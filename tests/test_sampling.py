"""Sampling/splitting invariants that matter for training pipelines:
hash-split determinism, subset stability (no leakage as the corpus grows),
approximate split fractions, and exact-k stratified sampling."""

from __future__ import annotations

import pytest

from xboard_spark.operators import sampling


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, f"word{i} alpha beta gamma delta " * (1 + i % 4), ["en", "de"][i % 2], "web", 30 * (1 + i % 4))
        for i in range(200)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_split_deterministic_and_stable_under_growth(docs):
    """The split of a given doc must not depend on the rest of the corpus:
    the hash is a pure function of doc_id, so splitting a 100-doc prefix
    and the full 200-doc corpus must agree on the shared docs (this is the
    anti-leakage property RNG-based splits do not have)."""
    full = {r.doc_id: r.split for r in sampling.with_split(docs).collect()}
    prefix = {
        r.doc_id: r.split
        for r in sampling.with_split(docs.filter("doc_id < 100")).collect()
    }
    assert prefix == {k: v for k, v in full.items() if k < 100}
    again = {r.doc_id: r.split for r in sampling.with_split(docs).collect()}
    assert again == full


def test_split_fraction_near_target(docs):
    full = sampling.with_split(docs, test_pct=20).groupBy("split").count().collect()
    by = {r.split: r["count"] for r in full}
    assert 0.10 <= by.get("test", 0) / 200 <= 0.30  # hash-uniform, 200 draws


def test_split_stats_shape(docs):
    out = sampling.train_test_split_stats(docs).collect()
    assert {r.split for r in out} == {"train", "test"}
    assert all(r.n_docs > 0 and r.total_tokens > 0 for r in out)


def test_stratified_sample_exact_k_and_deterministic(docs):
    out = sampling.stratified_sample(docs, k=7).collect()
    by_lang: dict[str, list] = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r)
    assert set(by_lang) == {"en", "de"}
    for lang, rows in by_lang.items():
        assert [r.rank for r in sorted(rows, key=lambda r: r.rank)] == list(
            range(1, 8)
        )
        # ranked by tag: the sample is the bottom-k of the salted hash
        tags = [r.tag for r in sorted(rows, key=lambda r: r.rank)]
        assert tags == sorted(tags)
    assert sampling.stratified_sample(docs, k=7).collect() == out


def test_length_histogram_buckets_cover_all_docs(docs):
    out = sampling.length_histogram(docs, bucket_width=10).collect()
    assert sum(r.n_docs for r in out) == 200
    assert all(r.bucket_lo % 10 == 0 for r in out)
