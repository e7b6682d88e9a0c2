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


def test_doc_chunks_partition_tokens_in_order(docs, spark):
    from xboard_spark.operators import text as T
    from pyspark.sql import functions as F

    out = T.doc_chunks(docs, chunk_size=5).collect()
    # chunk token counts partition the document's tokens
    totals = {}
    for r in out:
        totals[r.doc_id] = totals.get(r.doc_id, 0) + r.n_tokens
        assert 1 <= r.n_tokens <= 5
    expected = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id", T.token_count_col(F.col("text")).alias("n")
        ).collect()
    }
    assert totals == expected
    # chunk ids are dense from 0 per doc
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r.chunk_id)
    for ids in by_doc.values():
        assert sorted(ids) == list(range(len(ids)))
    # only the LAST chunk of a doc may be short
    for doc_id, ids in by_doc.items():
        rows = {r.chunk_id: r for r in out if r.doc_id == doc_id}
        for cid in ids:
            if cid != max(ids):
                assert rows[cid].n_tokens == 5


def test_doc_chunks_fp_matches_reassembled_text(spark):
    """The chunk fingerprint equals the fingerprint of the space-joined
    tokens in position order (exercised with a doc whose tokens are NOT in
    lexical order, so a wrong sort key would be caught)."""
    from xboard_spark.operators import text as T
    from xboard_spark.functions.portable_hash import fingerprint64
    from pyspark.sql import functions as F

    one = spark.createDataFrame(
        [(1, "zebra yak xray walrus vole unicorn", "en", "t", 34)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = T.doc_chunks(one, chunk_size=4).collect()
    want = {0: "zebra yak xray walrus", 1: "vole unicorn"}
    fps = {
        r.cid: r.fp
        for r in spark.createDataFrame(
            [(k, v) for k, v in want.items()], "cid long, s string"
        )
        .select("cid", fingerprint64(F.col("s")).alias("fp"))
        .collect()
    }
    assert {r.chunk_id: r.chunk_fp for r in out} == fps


def test_sequence_packing_invariants(docs):
    out = sampling.sequence_packing(docs, budget=100, n_shards=4).collect()
    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    assert sum(r.n_docs for r in out) == 200  # every doc packed exactly once
    for shard, rows in by_shard.items():
        rows = sorted(rows, key=lambda r: r.pack_id)
        # pack ids dense from 0 within the shard
        assert [r.pack_id for r in rows] == list(range(len(rows)))
        # a pack is closed only once the running total crosses its upper
        # boundary (greedy-concat semantics), so every non-final pack's
        # cumulative token count reaches (pack_id + 1) * budget
        cum = 0
        for r in rows[:-1]:
            cum += r.pack_tokens
            assert cum >= (r.pack_id + 1) * 100, (shard, r.pack_id, cum)
        # fill ratio is tokens/budget
        for r in rows:
            assert abs(r.fill_ratio - r.pack_tokens / 100) < 1e-6


def test_overlapping_chunks_degenerate_equals_doc_chunks(docs):
    from xboard_spark.operators import text as T

    plain = {
        (r.doc_id, r.chunk_id): (r.n_tokens, r.chunk_fp)
        for r in T.doc_chunks(docs, chunk_size=5).collect()
    }
    degen = {
        (r.doc_id, r.chunk_id): (r.n_tokens, r.chunk_fp)
        for r in T.doc_chunks_overlapping(docs, chunk_size=5, stride=5).collect()
    }
    assert degen == plain


def test_overlapping_chunks_window_coverage(spark):
    """12 tokens, size 6, stride 4 -> chunks at 0/4/8 covering [0,6),
    [4,10), [8,12): interior chunks full, overlap = size - stride."""
    from xboard_spark.operators import text as T

    words = " ".join(f"w{i:02d}" for i in range(12))
    one = spark.createDataFrame(
        [(1, words, "en", "t", len(words))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = sorted(
        T.doc_chunks_overlapping(one, chunk_size=6, stride=4).collect(),
        key=lambda r: r.chunk_id,
    )
    assert [(r.chunk_id, r.start_pos, r.n_tokens) for r in out] == [
        (0, 0, 6),
        (1, 4, 6),
        (2, 8, 4),
    ]


def test_term_cooccurrence_counts_and_pmi_formula(spark):
    """Identical docs so the combinatorics are computable by hand: verify
    the top pair, exact pair counts, and that every returned PMI equals
    ln((pair_n/P) / ((cnt_a/N)(cnt_b/N))) for the corpus totals."""
    import math

    from xboard_spark.operators import text as T

    text = "data pipeline alpha beta data pipeline"  # 6 tokens
    n_docs = 30
    docs = spark.createDataFrame(
        [(i, text, "en", "t", len(text)) for i in range(n_docs)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    window = 2
    toks = text.split()
    L = len(toks)
    N = n_docs * L
    # ordered pairs within the window, per doc
    per_doc = sum(max(0, L - d) for d in range(1, window + 1))
    P = n_docs * per_doc
    cnt = {w: n_docs * toks.count(w) for w in set(toks)}

    out = T.term_cooccurrence(docs, window=window, k=10, min_count=5).collect()
    assert out, "no pairs above min_count"
    # (data, pipeline) occurs twice per doc at distance 1 — top count with
    # the (w_a, w_b) tiebreak
    assert (out[0].w_a, out[0].w_b) == ("data", "pipeline")
    assert out[0].pair_n == 2 * n_docs
    for r in out:
        assert r.cnt_a == cnt[r.w_a] and r.cnt_b == cnt[r.w_b]
        want = math.log((r.pair_n / P) / ((r.cnt_a / N) * (r.cnt_b / N)))
        assert abs(r.pmi - want) < 1e-6, (r.w_a, r.w_b)


def test_mixture_rebalance_binding_lang_keeps_all(spark):
    """100 en vs 20 zh with a 50/50 target: zh is the binding lang (keeps
    everything, rate 1.0) and en downsamples to rate 0.2 so the expected
    kept mix is 50/50. Rates are exact arithmetic; kept counts are
    hash-binomial around the expectation."""
    from xboard_spark.operators import sampling

    rows = [(i, f"text {i}", "en", "s", 10) for i in range(100)]
    rows += [(1000 + i, f"zh text {i}", "zh", "s", 10) for i in range(20)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = {
        r.lang: r
        for r in sampling.mixture_rebalance(
            docs, targets={"en": 0.5, "zh": 0.5}
        ).collect()
    }
    assert set(out) == {"en", "zh"}
    assert out["zh"].rate == 1.0 and out["zh"].n_kept == 20
    assert abs(out["en"].rate - 0.2) < 1e-9
    assert 8 <= out["en"].n_kept <= 32  # 100 hash-draws at p=0.2
    assert abs(out["en"].kept_share + out["zh"].kept_share - 1.0) < 1e-6
    # deterministic: same inputs, same result
    again = {
        r.lang: r.n_kept
        for r in sampling.mixture_rebalance(
            docs, targets={"en": 0.5, "zh": 0.5}
        ).collect()
    }
    assert again == {lg: r.n_kept for lg, r in out.items()}
