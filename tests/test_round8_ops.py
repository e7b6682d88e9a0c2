"""Round-8 hardening: the dedup_token_savings zero-token guard (ADVICE
r7) and cluster-cache coherence — cold vs warm output must be
bit-identical for every consumer of the shared ``_CLUSTERS_CACHE``
frame (VERDICT r7 #8: the caches are load-bearing for three consumers;
cache-coherence bugs are the class the suite hadn't planted yet)."""

from __future__ import annotations

import xboard_spark
from xboard_spark.operators.curation import dedup_token_savings
from xboard_spark.operators.dedup import canonical_docs, cluster_size_profile

DOC_SCHEMA = "doc_id long, lang string, source string, text string"


def _docs(spark, rows):
    return spark.createDataFrame(rows, DOC_SCHEMA)


def _corpus(spark):
    """Two near-dup clusters (one with a strictly richer member, one
    all-ties) plus singletons across two languages — enough structure
    that a stale or cross-wired cluster frame changes every output."""
    base_en = "the quick brown fox jumps over the lazy dog again and again"
    base_fr = "le renard brun saute par dessus le chien paresseux encore"
    return _docs(
        spark,
        [
            (1, "en", "web", base_en + " extra tokens"),
            (2, "en", "web", base_en),
            (3, "en", "web", base_en),
            (10, "fr", "web", base_fr),
            (11, "fr", "web", base_fr),
            (20, "en", "books", "a unique document about completely other things"),
            (21, "fr", "books", "un document unique sur de toutes autres choses"),
        ],
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_dedup_token_savings_zero_token_lang(spark):
    """ADVICE r7: a lang whose docs ALL tokenize to zero tokens (the
    token regex matches alnum runs; punctuation-only text has none) must
    report savings_rate == 0.0 exactly — not null/NaN from 0/0. The
    oracle twin carries the same CASE guard."""
    docs = _docs(
        spark,
        [
            (1, "xx", "web", "!!! ??? ... ---"),
            (2, "xx", "web", "%%% &&& ((( )))"),
            (3, "en", "web", "one normal document with actual words"),
        ],
    )
    xboard_spark.clear_index_caches()
    out = {r.lang: r for r in dedup_token_savings(docs, tau=0.5).collect()}
    xx = out["xx"]
    assert xx.total_tokens == 0 and xx.removed_tokens == 0
    assert xx.savings_rate is not None
    assert xx.savings_rate == 0.0
    assert out["en"].savings_rate == 0.0  # singleton: nothing removed
    xboard_spark.clear_index_caches()


def test_cluster_cache_cold_vs_warm_identical(spark):
    """Cold (cache miss, fixpoint runs) and warm (cache hit) invocations
    of every _CLUSTERS_CACHE consumer must produce identical rows."""
    docs = _corpus(spark)
    consumers = {
        "dedup_token_savings": lambda: dedup_token_savings(docs, tau=0.5),
        "canonical_docs": lambda: canonical_docs(docs, tau=0.5),
        "cluster_size_profile": lambda: cluster_size_profile(docs, tau=0.5),
    }
    xboard_spark.clear_index_caches()
    cold = {name: _rows(fn()) for name, fn in consumers.items()}
    # sanity: the planted structure actually produced clusters
    assert any(r for r in cold["cluster_size_profile"])
    warm = {name: _rows(fn()) for name, fn in consumers.items()}
    assert warm == cold, "warm (cache-hit) output diverged from cold"
    xboard_spark.clear_index_caches()


def test_cluster_cache_warmed_by_other_consumer(spark):
    """The cache is shared: warming it through one consumer must not
    change any other consumer's output (cross-consumer coherence — the
    failure mode where a consumer accidentally depends on who built the
    cached frame)."""
    docs = _corpus(spark)
    xboard_spark.clear_index_caches()
    cold_savings = _rows(dedup_token_savings(docs, tau=0.5))
    cold_canon = _rows(canonical_docs(docs, tau=0.5))

    xboard_spark.clear_index_caches()
    _rows(canonical_docs(docs, tau=0.5))  # warm via the OTHER consumer
    assert _rows(dedup_token_savings(docs, tau=0.5)) == cold_savings

    xboard_spark.clear_index_caches()
    _rows(dedup_token_savings(docs, tau=0.5))
    assert _rows(canonical_docs(docs, tau=0.5)) == cold_canon
    xboard_spark.clear_index_caches()
