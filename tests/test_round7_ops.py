"""Round-7 operator semantics: the dedup token-savings panel."""

from __future__ import annotations

import xboard_spark
from xboard_spark.operators.curation import dedup_token_savings

DOC_SCHEMA = "doc_id long, lang string, source string, text string"


def _docs(spark, rows):
    return spark.createDataFrame(rows, DOC_SCHEMA)


def test_dedup_token_savings_planted_cluster(spark):
    """Plant a near-dup cluster (one doc richer than its two copies) in
    'en' and a unique doc in 'fr': the keep-the-richest policy must drop
    the two poorer members, charge their token mass to 'en', and leave
    'fr' untouched."""
    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = _docs(
        spark,
        [
            # near-identical trio: doc 1 has two extra tokens (richest)
            (1, "en", "web", base + " extra tokens"),
            (2, "en", "web", base),
            (3, "en", "web", base),
            # singleton, different language: never clustered
            (4, "fr", "web", "le renard brun saute par dessus le chien"),
        ],
    )
    xboard_spark.clear_index_caches()
    out = {r.lang: r for r in dedup_token_savings(docs, tau=0.5).collect()}
    en, fr = out["en"], out["fr"]
    base_tokens = len(base.split())
    assert en.n_docs == 3
    assert en.n_removed == 2  # docs 2 and 3; doc 1 kept as richest
    assert en.removed_tokens == 2 * base_tokens
    assert en.total_tokens == 3 * base_tokens + 2
    assert abs(
        en.savings_rate - round(en.removed_tokens / en.total_tokens, 6)
    ) < 1e-12
    assert fr.n_docs == 1 and fr.n_removed == 0 and fr.removed_tokens == 0
    assert fr.savings_rate == 0.0
    xboard_spark.clear_index_caches()


def test_dedup_token_savings_tiebreak_keeps_min_doc_id(spark):
    """Equal token counts inside a cluster: the representative is the
    MIN doc_id (the canonical_docs tie-break), so the HIGHER ids are the
    removed ones."""
    base = "identical text repeated for every member of this cluster"
    docs = _docs(spark, [(i, "en", "web", base) for i in (7, 3, 5)])
    xboard_spark.clear_index_caches()
    r = dedup_token_savings(docs, tau=0.5).collect()[0]
    n = len(base.split())
    assert r.n_removed == 2 and r.removed_tokens == 2 * n
    # doc 3 kept: savings = 2/3 of the corpus token mass
    assert r.savings_rate == round(2 * n / (3 * n), 6)
    xboard_spark.clear_index_caches()
