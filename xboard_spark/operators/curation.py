"""The end-to-end training-data curation pipeline — the composition the
whole operator library exists for: quality filter -> near-duplicate removal
-> curated corpus stats, in ONE lazy plan (Catalyst fuses the stages; no
intermediate materialization beyond the persisted dedup index).

Pipeline semantics (standard pre-training curation shape, C4/RefinedWeb
style):
1. quality gate: keep documents with >= ``min_tokens`` tokens;
2. near-dedup: among MinHash/LSH near-dup pairs (exact-verified Jaccard >=
   tau), drop the higher doc_id of each pair (keep-first policy);
3. report the surviving corpus per (lang, source).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xboard_spark.operators.dedup import minhash_dedup_pairs
from xboard_spark.operators.text import TOKEN_RE


def curated_corpus_stats(
    documents: DataFrame, min_tokens: int = 40, tau: float = 0.5
) -> DataFrame:
    """Curation summary: per (lang, source) document/token counts after the
    quality gate and near-dup removal.

    Scale shape: the quality gate is a per-row expression (no shuffle);
    dedup-removal is an anti join against the (small) removed-id set; the
    final rollup is one partial+final hash agg. At 100 TB the removed set
    is still tiny relative to the corpus — the anti join broadcasts.
    """
    with_tokens = documents.withColumn(
        "n_tokens",
        F.size(F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_RE), 0)),
    )
    quality_pass = with_tokens.filter(F.col("n_tokens") >= min_tokens)
    removed = (
        minhash_dedup_pairs(documents, tau=tau)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    curated = quality_pass.join(removed, "doc_id", "left_anti")
    return (
        curated.groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.round(F.avg("n_tokens"), 6).alias("avg_tokens"),
        )
        .orderBy("lang", "source")
    )
