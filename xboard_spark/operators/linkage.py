"""Record linkage / entity resolution: blocked fuzzy-duplicate detection
over dimension tables — the structured-data sibling of the document dedup
family (``operators/dedup.py``). The reference's world gets this for free
from UNIQUE constraints on upstream ids (``migrations/init.sql:43``); a
lake ingesting from many sources has no shared id space and has to MATCH
records instead.

Method (Fellegi-Sunter-style pipeline, reduced to its scalable core):
blocking first — records only ever compare within a block, so the
pairwise cost is sum(block_size^2), never |table|^2 (the same bound the
shingle/LSH dedup operators enforce; blocking keys play the role of LSH
buckets) — then an exact pairwise similarity (Levenshtein edit distance,
a built-in JVM expression in Spark AND DuckDB with identical classic
semantics, so the operator stays oracle-checkable) inside each block.
At 100 TB: pick blocking keys with bounded block sizes (phonetic codes,
sorted-neighborhood windows, LSH over name shingles) and add a hot-block
cap exactly like the stop-shingle df cap in ``dedup.filtered_index``."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_customer_pairs(customer: DataFrame, max_dist: int = 1) -> DataFrame:
    """Near-duplicate customer pairs: same nation (blocking key), name
    edit distance <= ``max_dist``. One shuffle keys both self-join sides
    on the blocking key; the quadratic is per-block only."""
    probe = customer.select("c_custkey", "c_name", "c_nationkey")
    a = probe.alias("a")
    b = probe.alias("b")
    return (
        a.join(
            b,
            (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
            & (F.col("a.c_custkey") < F.col("b.c_custkey")),
        )
        .withColumn(
            "name_dist", F.levenshtein(F.col("a.c_name"), F.col("b.c_name"))
        )
        .filter(F.col("name_dist") <= max_dist)
        .select(
            F.col("a.c_nationkey").cast("long").alias("nationkey"),
            F.col("a.c_custkey").alias("custkey_a"),
            F.col("b.c_custkey").alias("custkey_b"),
            F.col("name_dist").cast("long").alias("name_dist"),
        )
        .orderBy("custkey_a", "custkey_b")
    )
