"""Skew-mitigation utilities — the tenant axis is the natural skew in the
XBoard domain (one big tenant = one hot partition; SURVEY.md §4.3). AQE's
skew-join splitting handles joins; for aggregations with heavy keys, the
classic fix is two-phase salted aggregation, provided here as a reusable
combinator.

Semantics: identical to ``df.groupBy(keys).agg(...)`` for any algebraic
aggregate (sum/count/min/max) — the salt only splits the partial phase.
Non-algebraic aggregates (exact distinct, percentiles) cannot be salted
this way; use their approximate forms at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation with a random salt on the partial phase.

    ``aggs`` maps output column -> (input column/expr, op) with op in
    {"sum", "count", "min", "max"}. Phase 1 groups by (keys + salt) —
    a hot key's rows spread over ``n_salts`` reducers; phase 2 re-combines
    the per-salt partials (sum/sum/min/max are all re-combinable).

    The salt is ``rand``-based and never appears in the result, so
    nondeterminism cannot leak: any salt assignment yields the same final
    aggregate.
    """
    salted = df.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
    phase1_aggs = []
    phase2_aggs = []
    for out, (col, op) in aggs.items():
        if op == "sum":
            phase1_aggs.append(F.sum(col).alias(f"_p_{out}"))
            phase2_aggs.append(F.sum(f"_p_{out}").alias(out))
        elif op == "count":
            phase1_aggs.append(F.count(col).alias(f"_p_{out}"))
            phase2_aggs.append(F.sum(f"_p_{out}").alias(out))
        elif op == "min":
            phase1_aggs.append(F.min(col).alias(f"_p_{out}"))
            phase2_aggs.append(F.min(f"_p_{out}").alias(out))
        elif op == "max":
            phase1_aggs.append(F.max(col).alias(f"_p_{out}"))
            phase2_aggs.append(F.max(f"_p_{out}").alias(out))
        else:
            raise ValueError(f"non-algebraic op cannot be salted: {op}")
    partial = salted.groupBy(*keys, "_salt").agg(*phase1_aggs)
    return partial.groupBy(*keys).agg(*phase2_aggs)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Skewed fact⋈dim equi-join: salt the fact side, replicate the dim side
    ``n_salts`` times — every hot fact key spreads across ``n_salts``
    reducers while the (small) dim side pays a bounded replication cost.
    (AQE's skew-join split supersedes this when both sides are shuffled;
    the manual form still matters when you need a deterministic layout or
    AQE is off.)"""
    salted_fact = fact.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
    exploded_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_fact.join(exploded_dim, [key, "_salt"]).drop("_salt")
