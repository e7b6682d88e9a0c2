"""Exact cent-arithmetic aggregation for 2-decimal-clean money/metric
columns — the engine-wide convention behind every PLAIN money sum.

Why: summing doubles re-associates across partitions, so Spark's
parallel partial sums and DuckDB's sequential sum differ in the last ulp
once a large value dominates the accumulator, and ``round()`` on huge
doubles splits engines at the cent (round-10 sweep 7). Per-row cents
(``round(v * 100)`` → long) are exact for any cent-quantized input at
any magnitude — at normal scales the product sits within a hair of an
integer, past 2^46 the double product is itself integral — and the long
sum is associative, so the aggregate is bit-identical regardless of
partitioning.

Conversion back to dollars is EXPLICIT ``::BIGINT::DOUBLE / 100.0`` on
both engines. The inner BIGINT narrowing is load-bearing in the DuckDB
twin: its BIGINT sum is HUGEINT, and the HUGEINT→DOUBLE (and
decimal-division) conversions truncate toward zero where the JVM
long→double and DuckDB's own BIGINT→DOUBLE round to nearest — measured
on the sweep-7 fixture as a last-ulp split on a sum past 2^53 landing on
an exact half-ulp tie (NOTES_r11.md sweep 7).

Boundaries (documented, fenced upstream by
``profiling.input_bounds_audit``): inputs must be 2-decimal-quantized
(a DERIVED product like ``l_extendedprice * (1 - l_discount)`` is NOT —
per-row cent rounding would change clean-data semantics, so product
sums keep the rounded-double surface and its documented magnitude
contract), and sum(|cents|) must stay under 2^63 (~9.2e16 dollars; the
ANSI long-overflow error past it is loud, not silent).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cent_sum_dollars(col: Column) -> Column:
    """Spark: exact cent-sum of a 2-decimal-clean column, emitted as
    dollars (double). Bit-identical to ``duck_cent_sum_dollars`` at any
    magnitude inside the long fence."""
    return F.sum(F.round(col * 100).cast("long")).cast("double") / F.lit(
        100.0
    )


def duck_cent_sum_dollars(sql_expr: str) -> str:
    """DuckDB SQL for the identical exact cent-sum-as-dollars."""
    return (
        f"sum(CAST(round(({sql_expr}) * 100) AS BIGINT))::BIGINT::DOUBLE"
        " / 100.0"
    )
