"""Plan inspection + query-builder invariants.

Two purposes:

1. **Tenant-filter lint** (SURVEY.md §4.3): the reference's only security
   invariant is that every analytics query carries the JWT-sourced
   ``tenant_id`` predicate (``routes/analytics.js:30``). Our analog is a
   Python-side check that a DataFrame's analyzed plan contains an equality
   filter on the tenant column — enforced at the query-builder boundary,
   not as a Catalyst rule (same guarantee, visible in plain Python).

2. **Plan-quality report** for the perf loop: what reached the parquet scan
   (PushedFilters / ReadSchema), which joins broadcast, whether top-k
   planned as TakeOrderedAndProject, how many Exchanges (shuffles) the plan
   carries. ``bench.py`` measures wall clock; this explains it.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (Spark prints it to stdout)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def assert_filter_on(df: DataFrame, column: str) -> None:
    """Raise unless the analyzed plan carries an equality (or IN)
    predicate on ``column`` ITSELF — the tenant-isolation lint. Call it
    at the API boundary of any multi-tenant query entry point.

    The match anchors on the exact attribute token (analyzed plans print
    references as ``name#id``) adjacent to ``=``/``IN`` — a bare
    substring match was a false-negative hole: it passed on a filter
    over ``parent_tenant_id`` or on a mere ``isnotnull(tenant_id)``,
    neither of which isolates a tenant."""
    plan = df._jdf.queryExecution().analyzed().toString()
    ref = rf"(?<![A-Za-z0-9_]){re.escape(column)}#\d+[A-Za-z]*"
    # the analyzed plan may wrap the attribute in a widening cast —
    # `cast(tenant_id#5L as bigint) IN (...)` — so allow one trailing
    # `as <type>)` between the token and the operator (and a leading
    # `cast(` on the right-hand-side form)
    lhs = rf"{ref}(?:\s+as\s+\w+\))?\s*(?:=|IN\b)"
    rhs = rf"=\s*(?:cast\()?{ref}"
    pat = rf"Filter .*(?:{lhs}|{rhs})"
    if not re.search(pat, plan):
        raise ValueError(
            f"query plan carries no filter on '{column}' — multi-tenant "
            "isolation predicate is missing (reference invariant: "
            "routes/analytics.js:30 sources tenant_id from the JWT on "
            "every query)"
        )


def plan_report(df: DataFrame) -> dict[str, object]:
    """Structured summary of the physical plan for perf review."""
    txt = explain_str(df, "formatted")
    return {
        "n_exchanges": len(re.findall(r"\bExchange\b", txt)),
        "n_broadcast_joins": len(re.findall(r"BroadcastHashJoin", txt)),
        "n_smj": len(re.findall(r"SortMergeJoin", txt)),
        "take_ordered": "TakeOrderedAndProject" in txt,
        "pushed_filters": re.findall(r"PushedFilters: \[([^\]]*)\]", txt),
        "read_schemas": re.findall(r"ReadSchema: ([^\n]*)", txt),
        "whole_stage_codegen": len(set(re.findall(r"codegen id : (\d+)", txt))),
        "has_python_udf": "BatchEvalPython" in txt or "ArrowEvalPython" in txt,
    }
