"""Plan-quality regression tests: the properties that make these queries
scale are asserted on the PHYSICAL PLAN, so a refactor that silently
un-pushes a filter, drops a broadcast, or sneaks a Python UDF into a hot
path fails CI — not just the 100 TB run."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from xboard_spark.plans.lint import explain_str, plan_report


@pytest.fixture(scope="module")
def qs():
    return entrymod.queries()


def _report(spark, qs, name, sf_dir):
    return plan_report(qs[name](spark, sf_dir))


def test_filters_reach_parquet_scan(spark, sf_dir, qs):
    r = _report(spark, qs, "pricing_summary", sf_dir)
    pushed = " ".join(p for p in r["pushed_filters"] if p)
    assert "l_shipdate" in pushed  # date cutoff reached the scan

    r = _report(spark, qs, "segment_top_orders", sf_dir)
    pushed = " ".join(p for p in r["pushed_filters"] if p)
    assert "EqualTo(c_mktsegment,BUILDING)" in pushed


def test_column_pruning(spark, sf_dir, qs):
    r = _report(spark, qs, "recent_orders", sf_dir)
    # projection of 5 columns must NOT read the other orders columns
    schemas = " ".join(r["read_schemas"])
    assert "o_orderpriority" not in schemas


def test_topk_plans_as_take_ordered(spark, sf_dir, qs):
    for name in ["top_customers", "recent_orders", "top_parts_by_revenue"]:
        assert _report(spark, qs, name, sf_dir)["take_ordered"], name


def test_dimension_joins_broadcast(spark, sf_dir, qs):
    r = _report(spark, qs, "revenue_by_nation", sf_dir)
    assert r["n_broadcast_joins"] >= 3  # supplier, nation, region at least
    assert r["n_smj"] == 0  # nothing falls back to sort-merge at this scale


def test_no_python_udf_in_hot_paths(spark, sf_dir, qs):
    for name in [
        "pricing_summary",
        "minhash_dedup",
        "knn_bruteforce",
        "quality_scores",
        "session_stats",
        "tfidf_top_terms",
    ]:
        assert not _report(spark, qs, name, sf_dir)["has_python_udf"], name


def test_point_lookup_is_shuffle_free(spark, sf_dir, qs):
    r = _report(spark, qs, "customer_lookup", sf_dir)
    assert r["n_exchanges"] == 0  # filter + broadcast chain, no shuffle


def test_no_collect_in_registered_query_paths():
    """Static gate: no registered query path may pull rows to the driver.

    Every ``queries()`` entry resolves to functions in the operator modules;
    a ``.collect()`` there means the operator isn't distributed. Scalar plan
    constants must instead be one-row aggregates joined back via broadcast
    crossJoin (the ``mixture_rebalance`` / ``term_cooccurrence`` pattern).
    Orchestration modules (ingest registration/backfill, streaming batch
    barriers) are deliberately exempt — they are metadata paths.
    """
    import pathlib

    ops_dir = pathlib.Path(__file__).resolve().parent.parent / "xboard_spark" / "operators"
    offenders = []
    for py in sorted(ops_dir.glob("*.py")):
        for i, line in enumerate(py.read_text().splitlines(), 1):
            # "sanctioned-collect:" marks a reviewed bounded-size driver
            # transfer (e.g. ml.ridge_probe pulls d^2 sufficient-statistic
            # doubles to solve a 65x65 system — aggregates, never data);
            # the marker must carry its justification inline.
            if "sanctioned-collect:" in line:
                continue
            code = line.split("#", 1)[0]
            if ".collect()" in code:
                offenders.append(f"{py.name}:{i}")
    assert offenders == [], f"driver-side collect in operator modules: {offenders}"


def test_global_ntile_reuses_range_exchange(spark, sf_dir, qs):
    """global_ntile's correctness INVARIANT (window_ops.py): the
    per-partition counts/offsets and the in-partition ranks must read the
    SAME range exchange — if Spark re-executed the range repartition for
    each branch, sampled bounds could differ between the two reads and the
    global ranks would be silently wrong.

    AQE marks stage reuse only in the EXECUTED adaptive plan, so run the
    query first, then assert the final plan (the section before ``Initial
    Plan``) contains a ReusedExchange whose target operator is the
    rangepartitioning exchange."""
    import re

    df = qs["rfm_segments"](spark, sf_dir)
    df.collect()
    full = explain_str(df, "formatted")
    # formatted layout: final tree, then "== Initial Plan ==" tree, then
    # per-operator details — the reuse target id lives in the DETAILS
    final_tree = full.split("== Initial Plan ==")[0]
    reuse_nodes = re.findall(r"ReusedExchange \((\d+)\)", final_tree)
    assert reuse_nodes, final_tree
    targets = set(
        re.findall(r"ReusedExchange \[Reuses operator id: (\d+)\]", full)
    )
    range_ids = {
        m.group(1)
        for m in re.finditer(
            r"\((\d+)\) Exchange\n[^()]*?rangepartitioning[^\n]*"
            r"REPARTITION_BY_COL",
            full,
        )
    }
    assert targets & range_ids, (targets, range_ids, full)


def test_boilerplate_topn_plans_distributed(spark, sf_dir, qs):
    """boilerplate_ngrams' LIMIT-after-sort must plan as
    TakeOrderedAndProject (distributed top-N heap), never a global sort,
    and its hot path stays JVM-only."""
    r = _report(spark, qs, "boilerplate_ngrams", sf_dir)
    assert r["take_ordered"]
    assert not r["has_python_udf"]


def test_knn_label_vote_plan_quality(spark, sf_dir, qs):
    """The label-vote probe inherits knn_bruteforce's plan properties:
    pure JVM expressions and the query-side filter pushed to the scan."""
    r = _report(spark, qs, "knn_label_vote", sf_dir)
    assert not r["has_python_udf"]
    pushed = " ".join(p for p in r["pushed_filters"] if p)
    assert "vec_id" in pushed


def test_aqe_splits_planted_skew_join(spark):
    """AQE's OptimizeSkewedJoin actually fires on a planted hot key: with
    skew thresholds lowered, the post-execution plan reports skew
    handling on the sort-merge join — the runtime mitigation that
    complements the manual salting in operators/skew.py."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # hot key 0 carries 50k rows with a fat payload; other keys tiny
        left = spark.range(0, 60_000).select(
            F.when(F.col("id") < 50_000, 0).otherwise(F.col("id") % 64).alias("k"),
            F.concat(F.lit("x" * 100), F.col("id").cast("string")).alias("pad"),
        )
        right = spark.range(0, 64).select(F.col("id").alias("k"))
        joined = left.join(right, "k")
        # collect() on THIS DataFrame so the inspected QueryExecution is
        # the one AQE finalized (count() would plan a separate query)
        assert len(joined.collect()) == 60_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]   # SortMergeJoin(skew=true)
        assert "skewed" in plan, plan[:2000]      # AQEShuffleRead ... skewed
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
