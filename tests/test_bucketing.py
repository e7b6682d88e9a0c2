"""Scale-path storage tests: bucketed tables co-locate join keys so the
fact-fact join needs NO shuffle (the Spark analog of the reference's
indexed join columns, and the strategy that matters most at 100 TB — a
600 GB shuffle avoided per query is the difference between minutes and
hours). Asserts on the physical plan, not just results."""

from __future__ import annotations

import re

import pytest

from xboard_spark.plans.lint import explain_str
from xboard_spark.session import get_spark


@pytest.fixture(scope="module")
def wh_spark(spark):
    # shared session; conftest pins the warehouse + metastore to a temp dir
    return spark


def _exchanges(df) -> int:
    return len(re.findall(r"\bExchange\b", explain_str(df, "simple")))


def test_bucketed_join_has_no_shuffle(wh_spark):
    spark = wh_spark
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")

    (
        orders.write.mode("overwrite")
        .bucketBy(4, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("orders_b")
    )
    (
        lineitem.write.mode("overwrite")
        .bucketBy(4, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("lineitem_b")
    )

    ob = spark.table("orders_b")
    lb = spark.table("lineitem_b")

    plain = lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
    bucketed = lb.join(ob, lb["l_orderkey"] == ob["o_orderkey"])

    # same results
    assert bucketed.count() == plain.count()
    # the bucketed join reads both sides pre-partitioned: no Exchange at all
    assert _exchanges(bucketed) == 0
    # sanity: the plain parquet join does shuffle (or broadcasts);
    # disable broadcast to expose the exchange
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plain2 = lineitem.join(
            orders, lineitem["l_orderkey"] == orders["o_orderkey"]
        )
        assert _exchanges(plain2) >= 2
        bucketed2 = lb.join(ob, lb["l_orderkey"] == ob["o_orderkey"])
        assert _exchanges(bucketed2) == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")


def test_partitioned_write_prunes(wh_spark, tmp_path_factory):
    """partitionBy on the tenant-analog column -> predicate becomes
    directory pruning (the Spark analog of idx_*_tenant_id,
    SURVEY.md §1.4)."""
    spark = wh_spark
    out = str(tmp_path_factory.mktemp("part")) + "/orders_p"
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    orders.write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)

    pruned = spark.read.parquet(out).filter("o_orderstatus = 'F'")
    txt = explain_str(pruned, "formatted")
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", txt)
    assert m and "o_orderstatus" in m.group(1)  # filter hit the directory level
    assert pruned.count() == orders.filter("o_orderstatus = 'F'").count()


def test_write_silver_layout_prunes_and_sorts(spark, tmp_path):
    """write_silver's layout delivers both index analogs: the tenant
    predicate becomes a PartitionFilter (no data read outside the tenant
    dir) and rows inside each partition are sorted on the range column."""
    import re

    from pyspark.sql import functions as F
    from xboard_spark.io import read_silver, write_silver

    rows = [(t, i, float(i), f"2024-01-{(i % 28) + 1:02d}") for t in (1, 2, 3) for i in range(50)]
    df = spark.createDataFrame(
        rows, "tenant_id int, order_id int, total double, d string"
    ).withColumn("created_at", F.to_timestamp("d")).drop("d")
    out = str(tmp_path / "silver_orders")
    write_silver(df, out, partition_cols=("tenant_id",), sort_cols=("created_at",))

    back = read_silver(spark, out)
    assert back.count() == 150
    q = back.filter(F.col("tenant_id") == 2)
    txt = q._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", txt)
    assert m and "tenant_id" in m.group(1), txt[:500]
    # within one tenant's files, timestamps are non-decreasing per file
    import glob
    import pyarrow.parquet as pq

    for f in glob.glob(f"{out}/tenant_id=2/*.parquet"):
        ts = pq.read_table(f, columns=["created_at"]).column(0).to_pylist()
        assert ts == sorted(ts), f


def test_compact_silver_merges_small_files(spark, tmp_path):
    """Simulate streaming-append damage (many tiny appends per tenant),
    compact, and assert: far fewer files, identical data, layout intact
    (partition pruning still works on the compacted table)."""
    from pyspark.sql import functions as F

    from xboard_spark.io import compact_silver, read_silver

    out = str(tmp_path / "silver")
    rows = [(t, i, float(i)) for t in (1, 2) for i in range(40)]
    df = spark.createDataFrame(rows, "tenant_id long, k long, v double")
    # 10 tiny appends of 8 rows each -> >= 20 small files across 2 tenants
    for chunk in range(10):
        df.filter((F.col("k") % 10) == chunk).repartition(2).write.mode(
            "append"
        ).partitionBy("tenant_id").parquet(out)

    import glob
    before = glob.glob(f"{out}/**/*.parquet", recursive=True)
    assert len(before) >= 20

    stats = compact_silver(spark, out, target_file_mb=128,
                           partition_cols=("tenant_id",), sort_cols=("k",))
    after = glob.glob(f"{out}/**/*.parquet", recursive=True)
    assert stats["files_before"] == len(before)
    assert stats["files_after"] == len(after)
    assert len(after) <= 2  # one file per hive partition
    got = sorted(
        map(tuple, read_silver(spark, out).select("tenant_id", "k", "v").collect())
    )
    assert got == sorted(rows)  # no data lost or duplicated
    # partition pruning still applies on the compacted layout
    plan = read_silver(spark, out).filter(F.col("tenant_id") == 1)
    assert plan.count() == 40
