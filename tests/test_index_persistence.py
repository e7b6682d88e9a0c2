"""Persisted index artifacts: the shingle index written as a BUCKETED
table probes without an Exchange on the bucketed side — the durable form
the in-session caches stand in for."""

from __future__ import annotations

from pyspark.sql import functions as F

from xboard_spark.io import read_index_table, write_bucketed_index
from xboard_spark.operators.dedup import cached_filtered_index


def _mkdocs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )


def test_bucketed_index_roundtrip_and_shuffle_free_probe(spark):
    docs = _mkdocs(
        spark,
        [(i, " ".join(f"w{i}x{j}" for j in range(30)), "en", "web") for i in range(20)],
    )
    inv = cached_filtered_index(docs, 3, 100)
    write_bucketed_index(inv, "t_shingle_idx", "shfp", n_buckets=4, sort_col="shfp")
    back = read_index_table(spark, "t_shingle_idx")
    # content identical to the in-session artifact
    assert back.count() == inv.count()
    assert back.exceptAll(inv).count() == 0 and inv.exceptAll(back).count() == 0

    # probe join keyed on the bucket column: the persisted side must join
    # with NO Exchange above its scan (probe side may shuffle; the index
    # side must not — that is what bucketing buys)
    probe = inv.limit(50).select("shfp").distinct()
    joined = back.join(probe.hint("shuffle_hash"), "shfp")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # the persisted side must scan with its bucketing ACTIVE (the scan
    # reports "Bucketed: true" only when the join consumed the bucketed
    # distribution instead of re-shuffling it)
    assert "Bucketed: true" in plan
    spark.sql("DROP TABLE IF EXISTS t_shingle_idx")


def test_parquet_layout_report_reads_footers(spark, tmp_path):
    from pyspark.sql import functions as F

    from xboard_spark.io import parquet_layout_report

    p = str(tmp_path / "t")
    spark.range(0, 10_000).select(
        F.col("id"),
        (F.col("id") % 3).cast("string").alias("cat"),  # low-card -> dict
    ).write.parquet(p)
    rows = {r["column"]: r for r in parquet_layout_report(p)}
    assert set(rows) == {"id", "cat"}
    assert rows["cat"]["n_values"] == 10_000
    # the 3-value string column must dictionary-encode
    assert any("DICTIONARY" in e for e in rows["cat"]["encodings"])
    assert rows["cat"]["ratio"] >= 1.0
