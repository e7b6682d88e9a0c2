"""Spark 4 Python DataSource over REST capture directories: registration,
split-per-page-file parallelism, provenance columns, and option
validation."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F

from xboard_spark.sources.pages_datasource import PagesDataSource


@pytest.fixture()
def capture_dir(tmp_path):
    d = tmp_path / "capture"
    d.mkdir()
    for p in range(3):
        (d / f"page-{p}.json").write_text(
            json.dumps(
                {"customers": [{"id": p * 10 + i, "n": f"c{p}-{i}"} for i in range(4)]}
            )
        )
    (d / "not-a-page.txt").write_text("ignored")
    return str(d)


def test_pages_datasource_reads_with_split_per_file(spark, capture_dir):
    spark.dataSource.register(PagesDataSource)
    df = (
        spark.read.format("xboard_pages")
        .option("path", capture_dir)
        .option("entity", "customers")
        .load()
    )
    assert df.columns == ["page", "pos", "raw"]
    rows = df.collect()
    assert len(rows) == 12
    # one input partition per page file -> true parallel read
    n_parts = df.select(F.spark_partition_id().alias("p")).distinct().count()
    assert n_parts == 3
    # provenance survives: page/pos identify the envelope slot exactly
    by_key = {(r.page, r.pos): json.loads(r.raw) for r in rows}
    assert by_key[(2, 3)] == {"id": 23, "n": "c2-3"}


def test_pages_datasource_requires_options(spark, capture_dir):
    spark.dataSource.register(PagesDataSource)
    with pytest.raises(Exception, match="path and entity"):
        spark.read.format("xboard_pages").option("path", capture_dir).load().collect()
