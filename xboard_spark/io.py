"""Readers + temp-view registration for the driver testdata tables.

Mirrors the reference's "pooled table scan" entry point (S1,
``/root/reference/db.js:9-17``): every query starts from a named table. Here a
named table is a parquet-backed DataFrame registered as a temp view so both
the DataFrame and ``spark.sql`` surfaces work (SURVEY.md §1.4).

Scale notes
-----------
- Parquet scans get predicate pushdown + column pruning from Catalyst for
  free; operators must keep filters/projections declarative so they reach the
  scan (check with ``xboard_spark.plans.explain_str``).
- At 100 TB the tables would be written ``partitionBy(tenant_id)`` (the Spark
  analog of the reference's ``idx_*_tenant_id`` B-trees,
  ``/root/reference/migrations/init.sql:46,62,80``); the reader below is
  layout-agnostic — partition pruning happens automatically when the layout
  has partition columns.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table (layout: ``{sf_dir}/{name}.parquet``).

    Spark 4 rejects parquet TIMESTAMP(NANOS) outright; the ``events`` table
    stores nanos, so we read nanos as long (runtime-settable legacy conf)
    and rebuild a microsecond TimestampType with integer division —
    ``timestamp_micros(ts div 1000)`` — the same truncation DuckDB applies
    casting TIMESTAMP_NS -> TIMESTAMP, keeping the oracle aligned.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def load_tables(
    spark: SparkSession,
    sf_dir: str,
    names: tuple[str, ...] = TESTDATA_TABLES,
    register_views: bool = True,
) -> dict[str, DataFrame]:
    """Load testdata tables; optionally register each as a temp view."""
    out: dict[str, DataFrame] = {}
    for name in names:
        df = read_table(spark, sf_dir, name)
        if register_views:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out
