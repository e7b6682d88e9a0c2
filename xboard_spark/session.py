"""SparkSession factory.

Defaults are chosen for the 100 TB / many-executor target and scaled down by
environment variables for local testing:

- AQE on (coalesce shuffle partitions, skew-join splitting) — tenant skew is
  the natural skew axis in the XBoard domain (SURVEY.md §4.3).
- UTC session timezone — the reference stores TIMESTAMPTZ and the oracle
  (DuckDB) compares in UTC.
- Arrow enabled for the few Pandas-UDF paths (multimodal decode).
- ``spark.sql.shuffle.partitions`` defaults to the local core count; on a real
  cluster this is expected to be overridden (or left to AQE's coalescing with
  a high initial partition count).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "xboard-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the configured SparkSession."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("XBOARD_SHUFFLE_PARTITIONS", cpus))

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Parquet scans: keep splits big enough to amortize task overhead but
        # small enough to parallelize; 128 MiB is the right default at scale.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # Broadcast threshold: dims (region/nation/tenants/users) stay well
        # under this; big fact-fact joins fall through to sort-merge + AQE.
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.driver.memory", os.environ.get("XBOARD_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
