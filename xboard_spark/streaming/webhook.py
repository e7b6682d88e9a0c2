"""Structured Streaming webhook intake — the implementation of what the
reference's schema promises but stubs (SURVEY.md §2.7):

- ST1: ``POST /webhooks`` sink stub (``server.js:38-40``) -> a file/Kafka
  JSON stream source feeding a bronze table.
- ST2: ``delivery_hash TEXT UNIQUE`` (``init.sql:25``) -> watermarked
  ``dropDuplicates`` — exactly-once under webhook redelivery with bounded
  state (the watermark bounds the dedup hash set; a redelivery later than
  the watermark falls through to the idempotent merge backstop, SURVEY.md
  §7 hard part 2).
- ST3: event-time vs arrival-time (``init.sql:56-58``) -> watermark on
  ``received_at``.
- ST4: processed/error markers (``init.sql:27-28``) -> replaced by
  checkpointing + idempotent ``foreachBatch`` merge (Spark's native
  exactly-once).
- ST5: ``ingestion_runs`` bookkeeping (``init.sql:126-133``) -> a run-log
  append per micro-batch.

At scale: the source becomes Kafka with the same schema; dedup state is
per-key in the state store (RocksDB on executors), partitioned by
delivery_hash — no driver-side state anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

WEBHOOK_SCHEMA = T.StructType(
    [
        T.StructField("tenant_id", T.LongType()),
        T.StructField("topic", T.StringType()),
        T.StructField("shop_domain", T.StringType()),
        T.StructField("received_at", T.StringType()),  # ISO8601 in payload
        T.StructField("delivery_hash", T.StringType()),
        T.StructField("raw_payload", T.StringType()),
    ]
)


def read_webhook_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream of webhook JSON (one JSON object per line)."""
    return (
        spark.readStream.schema(WEBHOOK_SCHEMA)
        .json(path)
        .withColumn("received_at", F.to_timestamp("received_at"))
    )


def read_webhook_kafka(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str = "webhooks",
) -> DataFrame:
    """Kafka form of the webhook source — the production intake at scale
    (file source is the test/dev twin; both feed the same downstream
    pipeline). Requires the spark-sql-kafka package on the classpath; this
    container ships without it, so the failure mode is an explicit error at
    call time, not a silent stub."""
    try:
        raw = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("subscribe", topic)
            .load()
        )
    except Exception as e:  # pragma: no cover - no kafka jar in container
        raise NotImplementedError(
            "kafka source requires the spark-sql-kafka package "
            "(--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>); "
            "wire it here — downstream (deduped_stream -> parse_order_events "
            "-> start_bronze_to_silver) is source-agnostic"
        ) from e
    parsed = raw.select(
        F.from_json(F.col("value").cast("string"), WEBHOOK_SCHEMA).alias("w")
    ).select("w.*")
    return parsed.withColumn("received_at", F.to_timestamp("received_at"))


CORRUPT_COL = "_corrupt_record"


def read_webhooks_with_errors(spark: SparkSession, path: str) -> DataFrame:
    """Batch intake that KEEPS malformed payloads instead of dropping them —
    the reference's ``webhook_events.error TEXT`` design (``init.sql:28``):
    bad rows must land with an error marker, not vanish. PERMISSIVE mode
    parks the raw line in ``error_raw``; downstream routing filters on
    ``is_valid`` (good rows -> silver merge, bad rows -> quarantine table).
    """
    # StructType.add MUTATES in place — build a fresh schema each call so the
    # shared module-level WEBHOOK_SCHEMA never grows a duplicate column
    schema = T.StructType(WEBHOOK_SCHEMA.fields + [T.StructField(CORRUPT_COL, T.StringType())])
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    # a permissive parse can't be filtered on the corrupt column directly
    # without materializing it first (Spark requires a checkpointed plan) —
    # re-project through select so the column is a plain attribute
    return df.select(
        *[c for c in df.columns if c != CORRUPT_COL],
        F.col(CORRUPT_COL).alias("error_raw"),
    ).withColumn(
        "is_valid", F.col("error_raw").isNull()
    ).withColumn("received_at", F.to_timestamp("received_at"))


def deduped_stream(
    webhook: DataFrame, watermark_delay: str = "10 minutes"
) -> DataFrame:
    """ST2: exactly-once dedup on delivery_hash with bounded state.

    ``dropDuplicatesWithinWatermark`` — NOT plain ``dropDuplicates`` —
    because the plain form only watermark-evicts state when the event-time
    column is part of the dedup keys; keyed on delivery_hash alone it
    accumulates one state row per hash FOREVER (unbounded state, the
    100 TB killer). The WithinWatermark form guarantees dedup of
    redeliveries arriving within ``watermark_delay`` of each other and
    evicts older state; a redelivery later than that falls through to the
    idempotent merge backstop in ``start_bronze_to_silver`` (tested by
    ``test_late_redelivery_past_watermark_hits_merge_backstop``)."""
    return webhook.withWatermark(
        "received_at", watermark_delay
    ).dropDuplicatesWithinWatermark(["delivery_hash"])


def parse_order_events(webhook: DataFrame) -> DataFrame:
    """Bronze -> silver projection for 'orders/*' topics: pull the typed
    order columns out of raw_payload (the streaming twin of
    ``ingest.normalize_orders``)."""
    payload = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("total_price", T.StringType()),
            T.StructField("currency", T.StringType()),
            T.StructField("created_at", T.StringType()),
        ]
    )
    p = F.from_json(F.col("raw_payload"), payload)
    return webhook.filter(F.col("topic").startswith("orders/")).select(
        "tenant_id",
        p["id"].alias("shopify_order_id"),
        p["total_price"].cast(T.DecimalType(18, 2)).alias("total_price"),
        p["currency"].alias("currency"),
        F.to_timestamp(p["created_at"]).alias("created_at"),
        F.col("raw_payload").alias("raw"),
        F.col("received_at").alias("created_recorded_at"),
    )


def start_bronze_to_silver(
    stream: DataFrame,
    silver_path: str,
    checkpoint_path: str,
    keys: list[str],
    run_log: list | None = None,
    trigger_available_now: bool = True,
):
    """foreachBatch merge into a parquet silver table (ST4 exactly-once:
    checkpoint + idempotent merge; re-processing a batch converges to the
    same table). ``run_log`` collects per-batch bookkeeping (ST5)."""
    from xboard_spark.ingest import merge_upsert

    def process(batch: DataFrame, batch_id: int) -> None:
        import os
        import shutil

        spark = batch.sparkSession
        if os.path.exists(silver_path):
            current = spark.read.parquet(silver_path)
            merged = merge_upsert(
                current,
                batch.withColumn("_batch_priority", F.lit(batch_id + 1)),
                keys=keys,
            )
        else:
            merged = batch
        out = merged.select(batch.columns)
        # stage-then-swap: write the merged table next to the live one, then
        # atomically replace the directory. All data movement stays on
        # executors (no collect); only the rename is driver-side. This is
        # the Delta-free transactional overwrite (at warehouse scale the
        # swap is a metastore partition-location flip instead).
        staging = silver_path.rstrip("/") + f"._staging_{batch_id}"
        out.write.mode("overwrite").parquet(staging)
        if os.path.exists(silver_path):
            shutil.rmtree(silver_path)
        os.rename(staging, silver_path)
        if run_log is not None:
            run_log.append(
                {"batch_id": batch_id, "n_rows": batch.count(), "status": "ok"}
            )

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
