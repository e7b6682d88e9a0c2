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

from xboard_spark.streaming.conf import stream_shuffle_partitions

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
    bad rows must land with an error marker, not vanish. The raw line is
    parked in ``error_raw``; downstream routing filters on ``is_valid``
    (good rows -> silver merge, bad rows -> quarantine table).

    Implementation is text-source + ``from_json`` — NOT a schema'd
    ``read.json`` — because Spark refuses any query over a raw JSON file
    scan whose referenced columns prune down to only the internal corrupt
    record column (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN):
    exactly what the quarantine path does
    (``.filter(~is_valid).select('error_raw')``). A select re-projection
    does NOT lift the restriction (it follows the plan down to the scan),
    and the documented cache() workaround pins the whole intake in
    memory. ``from_json`` with the corrupt-record option has the same
    PERMISSIVE semantics per line, no scan restriction, and mirrors the
    Kafka path (``read_webhook_kafka``), which parses the same way.

    Blank lines are filtered BEFORE the parse: the text source emits an
    empty-string row per blank line (``read.json`` silently skipped
    them), and ``from_json('')`` returns a NULL struct — not a corrupt
    record — so an unfiltered blank line would surface as an
    ``is_valid=true`` row with every field (including the merge key)
    NULL and flow into the silver merge. The emptiness check is a
    whitespace-CLASS regex, not ``trim()`` — Spark's trim strips only
    spaces, so a tab-only line would slip through a trim-based filter
    (measured before fixing)."""
    # StructType.add MUTATES in place — build a fresh schema each call so the
    # shared module-level WEBHOOK_SCHEMA never grows a duplicate column
    schema = T.StructType(WEBHOOK_SCHEMA.fields + [T.StructField(CORRUPT_COL, T.StringType())])
    parsed = spark.read.text(path).filter(
        F.col("value").rlike(r"\S")
    ).select(
        F.from_json(
            F.col("value"),
            schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("w")
    ).select("w.*")
    return parsed.select(
        *[c for c in parsed.columns if c != CORRUPT_COL],
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


def _recover_silver_swap(silver_path: str) -> None:
    """Recover an interrupted stage-then-swap (``start_bronze_to_silver``).
    The swap's two crash windows and their cures:

    - live MISSING + backup present: died between the demote and promote
      renames -> restore the backup (every previously merged batch).
      Without this, the replayed batch would find no silver table, take
      the first-batch branch, and rebuild the table from itself alone —
      silently discarding all prior data.
    - live present + backup present: died after the promote, before the
      backup cleanup -> the new table already won; drop the stale backup.
    """
    import os
    import shutil

    backup = silver_path.rstrip("/") + "._backup"
    if os.path.exists(backup):
        if os.path.exists(silver_path):
            shutil.rmtree(backup)
        else:
            os.rename(backup, silver_path)


def _make_batch_processor(
    silver_path: str, keys: list[str], run_log: list | None = None
):
    """Build the per-micro-batch merge closure for
    ``start_bronze_to_silver`` (module-level so tests can drive single
    batches directly, without a streaming query around them)."""
    from xboard_spark.ingest import merge_upsert

    def process(batch: DataFrame, batch_id: int) -> None:
        import os
        import shutil

        spark = batch.sparkSession
        _recover_silver_swap(silver_path)  # heal any interrupted swap first
        # persist + one count(): the single job materializes the whole
        # micro-batch into the cache — every state-store partition of the
        # upstream stateful dedup loads and commits exactly once (an
        # isEmpty() probe here ran take(1)'s escalating 1/4/20/all ramp,
        # 3-4 scheduler rounds on an empty stateful batch) — and yields
        # the run-log row count for free (replacing the Observation that
        # previously rode the write). The staging write below then reads
        # from the cache instead of re-executing the batch plan.
        batch = batch.persist()
        try:
            n_rows = batch.count()
            # Empty micro-batches (the watermark-advance batch that
            # dropDuplicatesWithinWatermark emits after every data batch
            # under availableNow — half of every demo run's batches)
            # previously paid the FULL merge path: read the whole silver
            # table, merge nothing, rewrite every byte, swap (~1.4 s of
            # pure rewrite per empty batch at sf0.1). Because EVERY write
            # path below goes through merge_upsert's keyed window, silver
            # is key-unique by construction, so merging zero rows into it
            # is the identity and the skip leaves the table's values
            # untouched; the run log still gets its bookkeeping row (ST5).
            if n_rows == 0:
                if run_log is not None:
                    run_log.append(
                        {"batch_id": batch_id, "n_rows": 0, "status": "ok"}
                    )
                return
            if os.path.exists(silver_path):
                current = spark.read.parquet(silver_path)
            else:
                # First batch: merge against an empty current so
                # within-batch key duplicates collapse HERE, not
                # incidentally in the next batch's merge (the old
                # ``merged = batch`` fast path left them in silver and
                # relied on the trailing watermark-advance batch's full
                # merge to clean up — the rewrite the skip above removes).
                current = spark.createDataFrame([], batch.schema)
            merged = merge_upsert(
                current,
                batch.withColumn("_batch_priority", F.lit(batch_id + 1)),
                keys=keys,
            )
            out = merged.select(batch.columns)
            # stage-then-swap: write the merged table next to the live
            # one, then promote it via two atomic renames with a backup in
            # between — the crash-safe Delta-free transactional overwrite
            # (a bare rmtree-then-rename had a window where a driver death
            # lost the whole table; see _recover_silver_swap). All data
            # movement stays on executors (no collect); only the renames
            # are driver-side. At warehouse scale the swap is a metastore
            # partition-location flip instead.
            staging = silver_path.rstrip("/") + f"._staging_{batch_id}"
            backup = silver_path.rstrip("/") + "._backup"
            out.write.mode("overwrite").parquet(staging)
            if os.path.exists(silver_path):
                os.rename(silver_path, backup)  # atomic demote
            os.rename(staging, silver_path)  # atomic promote
            if os.path.exists(backup):
                shutil.rmtree(backup)
            if run_log is not None:
                run_log.append(
                    {
                        "batch_id": batch_id,
                        "n_rows": int(n_rows),
                        "status": "ok",
                    }
                )
        finally:
            batch.unpersist()

    return process


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
    process = _make_batch_processor(silver_path, keys, run_log)
    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def silver_merge_demo(events: DataFrame, workdir: str | None = None) -> DataFrame:
    """Registered batch-equivalence surface for the ST4 streaming path
    (VERDICT r8 #6): derive a deterministic webhook fixture from the
    ``events`` table, run it through the REAL chain — file source ->
    watermarked delivery-hash dedup -> bronze->silver parse ->
    ``start_bronze_to_silver`` foreachBatch merge — as TWO sequential
    ``availableNow`` runs sharing one checkpoint (the second run is a
    genuine checkpoint RESTART that must process only the new file), then
    return the per-tenant revenue panel of the final silver table.

    The fixture makes every streaming semantic load-bearing in the hash:

    * batch 1 = one webhook per purchase event, with the
      ``event_id % 7 == 0`` deliveries REDELIVERED (same delivery_hash) —
      on the first batch there is no existing silver to merge against, so
      an un-deduped duplicate lands twice and inflates ``n_orders``;
    * batch 2 (arriving at a constant event time after every batch-1
      row, new delivery hashes) = price updates (x2, computed in exact
      DECIMAL) for the ``event_id % 3 == 0`` orders — the idempotent
      keyed merge must make them WIN over batch 1, which the ``revenue``
      column proves.

    The DuckDB twin recomputes the expected silver directly from
    ``events`` (``oracles.py: streaming_silver_merge``). Money goes
    DECIMAL at the first possible moment and stays DECIMAL (payload
    string -> DECIMAL(18,2) -> exact x2 update -> exact decimal sum), so
    the cross-engine hash has neither a float-sum-order hazard nor a
    rounding-boundary one; the single double appears after the final
    round. Measured, not hypothetical: a x1.1 update computed on the
    DOUBLE before the decimal cast put updated prices on .005 half-cent
    boundaries where Spark's HALF_UP (decimal-string) and DuckDB's
    binary-double rounding disagree — at sf0.1 a handful of rows split
    the engines by one cent (events.value itself is 2-decimal clean, so
    ``round(value, 2)`` is boundary-free; only derived prices were at
    risk).

    Driver footprint: the returned panel is <= n_tenants rows,
    collected once so the temp fixture/silver/checkpoint dirs can be
    deleted before returning (the sanctioned k-row collect pattern).
    A caller-provided ``workdir`` is caller-owned: the fixture, silver
    table, and checkpoint are left in place for inspection and the
    caller handles cleanup; only a self-created temp dir is removed.
    At 100 TB this demo IS the production shape: the file source becomes
    Kafka, the two runs become a continuous trigger, and the panel is any
    downstream aggregate of the silver table."""
    import glob
    import os
    import shutil
    import tempfile

    spark = events.sparkSession
    owns_workdir = workdir is None
    if owns_workdir:
        workdir = tempfile.mkdtemp(prefix="xboard_silver_demo_")
    indir = os.path.join(workdir, "in")
    silver = os.path.join(workdir, "silver")
    ckpt = os.path.join(workdir, "ckpt")
    os.makedirs(indir, exist_ok=True)

    base = events.filter(
        (F.col("event_type") == "purchase")
        & F.col("value").isNotNull()
        # identified rows only: event_id is the demo's order/delivery
        # key and user_id derives the tenant — a NULL in either has no
        # webhook analog (round-10 null-key sweep)
        & F.col("event_id").isNotNull()
        & F.col("user_id").isNotNull()
    ).select(
        "event_id",
        (F.col("user_id") % 5 + 1).alias("tenant_id"),
        "value",
        "ts",
    )

    def _lines(df: DataFrame, price_mult: int, tag: str, ts_col) -> DataFrame:
        # decimal FIRST, multiply SECOND: the update factor must apply to
        # the exact DECIMAL, never to the double (see docstring)
        price = F.expr(
            "CAST(CAST(CAST(round(value, 2) AS DECIMAL(18,2))"
            f" * {price_mult} AS DECIMAL(18,2)) AS STRING)"
        )
        payload = F.to_json(
            F.struct(
                F.col("event_id").alias("id"),
                price.alias("total_price"),
                F.lit("USD").alias("currency"),
                F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("created_at"),
            )
        )
        return df.select(
            F.to_json(
                F.struct(
                    F.col("tenant_id"),
                    F.lit("orders/create").alias("topic"),
                    F.lit("demo.myshopify.example").alias("shop_domain"),
                    F.date_format(ts_col, "yyyy-MM-dd HH:mm:ss").alias(
                        "received_at"
                    ),
                    F.concat(
                        F.lit(f"{tag}-"), F.col("event_id").cast("string")
                    ).alias("delivery_hash"),
                    payload.alias("raw_payload"),
                )
            ).alias("value")
        )

    def _write_file(lines: DataFrame, fname: str) -> None:
        stage = os.path.join(workdir, f"_stage_{fname}")
        lines.coalesce(1).write.mode("overwrite").text(stage)
        parts = glob.glob(os.path.join(stage, "part-*"))
        if not parts:
            raise ValueError(
                f"silver_merge_demo: fixture {fname!r} produced no part "
                "file — a modulo class of the source events is empty (the "
                "demo needs purchases in every class; use a larger events "
                "table)"
            )
        os.rename(parts[0], os.path.join(indir, fname))
        shutil.rmtree(stage)

    b1 = _lines(base, 1, "d1", F.col("ts"))
    redelivered = _lines(
        base.filter(F.col("event_id") % 7 == 0), 1, "d1", F.col("ts")
    )
    # batch 2 arrives at a CONSTANT event time later than EVERY batch-1
    # row — derived from the source's max(ts), not a fixed literal (a
    # literal is a data-dependent bomb: source data past it would put
    # run 1's watermark beyond batch 2 and dropDuplicatesWithinWatermark
    # DROPS late rows — measured: with per-row ts+1day received_at only
    # 2 of 79 updates survived at sf0.001). The 1-row max(ts) collect is
    # the sanctioned driver-footprint pattern.
    max_ts = base.agg(F.max("ts")).first()[0]
    if max_ts is None:
        raise ValueError("silver_merge_demo: no usable purchase events")
    import datetime as _dt

    b2_arrival = (max_ts + _dt.timedelta(days=1)).strftime(
        "%Y-%m-%d %H:%M:%S"
    )
    b2 = _lines(
        base.filter(F.col("event_id") % 3 == 0),
        2,
        "d2",
        F.to_timestamp(F.lit(b2_arrival)),
    )

    run_log: list = []
    try:
        _write_file(b1.unionByName(redelivered), "batch1.json")
        # right-size state/micro-batch partitions: streaming has no AQE,
        # so the delivery-hash dedup state and every in-batch merge
        # shuffle inherit the full session width — 32 near-empty
        # state-store partitions per batch are fixed cost, not work
        # (measured on the tumbling demo; see streaming/conf.py)
        with stream_shuffle_partitions(spark):
            for fname, lines in [(None, None), ("batch2.json", b2)]:
                if fname is not None:
                    _write_file(lines, fname)
                stream = parse_order_events(
                    deduped_stream(read_webhook_stream(spark, indir))
                )
                q = start_bronze_to_silver(
                    stream,
                    silver,
                    ckpt,
                    keys=["tenant_id", "shopify_order_id"],
                    run_log=run_log,
                )
                q.awaitTermination()
        # each availableNow run yields its data batch plus an empty
        # watermark-advance batch from dropDuplicatesWithinWatermark;
        # exactly TWO batches may carry rows (fail loudly, never hash a
        # wrong panel)
        data_batches = [b for b in run_log if b["n_rows"] > 0]
        if len(data_batches) != 2:
            raise RuntimeError(
                f"expected 2 data micro-batches, got {run_log}"
            )
        panel = (
            spark.read.parquet(silver)
            .groupBy("tenant_id")
            .agg(
                F.count("*").alias("n_orders"),
                F.round(F.sum("total_price"), 2)
                .cast("double")
                .alias("revenue"),
            )
            .orderBy("tenant_id")
        )
        rows = panel.collect()  # <= n_tenants rows; detaches from temp files
        schema = panel.schema
    finally:
        # only destroy what we created: a caller-provided workdir is
        # caller-owned (they keep the fixture/silver/checkpoint for
        # inspection and handle cleanup)
        if owns_workdir:
            shutil.rmtree(workdir, ignore_errors=True)
    return spark.createDataFrame(rows, schema)
