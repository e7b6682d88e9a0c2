"""Batch ETL: Shopify-shaped JSON -> typed silver tables, and the
merge-by-window upsert that replaces the reference's per-row
``INSERT ... ON CONFLICT DO UPDATE`` loops (S7/S8,
``services/dataIngestion.js:31-44`` and ``:50-64``).

The reference does one synchronous SQL round-trip per row (N+1); here a
whole batch merges in ONE shuffle: union(old, new) -> row_number over the
merge key ordered by batch priority -> keep rank 1. Idempotent (re-merging
the same batch is a no-op) and scales as a single hash partitioning on the
merge key — the Delta-free MERGE (SURVEY.md §7 hard part 1).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Shopify Admin REST payload shapes, per the fields the reference consumes
# (customers: dataIngestion.js:38-42; orders: :56-62; products table
# migrations/init.sql:66-78).
CUSTOMER_PAYLOAD = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("email", T.StringType()),
        T.StructField("first_name", T.StringType()),
        T.StructField("last_name", T.StringType()),
        T.StructField("created_at", T.StringType()),
    ]
)
ORDER_PAYLOAD = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("total_price", T.StringType()),  # Shopify money-as-string
        T.StructField("currency", T.StringType()),
        T.StructField("created_at", T.StringType()),
        T.StructField(
            "customer", T.StructType([T.StructField("id", T.LongType())])
        ),
    ]
)
PRODUCT_PAYLOAD = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("title", T.StringType()),
        T.StructField("body_html", T.StringType()),
        T.StructField("vendor", T.StringType()),
        T.StructField("product_type", T.StringType()),
        T.StructField("handle", T.StringType()),
    ]
)


def normalize_customers(raw: DataFrame, tenant_id: int) -> DataFrame:
    """Typed projection of Shopify customers (F5 name build, F8 raw keep).

    ``concat_ws`` skips nulls where the reference's JS template literal
    stringifies missing names as "undefined" (``dataIngestion.js:41``) —
    corrected semantics, divergence documented in SURVEY.md §2.6 F5.
    """
    return raw.select(
        F.lit(tenant_id).cast("long").alias("tenant_id"),
        F.col("id").alias("shopify_customer_id"),
        F.col("email"),
        F.trim(F.concat_ws(" ", F.col("first_name"), F.col("last_name"))).alias(
            "name"
        ),
        F.to_json(F.struct("*")).alias("raw"),
        F.to_timestamp("created_at").alias("created_at"),
    )


def normalize_orders(raw: DataFrame, tenant_id: int) -> DataFrame:
    """Typed projection of Shopify orders (F6 parseFloat -> decimal cast,
    F7 timestamp parse, F8 raw keep; ``dataIngestion.js:56-62``)."""
    return raw.select(
        F.lit(tenant_id).cast("long").alias("tenant_id"),
        F.col("id").alias("shopify_order_id"),
        F.col("total_price").cast(T.DecimalType(18, 2)).alias("total_price"),
        F.col("currency"),
        F.to_timestamp("created_at").alias("created_at"),
        F.col("customer.id").alias("customer_shopify_id"),
        F.to_json(F.struct("*")).alias("raw"),
        F.current_timestamp().alias("created_recorded_at"),
    )


def normalize_products(raw: DataFrame, tenant_id: int) -> DataFrame:
    """Typed projection of Shopify products — implemented for real where the
    reference stubs it (S11, ``dataIngestion.js:67-72``)."""
    return raw.select(
        F.lit(tenant_id).cast("long").alias("tenant_id"),
        F.col("id").alias("shopify_product_id"),
        "title",
        "body_html",
        "vendor",
        "product_type",
        "handle",
        F.to_json(F.struct("*")).alias("raw"),
    )


def merge_upsert(
    current: DataFrame,
    updates: DataFrame,
    keys: list[str],
    order_col: str = "_batch_priority",
) -> DataFrame:
    """Merge-by-window upsert: updates win over current on key conflict;
    non-conflicting rows of both sides survive.

    ON CONFLICT (keys) DO UPDATE semantics (``init.sql:43,59`` UNIQUE
    constraints) in one distributed pass: a union (no shuffle) + one
    hash-partition on the merge key. If ``updates`` itself contains
    duplicate keys, the highest ``order_col`` wins (the reference's loop
    would apply them in order — last write wins; callers pass a batch
    sequence number to reproduce that).
    """
    cur = current
    upd = updates
    if order_col not in current.columns:
        cur = cur.withColumn(order_col, F.lit(0).cast("long"))
    if order_col not in updates.columns:
        upd = upd.withColumn(order_col, F.lit(1).cast("long"))
    unioned = cur.select(upd.columns).unionByName(upd)
    w = Window.partitionBy(*keys).orderBy(F.desc(order_col))
    return (
        unioned.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", order_col)
    )


def ingest_entity_json(
    spark: SparkSession, path: str, schema: T.StructType, envelope_field: str
) -> DataFrame:
    """Read a captured Shopify REST payload file ({customers: [...]} etc.,
    S2-S4 ``services/shopifyApi.js:35-45``) into one row per entity.

    ``multiLine`` because each capture file is ONE JSON document (the
    response body written verbatim) — the default JSON-Lines mode only
    worked while APIs happened to serve single-line bodies; a
    pretty-printed response would parse to a NULL envelope and explode to
    ZERO rows with no error (the silent truncation this module exists to
    prevent)."""
    env = T.StructType([T.StructField(envelope_field, T.ArrayType(schema))])
    raw = spark.read.schema(env).option("multiLine", "true").json(path)
    return raw.select(F.explode(F.col(envelope_field)).alias("e")).select("e.*")


def ingest_entity_pages(
    spark: SparkSession, dir_path: str, schema: T.StructType, envelope_field: str
) -> DataFrame:
    """Multi-page capture ingestion: ``{dir}/page-<N>.json`` files -> ONE
    DataFrame, one row per entity, later pages winning on id conflict.

    This is the engine-side fix for the reference's pagination defect
    (SURVEY.md §2.10.3, ``services/shopifyApi.js:35-45``): its REST fetch
    reads a single ``limit=250`` page and silently truncates every tenant
    with more rows. Here the capture step (driver-side, out of engine
    scope) may write as many pages as the API serves; the engine reads the
    whole directory in one distributed scan — page files are just input
    splits, so 10 pages or 10 million cost the same plan.

    Overlap semantics: cursor pagination re-serves boundary rows, and a
    row updated mid-sweep can appear on two pages in different versions —
    so pages carry authority order. The page number is extracted from the
    FILE PATH (``_metadata.file_path``, no driver-side listing) and the
    highest page wins per entity id (``merge_upsert``'s window, keyed and
    partitioned on id — one shuffle, no global ordering anywhere). Within
    one page the envelope-array POSITION is the secondary authority key
    (posexplode): if an API serves the same id twice in one page the
    later-listed version wins deterministically, instead of tying on
    ``desc(_page)`` and letting the shuffle pick."""
    env = T.StructType([T.StructField(envelope_field, T.ArrayType(schema))])
    raw = (
        spark.read.schema(env)
        .option("multiLine", "true")  # one JSON document per page file —
        # see ingest_entity_json: JSON-Lines mode silently zeroes
        # pretty-printed bodies
        .json(os.path.join(dir_path, "page-*.json"))
    )
    rows = raw.select(
        F.regexp_extract(F.col("_metadata.file_path"), r"page-(\d+)\.json", 1)
        .cast("long")
        .alias("_page"),
        F.posexplode(F.col(envelope_field)).alias("_pos", "e"),
    ).select("_page", "_pos", "e.*")
    # rows with a NULL id (field missing or failed the schema cast) have
    # no merge identity: pass them through UN-deduped — the same behavior
    # as the single-file path — instead of letting partitionBy(id) group
    # every NULL across all pages into one partition and keep exactly one
    # (N malformed entities silently becoming 1 row)
    keyed = rows.filter(F.col("id").isNotNull())
    unkeyed = rows.filter(F.col("id").isNull()).drop("_page", "_pos")
    w = Window.partitionBy("id").orderBy(F.desc("_page"), F.desc("_pos"))
    deduped = (
        keyed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_page", "_pos")
    )
    return deduped.unionByName(unkeyed)


def capture_merge_demo(
    customer: DataFrame, workdir: str | None = None
) -> DataFrame:
    """Registered driver-hashed face for the multi-page REST-capture
    ingest (S5, ``services/shopifyApi.js:17-45`` + the §2.10.3
    pagination correction) — the ``silver_merge_demo`` pattern applied
    to the capture scan: derive a deterministic two-page capture fixture
    from the ``customer`` table, run it through the REAL
    ``ingest_entity_pages`` path (multiLine page envelopes,
    ``_metadata.file_path`` page authority, posexplode in-page
    authority, merge-by-window), and return an exact-integer audit
    panel. Before round 11 this surface was pytest-only — the one §2.1
    row with no oracle row.

    The fixture makes every overlap semantic load-bearing in the hash:

    * page 0 = customers with ``c_custkey % 3 != 2``, version tag v1;
    * page 1 = customers with ``c_custkey % 2 == 0``, tag v2 — cursor
      re-serve overlap: every even id on page 0 must lose to page 1
      (later-page authority), or v1 counts inflate;
    * page 1 additionally RE-LISTS the ``c_custkey % 10 == 0`` ids at
      LATER array positions with tag v3 — the in-page duplicate: the
      posexplode secondary authority must pick the later listing, or
      those ids count under v2.

    The version tag rides the ``first_name`` field, so the merged frame
    itself proves which listing won. The DuckDB twin
    (``oracles.capture_merge_audit_sql``) re-derives the winner per id
    from the modulo splits alone. Surface: tag + exact-long counts/id
    sums — hash-stable by construction.

    Scale shape: the capture read is one distributed multiLine JSON scan
    (page files are input splits), the merge is ``merge_upsert``'s
    single hash partitioning on id; the fixture build is two 1-row
    collect_list aggregates (bounded by fixture size — this demo's
    corpus is the dimension table, the production shape reads pages
    straight from the capture dir)."""
    import os
    import shutil
    import tempfile

    spark = customer.sparkSession
    owns_workdir = workdir is None
    if owns_workdir:
        workdir = tempfile.mkdtemp(prefix="xboard_capture_demo_")
    indir = os.path.join(workdir, "pages")
    os.makedirs(indir, exist_ok=True)

    def _entity(tag: str) -> F.Column:
        return F.struct(
            F.col("c_custkey").alias("id"),
            F.concat(
                F.lit("c"), F.col("c_custkey").cast("string"),
                F.lit("@example.test"),
            ).alias("email"),
            F.lit(tag).alias("first_name"),
            F.col("c_name").alias("last_name"),
            F.lit("2026-01-01T00:00:00Z").alias("created_at"),
        )

    ck = F.col("c_custkey")
    # sort_array orders the collected structs by leading field (id), so
    # the envelope arrays are deterministic — collect_list alone is not
    page0 = customer.filter(ck % 3 != 2).agg(
        F.sort_array(F.collect_list(_entity("v1"))).alias("customers")
    )
    page1 = customer.filter(ck % 2 == 0).agg(
        F.concat(
            F.sort_array(F.collect_list(_entity("v2"))),
            F.sort_array(
                F.collect_list(
                    F.when(ck % 10 == 0, _entity("v3"))
                )
            ),
        ).alias("customers")
    )

    def _write_page(df: DataFrame, fname: str) -> None:
        # The page body is rendered by Spark (to_json keeps the envelope
        # byte-identical to the engine's own JSON dialect) but WRITTEN
        # driver-side: the fixture is one bounded row per page, and a
        # coalesce(1).write + rename of the part file would only work
        # where executors share the driver filesystem (ADVICE r11) —
        # this registered query must not assume local execution.
        rows = df.select(
            F.to_json(F.struct(F.col("customers"))).alias("value")
        ).collect()  # exactly one envelope row per page by construction
        if len(rows) != 1 or rows[0]["value"] is None:
            raise ValueError(
                f"capture_merge_demo: page {fname!r} produced no envelope"
            )
        with open(os.path.join(indir, fname), "w", encoding="utf-8") as f:
            f.write(rows[0]["value"])

    try:
        _write_page(page0, "page-0.json")
        _write_page(page1, "page-1.json")
        merged = ingest_entity_pages(
            spark, indir, CUSTOMER_PAYLOAD, "customers"
        )
        panel = (
            merged.groupBy(F.col("first_name").alias("version_tag"))
            .agg(
                F.count("*").alias("n_customers"),
                F.count_distinct("id").alias("n_ids"),
                F.sum("id").cast("long").alias("id_sum"),
            )
            .orderBy("version_tag")
        )
        rows = panel.collect()  # materialize before deleting the fixture
    finally:
        if owns_workdir:
            shutil.rmtree(workdir, ignore_errors=True)
    return spark.createDataFrame(rows, panel.schema)


def ingest_tenant_data(
    spark: SparkSession,
    tenant_id: int,
    customers_path: str | None = None,
    orders_path: str | None = None,
    products_path: str | None = None,
) -> dict[str, DataFrame]:
    """S12 orchestrator (``dataIngestion.js:8-26``): per-tenant
    customers -> orders -> products normalization. Returns the typed frames;
    callers merge them into their silver tables with ``merge_upsert``."""
    out: dict[str, DataFrame] = {}
    if customers_path:
        raw = ingest_entity_json(spark, customers_path, CUSTOMER_PAYLOAD, "customers")
        out["customers"] = normalize_customers(raw, tenant_id)
    if orders_path:
        raw = ingest_entity_json(spark, orders_path, ORDER_PAYLOAD, "orders")
        out["orders"] = normalize_orders(raw, tenant_id)
    if products_path:
        raw = ingest_entity_json(spark, products_path, PRODUCT_PAYLOAD, "products")
        out["products"] = normalize_products(raw, tenant_id)
    return out


def ingest_tenant_capture(
    spark: SparkSession, tenant_id: int, capture_dirs: dict[str, str]
) -> dict[str, DataFrame]:
    """S12 over a PAGINATED capture (``sources.rest.capture_tenant``
    output): entity -> page-directory, each read by
    ``ingest_entity_pages`` (distributed scan + overlap resolution) and
    normalized into the typed silver frame."""
    norm = {
        "customers": (CUSTOMER_PAYLOAD, normalize_customers),
        "orders": (ORDER_PAYLOAD, normalize_orders),
        "products": (PRODUCT_PAYLOAD, normalize_products),
    }
    out: dict[str, DataFrame] = {}
    for entity, d in capture_dirs.items():
        schema, normalize = norm[entity]
        out[entity] = normalize(
            ingest_entity_pages(spark, d, schema, entity), tenant_id
        )
    return out


def orders_upsert_demo(orders: DataFrame) -> DataFrame:
    """Oracle-checkable demonstration of merge semantics on the testdata
    ``orders`` table: a synthetic update batch (every 100th order gets a 10%
    price bump and status 'U') merged over the base, then summarized per
    status so the result is small and stable."""
    updates = orders.filter(F.col("o_orderkey") % 100 == 0).withColumn(
        "o_totalprice", F.round(F.col("o_totalprice") * 1.1, 2)
    ).withColumn("o_orderstatus", F.lit("U"))
    merged = merge_upsert(orders, updates, keys=["o_orderkey"])
    from xboard_spark.functions.exact import cent_sum_dollars

    return (
        merged.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            cent_sum_dollars(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


def scd2_history(orders: DataFrame, max_custkey: int = 20) -> DataFrame:
    """Slowly-changing-dimension TYPE-2 build: turn a change stream (here:
    each customer's orders, ordered by event time) into versioned history
    rows with ``valid_from`` / ``valid_to`` / ``is_current`` — the history
    the reference's ON CONFLICT upsert (dataIngestion.js:32-43) throws
    away. A warehouse that must answer "what did this record look like on
    date D" keeps SCD2 instead of last-write-wins; this is the standard
    window-function formulation (valid_to = lead(valid_from) over the key).

    Scale shape: one shuffle, keyed on the entity key (o_custkey) for the
    per-key ordered window; no join, no global sort (the final orderBy
    exists only for the bounded demo output). The ``max_custkey`` filter
    keeps the oracle-compared output small AND demonstrates pushdown — the
    predicate reaches the parquet scan, so building history for one
    entity never scans the corpus. Tie-break on o_orderkey makes
    same-timestamp updates deterministic (same discipline as
    ``ingest_entity_pages``' page/position key)."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    hist = (
        orders.filter(F.col("o_custkey") < max_custkey)
        .withColumn("version", F.row_number().over(w))
        .withColumn("valid_from", F.col("o_orderdate"))
        .withColumn("valid_to", F.lead("o_orderdate").over(w))
    )
    return hist.select(
        "o_custkey",
        F.col("version").cast("long").alias("version"),
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        "valid_from",
        "valid_to",
        F.col("valid_to").isNull().alias("is_current"),
    ).orderBy("o_custkey", "version")


TENANT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("shop_domain", T.StringType()),
        T.StructField("encrypted_admin_token", T.StringType()),
        T.StructField("scopes", T.StringType()),
        T.StructField("installed_at", T.TimestampType()),
        T.StructField("status", T.StringType()),
        T.StructField("webhook_registration", T.StringType()),  # JSON
        T.StructField("last_backfill_at", T.TimestampType()),
    ]
)
USER_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("email", T.StringType()),
        T.StructField("password_hash", T.StringType()),
        T.StructField("tenant_id", T.LongType()),
        T.StructField("created_at", T.TimestampType()),
    ]
)


def assign_ids(existing: DataFrame, new_rows: DataFrame, id_col: str = "id") -> DataFrame:
    """S9/S10 insert-returning analog: assign surrogate ids to ``new_rows``
    as max(existing id) + row_number (``RETURNING id``,
    ``routes/auth.js:26-39``). Spark has no auto-increment; this is the
    documented non-transactional equivalent (SURVEY.md §7) — safe for a
    single writer per table, which is exactly the reference's model (one
    Node process). row_number over an explicit total order keeps ids
    deterministic; monotonically_increasing_id would not be."""
    base = existing.agg(F.coalesce(F.max(id_col), F.lit(0)).alias("m"))
    order_cols = [c for c in new_rows.columns if c != id_col]
    w = Window.orderBy(*order_cols)
    numbered = new_rows.withColumn("_rn", F.row_number().over(w))
    return (
        numbered.crossJoin(F.broadcast(base))
        .withColumn(id_col, (F.col("m") + F.col("_rn")).cast("long"))
        .drop("_rn", "m")
        .select(new_rows.columns)
    )


def register_tenant(
    spark: SparkSession,
    tenants: DataFrame,
    users: DataFrame,
    shop_domain: str,
    access_token: str,
    email: str,
    password_hash: str,
    scopes: str = "read_customers,read_orders,read_products",
) -> tuple[DataFrame, DataFrame, int]:
    """The register flow (``routes/auth.js:13-53``) minus the HTTP/JWT/bcrypt
    shell (the HTTP layer; the JWT/password primitives live in
    ``xboard_spark.auth`` — SURVEY.md §2.6 F10/F11, and ``auth.register``
    wraps this function with them): duplicate-email
    check, tenant insert-returning, user insert — returns the new frames and
    the assigned tenant id. Ingestion kickoff (the reference fires it
    unawaited, ``auth.js:44-46``) is the caller's separate Spark action."""
    if users.filter(F.col("email") == email).limit(1).count() > 0:
        raise ValueError(f"user already exists: {email}")
    new_tenant = spark.createDataFrame(
        [(None, shop_domain, access_token, scopes, None, "active", None, None)],
        TENANT_SCHEMA,
    ).withColumn("installed_at", F.current_timestamp())
    new_tenant = assign_ids(tenants, new_tenant)
    tenant_id = new_tenant.first().id
    new_user = spark.createDataFrame(
        [(None, email, password_hash, tenant_id, None)], USER_SCHEMA
    ).withColumn("created_at", F.current_timestamp())
    new_user = assign_ids(users, new_user)
    return (
        tenants.unionByName(new_tenant),
        users.unionByName(new_user),
        tenant_id,
    )


INGESTION_RUN_SCHEMA = T.StructType(
    [
        T.StructField("tenant_id", T.LongType()),
        T.StructField("started_at", T.TimestampType()),
        T.StructField("finished_at", T.TimestampType()),
        T.StructField("status", T.StringType()),
        T.StructField("details", T.StringType()),  # JSON, like init.sql:131
    ]
)


def tenants_needing_backfill(
    tenants: DataFrame, older_than_hours: int = 24
) -> DataFrame:
    """ST5 scheduling predicate: active tenants whose ``last_backfill_at``
    is NULL (never backfilled) or older than the interval
    (``tenants.last_backfill_at``, init.sql:12)."""
    cutoff = F.current_timestamp() - F.make_interval(hours=F.lit(older_than_hours))
    return tenants.filter(
        (F.col("status") == "active")
        & (F.col("last_backfill_at").isNull() | (F.col("last_backfill_at") < cutoff))
    )


def run_backfill(
    spark: SparkSession,
    tenants: DataFrame,
    ingest_fn,
    ingestion_runs: DataFrame | None = None,
    older_than_hours: int = 24,
) -> tuple[DataFrame, DataFrame]:
    """Backfill orchestrator: for each due tenant run ``ingest_fn(tenant_row)``
    (the S12 pipeline), stamp ``last_backfill_at``, and append an
    ``ingestion_runs`` row per tenant (started/finished/status/details —
    init.sql:126-133). Returns (updated tenants, updated ingestion_runs).

    The reference fires one ETL per tenant sequentially on one node
    (``dataIngestion.js:12-19``); here each tenant's ingest is a Spark job —
    at scale the per-tenant jobs are submitted concurrently (scheduler
    pools), and this driver loop only moves metadata.
    """
    import datetime as dt
    import json as _json

    due = tenants_needing_backfill(tenants, older_than_hours).collect()
    runs = []
    done_ids = []
    for row in due:
        started = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
        try:
            details = ingest_fn(row) or {}
            status = "success"
        except Exception as e:  # noqa: BLE001 - run log captures the failure
            details = {"error": str(e)[:500]}
            status = "failed"
        finished = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
        # default=str: ingest_fn naturally returns non-JSON values (the
        # S12 pipeline returns dict[str, DataFrame]) — a serialization
        # TypeError here would escape the try above and abort the whole
        # orchestrator AFTER a successful ingest, losing every
        # accumulated run record
        runs.append(
            (row.id, started, finished, status, _json.dumps(details, default=str))
        )
        if status == "success":
            done_ids.append(row.id)

    new_runs = spark.createDataFrame(runs or [], INGESTION_RUN_SCHEMA)
    all_runs = (
        new_runs
        if ingestion_runs is None
        else ingestion_runs.unionByName(new_runs)
    )
    updated_tenants = tenants.withColumn(
        "last_backfill_at",
        F.when(
            F.col("id").isin(done_ids) if done_ids else F.lit(False),
            F.current_timestamp(),
        ).otherwise(F.col("last_backfill_at")),
    )
    return updated_tenants, all_runs
