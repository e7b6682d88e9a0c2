"""Deterministic sampling / dataset-splitting operators over ``documents``
— the remaining training-data-pipeline primitives: hash-based train/test
splitting, per-stratum (per-language) sampling, and length histograms.

All assignment is HASH-based, never RNG-based, which is the only split
design that survives distribution: the decision is a pure function of the
row, so it is (a) reproducible across runs/engines/partitionings, (b)
stable under re-ingestion (a re-ingested doc lands in the same split —
no train/test leakage as the corpus grows), and (c) shuffle-free — the
split column costs one md5 per row computed where the row lives. The
salt prefix decorrelates the split hash from every other fingerprint use
(dedup, sampling) so membership in one never biases the other.

Reference parity: the XBoard reference has no sampling surface (SURVEY.md
§2.9 explicit absences) — these are engine extensions per the north star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from xboard_spark.functions.portable_hash import fingerprint64
from xboard_spark.operators.text import token_count_col


def with_split(
    documents: DataFrame, test_pct: int = 10, salt: str = "split-v1"
) -> DataFrame:
    """Adds a deterministic ``split`` column: 'test' iff
    fingerprint(salt || doc_id) mod 100 < test_pct."""
    fp = fingerprint64(F.concat_ws(":", F.lit(salt), F.col("doc_id")))
    return documents.withColumn(
        "split",
        F.when(fp % 100 < test_pct, F.lit("test")).otherwise(F.lit("train")),
    )


def train_test_split_stats(
    documents: DataFrame, test_pct: int = 10
) -> DataFrame:
    """Per (split, lang) corpus panel — the balance check run after any
    split: doc counts, token totals/means. One scan, one partial+final
    hash aggregate; no shuffle beyond the (split, lang) agg."""
    toks = token_count_col(F.col("text"))
    return (
        with_split(documents, test_pct)
        .withColumn("n_tokens", toks)
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.avg("n_tokens"), 6).alias("avg_tokens"),
        )
        .orderBy("split", "lang")
    )


def stratified_sample(
    documents: DataFrame, k: int = 5, salt: str = "sample-v1"
) -> DataFrame:
    """Deterministic k-per-stratum sample: rank docs within each ``lang``
    by a salted fingerprint and keep the bottom-k — distributed bottom-k
    sampling (the hash plays the role of the reservoir's random tag, cf.
    Vitter 1985, but reproducibly). At scale the ranking window is a
    per-stratum top-k that AQE/TakeOrdered keeps bounded; the full sort
    never materializes."""
    fp = fingerprint64(F.concat_ws(":", F.lit(salt), F.col("doc_id")))
    w = Window.partitionBy("lang").orderBy(F.asc("tag"), F.asc("doc_id"))
    return (
        documents.select("doc_id", "lang", fp.alias("tag"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("lang", F.col("rank").cast("long").alias("rank"), "doc_id", "tag")
        .orderBy("lang", "rank")
    )


def length_histogram(documents: DataFrame, bucket_width: int = 50) -> DataFrame:
    """Token-length histogram: fixed-width buckets over the token count,
    with per-bucket doc counts and char means — the standard corpus
    length-profile pass before choosing truncation/packing lengths.
    Bucketing is a pure projection; the agg keys are ~hundreds of buckets,
    so the shuffle is trivially small at any corpus size."""
    toks = token_count_col(F.col("text"))
    bucket = (F.floor(toks / bucket_width) * bucket_width).cast("long")
    return (
        documents.select(
            bucket.alias("bucket_lo"), F.col("n_chars").cast("double").alias("n_chars")
        )
        .groupBy("bucket_lo")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        )
        .orderBy("bucket_lo")
    )


def sequence_packing(
    documents: DataFrame,
    budget: int = 2048,
    n_shards: int = 32,
    salt: str = "pack-v1",
) -> DataFrame:
    """Sequence packing — concatenate documents in order and cut at a token
    ``budget`` (the streaming-concatenation packing used to build LLM
    pre-training batches). A single global running sum is inherently
    sequential, so packing is SHARDED: docs hash into ``n_shards``
    independent streams, and the running sum / pack assignment is a window
    per shard — n_shards-way parallel, each shard's state is one counter.
    At 1000 executors you set n_shards ~ O(cores) and the window sort is
    per-shard, never global (the plan has no single-partition window).

    A doc whose tokens straddle a boundary belongs to the pack where it
    STARTS (cum_before div budget) — packs can overflow by at most one
    doc, the standard greedy-concat semantics.

    Returns per (shard, pack_id): doc/token counts and fill ratio."""
    toks = token_count_col(F.col("text"))
    fp = fingerprint64(F.concat_ws(":", F.lit(salt), F.col("doc_id")))
    staged = documents.select(
        "doc_id", toks.alias("n_tokens"), (fp % n_shards).alias("shard")
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = staged.withColumn(
        "pack_id",
        F.floor(F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / budget),
    )
    return (
        packed.groupBy("shard", "pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("pack_tokens"),
        )
        .select(
            "shard",
            "pack_id",
            "n_docs",
            "pack_tokens",
            F.round(F.col("pack_tokens") / budget, 6).alias("fill_ratio"),
        )
        .orderBy("shard", "pack_id")
    )


DEFAULT_MIX = {"en": 0.2, "de": 0.2, "fr": 0.2, "es": 0.2, "zh": 0.2}


def mixture_rebalance(
    documents: DataFrame,
    targets: dict[str, float] | None = None,
    salt: str = "mix-v1",
) -> DataFrame:
    """Domain/language mixture rebalancing (downsample-only): compute the
    per-lang keep rate that moves the corpus to the ``targets`` mixture
    without upsampling — the most-underrepresented lang (relative to its
    target) keeps 100% and every other lang is hash-downsampled so the
    kept corpus matches the target proportions in expectation. This is the
    deterministic core of data-mixing pipelines (cf. DoReMi/Pile-style
    domain weights), reproducible because membership is a pure hash
    function (same anti-leakage argument as ``with_split``).

    Entirely plan-side: the share/rate table is a 5-row aggregate with all
    derived quantities (corpus total, limiting scale, kept total) computed
    as UNPARTITIONED WINDOW aggregates over that k-row frame — single-task
    windows over k rows, deliberately: the former agg + crossJoin form
    referenced the counts/shares/kept subtrees 2-3x each and the optimizer
    re-derived the corpus scan for every reference (6 document scans, 54
    Exchange nodes planned; round-13 optimization, guide §2.4 "duplicated
    subtrees"). Every windowed reduction here is an integer SUM or a MIN —
    order-independent, so the emitted doubles are bit-identical to the
    agg form's. The keep decision stays a per-row expression — no driver
    collect; two corpus scans (count pass, keep pass) at any corpus size.

    Returns per lang: corpus count, share, rate, kept count, kept share."""
    targets = targets or DEFAULT_MIX
    target_expr = None
    for lg, t in sorted(targets.items()):
        cond = F.when(F.col("lang") == lg, F.lit(float(t)))
        target_expr = cond if target_expr is None else target_expr.when(
            F.col("lang") == lg, F.lit(float(t))
        )
    target_expr = target_expr.otherwise(F.lit(0.0))

    w_all = Window.partitionBy()
    counts = documents.groupBy("lang").agg(F.count("*").alias("n"))
    shares = (
        counts.withColumn("share", F.col("n") / F.sum("n").over(w_all))
        .withColumn("target", target_expr)
    )
    # zero-target groups (a lang OUTSIDE the target mixture, or a NULL
    # lang group) must not reach the share/target division: under ANSI
    # mode it is a hard DIVIDE_BY_ZERO, so one unexpected language value
    # in the corpus killed the whole rebalance (found by the round-10
    # NULL-heavy sweep). They take rate 0.0 — excluded from the kept
    # corpus (downsample-only semantics), visible in the report. The MIN
    # window skips them via the NULL the unmatched WHEN yields.
    scale = F.min(
        F.when(F.col("target") > 0, F.col("share") / F.col("target"))
    ).over(w_all)
    rates = (
        shares.withColumn(
            "rate",
            F.when(
                F.col("target") > 0,
                F.least(
                    F.lit(1.0),
                    F.col("target") * scale / F.col("share"),
                ),
            ).otherwise(F.lit(0.0)),
        )
        .select("lang", "n", "share", "rate")
    )
    fp = fingerprint64(F.concat_ws(":", F.lit(salt), F.col("doc_id")))
    u = (fp % 1000000) / 1000000.0
    kept = (
        documents.join(F.broadcast(rates), "lang")
        .withColumn("keep", (u < F.col("rate")).cast("int"))
        .groupBy("lang")
        .agg(
            F.max("n").alias("n_docs"),
            F.round(F.max("share"), 6).alias("share"),
            F.round(F.max("rate"), 6).alias("rate"),
            F.sum("keep").alias("n_kept"),
        )
    )
    return (
        kept.withColumn("tk", F.sum("n_kept").over(w_all))
        .select(
            "lang",
            "n_docs",
            "share",
            "rate",
            F.col("n_kept").cast("long").alias("n_kept"),
            F.round(F.col("n_kept") / F.col("tk"), 6).alias("kept_share"),
        )
        .orderBy("lang")
    )


def quality_weighted_sample(
    documents: DataFrame,
    full_weight_tokens: int = 200,
    salt: str = "qsample-v1",
) -> DataFrame:
    """Quality-proportional sampling: each document survives with
    probability min(1, n_tokens / ``full_weight_tokens``) — longer
    (higher-signal) documents always kept, short ones thinned
    proportionally (the quality/length-weighted sampling used when a
    mixture over-represents low-value shards). DETERMINISTIC: the coin is
    the salted content-id fingerprint mapped to [0, 1), so reruns,
    retries, and both engines select the identical sample — the same
    leakage-stable contract as ``with_split`` (never rand(): a retried
    task would flip rows). Returns the per-(lang, source) panel of kept
    vs total docs/tokens.

    Scale shape: one scan, per-row expressions, one bounded-key agg."""
    toks = token_count_col(F.col("text"))
    fp = fingerprint64(F.concat_ws(":", F.lit(salt), F.col("doc_id")))
    u = (fp % 1_000_000) / 1_000_000.0
    weight = F.least(F.lit(1.0), toks / F.lit(float(full_weight_tokens)))
    kept = (u < weight).cast("long")
    return (
        documents.select(
            "lang",
            "source",
            toks.cast("long").alias("n_tokens"),
            kept.alias("kept"),
        )
        .groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("kept").cast("long").alias("n_kept"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.sum(F.col("kept") * F.col("n_tokens"))
            .cast("long")
            .alias("kept_tokens"),
        )
        .orderBy("lang", "source")
    )


# quantized Poisson(1) inverse CDF: cumulative P(X<=k) for k=0..4, then 5.
# Exact decimal constants so BOTH engines branch on identical thresholds.
POISSON1_CDF = (0.367879, 0.735759, 0.919699, 0.981012, 0.996340)

# Seed for the per-replica affine coin family — decorrelated from the
# dedup/MinHash default family (seed 42) so bootstrap membership never
# correlates with any fingerprint-derived dedup or split decision.
BOOT_SEED = 77


def bootstrap_mean_ci(
    orders: DataFrame, n_replicas: int = 32, salt: str = "boot-v1"
) -> DataFrame:
    """POISSON BOOTSTRAP confidence interval for the mean order value —
    the resampling scheme that actually works on distributed data
    (Chamandy et al., "Estimating Uncertainty for Massive Data Streams":
    true resampling needs global row indexes; independent Poisson(1)
    weights per (row, replica) need only a row-local coin). DETERMINISTIC:
    the coin is a salted row fingerprint pushed through one
    pairwise-independent affine hash PER REPLICA (the MinHash
    ``(a*x + b) mod p`` family, replica-seeded), then a quantized
    Poisson(1) inverse CDF — reruns and both engines draw identical
    weights, same contract as ``with_split``.

    One md5 per ROW, not per (row, replica): the first form of this coin
    fingerprinted the concatenated (salt, row, replica) string, which put
    ``n_replicas`` md5 evaluations on every row — measured 9.4s at sf0.1
    with the md5 dominating the whole query. Hashing the row once and
    deriving the 32 replica uniforms with integer affine mixes (exactly
    the universal-hash family MinHash already trusts for independence)
    measured 0.9s — same aggregation plan, 32x fewer digests. Weights
    stay independent across rows (distinct fingerprints); across
    replicas the affine family guarantees pairwise-uncorrelated draws
    (not full joint independence — CI quantiles also touch higher-order
    cross-replica structure), adequate at these replica counts and
    pinned empirically by the cross-replica correlation test
    (``test_bootstrap_replica_weights_decorrelated``).

    Scale shape: one scan exploded x``n_replicas`` (column-local, no
    shuffle), a partial+final agg keyed on the replica id (bounded
    domain), then order statistics over the ``n_replicas``-row frame.
    The explode IS the measured-fastest form: rewriting as 2x32 aggregate
    expressions over one row (with or without pre-bound weight columns)
    measured 1.5-2x SLOWER at sf0.1 — 64 wide agg buffers fed by long
    when-chains fall out of whole-stage codegen, while the exploded form
    keeps narrow codegen rows and a 32-key hash agg.
    Returns (n_rows, n_replicas, point_mean, ci_lo, ci_hi) with the
    2.5%/97.5% replica-mean order statistics as the interval."""
    from xboard_spark.functions.portable_hash import (
        MINHASH_P,
        _X_MASK,
        minhash_params,
    )

    params = minhash_params(n_replicas, seed=BOOT_SEED)
    reps_arr = F.array(
        *[
            F.struct(
                F.lit(i).alias("b"),
                F.lit(a).alias("ha"),
                F.lit(hb).alias("hb"),
            )
            for i, (a, hb) in enumerate(params)
        ]
    )
    fp0 = fingerprint64(F.concat_ws(":", F.lit(salt), F.col("o_orderkey")))
    staged = (
        orders.select("o_orderkey", "o_totalprice")
        .withColumn("x", fp0.bitwiseAND(F.lit(_X_MASK)))
        .select("o_totalprice", "x", F.explode(reps_arr).alias("r"))
    )
    u = (
        (F.col("x") * F.col("r.ha") + F.col("r.hb"))
        % F.lit(MINHASH_P)
        % 1_000_000
    ) / 1_000_000.0
    w = F.lit(5)
    for k in reversed(range(len(POISSON1_CDF))):
        w = F.when(u < POISSON1_CDF[k], F.lit(k)).otherwise(w)
    # replicate means in EXACT integer arithmetic (functions.exact,
    # round 12): weights are small integers and o_totalprice is
    # cent-quantized, so sum(w*cents) is an exact DECIMAL(38,0) sum and
    # round(mean, 4) happens in integer space — the weighted double sum
    # re-associated across partitions and round-on-huge split engines on
    # the magnitude sweep (this was one of the two queries classified
    # inherent-float in round 11; only the w*price product made it so)
    from xboard_spark.functions import exact as X

    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    weighted = staged.select(
        F.col("r.b").alias("b"),
        w.cast("long").alias("w"),
        (w.cast("long") * cents).cast("decimal(38,0)").alias("wc"),
    )
    # a replica whose Poisson weights are ALL zero has no resample mean
    # — probability (1/e)^n, so only plausible for tiny groups, where it
    # is near-certain (n=1: ~37% per replica). It yields a NULL replica
    # mean (it ranks at the window's null position and can surface as a
    # NULL CI bound) instead of the ANSI DIVIDE_BY_ZERO that killed the
    # whole panel (round-10 degenerate-corpus sweep).
    reps = (
        weighted.groupBy("b")
        .agg(
            F.when(
                F.sum("w") > 0,
                X.round_div_units(
                    F.sum("wc") * F.lit(100),
                    F.sum("w").cast("decimal(38,0)"),
                    1e4,
                ),
            ).alias("rep_mean")
        )
    )
    # NULLS FIRST explicitly (Spark's asc default, but PINNED because the
    # twin must say it out loud: DuckDB defaults NULLS LAST, which
    # mirrored the CI bounds on a degenerate corpus — (NULL, v) vs
    # (v, NULL) — before both sides pinned the same null position
    win = Window.partitionBy().orderBy(F.asc_nulls_first("rep_mean"))
    lo_rank = max(1, int(0.025 * n_replicas))
    hi_rank = min(n_replicas, int(0.975 * n_replicas) + 1)
    ranked = reps.withColumn("rn", F.row_number().over(win))
    # 1-row AGGREGATES, not 1-row filters: a filter over an empty corpus
    # yields ZERO rows and the crossJoin below collapses the whole panel
    # to nothing, where the twin's scalar subquery yields one NULL-bound
    # row (round-12 empty-fixture sweep). min() over the <=1-row filter
    # result is the value itself — or NULL on empty, matching the twin.
    lo = ranked.filter(F.col("rn") == lo_rank).agg(
        F.min("rep_mean").alias("ci_lo")
    )
    hi = ranked.filter(F.col("rn") == hi_rank).agg(
        F.min("rep_mean").alias("ci_hi")
    )
    point = orders.agg(
        F.count("*").alias("n_rows"),
        F.lit(n_replicas).cast("long").alias("n_replicas"),
        X.round_div_units(
            F.sum(cents.cast("decimal(38,0)")) * F.lit(100),
            F.count("*").cast("decimal(38,0)"),
            1e4,
        ).alias("point_mean"),
    )
    return (
        point.crossJoin(F.broadcast(lo)).crossJoin(F.broadcast(hi))
    )


def temperature_mixture(documents: DataFrame, alpha: float = 0.7) -> DataFrame:
    """Temperature-scaled multilingual sampling weights: the per-language
    sampling distribution q_i ∝ p_i^alpha that multilingual LM training
    uses to up-weight low-resource languages without flattening the
    mixture entirely (alpha=0.7 is the XLM-R / mBERT convention; alpha=1
    is natural sampling, alpha=0 uniform — Conneau et al. 2020 §3.1).
    Complements ``mixture_rebalance`` (explicit target shares, downsample
    only): here the target IS a function of the corpus, and the factor
    column is the up/down-sampling multiplier a weighted data loader
    would apply per language.

    Scale shape: one partial/final hash aggregate over the corpus to get
    per-lang counts (the only pass over the data), then all arithmetic on
    the k-row lang frame via broadcast cross-joins — no second scan, no
    driver collect, identical plan at 100 TB.

    Float discipline: share is rounded 6dp BEFORE pow() so both engines
    exponentiate identical doubles (JVM Math.pow vs C pow differ in ulps
    on unrounded inputs); the normalizer is a rounded sum of rounded
    terms; every emitted double is one identical expression tree."""
    # k-row lang frame, lineage-truncated: every downstream consumer
    # (total, z, final projection) would otherwise re-embed the corpus
    # scan subtree — measured 5 Scan nodes before, 1 after; the corpus
    # is read exactly once at any scale
    counts = (
        documents.groupBy("lang")
        .agg(F.count("*").alias("n_docs"))
        .localCheckpoint(eager=True)
    )
    total = counts.agg(F.sum("n_docs").alias("total"))
    # share_raw (unrounded) backs sampling_factor's denominator: at 100 TB
    # a language with true share < 5e-7 rounds to 0.000000, and dividing
    # by the ROUNDED share would emit Infinity. One exact int/int IEEE
    # division — deterministic across engines without rounding.
    shares = (
        counts.crossJoin(F.broadcast(total))
        .withColumn("share_raw", F.col("n_docs") / F.col("total"))
        .withColumn("share", F.round(F.col("share_raw"), 6))
    )
    powd = shares.withColumn(
        "w", F.round(F.pow(F.col("share"), F.lit(float(alpha))), 6)
    )
    z = powd.agg(F.round(F.sum("w"), 6).alias("z"))
    return (
        powd.crossJoin(F.broadcast(z))
        .select(
            "lang",
            "n_docs",
            "share",
            F.round(F.col("w") / F.col("z"), 6).alias("temp_share"),
            F.round((F.col("w") / F.col("z")) / F.col("share_raw"), 6).alias(
                "sampling_factor"
            ),
        )
        .orderBy("lang")
    )


def training_order_audit(
    documents: DataFrame, n_shards: int = 8, salt: str = "shuffle-v1"
) -> DataFrame:
    """Deterministic global training-order shuffle, audited: assign every
    doc to a shard by salted fingerprint and order within the shard by the
    fingerprint itself — a reproducible full-corpus shuffle with NO global
    sort (the classic "shuffle 100 TB for epoch order" problem: a total
    order is one giant range partition; hash-sharding + within-shard sort
    is embarrassingly parallel and a data loader streams shards
    round-robin). The audit emits, per shard: size and share (balance —
    a skewed shard gates loader throughput) and the mean source-position
    gap between CONSECUTIVE examples in shuffle order (mean |doc_id -
    lag(doc_id)|): a well-shuffled order has a large mean gap (~n/3 for
    uniform), while any residual source locality — crawl order leaking
    into training order — drags it down.

    Scale shape: ONE hash-partition shuffle on shard (the same exchange
    the write itself needs), window per shard in sorted order, then a
    k-row aggregate. Salt change = new epoch order, same plan.

    Float discipline: gaps are exact int64 diffs; the mean is one
    cast-then-divide, 6dp."""
    fp = fingerprint64(F.concat_ws(":", F.lit(salt), F.col("doc_id")))
    assigned = documents.select(
        "doc_id",
        (fp % n_shards).alias("shard"),
        fp.alias("pos_key"),
    )
    w = Window.partitionBy("shard").orderBy("pos_key", "doc_id")
    gaps = assigned.withColumn(
        "gap", F.abs(F.col("doc_id") - F.lag("doc_id").over(w))
    )
    # n_shards-row frame, lineage-truncated: the total agg and the final
    # projection would otherwise each re-embed the scan+window subtree
    # (measured 4 Scan nodes before, 1 after — one corpus pass)
    per_shard = (
        gaps.groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("gap").alias("gap_sum"),
            F.count("gap").alias("n_gaps"),
        )
        .localCheckpoint(eager=True)
    )
    total = per_shard.agg(F.sum("n_docs").alias("total"))
    return (
        per_shard.crossJoin(F.broadcast(total))
        .select(
            "shard",
            "n_docs",
            F.round(F.col("n_docs") / F.col("total"), 6).alias("share"),
            F.round(
                F.col("gap_sum").cast("double") / F.col("n_gaps"), 6
            ).alias("mean_source_gap"),
        )
        .orderBy("shard")
    )


def epochs_plan(
    documents: DataFrame, budget_factor: float = 2.0, alpha: float = 0.7
) -> DataFrame:
    """Data-constrained training plan: given a token budget of
    ``budget_factor`` x the corpus and a temperature-``alpha`` language
    mixture, compute how many EPOCHS of each language the plan implies —
    the repetition accounting of data-constrained scaling (Muennighoff
    et al. 2023: value per epoch decays, ~4 epochs is where repetition
    stops helping, hence the ``repeat_warning`` flag).

    Scale shape: ONE pass over the corpus for per-lang doc/token counts
    (the k-row frame is lineage-truncated like ``temperature_mixture``),
    then broadcast arithmetic on k rows.

    Float discipline: shares rounded 6dp before pow(); epochs is one
    identical rounded expression tree over the rounded temp share."""
    from xboard_spark.operators.text import token_count_col

    per_lang = (
        documents.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(token_count_col(F.col("text"))).alias("corpus_tokens"),
        )
        .localCheckpoint(eager=True)
    )
    total = per_lang.agg(F.sum("corpus_tokens").alias("total_tokens"))
    shares = per_lang.crossJoin(F.broadcast(total)).withColumn(
        "token_share",
        F.round(F.col("corpus_tokens") / F.col("total_tokens"), 6),
    )
    powd = shares.withColumn(
        "w", F.round(F.pow(F.col("token_share"), F.lit(float(alpha))), 6)
    )
    z = powd.agg(F.round(F.sum("w"), 6).alias("z"))
    out = powd.crossJoin(F.broadcast(z)).withColumn(
        "temp_share", F.round(F.col("w") / F.col("z"), 6)
    )
    epochs = F.round(
        F.lit(float(budget_factor))
        * F.col("total_tokens")
        * F.col("temp_share")
        / F.col("corpus_tokens"),
        4,
    )
    return out.select(
        "lang",
        "n_docs",
        "corpus_tokens",
        "token_share",
        "temp_share",
        epochs.alias("epochs"),
        (epochs > 4.0).alias("repeat_warning"),
    ).orderBy("lang")
