"""Planted-structure tests for the round-4 extension operators:
dup_span_stats (exact substring-span duplication rate), basket_pairs
(market-basket co-occurrence), value_outliers (z-score anomaly panel),
scd2_history (type-2 history build)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from xboard_spark.ingest import scd2_history
from xboard_spark.operators import dedup, events, profiling, tpch


def _mkdocs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )


def test_dup_span_stats_planted(spark):
    # ten shared tokens between docs 1 and 2 -> exactly one duplicated
    # window each; doc 3 is all-unique tokens -> zero duplicated windows
    shared = " ".join(f"tok{i}" for i in range(10))
    docs = _mkdocs(
        spark,
        [
            (1, f"alpha {shared} beta", "en", "web"),
            (2, f"gamma {shared} delta", "en", "web"),
            (3, " ".join(f"uniq{i}" for i in range(12)), "en", "books"),
        ],
    )
    out = {
        (r.lang, r.source): r
        for r in dedup.dup_span_stats(docs, window=10).collect()
    }
    web = out[("en", "web")]
    # 12 tokens per doc -> 3 windows per doc; only the fully-shared window
    # (positions exactly covering the 10 shared tokens) is cross-doc dup
    assert web.n_docs == 2
    assert web.n_spans == 6
    assert web.n_dup_spans == 2
    assert abs(web.dup_fraction - 2 / 6) < 1e-12
    books = out[("en", "books")]
    assert books.n_dup_spans == 0 and books.n_docs == 1


def test_dup_span_stats_short_docs_excluded(spark):
    docs = _mkdocs(spark, [(1, "too short", "en", "web")])
    assert dedup.dup_span_stats(docs, window=10).collect() == []


def test_basket_pairs_planted(spark):
    # parts 10+20 co-occur in two orders; 10+30 in one; duplicate lineitem
    # rows for the same (order, part) must NOT inflate counts
    li = spark.createDataFrame(
        [
            (1, 10),
            (1, 10),  # duplicate line for same part in same order
            (1, 20),
            (2, 10),
            (2, 20),
            (2, 30),
            (3, 10),
            (3, 30),
        ],
        "l_orderkey long, l_partkey long",
    )
    rows = tpch.basket_pairs(li).collect()
    counts = {(r.part_a, r.part_b): r.n_orders for r in rows}
    assert counts[(10, 20)] == 2
    assert counts[(10, 30)] == 2
    assert counts[(20, 30)] == 1
    # ordering: count desc then part ids asc
    assert [
        (r.part_a, r.part_b) for r in rows
    ] == [(10, 20), (10, 30), (20, 30)]


def test_value_outliers_planted(spark):
    # 40 unit values plus one extreme spike -> exactly one >3-sigma point;
    # a second type with no spike -> zero outliers
    rows = [("click", 1.0 + (i % 5) * 0.01) for i in range(40)]
    rows.append(("click", 1000.0))
    rows += [("view", float(i % 3)) for i in range(30)]
    ev = spark.createDataFrame(rows, "event_type string, value double")
    out = {r.event_type: r for r in events.value_outliers(ev).collect()}
    assert out["click"].n_outliers == 1
    assert out["click"].n_events == 41
    assert out["view"].n_outliers == 0
    # moments are the plain sample stats (rounded 6dp)
    assert abs(out["view"].mean_value - (sum(float(i % 3) for i in range(30)) / 30)) < 1e-6


def test_value_outliers_null_values_ignored_in_moments(spark):
    ev = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("a", None)],
        "event_type string, value double",
    )
    r = events.value_outliers(ev).collect()[0]
    assert r.n_events == 3  # count(*) includes the null row
    assert r.mean_value == 2.0  # moments exclude nulls
    assert r.n_outliers == 0


def test_value_outliers_degenerate_groups(spark):
    # round-13 n=1 sweep finding: a single-valued group has no sample
    # variance — std must be NULL and nothing flagged (the bare
    # (n_vals - 1) division was an ANSI DIVIDE_BY_ZERO crash); an
    # all-NULL group's mean gets the same contract; a healthy group in
    # the same frame is untouched by the guards
    ev = spark.createDataFrame(
        [("solo", 5.0), ("ghost", None), ("ok", 1.0), ("ok", 3.0)],
        "event_type string, value double",
    )
    out = {r.event_type: r for r in events.value_outliers(ev).collect()}
    assert (out["solo"].mean_value, out["solo"].std_value,
            out["solo"].n_outliers) == (5.0, None, 0)
    assert (out["ghost"].mean_value, out["ghost"].std_value,
            out["ghost"].n_outliers) == (None, None, 0)
    assert out["ok"].mean_value == 2.0 and out["ok"].std_value is not None


def test_scd2_history_planted(spark):
    d = lambda s: datetime.datetime.fromisoformat(s)  # noqa: E731
    orders = spark.createDataFrame(
        [
            # custkey 1: three versions, middle two share a date ->
            # orderkey breaks the tie deterministically
            (101, 1, "O", 10.0, d("2024-01-01")),
            (102, 1, "F", 20.0, d("2024-02-01")),
            (103, 1, "F", 30.0, d("2024-02-01")),
            # custkey 2: single version -> current from day one
            (201, 2, "O", 5.0, d("2024-03-01")),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp",
    )
    rows = scd2_history(orders).collect()
    by_key = {(r.o_custkey, r.version): r for r in rows}
    assert len(rows) == 4
    v1, v2, v3 = (by_key[(1, v)] for v in (1, 2, 3))
    # versions ordered by (date, orderkey); valid_to chains to the next
    # version's valid_from; only the last version is current
    assert [v1.o_orderkey, v2.o_orderkey, v3.o_orderkey] == [101, 102, 103]
    assert v1.valid_to == v2.valid_from
    assert v2.valid_to == v3.valid_from
    assert (v1.is_current, v2.is_current, v3.is_current) == (
        False,
        False,
        True,
    )
    assert by_key[(2, 1)].is_current is True


def test_scd2_history_filter_pushdown(spark, sf_dir):
    from xboard_spark.io import read_table

    orders = read_table(spark, sf_dir, "orders")
    plan = (
        scd2_history(orders)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the entity filter must reach the parquet scan
    assert "PushedFilters: [IsNotNull(o_custkey), LessThan(o_custkey,20)]" in plan


def test_table_profile_planted(spark):
    df = spark.createDataFrame(
        [(1, None, 2.345), (2, "b", 10.0), (3, "b", None), (10, "a", 1.5)],
        "k long, s string, v double",
    )
    out = {r.col_name: r for r in profiling.table_profile(df).collect()}
    assert set(out) == {"k", "s", "v"}
    assert all(r.n_rows == 4 for r in out.values())
    assert (out["s"].n_nulls, out["s"].n_distinct) == (1, 2)
    # min/max aggregate on the VALUE, not the string form: 10 > 9 ordering
    assert (out["k"].min_repr, out["k"].max_repr) == ("1", "10")
    # doubles render through DECIMAL(38,2): always two fraction digits
    assert (out["v"].min_repr, out["v"].max_repr) == ("1.50", "10.00")
    assert out["v"].n_nulls == 1


def test_table_profile_double_repr_is_plain_at_extreme_magnitude(spark):
    """The one string-surface panel must not hash-split on corrupt
    magnitudes (round-10 sweep 7): a double at 1e15 rendered 9.99E15 by
    Spark's Double.toString but 9990000000000000.0 by DuckDB. Both
    engines now route doubles through DECIMAL(38,2), whose string form is
    plain notation at every magnitude; assert Spark's side matches the
    exact form DuckDB produces for the same value."""
    import duckdb

    df = spark.createDataFrame(
        [(1, -9.99e15), (2, 9.99e15)], "k long, v double"
    )
    out = {r.col_name: r for r in profiling.table_profile(df).collect()}
    expect_min, expect_max = duckdb.sql(
        "SELECT TRY_CAST(-9.99e15::DOUBLE AS DECIMAL(38,2))::VARCHAR,"
        "       TRY_CAST(9.99e15::DOUBLE AS DECIMAL(38,2))::VARCHAR"
    ).fetchone()
    assert out["v"].min_repr == expect_min == "-9990000000000000.00"
    assert out["v"].max_repr == expect_max == "9990000000000000.00"


def test_table_profile_double_repr_half_boundary(spark):
    """Round-13 half-boundary probe: Spark's round(v, 2) quantizes HALF_UP
    on the shortest decimal repr (8.165 -> 8.17) while DuckDB's round()
    follows the binary value (8.165 -> 8.16) — but BOTH engines'
    double->DECIMAL casts are repr-faithful and agree. The render
    therefore casts directly with no pre-round; assert the repr-faithful
    boundary on Spark's side and that DuckDB's cast produces the same
    string for the same value."""
    import duckdb

    df = spark.createDataFrame([(1, 8.165), (2, 1.005)], "k long, v double")
    out = {r.col_name: r for r in profiling.table_profile(df).collect()}
    assert (out["v"].min_repr, out["v"].max_repr) == ("1.01", "8.17")
    assert duckdb.sql(
        "SELECT TRY_CAST(1.005::DOUBLE AS DECIMAL(38,2))::VARCHAR,"
        "       TRY_CAST(8.165::DOUBLE AS DECIMAL(38,2))::VARCHAR"
    ).fetchone() == ("1.01", "8.17")


def test_decayed_engagement_halflife(spark):
    d = datetime.datetime.fromisoformat
    ev = spark.createDataFrame(
        [
            # user 1: one event at the anchor (weight 1), one exactly one
            # half-life old (weight 0.5)
            (1, d("2024-01-08 00:00:00"), 8.0),
            (1, d("2024-01-01 00:00:00"), 8.0),
            # user 2: only the stale event
            (2, d("2024-01-01 00:00:00"), 4.0),
        ],
        "user_id long, ts timestamp, value double",
    )
    out = {r.user_id: r for r in events.decayed_engagement(ev).collect()}
    assert abs(out[1].decayed_value - (8.0 + 4.0)) < 1e-6
    assert abs(out[2].decayed_value - 2.0) < 1e-6
    assert out[1].n_events == 2
    assert out[1].last_seen == d("2024-01-08 00:00:00")


def test_fuzzy_customer_pairs_blocking_and_distance(spark):
    from xboard_spark.operators import linkage

    cust = spark.createDataFrame(
        [
            # same nation, 1 edit apart -> pair
            (1, "Customer#0001", 5),
            (2, "Customer#0002", 5),
            # same name-distance but DIFFERENT nation -> blocked out
            (3, "Customer#0003", 6),
            # same nation but 4 edits away -> above threshold
            (4, "Zustomer#9999", 5),
        ],
        "c_custkey long, c_name string, c_nationkey int",
    )
    rows = linkage.fuzzy_customer_pairs(cust, max_dist=1).collect()
    assert [(r.custkey_a, r.custkey_b, r.name_dist) for r in rows] == [
        (1, 2, 1)
    ]


def test_value_drift_psi_planted_shift(spark):
    d = datetime.datetime.fromisoformat
    # early half: all values low; late half: all values high -> two
    # buckets, each present in only ONE half -> no finite PSI terms emitted
    rows = [(d("2024-01-01 00:00:00"), 1.0)] * 10 + [
        (d("2024-01-31 00:00:00"), 100.0)
    ] * 10
    ev = spark.createDataFrame(rows, "ts timestamp, value double")
    assert profiling.value_drift_psi(ev).collect() == []
    # identical halves -> every bucket balanced -> psi terms all 0
    rows = [
        (d("2024-01-01 00:00:00"), float(v)) for v in (1, 2, 3)
    ] + [(d("2024-01-31 00:00:00"), float(v)) for v in (1, 2, 3)]
    ev = spark.createDataFrame(rows, "ts timestamp, value double")
    out = profiling.value_drift_psi(ev).collect()
    assert len(out) > 0
    assert all(r.psi_term == 0.0 for r in out)
    assert all(r.n_early == r.n_late for r in out)


def test_value_drift_psi_detects_partial_shift(spark):
    d = datetime.datetime.fromisoformat
    # both halves occupy both buckets but with different shares -> nonzero
    # positive total PSI
    rows = [(d("2024-01-01 00:00:00"), 0.0)] * 8 + [
        (d("2024-01-01 00:00:00"), 10.0)
    ] * 2
    rows += [(d("2024-01-31 00:00:00"), 0.0)] * 2 + [
        (d("2024-01-31 00:00:00"), 10.0)
    ] * 8
    ev = spark.createDataFrame(rows, "ts timestamp, value double")
    out = profiling.value_drift_psi(ev).collect()
    total = sum(r.psi_term for r in out)
    assert total > 0.2  # textbook "significant shift" territory


def test_incremental_rollup_equals_recompute(spark, sf_dir):
    from xboard_spark.io import read_table
    from xboard_spark.operators import incremental

    orders = read_table(spark, sf_dir, "orders")
    inc = incremental.incremental_daily_rollup(orders).collect()
    full = (
        orders.groupBy(F.to_date("o_orderdate").alias("order_date"))
        .agg(
            F.count("*").cast("long").alias("order_count"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy("order_date")
        .collect()
    )
    assert [(r.order_date, r.order_count) for r in inc] == [
        (r.order_date, r.order_count) for r in full
    ]
    for a, b in zip(inc, full):
        assert abs(a.revenue - b.revenue) < 1e-6


def test_cdc_diff_classification(spark):
    from xboard_spark.operators.incremental import cdc_diff

    old = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 20.0, "b"), (3, None, "c"), (4, 40.0, "d")],
        "k long, price double, tag string",
    )
    new = spark.createDataFrame(
        [
            (1, 10.0, "a"),   # unchanged
            (2, 25.0, "b"),   # updated (price)
            (3, None, "zz"),  # updated (tag; NULL==NULL must not mask it)
            (5, 50.0, "e"),   # inserted; 4 deleted
        ],
        "k long, price double, tag string",
    )
    out = {
        r.k: r.change
        for r in cdc_diff(old, new, "k", ["price", "tag"]).collect()
    }
    assert out == {
        1: "unchanged",
        2: "updated",
        3: "updated",
        4: "deleted",
        5: "inserted",
    }


def test_cdc_diff_null_equal_is_unchanged(spark):
    from xboard_spark.operators.incremental import cdc_diff

    old = spark.createDataFrame([(1, None)], "k long, price double")
    new = spark.createDataFrame([(1, None)], "k long, price double")
    assert cdc_diff(old, new, "k", ["price"]).collect()[0].change == (
        "unchanged"
    )


def test_event_transitions_planted(spark):
    d = datetime.datetime.fromisoformat
    ev = spark.createDataFrame(
        [
            # user 1: view -> view -> purchase
            (1, 1, d("2024-01-01 00:00:00"), "view"),
            (2, 1, d("2024-01-01 00:01:00"), "view"),
            (3, 1, d("2024-01-01 00:02:00"), "purchase"),
            # user 2: view -> purchase (streams never cross users)
            (4, 2, d("2024-01-01 00:00:00"), "view"),
            (5, 2, d("2024-01-01 00:01:00"), "purchase"),
        ],
        "event_id long, user_id long, ts timestamp, event_type string",
    )
    rows = events.event_transitions(ev).collect()
    got = {(r.from_type, r.to_type): r for r in rows}
    assert got[("_start", "view")].n_transitions == 2
    assert got[("view", "view")].n_transitions == 1
    assert got[("view", "purchase")].n_transitions == 2
    assert ("purchase", "view") not in got  # no cross-user transition
    # probabilities normalize per from-state
    assert got[("_start", "view")].p_transition == 1.0
    assert abs(got[("view", "purchase")].p_transition - 2 / 3) < 1e-6


def test_fuzzy_pairs_symspell_equals_quadratic(spark, sf_dir):
    """The deletion-neighborhood candidate generator must be COMPLETE for
    edit distance <= 1: its output must equal the exhaustive per-nation
    quadratic on real data (including insert/delete length-change pairs,
    not just substitutions)."""
    from xboard_spark.io import read_table
    from xboard_spark.operators import linkage

    cust = read_table(spark, sf_dir, "customer")
    # add a planted length-change near-dup (deletion case)
    extra = spark.createDataFrame(
        [(990001, "Customer#00000001", 13)],  # one char shorter than 8-digit form
        "c_custkey long, c_name string, c_nationkey int",
    )
    cust = cust.select("c_custkey", "c_name", "c_nationkey").unionByName(extra)
    fast = [
        (r.custkey_a, r.custkey_b, r.name_dist)
        for r in linkage.fuzzy_customer_pairs(cust, max_dist=1).collect()
    ]
    # quadratic reference path (max_dist=2 then filter to 1 keeps the
    # fallback branch honest too)
    slow = [
        (r.custkey_a, r.custkey_b, r.name_dist)
        for r in linkage.fuzzy_customer_pairs(cust, max_dist=2).collect()
        if r.name_dist <= 1
    ]
    assert fast == slow
    assert len(fast) > 0


def test_value_equidepth_balanced_buckets(spark):
    from xboard_spark.operators import window_ops

    ev = spark.createDataFrame(
        [(i, float(i * i)) for i in range(23)] + [(99, None)],
        "event_id long, value double",
    )
    rows = window_ops.value_equidepth(ev, n_buckets=5).collect()
    # 23 non-null rows over 5 buckets: first 3 buckets get 5, last 2 get 4
    assert [r.n_events for r in rows] == [5, 5, 5, 4, 4]
    # buckets are contiguous, ordered ranges
    for a, b in zip(rows, rows[1:]):
        assert a.hi <= b.lo
    assert rows[0].lo == 0.0 and rows[-1].hi == 484.0


def test_part_pagerank_planted_hub(spark):
    from xboard_spark.operators import graph

    # star graph: part 1 co-occurs with 2,3,4 (each in its own order);
    # the hub must outrank the leaves, and scores must sum near 1
    li = spark.createDataFrame(
        [(10, 1), (10, 2), (11, 1), (11, 3), (12, 1), (12, 4)],
        "l_orderkey long, l_partkey long",
    )
    rows = graph.part_pagerank(li, n_iters=2, top=10).collect()
    scores = {r.node: r.pagerank for r in rows}
    assert rows[0].node == 1  # hub ranks first
    assert all(scores[1] > scores[leaf] for leaf in (2, 3, 4))
    assert abs(sum(scores.values()) - 1.0) < 1e-4  # stochastic vector
    # leaves are symmetric -> identical scores
    assert scores[2] == scores[3] == scores[4]


def test_source_contamination_planted(spark):
    # two exact dups across sources web/books, plus an unrelated doc:
    # exactly one cross-source pair, canonically ordered
    txt = " ".join(f"tok{i}" for i in range(30))
    docs = _mkdocs(
        spark,
        [
            (1, txt, "en", "web"),
            (2, txt, "en", "books"),
            (3, " ".join(f"uniq{i}" for i in range(30)), "en", "web"),
        ],
    )
    rows = dedup.source_contamination_matrix(docs).collect()
    assert [(r.source_a, r.source_b, r.n_pairs) for r in rows] == [
        ("books", "web", 1)
    ]


def test_winsorized_stats_clips_tails(spark):
    # 99 unit-ish values + one huge spike: the winsorized mean must sit
    # near 1, unlike the raw mean (~11)
    rows = [("click", 1.0 + (i % 10) * 0.01) for i in range(99)]
    rows.append(("click", 1000.0))
    ev = spark.createDataFrame(rows, "event_type string, value double")
    r = events.winsorized_stats(ev).collect()[0]
    assert r.n_values == 100
    assert r.winsorized_mean < 2.0
    assert r.lo >= 1.0 and r.hi < 1000.0


def test_keyword_pagerank_hub_term(spark):
    from xboard_spark.operators import graph

    # 'spark' co-occurs with every other frequent term; the satellites
    # only ever co-occur with 'spark' -> hub term must rank first
    docs = _mkdocs(
        spark,
        [
            (i, " ".join(["spark", w] * 6), "en", "web")
            for i, w in enumerate(["alpha", "beta", "gamma"])
        ],
    )
    rows = graph.keyword_pagerank(docs, min_count=2).collect()
    assert rows[0].term == "spark"
    scores = {r.term: r.pagerank for r in rows}
    assert all(scores["spark"] > scores[w] for w in ("alpha", "beta", "gamma"))


def test_vocab_coverage_planted(spark):
    from xboard_spark.operators import text

    # vocab_size=2 keeps {common, filler}; doc 2 is half OOV
    docs = _mkdocs(
        spark,
        [
            (1, "common filler common filler common filler", "en", "web"),
            (2, "common rare1 common rare2", "en", "books"),
        ],
    )
    out = {
        (r.lang, r.source): r
        for r in text.vocab_coverage(docs, vocab_size=2).collect()
    }
    web = out[("en", "web")]
    assert (web.n_tokens, web.n_covered, web.coverage) == (6, 6, 1.0)
    books = out[("en", "books")]
    assert (books.n_tokens, books.n_covered) == (4, 2)
    assert abs(books.coverage - 0.5) < 1e-12


def test_char_lm_fluency_scores_gibberish_lower(spark):
    from xboard_spark.operators import text

    # repetitive natural-ish text has predictable bigrams; the gibberish
    # slice (unique random-ish chars) must score strictly lower under the
    # corpus's own bigram statistics
    natural = "the cat sat on the mat and the cat sat again " * 4
    gibber = "qxzjv kqpwz xvjqz zqxwv jvqxk wzqpx " * 4
    docs = _mkdocs(
        spark,
        [(1, natural, "en", "clean"), (2, gibber, "en", "noise")],
    )
    out = {r.source: r for r in text.char_lm_fluency(docs).collect()}
    assert out["clean"].avg_logp > out["noise"].avg_logp
    assert out["clean"].n_bigrams > 0 and out["noise"].n_bigrams > 0


def test_char_bigram_kernel_equals_expression_path(spark):
    """The mapInArrow bigram counter and the explode/substr expression
    path must agree count-for-count, including multi-byte code points,
    row-boundary masking, NULL slice keys, and 2-char minimum rows."""
    from pyspark.sql import functions as F

    from xboard_spark.operators import text

    docs = _mkdocs(
        spark,
        [
            (1, "abcab", "en", "s1"),
            (2, "ab", "en", "s1"),  # single bigram row
            (3, "café naïve 你好你", "fr", "s2"),
            (4, "zz  zz\tzz", None, None),  # NULL slice keys
            (5, "x", "en", "s1"),  # shorter than one bigram: filtered
        ],
    )
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), "\\s+", " ")
    staged = docs.select("lang", "source", norm.alias("norm")).filter(
        F.length("norm") >= 2
    )
    a = sorted(
        map(tuple, text._char_bigram_counts_expr(staged).collect()), key=str
    )
    b = sorted(
        map(
            tuple,
            staged.mapInArrow(
                text._char_bigram_batch,
                "lang string, source string, bg string, n long",
            )
            .groupBy("lang", "source", "bg")
            .agg(F.sum("n").alias("n"))
            .collect(),
        ),
        key=str,
    )
    assert a == b and len(a) > 0


def test_truncation_recall_monotone_and_bounded(spark, sf_dir):
    from xboard_spark.io import read_table
    from xboard_spark.operators import similarity

    emb = read_table(spark, sf_dir, "embeddings")
    rows = similarity.truncation_recall(
        emb, dims=(8, 32, 64), n_queries=10, k=5
    ).collect()
    rec = {r.dim: r.recall for r in rows}
    assert set(rec) == {8, 32, 64}
    assert all(0.0 <= v <= 1.0 for v in rec.values())
    # full dimension against itself is perfect recall by construction
    assert rec[64] == 1.0
    # more dimensions can only help on this corpus (soft monotonicity:
    # allow equality)
    assert rec[8] <= rec[32] <= rec[64]


def test_knn_rrf_fusion_properties(spark, sf_dir):
    from xboard_spark.io import read_table
    from xboard_spark.operators import similarity

    emb = read_table(spark, sf_dir, "embeddings")
    rows = similarity.knn_rrf(emb, n_queries=5, k=3, pool=5).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.q_id, []).append(r)
    assert set(by_q) == {0, 1, 2, 3, 4}
    for q, rs in by_q.items():
        # dense ranks 1..k, scores non-increasing, all positive and
        # bounded by the two-retriever maximum 2/(60+1)
        assert [r.rank for r in rs] == [1, 2, 3]
        scores = [r.rrf_score for r in rs]
        assert scores == sorted(scores, reverse=True)
        # scores are 6dp-rounded, so allow half-ulp-of-rounding slack
        assert all(0 < s <= 2 / 61 + 1e-6 for s in scores)
        # a double-listed top-1 candidate (rank 1 in both metrics) would
        # score exactly 2/61; anything fused scores more than one list's
        # minimum contribution
        assert scores[0] >= 1 / 65  # at least one top-pool contribution


def test_input_bounds_audit_flags_corrupt_rows(spark):
    """The intake gate the round-10 magnitude/timestamp sweeps call for:
    +-1e15 values, NaN/Inf, pre-1990 and 2099 timestamps must each land
    in their own counter, NULLs separately, and n_ok must account for
    exactly the clean remainder."""
    import datetime as dt
    import math

    ok_t = dt.datetime(2026, 3, 1, 12, 0)
    ev = spark.createDataFrame(
        [
            (1, ok_t, 1, "view", 1.0, "{}"),
            (2, ok_t, 1, "view", 1.0e15, "{}"),          # magnitude
            (3, ok_t, 1, "view", -9.99e15, "{}"),        # magnitude
            (4, ok_t, 1, "view", math.nan, "{}"),        # non-finite
            (5, ok_t, 1, "view", math.inf, "{}"),        # non-finite
            (6, ok_t, 1, "view", None, "{}"),            # null
            (7, dt.datetime(2099, 1, 1), 1, "view", 2.0, "{}"),   # ts high
            (8, dt.datetime(1969, 12, 31), 1, "view", 2.0, "{}"), # ts low
            (9, None, 1, "view", 2.0, "{}"),             # ts null
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    orders = spark.createDataFrame(
        [(1, 1, "O", 10.0, ok_t, "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    li = spark.createDataFrame(
        [(1, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", ok_t)],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    )
    out = {
        (r.table_name, r.col_name): r
        for r in profiling.input_bounds_audit(ev, orders, li).collect()
    }
    v = out[("events", "value")]
    assert (v.n_rows, v.n_null, v.n_nonfinite, v.n_oob, v.n_ok) == (
        9, 1, 2, 2, 4
    )
    t = out[("events", "ts")]
    assert (t.n_rows, t.n_null, t.n_nonfinite, t.n_oob, t.n_ok) == (
        9, 1, 0, 2, 6
    )
    for key in (
        ("orders", "o_totalprice"),
        ("orders", "o_orderdate"),
        ("lineitem", "l_discount"),
        ("lineitem", "l_extendedprice"),
        ("lineitem", "l_tax"),
        ("lineitem", "l_shipdate"),
    ):
        r = out[key]
        assert (r.n_null, r.n_nonfinite, r.n_oob) == (0, 0, 0)
        assert r.n_ok == r.n_rows == 1


def test_input_bounds_audit_counts_off_grid_values(spark):
    """ADVICE r12: the x100-grid quantization contract — a dirty rate
    (0.125) or dirty price (9.999) silently rounds inside cent_units /
    pct_units with both engines agreeing, so the audit must surface it
    at intake. Off-grid rows flag in n_offgrid but stay in n_ok (they
    are in-fence and finite — a contract warning, not quarantine);
    columns without the contract (timestamps) report NULL."""
    import datetime as dt

    ok_t = dt.datetime(2026, 3, 1, 12, 0)
    ev = spark.createDataFrame(
        [(1, ok_t, 1, "view", 1.25, "{}")],  # cent-clean
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    orders = spark.createDataFrame(
        [(1, 1, "O", 9.999, ok_t, "1-URGENT")],  # dirty price
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    li = spark.createDataFrame(
        [
            (1, 1, 1, 1, 1.0, 10.0, 0.125, 0.02, "N", "O", ok_t),  # dirty d
            (2, 1, 1, 1, 1.0, 10.01, 0.04, 0.08, "N", "O", ok_t),  # clean
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    )
    out = {
        (r.table_name, r.col_name): r
        for r in profiling.input_bounds_audit(ev, orders, li).collect()
    }
    assert out[("events", "value")].n_offgrid == 0
    assert out[("orders", "o_totalprice")].n_offgrid == 1
    d = out[("lineitem", "l_discount")]
    assert d.n_offgrid == 1 and d.n_ok == 2  # flagged, NOT quarantined
    assert out[("lineitem", "l_extendedprice")].n_offgrid == 0
    assert out[("lineitem", "l_tax")].n_offgrid == 0
    for ts_key in (
        ("events", "ts"),
        ("orders", "o_orderdate"),
        ("lineitem", "l_shipdate"),
    ):
        assert out[ts_key].n_offgrid is None  # no contract on timestamps


def test_input_bounds_audit_empty_table_reports_zeros(spark):
    """An intake gate must report '0 corrupt rows' on an empty drop, not
    NULL counters (sum over zero rows is NULL in both engines)."""
    ev = spark.createDataFrame(
        [],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    orders = spark.createDataFrame(
        [],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    li = spark.createDataFrame(
        [],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    )
    rows = profiling.input_bounds_audit(ev, orders, li).collect()
    assert len(rows) == 8
    for r in rows:
        assert (r.n_rows, r.n_null, r.n_nonfinite, r.n_oob, r.n_ok) == (
            0, 0, 0, 0, 0
        )
        # quantized columns audit 0 off-grid on empty (not NULL); columns
        # without the contract stay NULL
        assert r.n_offgrid == (None if r.kind == "timestamp" else 0)


def test_quarantine_out_of_bounds_splits_on_audit_fences(spark):
    """clean ∪ quarantined == input exactly; NaN/Inf/magnitude/timestamp
    violations quarantine, NULLs pass (they are the downstream
    operators' documented modeling concern, not ingest corruption), and
    the per-column quarantine count equals the audit's
    n_oob + n_nonfinite."""
    import datetime as dt
    import math

    ok_t = dt.datetime(2026, 3, 1, 12, 0)
    ev = spark.createDataFrame(
        [
            (1, ok_t, 1, "view", 1.0, "{}"),
            (2, ok_t, 1, "view", 1.0e15, "{}"),
            (3, ok_t, 1, "view", math.nan, "{}"),
            (4, ok_t, 1, "view", math.inf, "{}"),
            (5, ok_t, 1, "view", None, "{}"),
            (6, dt.datetime(2099, 1, 1), 1, "view", 2.0, "{}"),
            (7, None, 1, "view", 2.0, "{}"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    clean, quarantined = profiling.quarantine_out_of_bounds(
        ev, ["value"], ["ts"]
    )
    assert {r.event_id for r in clean.collect()} == {1, 5, 7}
    assert {r.event_id for r in quarantined.collect()} == {2, 3, 4, 6}
    audit = {
        r.col_name: r
        for r in profiling.bounds_audit(ev, "events", ["value"], ["ts"]).collect()
    }
    assert audit["value"].n_oob + audit["value"].n_nonfinite == 3
    assert audit["ts"].n_oob == 1
