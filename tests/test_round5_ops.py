"""Round-5 operators: temperature-scaled mixture weights, training-order
shuffle audit, and incremental (delta) dedup against a base fingerprint
index — planted-structure tests proving the semantics, not just shape."""

from __future__ import annotations

import pytest

from xboard_spark.operators import dedup, sampling


@pytest.fixture(scope="module")
def skewed_docs(spark):
    """900 en / 90 de / 10 zh — a deliberately skewed language mixture."""
    rows = []
    for i in range(1000):
        lang = "en" if i < 900 else ("de" if i < 990 else "zh")
        rows.append((i, f"doc {i} body text", lang, "web", 20))
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_temperature_mixture_upweights_low_resource(skewed_docs):
    out = {r.lang: r for r in sampling.temperature_mixture(skewed_docs).collect()}
    assert set(out) == {"en", "de", "zh"}
    # shares reflect the planted skew
    assert abs(out["en"].share - 0.9) < 1e-6
    assert abs(out["zh"].share - 0.01) < 1e-6
    # alpha<1 moves mass toward low-resource langs: zh up, en down
    assert out["zh"].sampling_factor > 1.0
    assert out["en"].sampling_factor < 1.0
    # temperature shares still form a distribution
    assert abs(sum(r.temp_share for r in out.values()) - 1.0) < 1e-4
    # monotone: rarer lang gets the larger up-weighting factor
    assert out["zh"].sampling_factor > out["de"].sampling_factor


def test_temperature_mixture_alpha_one_is_natural_sampling(skewed_docs):
    out = sampling.temperature_mixture(skewed_docs, alpha=1.0).collect()
    for r in out:
        assert abs(r.sampling_factor - 1.0) < 1e-4, r
        assert abs(r.temp_share - r.share) < 1e-4, r


def test_training_order_audit_conserves_and_shuffles(skewed_docs):
    out = sampling.training_order_audit(skewed_docs, n_shards=8).collect()
    assert len(out) == 8
    assert sum(r.n_docs for r in out) == 1000
    assert abs(sum(r.share for r in out) - 1.0) < 1e-4
    # hash-sharding is near-balanced (no shard > 2x the uniform share)
    assert max(r.n_docs for r in out) < 2 * (1000 / 8)
    # shuffledness: consecutive training examples come from far-apart
    # source positions — a sorted (unshuffled) order would give gap ~= 8
    # (every 8th doc lands in the same shard); the hash order gives ~n/3
    assert all(r.mean_source_gap > 100 for r in out)


def test_training_order_audit_salt_changes_order_not_balance(skewed_docs):
    a = sampling.training_order_audit(skewed_docs, salt="epoch-1").collect()
    b = sampling.training_order_audit(skewed_docs, salt="epoch-2").collect()
    assert sum(r.n_docs for r in a) == sum(r.n_docs for r in b) == 1000
    # different epoch salts really produce different shard assignments
    assert [r.n_docs for r in a] != [r.n_docs for r in b] or [
        round(r.mean_source_gap, 3) for r in a
    ] != [round(r.mean_source_gap, 3) for r in b]
    # and each is itself deterministic
    a2 = sampling.training_order_audit(skewed_docs, salt="epoch-1").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in a2]


@pytest.fixture(scope="module")
def delta_docs(spark):
    """doc_id % 5 == 0 is the incoming batch. Planted:
    - doc 0  duplicates base doc 1   (dup_vs_base)
    - docs 5 and 10 duplicate each other but no base doc
      (5 -> new_unique, 10 -> dup_within_batch; min doc_id wins)
    - doc 15 is unique                (new_unique)
    - doc 20 duplicates base doc 21 AND incoming doc 25:
      both 20 and 25 are dup_vs_base (base index has precedence)
    """
    rows = [
        (0, "shared with base one", "web"),
        (1, "shared with base one", "web"),          # base
        (2, "base only text a", "web"),              # base
        (5, "batch internal dup", "wiki"),
        (10, "batch internal dup", "wiki"),
        (15, "totally unique text", "wiki"),
        (20, "tri duplicate text", "web"),
        (21, "tri duplicate text", "web"),           # base
        (25, "tri duplicate text", "web"),
        (3, "base only text b", "wiki"),             # base
    ]
    return spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, t, s in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_delta_dedup_classifies_planted_duplicates(delta_docs):
    out = {r.source: r for r in dedup.delta_dedup_stats(delta_docs).collect()}
    # web incoming: 0 (vs base), 20 + 25 (vs base via doc 21)
    assert out["web"].n_incoming == 3
    assert out["web"].n_dup_vs_base == 3
    assert out["web"].n_dup_within_batch == 0
    assert out["web"].n_new_unique == 0
    # wiki incoming: 5 (new unique), 10 (within-batch dup of 5), 15 (unique)
    assert out["wiki"].n_incoming == 3
    assert out["wiki"].n_dup_vs_base == 0
    assert out["wiki"].n_dup_within_batch == 1
    assert out["wiki"].n_new_unique == 2


def test_delta_dedup_counts_are_a_partition(delta_docs):
    for r in dedup.delta_dedup_stats(delta_docs).collect():
        assert (
            r.n_dup_vs_base + r.n_dup_within_batch + r.n_new_unique
            == r.n_incoming
        )


def test_zipf_fit_recovers_planted_power_law(spark):
    # word_r appears floor(200/r) times -> freq ~ 1/rank, slope ~ -1
    rows = []
    doc_words = []
    for r in range(1, 41):
        doc_words += [f"w{r:02d}"] * (200 // r)
    # spread across a few docs so the plan is non-trivial
    for i in range(10):
        rows.append((i, " ".join(doc_words[i::10]), "en", "web", 100))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    from xboard_spark.operators.text import zipf_fit

    out = zipf_fit(docs).collect()[0]
    assert out.n_terms == 40
    assert -1.2 < out.slope < -0.8, out
    assert out.r2 > 0.95, out


def test_bpe_merge_candidates_exact_counts(spark):
    docs = spark.createDataFrame(
        [(0, "aaab aaab", "en", "web", 9), (1, "abba", "en", "web", 4)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    from xboard_spark.operators.text import bpe_merge_candidates

    out = {r.pair: r.cnt for r in bpe_merge_candidates(docs).collect()}
    # aaab x2 -> aa,aa,ab each occurrence; abba -> ab,bb,ba
    assert out == {"aa": 4, "ab": 3, "bb": 1, "ba": 1}


def test_epochs_plan_identity_and_upweighting(skewed_docs):
    out = {r.lang: r for r in sampling.epochs_plan(skewed_docs).collect()}
    # temperature mixture repeats low-resource langs more
    assert out["zh"].epochs > out["de"].epochs > out["en"].epochs
    # budget=1x, alpha=1 (natural sampling) => exactly one epoch of each
    nat = sampling.epochs_plan(skewed_docs, budget_factor=1.0, alpha=1.0)
    for r in nat.collect():
        assert abs(r.epochs - 1.0) < 1e-3, r
        assert not r.repeat_warning
    # token accounting: shares sum to 1
    assert abs(sum(r.token_share for r in out.values()) - 1.0) < 1e-4


def test_incremental_nation_rollup_cutoff_invariant(spark):
    """The defining IVM contract: merging base partials with the delta's
    partials must equal the full recompute at EVERY cutoff — including
    the degenerate all-base and all-delta splits."""
    from xboard_spark.operators import incremental
    from xboard_spark.io import read_table

    sf = "/root/testdata/sf0.001"
    orders = read_table(spark, sf, "orders")
    customer = read_table(spark, sf, "customer")
    nation = read_table(spark, sf, "nation")
    results = []
    for cutoff in ["1900-01-01", "1995-06-15", "1997-01-01", "2999-01-01"]:
        rows = incremental.incremental_nation_rollup(
            orders, customer, nation, cutoff=cutoff
        ).collect()
        results.append([tuple(r) for r in rows])
    assert all(r == results[0] for r in results[1:])
    assert len(results[0]) == 25  # every nation present


def test_customer_order_distribution_includes_zero_bucket(spark):
    from xboard_spark.operators import tpch

    customer = spark.createDataFrame(
        [(1, "a", 0, 0.0, "SEG"), (2, "b", 0, 0.0, "SEG"), (3, "c", 0, 0.0, "SEG")],
        "c_custkey long, c_name string, c_nationkey long, c_acctbal double, c_mktsegment string",
    )
    orders = spark.createDataFrame(
        [(10, 1, "O", 5.0, "1996-01-01", "P"), (11, 1, "O", 5.0, "1996-01-02", "P")],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, o_orderdate string, o_orderpriority string",
    )
    out = {r.n_orders: r.n_customers
           for r in tpch.customer_order_distribution(customer, orders).collect()}
    # cust 1 has 2 orders; custs 2,3 have ZERO — the left-join point
    assert out == {2: 1, 0: 2}


def test_small_qty_part_revenue_decorrelated_threshold(spark):
    from xboard_spark.operators import tpch

    part = spark.createDataFrame(
        [(1, "p1", "Brand#13", "T", 1, 1.0), (2, "p2", "Brand#99", "T", 1, 1.0)],
        "p_partkey long, p_name string, p_brand string, p_type string, p_size long, p_retailprice double",
    )
    # part 1 avg qty = 10 -> cut 2.0; rows with qty 1 qualify, qty 19 not.
    # part 2 is the wrong brand entirely.
    li_rows = [(100, 1, 1, 1, 1.0, 50.0), (100, 1, 1, 2, 19.0, 999.0),
               (101, 1, 1, 1, 10.0, 999.0), (102, 2, 1, 1, 1.0, 999.0)]
    lineitem = spark.createDataFrame(
        li_rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long, l_quantity double, l_extendedprice double",
    )
    out = tpch.small_qty_part_revenue(lineitem, part).collect()[0]
    assert out.n_small_lineitems == 1           # only the qty-1 Brand#13 row
    assert abs(out.avg_yearly - 50.0 / 7.0) < 0.01


def test_large_volume_orders_threshold_semantics(spark):
    from xboard_spark.operators import tpch

    customer = spark.createDataFrame(
        [(1, "big", 0, 0.0, "S")],
        "c_custkey long, c_name string, c_nationkey long, c_acctbal double, c_mktsegment string",
    )
    orders = spark.createDataFrame(
        [(10, 1, "O", 100.0, "1996-01-01", "P"), (11, 1, "O", 200.0, "1996-01-02", "P")],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, o_orderdate string, o_orderpriority string",
    )
    lineitem = spark.createDataFrame(
        [(10, 1, 1, 1, 301.0, 1.0), (11, 1, 1, 1, 300.0, 1.0)],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long, l_quantity double, l_extendedprice double",
    )
    out = tpch.large_volume_orders(customer, orders, lineitem).collect()
    # strictly-greater threshold: order 10 (301) in, order 11 (300) out
    assert [r.o_orderkey for r in out] == [10]
    assert out[0].total_qty == 301.0


def _py_bpe(word_freqs, n_merges):
    """Pure-Python reference BPE trainer (Sennrich alg. 1 on a freq dict)."""
    vocab = {tuple(w): f for w, f in word_freqs.items()}
    merges = []
    for _ in range(n_merges):
        counts = {}
        for syms, f in vocab.items():
            for p in zip(syms, syms[1:]):
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        # count desc, then lexicographic — the operator's tie-break
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, a + b, cnt))
        new_vocab = {}
        for syms, f in vocab.items():
            out = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


def test_bpe_learn_matches_reference_trainer(spark):
    from xboard_spark.operators.text import bpe_learn

    words = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    text_blob = " ".join(
        w for w, f in sorted(words.items()) for _ in range(f)
    )
    docs = spark.createDataFrame(
        [(0, text_blob, "en", "web", len(text_blob))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = [
        (r.left, r.right, r.merged, r.pair_count)
        for r in sorted(bpe_learn(docs, n_merges=4).collect(),
                        key=lambda r: r.round)
    ]
    want = _py_bpe(words, 4)
    assert got == want, (got, want)
    # the classic outcome: 'es'/'est' family merges dominate ("newest" +
    # "widest" share the suffix with total freq 9)
    assert got[0][:2] == ("e", "s") and got[0][3] == 9


def test_bpe_learn_caps_driver_paced_merges(spark):
    """VERDICT r11 #6: the merge loop is one Spark job per round, so a
    production-sized n_merges must fail LOUDLY with the sample-then-train
    pointer instead of silently scheduling thousands of barriers."""
    import pytest

    from xboard_spark.operators.text import MAX_BPE_MERGES, bpe_learn

    docs = spark.createDataFrame(
        [(0, "low lower", "en", "web", 9)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with pytest.raises(ValueError, match="sample-then-train"):
        bpe_learn(docs, n_merges=MAX_BPE_MERGES + 1)


def test_hard_negative_mining_planted_geometry(spark):
    from xboard_spark.operators.similarity import hard_negative_mining

    # 2-d toy space. Query 0 (label 0) at (1,0); same-label friend at
    # (0.95, 0.05); wrong-label vectors at increasing angles — the
    # hardest negative must be the closest wrong-label one (vec 2).
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.95, 0.05], 0),
        (2, [0.9, 0.2], 1),    # hardest negative for q=0
        (3, [0.5, 0.5], 1),
        (4, [0.0, 1.0], 1),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label long"
    )
    out = hard_negative_mining(emb, n_queries=1, k=4).collect()
    assert len(out) == 1
    r = out[0]
    assert r.label == 0 and r.n_queries_with_negatives == 1
    import math

    expect = (0.9 * 1.0 + 0.2 * 0.0) / (math.hypot(0.9, 0.2) * 1.0)
    assert abs(r.avg_hardest_neg_cos - round(expect, 6)) < 2e-6
    # vec 1 (same label, cos ~0.9986) outranks it, so the hardest
    # negative sits at rank 2 of the cosine ordering
    assert r.avg_hardest_neg_rank == 2.0


def test_zipf_fit_flat_on_uniform_corpus(spark):
    """Negative control: a uniform-frequency vocabulary has NO power law —
    the fitted slope must be ~0 (every word 10 times), distinguishing the
    health check from one that always reports 'zipfian'."""
    from xboard_spark.operators.text import zipf_fit

    words = [f"word{i:03d}" for i in range(50)]
    text_blob = " ".join(w for w in words for _ in range(10))
    docs = spark.createDataFrame(
        [(0, text_blob, "en", "web", len(text_blob))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = zipf_fit(docs).collect()[0]
    assert out.n_terms == 50
    assert abs(out.slope) < 0.05, out
    # near-zero y-variance: after 6dp sum rounding the r2 denominator is
    # either exactly 0 (both engines emit NULL via the round-6 nullif
    # guard — never engine-dependent 0/0 IEEE behavior) or a tiny
    # residual making r2 ~ 0; both are deterministic cross-engine
    assert out.r2 is None or abs(out.r2) < 1e-6, out
