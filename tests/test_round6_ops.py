"""Round-6 operator semantics: the PII redaction audit and the
quality x duplication correlation."""

from __future__ import annotations

import pytest

from xboard_spark.operators.curation import quality_dup_correlation
from xboard_spark.operators.text import pii_redact_stats, redact_pii

DOC_SCHEMA = "doc_id long, lang string, source string, text string"


def _docs(spark, rows):
    return spark.createDataFrame(rows, DOC_SCHEMA)


def test_pii_redact_stats_counts_and_char_accounting(spark):
    docs = _docs(
        spark,
        [
            (1, "en", "web", "contact bob@example.com or 415-555-1234 today"),
            (2, "en", "web", "totally clean text"),
            (3, "en", "mail", "a@b.io c@d.io"),
        ],
    )
    out = {r.source: r for r in pii_redact_stats(docs).collect()}
    web, mail = out["web"], out["mail"]
    assert web.n_docs == 2 and web.docs_redacted == 1
    assert web.emails_redacted == 1 and web.phones_redacted == 1
    assert mail.emails_redacted == 2 and mail.phones_redacted == 0
    # char accounting must equal what the actual transform produces
    redacted = {r.doc_id: r.text for r in redact_pii(docs).collect()}
    assert redacted[1] == "contact [EMAIL] or [PHONE] today"
    expected_after = sum(len(redacted[i]) for i in (1, 2))
    assert web.chars_after == expected_after
    assert web.chars_before == sum(
        len(t)
        for t in (
            "contact bob@example.com or 415-555-1234 today",
            "totally clean text",
        )
    )


def test_pii_redact_stats_phone_counted_after_email_redaction(spark):
    # a phone-shaped digit run INSIDE an email must not double-count:
    # the email is replaced first, so the phone matcher never sees it
    docs = _docs(spark, [(1, "en", "web", "mail 415-555-1234@example.com")])
    r = pii_redact_stats(docs).collect()[0]
    assert r.emails_redacted == 1
    assert r.phones_redacted == 0


def test_quality_dup_correlation_planted_bands(spark):
    # low-alpha docs duplicated, high-alpha docs unique
    junk = "!!! 1234 ??? 5678 ###"  # alpha_ratio = 0 -> band 0
    prose = "entirely alphabetic words here"  # high alpha -> band 8/9
    rows = (
        [(i, "en", "web", junk) for i in range(4)]
        + [(10 + i, "en", "web", f"{prose} variant {i}") for i in range(4)]
    )
    out = {r.alpha_band: r for r in quality_dup_correlation(_docs(spark, rows)).collect()}
    low = out[0]
    assert low.n_docs == 4 and low.n_dup_docs == 4 and low.dup_rate == 1.0
    high_bands = [b for b in out if b != 0]
    assert sum(out[b].n_docs for b in high_bands) == 4
    assert all(out[b].n_dup_docs == 0 for b in high_bands)


def test_quality_dup_correlation_band_is_capped_at_9(spark):
    # alpha_ratio exactly 1.0 would floor to band 10 without the cap
    docs = _docs(spark, [(1, "en", "web", "onlyletters")])
    r = quality_dup_correlation(docs).collect()
    assert [x.alpha_band for x in r] == [9]


def test_sole_late_suppliers_planted_semantics(spark):
    """Q21 shape on a planted graph: only the supplier who was the SOLE
    late supplier of a finalized multi-supplier order is counted."""
    import datetime as dt

    from xboard_spark.operators.tpch import sole_late_suppliers

    d0 = dt.datetime(1995, 1, 1)
    late = d0 + dt.timedelta(days=90)
    ontime = d0 + dt.timedelta(days=5)
    orders = spark.createDataFrame(
        [
            (1, 10, "F", 0.0, d0, "1-URGENT"),   # multi-supplier, s1 sole late
            (2, 10, "F", 0.0, d0, "1-URGENT"),   # multi-supplier, BOTH late
            (3, 10, "F", 0.0, d0, "1-URGENT"),   # single-supplier, late
            (4, 10, "O", 0.0, d0, "1-URGENT"),   # not finalized
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    li_rows = [
        (1, 1, late), (1, 2, ontime),
        (2, 1, late), (2, 2, late),
        (3, 1, late),
        (4, 1, late), (4, 2, ontime),
    ]
    lineitem = spark.createDataFrame(
        [(o, 0, s, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", ship)
         for o, s, ship in li_rows],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    )
    supplier = spark.createDataFrame(
        [(1, "Supplier#1", 0, 0.0), (2, "Supplier#2", 0, 0.0)],
        "s_suppkey long, s_name string, s_nationkey long, s_acctbal double",
    )
    out = sole_late_suppliers(lineitem, orders, supplier).collect()
    # order 1: counted for s1; order 2: two late suppliers -> nobody;
    # order 3: single-supplier -> nobody; order 4: not finalized
    assert [(r.s_suppkey, r.numwait) for r in out] == [(1, 1)]


def test_bootstrap_coin_weights_follow_poisson1(spark):
    """The hash-once affine coin must still draw Poisson(1)-distributed
    replica weights: over rows x replicas the empirical weight histogram
    should track the quantized inverse-CDF bucket widths (the property
    the md5-per-(row,replica) coin had by construction — this pins that
    the cheaper coin keeps it)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from xboard_spark.functions.portable_hash import (
        MINHASH_P,
        _X_MASK,
        fingerprint64,
        minhash_params,
    )
    from xboard_spark.operators.sampling import BOOT_SEED, POISSON1_CDF

    n_rows, n_replicas = 500, 32
    orders = spark.createDataFrame(
        [(i, 100.0) for i in range(n_rows)],
        "o_orderkey long, o_totalprice double",
    )
    params = minhash_params(n_replicas, seed=BOOT_SEED)
    reps = F.array(
        *[
            F.struct(
                F.lit(a).alias("ha"), F.lit(b).alias("hb")
            )
            for a, b in params
        ]
    )
    fp0 = fingerprint64(F.concat_ws(":", F.lit("boot-v1"), F.col("o_orderkey")))
    u = (
        (
            F.col("x") * F.col("r.ha") + F.col("r.hb")
        )
        % F.lit(MINHASH_P)
        % 1_000_000
    ) / 1_000_000.0
    w = F.lit(5)
    for k in reversed(range(len(POISSON1_CDF))):
        w = F.when(u < POISSON1_CDF[k], F.lit(k)).otherwise(w)
    hist = {
        r.w: r.n
        for r in orders.withColumn("x", fp0.bitwiseAND(F.lit(_X_MASK)))
        .select("x", F.explode(reps).alias("r"))
        .select(w.alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    total = n_rows * n_replicas
    expected = [POISSON1_CDF[0]] + [
        POISSON1_CDF[k] - POISSON1_CDF[k - 1]
        for k in range(1, len(POISSON1_CDF))
    ]
    for k, p in enumerate(expected):
        # 4-sigma binomial tolerance — deterministic inputs, so this
        # either always passes or flags a genuinely broken coin.
        sigma = (total * p * (1 - p)) ** 0.5
        assert abs(hist.get(k, 0) - total * p) < 4 * sigma + 1


def test_bootstrap_replica_weights_decorrelated(spark):
    """ADVICE r6: the affine family gives pairwise-UNCORRELATED replica
    coins, and the histogram test above only pins the marginal — pin the
    cross-replica structure empirically too: over a deterministic corpus
    the pairwise Pearson correlation between replica weight vectors must
    be indistinguishable from independent draws (|rho| < ~4/sqrt(n))."""
    import numpy as np
    from pyspark.sql import functions as F

    from xboard_spark.functions.portable_hash import (
        MINHASH_P,
        _X_MASK,
        fingerprint64,
        minhash_params,
    )
    from xboard_spark.operators.sampling import BOOT_SEED, POISSON1_CDF

    n_rows, n_replicas = 600, 16
    orders = spark.createDataFrame(
        [(i, 100.0) for i in range(n_rows)],
        "o_orderkey long, o_totalprice double",
    )
    params = minhash_params(n_replicas, seed=BOOT_SEED)
    reps = F.array(
        *[
            F.struct(
                F.lit(i).alias("b"), F.lit(a).alias("ha"), F.lit(b).alias("hb")
            )
            for i, (a, b) in enumerate(params)
        ]
    )
    fp0 = fingerprint64(
        F.concat_ws(":", F.lit("boot-v1"), F.col("o_orderkey"))
    )
    u = (
        (F.col("x") * F.col("r.ha") + F.col("r.hb"))
        % F.lit(MINHASH_P)
        % 1_000_000
    ) / 1_000_000.0
    w = F.lit(5)
    for k in reversed(range(len(POISSON1_CDF))):
        w = F.when(u < POISSON1_CDF[k], F.lit(k)).otherwise(w)
    rows = (
        orders.withColumn("x", fp0.bitwiseAND(F.lit(_X_MASK)))
        .select("o_orderkey", "x", F.explode(reps).alias("r"))
        .select("o_orderkey", F.col("r.b").alias("b"), w.alias("w"))
        .collect()
    )
    mat = np.zeros((n_rows, n_replicas))
    for r in rows:
        mat[r.o_orderkey, r.b] = r.w
    corr = np.corrcoef(mat.T)
    off_diag = corr[~np.eye(n_replicas, dtype=bool)]
    # independent Poisson vectors of length n have rho ~ N(0, 1/sqrt(n));
    # 4.5 sigma over 120 pairs keeps the deterministic check stable while
    # catching any systematic cross-replica coupling (rho ~ O(1))
    assert np.abs(off_diag).max() < 4.5 / np.sqrt(n_rows)


def test_suff_stats_matches_numpy_outer_product(spark):
    """The fused sufficient-statistics pass (round-6 probe rewrite) must
    equal the dense outer products it replaced: X^T diag(s) X and
    X^T r, computed by numpy on the same micro-rounded terms."""
    import math

    import numpy as np
    from pyspark.sql import functions as F

    from xboard_spark.operators.ml import MICRO, _design_arr, _suff_stats

    rng = np.random.default_rng(5)
    X = rng.normal(0, 1, (40, 4)).round(4)
    labels = (rng.random(40) < 0.3).astype(int)
    emb = spark.createDataFrame(
        [
            (i, [float(v) for v in X[i]], int(labels[i]))
            for i in range(40)
        ],
        "vec_id long, embedding array<double>, label long",
    )
    df, d = _design_arr(emb, positive_label=0)
    assert d == 5
    r_mul = F.col("y") * 2.0 - 1.0
    s_mul = F.col("y") + 0.5
    cells, rhs = _suff_stats(df, d, rhs_mul=r_mul, hess_mul=s_mul)

    Xb = np.hstack([np.ones((40, 1)), X])
    y = (labels == 0).astype(float)
    r = y * 2.0 - 1.0
    s = y + 0.5

    def micro(x):
        return math.floor(x * MICRO + 0.5)

    for i in range(d):
        for j in range(d):
            want = sum(micro(Xb[k, i] * Xb[k, j] * s[k]) for k in range(40))
            assert cells[(i, j)] == want / MICRO, (i, j)
        want = sum(micro(Xb[k, i] * r[k]) for k in range(40))
        assert rhs[i] == want / MICRO, i
