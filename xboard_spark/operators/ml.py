"""Distributed classical-ML primitives over embedding columns: the
aggregate-then-solve pattern (MLlib's own design for linear models at
scale) expressed directly in DataFrame ops — the sufficient statistics
(X^T X, X^T y) are partial+final hash aggregates that scale to any corpus,
and the final solve is an O(d^3) driver-side step on a d x d matrix,
which for embedding dims is microscopic. No gradient loop, no Python in
the scan path; the only driver transfer is d^2 + d doubles.

Rows-only in the driver gate by design: a 65x65 linear solve has no
ANSI-SQL twin; correctness is pinned by exact-recovery pytest
(planted linear data, separable classes) instead.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _design_rows(embeddings: DataFrame, positive_label: int) -> DataFrame:
    """Row-form (vec_id, dim, val, y): dim 0 is the bias feature (1.0),
    dims 1..D the embedding; y = 1.0 iff label == positive_label."""
    y = (F.col("label") == positive_label).cast("double")
    base = embeddings.select(
        "vec_id",
        F.posexplode("embedding").alias("pos", "v"),
        y.alias("y"),
    ).select(
        "vec_id",
        (F.col("pos") + 1).cast("long").alias("dim"),
        F.col("v").cast("double").alias("val"),
        "y",
    )
    bias = embeddings.select(
        "vec_id",
        F.lit(0).cast("long").alias("dim"),
        F.lit(1.0).alias("val"),
        y.alias("y"),
    )
    return base.unionByName(bias)


def ridge_probe(
    embeddings: DataFrame, positive_label: int = 0, lam: float = 1e-3
) -> DataFrame:
    """Linear probe on the embedding space: closed-form ridge regression
    of the one-vs-rest label indicator on the (bias-augmented) vectors,
    then a distributed scoring pass — the standard representation-quality
    check ("are the classes linearly separable in this space?"), and the
    template for any normal-equations fit at 100 TB:

    1. sufficient statistics: X^T X ((d+1)^2 cells) and X^T y (d+1
       cells) as outer-product hash aggregates — one shuffle of partial
       sums, never a matrix on one node;
    2. solve (X^T X + lam*I) w = X^T y with numpy on the driver (d+1 ~
       65: microseconds);
    3. score distributedly: predictions via a broadcast weight frame
       joined on dim, one more aggregate for RMSE + 0.5-threshold
       accuracy.

    Returns one row: (n_vecs, rmse, accuracy, pos_rate)."""
    rows = _design_rows(embeddings, positive_label)
    a = rows.select("vec_id", F.col("dim").alias("i"), F.col("val").alias("vi"))
    b = rows.select("vec_id", F.col("dim").alias("j"), F.col("val").alias("vj"))
    xtx = (
        a.join(b, "vec_id")
        .groupBy("i", "j")
        .agg(F.sum(F.col("vi") * F.col("vj")).alias("s"))
        .collect()  # sanctioned-collect: (d+1)^2 X^T X cells (~4k doubles)
    )
    xty = (
        rows.groupBy("dim")
        .agg(F.sum(F.col("val") * F.col("y")).alias("s"))
        .collect()  # sanctioned-collect: d+1 X^T y cells
    )
    d = max(r.i for r in xtx) + 1
    A = np.zeros((d, d))
    for r in xtx:
        A[r.i, r.j] = r.s
    bvec = np.zeros(d)
    for r in xty:
        bvec[r.dim] = r.s
    w = np.linalg.solve(A + lam * np.eye(d), bvec)

    spark = embeddings.sparkSession
    wdf = spark.createDataFrame(
        [(int(i), float(w[i])) for i in range(d)], "dim long, w double"
    )
    scored = (
        rows.join(F.broadcast(wdf), "dim")
        .groupBy("vec_id", "y")
        .agg(F.sum(F.col("val") * F.col("w")).alias("pred"))
    )
    err = F.col("pred") - F.col("y")
    hit = ((F.col("pred") > 0.5) == (F.col("y") > 0.5)).cast("long")
    return scored.agg(
        F.count("*").alias("n_vecs"),
        F.round(F.sqrt(F.avg(err * err)), 4).alias("rmse"),
        F.round(F.sum(hit) / F.count("*"), 4).alias("accuracy"),
        F.round(F.avg("y"), 4).alias("pos_rate"),
    )


def logistic_probe(
    embeddings: DataFrame,
    positive_label: int = 0,
    n_iters: int = 3,
    lam: float = 1e-3,
) -> DataFrame:
    """Logistic-regression probe by IRLS (Newton) — the ITERATIVE form of
    the aggregate-then-solve pattern: each iteration computes the
    gradient X^T (y - mu) and Hessian X^T S X as distributed aggregates
    (the scoring pass that produces mu broadcasts the current weights —
    d+1 doubles — never the data), solves the (d+1)^2 damped Newton
    system on the driver, and repeats. Three iterations of Newton on a
    well-scaled probe is effectively converged; per-iteration cluster
    cost is one scoring join plus one outer-product aggregate, identical
    shape every round.

    Returns one row: (n_vecs, n_iters, accuracy, log_loss)."""
    rows = _design_rows(embeddings, positive_label).persist()
    d_frame = rows.agg(F.max("dim").alias("m")).collect()  # sanctioned-collect: 1 cell (feature dim)
    d = int(d_frame[0].m) + 1
    w = np.zeros(d)
    spark = embeddings.sparkSession
    for _ in range(n_iters):
        wdf = spark.createDataFrame(
            [(int(i), float(w[i])) for i in range(d)], "dim long, w double"
        )
        eta = (
            rows.join(F.broadcast(wdf), "dim")
            .groupBy("vec_id", "y")
            .agg(F.sum(F.col("val") * F.col("w")).alias("eta"))
        )
        mu = eta.select(
            "vec_id",
            "y",
            (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("eta")))).alias("mu"),
        )
        resid = mu.select(
            "vec_id",
            (F.col("y") - F.col("mu")).alias("r"),
            (F.col("mu") * (1.0 - F.col("mu"))).alias("s"),
        )
        joined = rows.join(resid, "vec_id")
        grad_rows = (
            joined.groupBy("dim")
            .agg(F.sum(F.col("val") * F.col("r")).alias("g"))
            .collect()  # sanctioned-collect: d+1 gradient cells
        )
        a = joined.select(
            "vec_id", F.col("dim").alias("i"), F.col("val").alias("vi"), "s"
        )
        b = rows.select(
            "vec_id", F.col("dim").alias("j"), F.col("val").alias("vj")
        )
        hess_rows = (
            a.join(b, "vec_id")
            .groupBy("i", "j")
            .agg(F.sum(F.col("vi") * F.col("vj") * F.col("s")).alias("h"))
            .collect()  # sanctioned-collect: (d+1)^2 Hessian cells
        )
        g = np.zeros(d)
        for r in grad_rows:
            g[r.dim] = r.g
        H = np.zeros((d, d))
        for r in hess_rows:
            H[r.i, r.j] = r.h
        w = w + np.linalg.solve(H + lam * np.eye(d), g - lam * w)
    wdf = spark.createDataFrame(
        [(int(i), float(w[i])) for i in range(d)], "dim long, w double"
    )
    final = (
        rows.join(F.broadcast(wdf), "dim")
        .groupBy("vec_id", "y")
        .agg(F.sum(F.col("val") * F.col("w")).alias("eta"))
        .select(
            "y",
            (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("eta")))).alias("mu"),
        )
    )
    eps = 1e-12
    ll = -(
        F.col("y") * F.log(F.col("mu") + eps)
        + (1.0 - F.col("y")) * F.log(1.0 - F.col("mu") + eps)
    )
    hit = ((F.col("mu") > 0.5) == (F.col("y") > 0.5)).cast("long")
    out = final.agg(
        F.count("*").alias("n_vecs"),
        F.lit(n_iters).cast("long").alias("n_iters"),
        F.round(F.sum(hit) / F.count("*"), 4).alias("accuracy"),
        F.round(F.avg(ll), 4).alias("log_loss"),
    )
    rows.unpersist()
    return out
