"""Distributed classical-ML primitives over embedding columns: the
aggregate-then-solve pattern (MLlib's own design for linear models at
scale) expressed directly in DataFrame ops — the sufficient statistics
(X^T X, X^T y) are partial+final hash aggregates that scale to any corpus,
and the final solve is an O(d^3) driver-side step on a d x d matrix,
which for embedding dims is microscopic. No gradient loop, no Python in
the scan path; the only driver transfer is d^2 + d doubles.

``ridge_probe`` has a FULL DuckDB oracle twin since round 6 (the 65x65
normal-equations solve is an unrolled Gauss-Jordan CTE chain in
``oracles.ridge_probe_sql``): every float aggregate uses the repo's
exact-integer micro-unit discipline (terms rounded to MICRO units before
summing — integer-valued doubles sum association-free, so Spark's
partial-aggregate order and DuckDB's single-threaded order agree
bit-for-bit) and the driver-side solve is plain-Python Gauss-Jordan
WITHOUT pivoting, in exactly the op order the SQL twin uses — identical
IEEE inputs + identical op order = bit-identical weights. No pivoting is
safe here: X^T X + lam*I is symmetric positive definite.
``logistic_probe`` gets the same treatment (round 6): the 3 IRLS
iterations unroll to ~220 generated CTEs in the twin — per-iteration
weights stay bit-identical because every cross-engine sum is micro-unit
exact, the one transcendental per iteration (the sigmoid) is rounded to
6dp on both sides so a 1-ulp libm difference dies before it can
compound, and the Newton solve is the same no-pivot Gauss-Jordan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# shared with oracles.ridge_probe_sql — the oracle is GENERATED from these
# (one-sided edits drift; the round-3 doc_stats lesson)
MICRO = 1e6  # micro-unit rounding quantum for association-free float sums
RIDGE_LAM = 1e-3
RIDGE_POS_LABEL = 0


def _micro(expr):
    """Exact-integer micro-unit term for association-free sums:
    ``floor(x*1e6 + 0.5)`` instead of ``round(x*1e6, 0)`` because this
    runs per (row x dim x dim) cell in the Hessian/X^T X aggregates —
    tens of millions of evaluations — and Spark's ROUND on doubles goes
    through BigDecimal (measured 2.8x on logistic_probe) while FLOOR is
    a bare Math.floor in codegen. Half-up-toward-+inf differs from
    round-half-away only at exact .5 ties on negative values; what
    matters is both engines compute the IDENTICAL function, so the SQL
    twin uses the same floor(x*1e6 + 0.5) expression. Cast back to
    double so both engines sum doubles (exact for integer values up to
    2^53 — at extreme corpus scale sum in decimal instead)."""
    return F.floor(expr * F.lit(MICRO) + F.lit(0.5)).cast("double")


def gauss_jordan_solve(
    cells: dict[tuple[int, int], float],
    rhs: dict[int, float],
    d: int,
    lam: float,
) -> list[float]:
    """Solve (A + lam*I) w = b by Gauss-Jordan elimination WITHOUT
    pivoting, in the exact operation order the SQL oracle twin unrolls:
    at step k every cell is recomputed from the PREVIOUS matrix as
    ``M[k][j]/piv`` (pivot row) or ``M[i][j] - M[i][k]*(M[k][j]/piv)``
    (division first, then multiply, then subtract). Identical inputs →
    bit-identical weights across Python and DuckDB, since both are bare
    IEEE-754 double ops with no FMA. Column k zeroes EXACTLY
    (M[i][k] - M[i][k]*1.0), so the result is the textbook reduced form."""
    M = [
        [cells.get((i, j), 0.0) + (lam if i == j else 0.0) for j in range(d)]
        + [rhs.get(i, 0.0)]
        for i in range(d)
    ]
    for k in range(d):
        piv = M[k][k]
        M = [
            [
                (M[k][j] / piv)
                if i == k
                else (M[i][j] - M[i][k] * (M[k][j] / piv))
                for j in range(d + 1)
            ]
            for i in range(d)
        ]
    return [M[i][d] for i in range(d)]


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
    embeddings: DataFrame,
    positive_label: int = RIDGE_POS_LABEL,
    lam: float = RIDGE_LAM,
) -> DataFrame:
    """Linear probe on the embedding space: closed-form ridge regression
    of the one-vs-rest label indicator on the (bias-augmented) vectors,
    then a distributed scoring pass — the standard representation-quality
    check ("are the classes linearly separable in this space?"), and the
    template for any normal-equations fit at 100 TB:

    1. sufficient statistics: X^T X ((d+1)^2 cells) and X^T y (d+1
       cells) as outer-product hash aggregates — one shuffle of partial
       sums, never a matrix on one node. Each cell is an exact-integer
       micro-unit sum (terms rounded to MICRO units first), so the cell
       values are identical across engines regardless of summation
       order — the precondition for the DuckDB oracle twin;
    2. solve (X^T X + lam*I) w = X^T y with ``gauss_jordan_solve`` on
       the driver (d+1 ~ 65: microseconds) — plain-Python, no-pivot,
       op-order-identical to the oracle's unrolled CTE chain;
    3. score distributedly: predictions via a broadcast weight frame
       joined on dim (micro-unit dot products), one more aggregate for
       RMSE + 0.5-threshold accuracy.

    Oracle twin: ``oracles.ridge_probe_sql`` — generated from the same
    MICRO/RIDGE_LAM/RIDGE_POS_LABEL constants this function defaults to.

    Returns one row: (n_vecs, rmse, accuracy, pos_rate)."""
    rows = _design_rows(embeddings, positive_label)
    a = rows.select("vec_id", F.col("dim").alias("i"), F.col("val").alias("vi"))
    b = rows.select("vec_id", F.col("dim").alias("j"), F.col("val").alias("vj"))
    xtx = (
        a.join(b, "vec_id")
        .groupBy("i", "j")
        .agg(
            F.sum(_micro(F.col("vi") * F.col("vj"))).alias("s")
        )
        .collect()  # sanctioned-collect: (d+1)^2 X^T X cells (~4k doubles)
    )
    xty = (
        rows.groupBy("dim")
        .agg(
            F.sum(_micro(F.col("val") * F.col("y"))).alias("s")
        )
        .collect()  # sanctioned-collect: d+1 X^T y cells
    )
    d = max(r.i for r in xtx) + 1
    cells = {(r.i, r.j): r.s / MICRO for r in xtx}
    rhs = {r.dim: r.s / MICRO for r in xty}
    w = gauss_jordan_solve(cells, rhs, d, lam)

    spark = embeddings.sparkSession
    wdf = spark.createDataFrame(
        [(int(i), float(w[i])) for i in range(d)], "dim long, w double"
    )
    scored = (
        rows.join(F.broadcast(wdf), "dim")
        .groupBy("vec_id", "y")
        .agg(
            (
                F.sum(_micro(F.col("val") * F.col("w"))) / F.lit(MICRO)
            ).alias("pred")
        )
    )
    err = F.col("pred") - F.col("y")
    hit = ((F.col("pred") > 0.5) == (F.col("y") > 0.5)).cast("long")
    return scored.agg(
        F.count("*").alias("n_vecs"),
        F.round(
            F.sqrt(
                F.sum(F.round(err * err * F.lit(MICRO), 0))
                / (F.count("*") * F.lit(MICRO))
            ),
            4,
        ).alias("rmse"),
        F.round(F.sum(hit).cast("double") / F.count("*"), 4).alias(
            "accuracy"
        ),
        F.round(F.avg("y"), 4).alias("pos_rate"),
    )


def _micro_dot(rows: DataFrame, wdf: DataFrame, out: str) -> DataFrame:
    """Per-vector dot product with a broadcast weight frame, as an
    exact-integer micro-unit sum: (vec_id, y, <out>) — the one scoring
    shape both probes share, bit-identical across engines."""
    return (
        rows.join(F.broadcast(wdf), "dim")
        .groupBy("vec_id", "y")
        .agg(
            (
                F.sum(_micro(F.col("val") * F.col("w"))) / F.lit(MICRO)
            ).alias(out)
        )
    )


def logistic_probe(
    embeddings: DataFrame,
    positive_label: int = RIDGE_POS_LABEL,
    n_iters: int = 3,
    lam: float = RIDGE_LAM,
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

    Determinism (round 6, enabling the DuckDB twin
    ``oracles.logistic_probe_sql``): every cross-engine aggregate is an
    exact-integer micro-unit sum; mu — the only transcendental — is
    rounded to 6dp each iteration so a 1-ulp exp() difference between
    libm implementations dies per step instead of compounding (the
    repo's iterative-float rule); the Newton solve is the no-pivot
    ``gauss_jordan_solve`` in the oracle's exact op order.

    Returns one row: (n_vecs, n_iters, accuracy, log_loss)."""
    rows = _design_rows(embeddings, positive_label).persist()
    d_frame = rows.agg(F.max("dim").alias("m")).collect()  # sanctioned-collect: 1 cell (feature dim)
    d = int(d_frame[0].m) + 1
    w = [0.0] * d
    spark = embeddings.sparkSession
    sigmoid = F.round(
        F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("eta"))), 6
    ).alias("mu")
    for _ in range(n_iters):
        wdf = spark.createDataFrame(
            [(int(i), float(w[i])) for i in range(d)], "dim long, w double"
        )
        mu = _micro_dot(rows, wdf, "eta").select("vec_id", "y", sigmoid)
        resid = mu.select(
            "vec_id",
            (F.col("y") - F.col("mu")).alias("r"),
            (F.col("mu") * (F.lit(1.0) - F.col("mu"))).alias("s"),
        )
        joined = rows.join(resid, "vec_id")
        grad_rows = (
            joined.groupBy("dim")
            .agg(
                F.sum(_micro(F.col("val") * F.col("r"))).alias("g")
            )
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
            .agg(
                F.sum(
                    _micro(F.col("vi") * F.col("vj") * F.col("s"))
                ).alias("h")
            )
            .collect()  # sanctioned-collect: (d+1)^2 Hessian cells
        )
        cells = {(r.i, r.j): r.h / MICRO for r in hess_rows}
        rhs = {r.dim: (r.g / MICRO) - lam * w[r.dim] for r in grad_rows}
        delta = gauss_jordan_solve(cells, rhs, d, lam)
        w = [w[i] + delta[i] for i in range(d)]
    wdf = spark.createDataFrame(
        [(int(i), float(w[i])) for i in range(d)], "dim long, w double"
    )
    final = _micro_dot(rows, wdf, "eta").select("y", sigmoid)
    eps = 1e-12
    ll = -(
        F.col("y") * F.log(F.col("mu") + F.lit(eps))
        + (F.lit(1.0) - F.col("y")) * F.log(F.lit(1.0) - F.col("mu") + F.lit(eps))
    )
    hit = ((F.col("mu") > 0.5) == (F.col("y") > 0.5)).cast("long")
    out = final.agg(
        F.count("*").alias("n_vecs"),
        F.lit(n_iters).cast("long").alias("n_iters"),
        F.round(F.sum(hit).cast("double") / F.count("*"), 4).alias(
            "accuracy"
        ),
        F.round(
            F.sum(F.round(ll * F.lit(MICRO), 0))
            / (F.count("*") * F.lit(MICRO)),
            4,
        ).alias("log_loss"),
    )
    rows.unpersist()
    return out
