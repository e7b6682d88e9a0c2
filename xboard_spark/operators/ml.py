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


def _design_arr(embeddings: DataFrame, positive_label: int):
    """Array-form design matrix (arr, y): ``arr[0]`` the bias 1.0,
    ``arr[1..D]`` the embedding; y = 1.0 iff label == positive_label.
    Returns (frame, d) with d = D + 1 (one tiny job to read D).

    Rows missing vec_id, embedding, or label are EXCLUDED up front (the
    ``_norm_corpus`` treatment): a supervised probe trains on identified,
    labeled, vector-bearing rows only. Found by the round-10 null-key
    sweep — without the filter the engines diverge three ways on such
    rows: Spark's count(*) kept them in n_vecs while their NULL terms
    silently vanished from every sum, the twin's vec_id-keyed design
    join collapsed all NULL-vec_id rows into ONE row, and the twin's
    CASE read a NULL label as y = 0.0 where Spark read NULL.

    Array form, not long form: the round-5 shape exploded to one row
    per (vec, dim) and built X^T X by self-joining on vec_id — two
    exchanges of |rows|*d rows plus join machinery before the cell
    aggregate. Keeping the vector whole lets every sufficient statistic
    generate from the row in place (``_suff_stats``) and every dot
    product stay a per-row ``zip_with`` fold — no shuffle anywhere
    except the final (d+1)^2-key cell aggregate, whose map-side partials
    bound the exchange by d^2 * partitions regardless of corpus size."""
    embeddings = embeddings.filter(
        F.col("vec_id").isNotNull()
        & F.col("embedding").isNotNull()
        & F.col("label").isNotNull()
    )
    head = embeddings.select(F.size("embedding").alias("s")).first()  # sanctioned-collect: 1 cell (feature dim)
    if head is None:
        # an empty design matrix has no feature dimension and no solvable
        # normal equations — fail with the reason, not a bare
        # NoneType AttributeError (found by the round-10 empty-table sweep)
        raise ValueError(
            "ridge/logistic probe: embeddings table is empty — "
            "no rows to read the feature dimension from"
        )
    d = int(head.s) + 1
    y = (F.col("label") == positive_label).cast("double")
    arr = F.concat(
        F.array(F.lit(1.0)), F.col("embedding").cast("array<double>")
    )
    return embeddings.select(arr.alias("arr"), y.alias("y")), d


def _suff_stats(df: DataFrame, d: int, rhs_mul, hess_mul):
    """ONE distributed pass for a Newton/normal-equations step: the
    upper triangle of X^T diag(hess_mul) X plus the rhs vector
    X^T rhs_mul, fused into a single (i, j)-keyed aggregate (j = -1
    marks rhs cells). Returns (cells, rhs) dicts in real units, with
    the lower triangle mirrored driver-side — legal because
    micro(arr[i]*arr[j]*m) is symmetric in (i, j) exactly (double
    multiplication is commutative), so cell (j, i) equals (i, j)
    bit-for-bit and the SQL oracle twin (which sums the full square)
    matches without change.

    Every term is an exact-integer micro-unit (``_micro``), so the
    generate order here vs the oracle's row order vs the round-5
    join order all sum to the identical integer."""
    pairs = df.select(
        F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("i"),
        "arr",
        rhs_mul.alias("m1"),
        hess_mul.alias("m2"),
    ).select(
        "i",
        F.explode(
            F.concat(
                F.sequence(F.col("i"), F.lit(d - 1)),
                F.array(F.lit(-1)),
            )
        ).alias("j"),
        "arr",
        "m1",
        "m2",
    )
    vi = F.element_at("arr", F.col("i").cast("int") + 1)
    # j = -1 marks rhs cells; clamp the lookup so the expression is a
    # valid array index on EVERY row (the CASE WHEN below never reads
    # vj on sentinel rows, but correctness must not depend on lazy
    # branch evaluation surviving future optimizer/ANSI changes).
    vj = F.element_at(
        "arr", F.greatest(F.col("j"), F.lit(0)).cast("int") + 1
    )
    term = F.when(F.col("j") >= 0, vi * vj * F.col("m2")).otherwise(
        vi * F.col("m1")
    )
    out = (
        pairs.groupBy("i", "j")
        .agg(F.sum(_micro(term)).alias("s"))
        .collect()  # sanctioned-collect: (d+1)(d+2)/2 + (d+1) cells (~2.2k doubles at d=65)
    )
    cells: dict[tuple[int, int], float] = {}
    rhs: dict[int, float] = {}
    for r in out:
        if r.j < 0:
            rhs[r.i] = r.s / MICRO
        else:
            cells[(r.i, r.j)] = r.s / MICRO
            cells[(r.j, r.i)] = r.s / MICRO
    return cells, rhs


def _arr_dot(df: DataFrame, w: list[float], out: str) -> DataFrame:
    """Per-row dot product with the (broadcast-as-literal) weight
    vector, as an exact-integer micro-unit fold — the scoring shape both
    probes share, bit-identical to the round-5 explode+join+sum form
    (same micro terms, integer addition in any order) with no join and
    no shuffle: d+1 doubles ride the plan as a literal array."""
    w_arr = F.array(*[F.lit(float(x)) for x in w])
    fold = F.aggregate(
        F.zip_with("arr", w_arr, lambda v, ww: _micro(v * ww)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return df.withColumn(out, fold / F.lit(MICRO))


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

    1. sufficient statistics: the X^T X upper triangle and X^T y fused
       into ONE (i, j)-keyed hash aggregate (``_suff_stats``) generated
       in place from the array-form rows — one map-side-combined
       shuffle bounded by d^2 * partitions, never a matrix on one node
       and (since round 6) no self-join exchange of the exploded design
       rows. Each cell is an exact-integer micro-unit sum (terms
       rounded to MICRO units first), so the cell values are identical
       across engines regardless of summation order — the precondition
       for the DuckDB oracle twin;
    2. solve (X^T X + lam*I) w = X^T y with ``gauss_jordan_solve`` on
       the driver (d+1 ~ 65: microseconds) — plain-Python, no-pivot,
       op-order-identical to the oracle's unrolled CTE chain;
    3. score distributedly: per-row ``zip_with`` micro-unit dot
       products against the literal weight array (``_arr_dot`` — no
       join, no shuffle), one more aggregate for RMSE + 0.5-threshold
       accuracy.

    Oracle twin: ``oracles.ridge_probe_sql`` — generated from the same
    MICRO/RIDGE_LAM/RIDGE_POS_LABEL constants this function defaults to;
    unchanged by the round-6 plan rewrite because every cross-engine
    value is the same exact integer sum.

    Returns one row: (n_vecs, rmse, accuracy, pos_rate)."""
    df, d = _design_arr(embeddings, positive_label)
    cells, rhs = _suff_stats(df, d, rhs_mul=F.col("y"), hess_mul=F.lit(1.0))
    w = gauss_jordan_solve(cells, rhs, d, lam)

    scored = _arr_dot(df, w, "pred")
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


def logistic_probe(
    embeddings: DataFrame,
    positive_label: int = RIDGE_POS_LABEL,
    n_iters: int = 3,
    lam: float = RIDGE_LAM,
) -> DataFrame:
    """Logistic-regression probe by IRLS (Newton) — the ITERATIVE form of
    the aggregate-then-solve pattern: each iteration computes the
    gradient X^T (y - mu) and Hessian X^T S X as distributed aggregates
    (the scoring pass that produces mu rides the current weights into
    the plan as a d+1-double literal array — never the data), solves
    the (d+1)^2 damped Newton system on the driver, and repeats. Three
    iterations of Newton on a well-scaled probe is effectively
    converged; per-iteration cluster cost is ONE fused job (round 6):
    mu, the residual, and the S weights are per-row expressions over
    the array-form design frame, and gradient + Hessian triangle come
    out of the single ``_suff_stats`` aggregate — the round-5 shape
    paid three jobs per iteration (scoring join, gradient agg,
    Hessian self-join agg) for the same integers.

    Determinism (round 6, enabling the DuckDB twin
    ``oracles.logistic_probe_sql``): every cross-engine aggregate is an
    exact-integer micro-unit sum; mu — the only transcendental — is
    rounded to 6dp each iteration so a 1-ulp exp() difference between
    libm implementations dies per step instead of compounding (the
    repo's iterative-float rule); the Newton solve is the no-pivot
    ``gauss_jordan_solve`` in the oracle's exact op order.

    Returns one row: (n_vecs, n_iters, accuracy, log_loss)."""
    df, d = _design_arr(embeddings, positive_label)
    df = df.persist()
    w = [0.0] * d
    sigmoid = F.round(
        F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("eta"))), 6
    ).alias("mu")
    for _ in range(n_iters):
        scored = _arr_dot(df, w, "eta").select("arr", "y", sigmoid)
        step = scored.select(
            "arr",
            (F.col("y") - F.col("mu")).alias("r"),
            (F.col("mu") * (F.lit(1.0) - F.col("mu"))).alias("s"),
        )
        cells, grad = _suff_stats(
            step, d, rhs_mul=F.col("r"), hess_mul=F.col("s")
        )
        rhs = {i: grad.get(i, 0.0) - lam * w[i] for i in range(d)}
        delta = gauss_jordan_solve(cells, rhs, d, lam)
        w = [w[i] + delta[i] for i in range(d)]
    final = _arr_dot(df, w, "eta").select("y", sigmoid)
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
    df.unpersist()
    return out
