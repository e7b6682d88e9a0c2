"""Deduplication operators over ``documents`` — exact, n-gram Jaccard, and
MinHash+LSH near-dup — built to be (a) fully distributed (shuffle keys are
content hashes, never a global sort/collect) and (b) bit-for-bit
reproducible in ANSI SQL so the DuckDB oracle can hash-match them
(see ``xboard_spark.functions.portable_hash`` for the portable fingerprint
and the deterministic MinHash permutation family).

Scale design (the 100 TB story):
- Exact dedup: one hash-partition on the 60-bit content fingerprint; the
  aggregate is partial+final, so the shuffle carries one row per fingerprint.
- Shingle inverted index: explode distinct shingles, drop stop-shingles above
  a document-frequency cap (hot-key defense — without it one ubiquitous
  shingle produces a quadratic bucket), then pair-join *within shingle
  buckets* so candidate generation is bounded by sum(df^2) over surviving
  shingles, not |docs|^2.
- MinHash/LSH: signatures are computed per-document with array expressions
  (zero shuffle), banding re-keys by (band, band_hash) — only same-bucket
  docs ever meet, the textbook way brute-force O(n^2) near-dup becomes
  tractable (Broder 1997; Leskovec et al., Mining of Massive Datasets ch.3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from xboard_spark.functions.portable_hash import (
    MINHASH_P,
    _X_MASK,
    fingerprint64,
    minhash_params,
)
from xboard_spark.operators.text import TOKEN_RE

N_PERMS = 32
N_BANDS = 8  # 8 bands x 4 rows — s-curve threshold ~ (1/8)^(1/4) ≈ 0.59


def _norm_text(text: Column) -> Column:
    return F.regexp_replace(F.trim(F.lower(text)), "\\s+", " ")


def exact_dedup_groups(documents: DataFrame, min_size: int = 2) -> DataFrame:
    """Exact duplicate groups by normalized-content fingerprint. Returns one
    row per duplicate group: fingerprint, group size, canonical (min) doc."""
    fp = fingerprint64(_norm_text(F.col("text")))
    return (
        documents.select(fp.alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("canonical_doc_id"))
        .filter(F.col("n_docs") >= min_size)
        .orderBy("fingerprint")
    )


def shingle_fps(documents: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, fps array<long>): distinct word-n-gram shingle fingerprints
    per document. Pure array expressions — computed where the data lives,
    nothing shuffles."""
    words = F.regexp_extract_all(_norm_text(F.col("text")), F.lit(TOKEN_RE), 0)
    idx = F.sequence(F.lit(1), F.size(words) - (n - 1))
    shingle_at = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(words, i + j) for j in range(n)]
    )
    shingles = F.when(F.size(words) >= n, F.transform(idx, shingle_at)).otherwise(
        F.array().cast("array<string>")
    )
    fps = F.array_distinct(
        F.transform(
            shingles,
            lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long"),
        )
    )
    return documents.select("doc_id", fps.alias("fps")).filter(F.size("fps") > 0)


def _pair_jaccard(doc_sh: DataFrame, candidates: DataFrame | None, max_df: int) -> DataFrame:
    """Exact Jaccard for doc pairs sharing >=1 surviving shingle.

    doc_sh: (doc_id, fps). candidates: optional (doc_a, doc_b) to restrict to.
    Stop-shingles with df > max_df are excluded from the *index* (candidate
    generation) but kept in the per-doc set sizes, so Jaccard stays exact.
    """
    sizes = doc_sh.select("doc_id", F.size("fps").alias("n_sh"))
    inv = doc_sh.select("doc_id", F.explode("fps").alias("shfp"))
    df_ok = (
        inv.groupBy("shfp")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= max_df)
        .select("shfp")
    )
    inv = inv.join(df_ok, "shfp")
    a = inv.select(F.col("doc_id").alias("doc_a"), "shfp")
    b = inv.select(F.col("doc_id").alias("doc_b"), "shfp")
    shared = (
        a.join(b, "shfp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("shared_indexed"))
    )
    if candidates is not None:
        shared = shared.join(candidates, ["doc_a", "doc_b"], "inner")
    # shared_indexed undercounts shared stop-shingles; recompute exact overlap
    # with an array intersect on the candidate pairs only (cheap: few pairs).
    with_sets = (
        shared.join(doc_sh.select(F.col("doc_id").alias("doc_a"), F.col("fps").alias("fps_a")), "doc_a")
        .join(doc_sh.select(F.col("doc_id").alias("doc_b"), F.col("fps").alias("fps_b")), "doc_b")
        .withColumn("shared", F.size(F.array_intersect("fps_a", "fps_b")))
    )
    return (
        with_sets.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b")), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("shared")
                / (F.col("n_a") + F.col("n_b") - F.col("shared")),
                6,
            ),
        )
        .select(
            "doc_a",
            "doc_b",
            F.col("shared").cast("long").alias("shared"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            "jaccard",
        )
    )


def ngram_jaccard_pairs(
    documents: DataFrame, n: int = 3, tau: float = 0.5, max_df: int = 100
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs above ``tau`` via the shingle
    inverted index."""
    doc_sh = shingle_fps(documents, n)
    return (
        _pair_jaccard(doc_sh, None, max_df)
        .filter(F.col("jaccard") >= tau)
        .orderBy("doc_a", "doc_b")
    )


def minhash_signatures(doc_sh: DataFrame, n_perms: int = N_PERMS) -> DataFrame:
    """(doc_id, sig_0..sig_{n-1}): MinHash signature columns. Each signature
    is array_min over a transformed fingerprint array — per-row JVM work,
    embarrassingly parallel, no shuffle."""
    params = minhash_params(n_perms)

    def perm(a: int, b: int):
        # closure factory: a single-arg lambda, so Spark binds only the
        # array element (a default-arg lambda would read as the 2/3-arg
        # (element, index) form and bind ints to Columns)
        return lambda x: (
            x.bitwiseAND(F.lit(_X_MASK)) * F.lit(a) + F.lit(b)
        ) % F.lit(MINHASH_P)

    sig_cols = [
        F.array_min(F.transform("fps", perm(a, b))).alias(f"sig_{i}")
        for i, (a, b) in enumerate(params)
    ]
    return doc_sh.select("doc_id", *sig_cols)


def minhash_dedup_pairs(
    documents: DataFrame,
    n: int = 3,
    n_perms: int = N_PERMS,
    n_bands: int = N_BANDS,
    tau: float = 0.5,
    max_df: int = 100,
) -> DataFrame:
    """MinHash + LSH near-duplicate pairs, verified with exact Jaccard.

    Pipeline: shingle fps (no shuffle) -> signatures (no shuffle) -> band
    hashes (no shuffle) -> explode bands + hash-partition by (band,
    band_hash) -> same-bucket pairs -> distinct candidates -> exact-Jaccard
    verify -> filter tau. Output matches ``ngram_jaccard_pairs`` on recalled
    pairs; LSH trades recall for never comparing all pairs.
    """
    rows_per_band = n_perms // n_bands
    doc_sh = shingle_fps(documents, n)
    sigs = minhash_signatures(doc_sh, n_perms)
    band_cols = []
    for bi in range(n_bands):
        parts = [
            F.col(f"sig_{bi * rows_per_band + r}").cast("string")
            for r in range(rows_per_band)
        ]
        band_cols.append(
            F.struct(
                F.lit(bi).alias("band"),
                fingerprint64(F.concat_ws(",", *parts)).alias("bh"),
            )
        )
    exploded = sigs.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("b")
    ).select("doc_id", F.col("b.band").alias("band"), F.col("b.bh").alias("bh"))
    left = exploded.select("band", "bh", F.col("doc_id").alias("doc_a"))
    right = exploded.select("band", "bh", F.col("doc_id").alias("doc_b"))
    candidates = (
        left.join(right, ["band", "bh"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    return (
        _pair_jaccard(doc_sh, candidates, max_df)
        .filter(F.col("jaccard") >= tau)
        .orderBy("doc_a", "doc_b")
    )


def simhash_col(tokens: Column, bits: int = 16) -> Column:
    """SimHash over token fingerprints: for each bit, sign of the sum of
    (+1/-1) votes across tokens. Expressed with aggregate() over the token
    array — per-row, JVM-side. 16 bits keeps the oracle SQL tractable;
    the construction generalizes."""
    fps = F.transform(
        tokens, lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")
    )
    def voter(bit_mask: int):
        return lambda acc, x: acc + F.when(
            x.bitwiseAND(F.lit(bit_mask)) != 0, 1
        ).otherwise(-1)

    bit_exprs = []
    for b in range(bits):
        vote = F.aggregate(fps, F.lit(0).cast("long"), voter(1 << b))
        bit_exprs.append(F.when(vote > 0, F.lit(1 << b)).otherwise(F.lit(0)))
    out = bit_exprs[0]
    for e in bit_exprs[1:]:
        out = out + e
    return out


def simhash_fingerprints(documents: DataFrame, bits: int = 16) -> DataFrame:
    """Per-document SimHash fingerprint + duplicate-bucket summary."""
    tokens = F.regexp_extract_all(_norm_text(F.col("text")), F.lit(TOKEN_RE), 0)
    return documents.select(
        "doc_id", simhash_col(tokens, bits).cast("long").alias("simhash")
    ).orderBy("doc_id")
