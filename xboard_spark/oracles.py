"""DuckDB oracle SQL for every operator registered in ``__spark_entry__``.

Each SQL string is the ANSI-SQL twin of one Spark operator, over the same
parquet tables (pre-registered views: region nation customer supplier part
orders lineitem events documents embeddings). Aliases, rounding, and
tie-breaks match the Spark side exactly — the driver hash-compares values
after sorting columns by name, so both sides pin deterministic semantics.

The MinHash / LSH / SimHash / kNN oracles are *generated* from the same
constants the Spark operators import (permutation params, band layout,
hyperplane weights) so the two sides can never drift.
"""

from __future__ import annotations

from xboard_spark.functions.exact import (
    duck_charge_units,
    duck_disc_price_units,
    duck_round_div_units,
)
from xboard_spark.functions.portable_hash import MINHASH_P, _X_MASK, minhash_params
from xboard_spark.operators.dedup import N_BANDS, N_PERMS
from xboard_spark.operators.ml import MICRO, RIDGE_LAM, RIDGE_POS_LABEL
from xboard_spark.operators.similarity import DIM, N_PLANES, N_TABLES, plane_weight
from xboard_spark.operators.text import EMAIL_RE, LANG_STOPWORDS, PHONE_RE

# ---------------------------------------------------------------- helpers

TOKEN_RE_SQL = "[a-z0-9]+"


def _fp(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def _boot_params_values(n_replicas: int = 32) -> str:
    """VALUES rows for the bootstrap per-replica affine coin family —
    generated from the SAME ``minhash_params(seed=BOOT_SEED)`` call the
    Spark side uses (``operators.sampling.bootstrap_mean_ci``), so the
    two engines can never drift."""
    from xboard_spark.operators.sampling import BOOT_SEED

    params = minhash_params(n_replicas, seed=BOOT_SEED)
    return ", ".join(
        f"({i}, {a}, {b})" for i, (a, b) in enumerate(params)
    )


_NORM_TEXT = r"regexp_replace(trim(lower(text)), '\s+', ' ', 'g')"


def _docs_cte(n: int = 3, with_norm: bool = True) -> str:
    """Shared CTE: per-doc distinct shingle fingerprints (word n-grams)."""
    shingle = " || ' ' || ".join(f"words[i+{j}]" for j in range(n))
    return f"""
docs AS (
  SELECT doc_id, list_distinct(list_transform(shingles, s -> {_fp('s')})) AS fps
  FROM (
    SELECT doc_id,
      CASE WHEN len(words) >= {n}
        THEN list_transform(generate_series(1, len(words) - {n - 1}), i -> {shingle})
        ELSE [] END AS shingles
    FROM (SELECT doc_id, regexp_extract_all({_NORM_TEXT}, '{TOKEN_RE_SQL}') AS words
          FROM documents)
  ) WHERE len(shingles) > 0
)"""


def _inv_cte(max_df: int) -> str:
    """Stop-shingle-filtered inverted index (mirrors
    operators.dedup.filtered_index)."""
    return f"""
inv0 AS (SELECT doc_id, unnest(fps) AS shfp FROM docs),
df_ok AS (SELECT shfp FROM inv0 GROUP BY shfp HAVING count(*) <= {max_df}),
inv AS (SELECT inv0.doc_id, inv0.shfp FROM inv0 JOIN df_ok USING (shfp))"""


def _pairs_cte(shared_cte: str) -> str:
    """sizes + pairs CTEs (mirrors operators.dedup._pair_jaccard), no final
    select — composable by minhash/ngram/curation oracles."""
    return f"""
sizes AS (SELECT doc_id, count(*)::BIGINT AS n_sh FROM inv GROUP BY doc_id),
pairs AS (
  SELECT doc_a, doc_b, shared, sa.n_sh AS n_a, sb.n_sh AS n_b,
         round(shared / (sa.n_sh + sb.n_sh - shared), 6) AS jaccard
  FROM {shared_cte} s
  JOIN sizes sa ON sa.doc_id = s.doc_a
  JOIN sizes sb ON sb.doc_id = s.doc_b
)"""


def _pair_jaccard_sql(shared_cte: str, tau: float) -> str:
    return f"""{_pairs_cte(shared_cte)}
SELECT doc_a, doc_b, shared, n_a, n_b, jaccard
FROM pairs WHERE jaccard >= {tau}
ORDER BY doc_a, doc_b"""


def ngram_jaccard_sql(n: int = 3, tau: float = 0.5, max_df: int = 100) -> str:
    return f"""
WITH {_docs_cte(n)},
{_inv_cte(max_df)},
shared AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS shared
  FROM inv a JOIN inv b USING (shfp)
  WHERE a.doc_id < b.doc_id GROUP BY 1, 2
),
{_pair_jaccard_sql('shared', tau)}"""


def _minhash_stack(
    n: int = 3,
    n_perms: int = N_PERMS,
    n_bands: int = N_BANDS,
    max_df: int = 100,
) -> str:
    """The full MinHash CTE stack through the tau-independent verified
    ``pairs`` CTE — shared by ``minhash_sql`` and ``dedup_clusters_sql``."""
    params = minhash_params(n_perms)
    rows_per_band = n_perms // n_bands
    sig_exprs = ",\n  ".join(
        f"min(((shfp & {_X_MASK}) * {a} + {b}) % {MINHASH_P}) AS sig_{i}"
        for i, (a, b) in enumerate(params)
    )
    band_selects = []
    for bi in range(n_bands):
        parts = ", ".join(
            f"sig_{bi * rows_per_band + r}::VARCHAR" for r in range(rows_per_band)
        )
        band_hash = _fp(f"concat_ws(',', {parts})")
        band_selects.append(
            f"SELECT doc_id, {bi} AS band, {band_hash} AS bh FROM sigs"
        )
    bands_union = "\nUNION ALL\n".join(band_selects)
    stack = f"""{_docs_cte(n)},
{_inv_cte(max_df)},
sigs AS (SELECT doc_id, {sig_exprs} FROM inv GROUP BY doc_id),
bands AS ({bands_union}),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh
  WHERE a.doc_id < b.doc_id GROUP BY 1, 2
),
shared AS (
  SELECT c.doc_a, c.doc_b, count(*)::BIGINT AS shared
  FROM cand c
  JOIN inv a ON a.doc_id = c.doc_a
  JOIN inv b ON b.doc_id = c.doc_b AND b.shfp = a.shfp
  GROUP BY 1, 2
),{_pairs_cte('shared')}"""
    return stack


def minhash_sql(
    n: int = 3,
    n_perms: int = N_PERMS,
    n_bands: int = N_BANDS,
    tau: float = 0.5,
    max_df: int = 100,
) -> str:
    return f"""
WITH {_minhash_stack(n, n_perms, n_bands, max_df)}
SELECT doc_a, doc_b, shared, n_a, n_b, jaccard
FROM pairs WHERE jaccard >= {tau}
ORDER BY doc_a, doc_b"""


def dedup_clusters_sql(
    n: int = 3,
    n_perms: int = N_PERMS,
    n_bands: int = N_BANDS,
    tau: float = 0.5,
    max_df: int = 100,
) -> str:
    """Connected components over the verified minhash pairs — mirrors
    ``dedup.dedup_clusters``: recursive reachability, component label =
    min reachable doc_id (the recursive CTE computes the same fixpoint the
    Spark side reaches by bounded min-label propagation)."""
    return f"""
WITH RECURSIVE {_minhash_stack(n, n_perms, n_bands, max_df)},
dup AS (SELECT doc_a, doc_b FROM pairs WHERE jaccard >= {tau}),
edges AS (
  SELECT doc_a AS s, doc_b AS d FROM dup
  UNION ALL
  SELECT doc_b, doc_a FROM dup
),
reach(v, m) AS (
  SELECT DISTINCT s, s FROM edges
  UNION
  SELECT r.v, e.d FROM reach r JOIN edges e ON e.s = r.m
),
lab AS (SELECT v AS doc_id, min(m) AS cluster_id FROM reach GROUP BY v)
SELECT doc_id, cluster_id,
       count(*) OVER (PARTITION BY cluster_id) AS cluster_size
FROM lab
ORDER BY doc_id"""


def dedup_stream_sql(
    n: int = 3,
    n_perms: int = N_PERMS,
    n_bands: int = N_BANDS,
    tau: float = 0.5,
    max_df: int = 100,
) -> str:
    """DuckDB twin of ``streaming.dedup.dedup_stream_demo`` — re-derives
    BOTH micro-batches of the incremental LSH dedup from the parity
    split alone, generated from the same permutation/band constants the
    operators import. Batch-local semantics are mirrored exactly:

    * per-batch df-capped inverted index (``add_batch`` caps df within
      the batch, not globally — the documented streaming approximation);
    * batch 0 = within-even pairs, verified on inv1 alone (at batch 1
      the index IS the batch);
    * batch 1 = odd docs vs (evens UNION odds), candidates canonicalized
      with least/greatest, verified on inv1 UNION inv2 — the redelivered
      evens of the fixture's second file never appear because the
      anti-join semantics make them index no-ops (the twin simply uses
      the clean parity split).
    """
    params = minhash_params(n_perms)
    rows_per_band = n_perms // n_bands
    shingle = " || ' ' || ".join(f"words[i+{j}]" for j in range(n))
    sig_exprs = ",\n  ".join(
        f"min(((shfp & {_X_MASK}) * {a} + {b}) % {MINHASH_P}) AS sig_{i}"
        for i, (a, b) in enumerate(params)
    )

    def batch_stack(sfx: str, where: str) -> str:
        band_selects = []
        for bi in range(n_bands):
            parts = ", ".join(
                f"sig_{bi * rows_per_band + r}::VARCHAR"
                for r in range(rows_per_band)
            )
            band_hash = _fp(f"concat_ws(',', {parts})")
            band_selects.append(
                f"SELECT doc_id, {bi} AS band, {band_hash} AS bh FROM sigs{sfx}"
            )
        bands_union = "\nUNION ALL\n".join(band_selects)
        return f"""docs{sfx} AS (
  SELECT doc_id, list_distinct(list_transform(shingles, s -> {_fp('s')})) AS fps
  FROM (
    SELECT doc_id,
      CASE WHEN len(words) >= {n}
        THEN list_transform(generate_series(1, len(words) - {n - 1}), i -> {shingle})
        ELSE [] END AS shingles
    FROM (SELECT doc_id, regexp_extract_all({_NORM_TEXT}, '{TOKEN_RE_SQL}') AS words
          FROM documents WHERE {where})
  ) WHERE len(shingles) > 0
),
inv0{sfx} AS (SELECT doc_id, unnest(fps) AS shfp FROM docs{sfx}),
df_ok{sfx} AS (SELECT shfp FROM inv0{sfx} GROUP BY shfp HAVING count(*) <= {max_df}),
inv{sfx} AS (SELECT inv0{sfx}.doc_id, inv0{sfx}.shfp
             FROM inv0{sfx} JOIN df_ok{sfx} USING (shfp)),
sigs{sfx} AS (SELECT doc_id, {sig_exprs} FROM inv{sfx} GROUP BY doc_id),
bands{sfx} AS ({bands_union})"""

    def verify(tag: str, cand: str, inv: str) -> str:
        return f"""sizes{tag} AS (
  SELECT doc_id, count(*)::BIGINT AS n_sh FROM {inv} GROUP BY doc_id
),
shared{tag} AS (
  SELECT c.doc_a, c.doc_b, count(*)::BIGINT AS shared
  FROM {cand} c
  JOIN {inv} a ON a.doc_id = c.doc_a
  JOIN {inv} b ON b.doc_id = c.doc_b AND b.shfp = a.shfp
  GROUP BY 1, 2
),
pairs{tag} AS (
  SELECT doc_a, doc_b,
         round(shared / (sa.n_sh + sb.n_sh - shared), 6) AS jaccard
  FROM shared{tag} s
  JOIN sizes{tag} sa ON sa.doc_id = s.doc_a
  JOIN sizes{tag} sb ON sb.doc_id = s.doc_b
)"""

    return f"""
WITH {batch_stack('_e', 'doc_id % 2 = 0')},
{batch_stack('_o', 'doc_id % 2 = 1')},
cand0 AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands_e a JOIN bands_e b ON a.band = b.band AND a.bh = b.bh
  WHERE a.doc_id < b.doc_id GROUP BY 1, 2
),
{verify('0', 'cand0', 'inv_e')},
allbands AS (SELECT * FROM bands_e UNION ALL SELECT * FROM bands_o),
allinv AS (SELECT * FROM inv_e UNION ALL SELECT * FROM inv_o),
cand1 AS (
  SELECT least(o.doc_id, nw.doc_id) AS doc_a,
         greatest(o.doc_id, nw.doc_id) AS doc_b
  FROM allbands o JOIN bands_o nw ON o.band = nw.band AND o.bh = nw.bh
  WHERE o.doc_id <> nw.doc_id GROUP BY 1, 2
),
{verify('1', 'cand1', 'allinv')}
SELECT doc_a, doc_b, jaccard, 0::BIGINT AS batch_id
FROM pairs0 WHERE jaccard >= {tau}
UNION ALL
SELECT doc_a, doc_b, jaccard, 1::BIGINT AS batch_id
FROM pairs1 WHERE jaccard >= {tau}
ORDER BY doc_a, doc_b"""


def curation_sql(min_tokens: int = 40, tau: float = 0.5) -> str:
    """Quality gate + minhash near-dedup removal + corpus rollup — composes
    the minhash pair stack (mirrors operators.curation)."""
    mh = minhash_sql(tau=tau)
    stack = mh[mh.index("WITH ") + 5 : mh.index("\nSELECT doc_a")]
    return f"""
WITH {stack},
removed AS (
  SELECT DISTINCT doc_b AS doc_id FROM pairs WHERE jaccard >= {tau}
),
toks AS (
  SELECT doc_id, lang, source,
         len(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}'))::BIGINT
           AS n_tokens
  FROM documents WHERE doc_id IS NOT NULL
)
SELECT lang, source, count(*) AS n_docs,
       sum(n_tokens)::BIGINT AS total_tokens,
       round(avg(n_tokens), 6) AS avg_tokens
FROM toks
WHERE n_tokens >= {min_tokens}
  AND doc_id NOT IN (SELECT doc_id FROM removed)
GROUP BY 1, 2 ORDER BY 1, 2"""


def _simhash_terms(bits: int) -> str:
    vote = (
        "list_sum(list_transform(fps, x -> CASE WHEN (x >> {b}) & 1 = 1 "
        "THEN 1 ELSE -1 END))"
    )
    return " + ".join(
        f"(CASE WHEN {vote.format(b=b)} > 0 THEN {1 << b} ELSE 0 END)"
        for b in range(bits)
    )


_SIMHASH_TOKS_CTE = f"""toks AS (
  SELECT doc_id,
         list_transform(regexp_extract_all({_NORM_TEXT}, '{TOKEN_RE_SQL}'),
                        t -> {_fp('t')}) AS fps
  FROM documents
)"""


def simhash_sql(bits: int = 16) -> str:
    return f"""
WITH {_SIMHASH_TOKS_CTE}
SELECT doc_id, ({_simhash_terms(bits)})::BIGINT AS simhash
FROM toks ORDER BY doc_id"""


def simhash_neardup_sql(
    bits: int = 32, n_bands: int = 4, max_hamming: int = 1
) -> str:
    """Mirrors dedup.simhash_neardup_pairs: band-bucket candidates,
    exact-Hamming verify."""
    band_bits = bits // n_bands
    mask = (1 << band_bits) - 1
    return f"""
WITH {_SIMHASH_TOKS_CTE},
sims AS (
  SELECT doc_id, ({_simhash_terms(bits)})::BIGINT AS simhash FROM toks
),
bands AS (
  SELECT doc_id, simhash, b,
         (simhash >> (b * {band_bits})) & {mask} AS bval
  FROM sims, generate_series(0, {n_bands - 1}) t(b)
),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
         x.simhash AS sh_a, y.simhash AS sh_b
  FROM bands x JOIN bands y
    ON x.b = y.b AND x.bval = y.bval AND x.doc_id < y.doc_id
)
SELECT doc_a, doc_b, bit_count(xor(sh_a, sh_b))::BIGINT AS hamming
FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= {max_hamming}
ORDER BY doc_a, doc_b"""


def _plane_sql_array(p: int, dim: int = DIM) -> str:
    vals = ", ".join(repr(plane_weight(p, d)) for d in range(dim))
    return f"[{vals}]::DOUBLE[]"


def _knn_ranked_cte(n_queries: int) -> str:
    """corpus -> norms -> queries -> scored -> ranked CTE chain (mirrors
    similarity.knn_bruteforce); shared by knn_sql / knn_label_vote_sql so
    the two oracles cannot disagree on the neighbor sets."""
    return f"""
corpus AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
norms AS (
  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS v_norm FROM corpus
),
queries AS (
  SELECT vec_id AS q_id, v AS q, v_norm AS q_norm FROM norms
  WHERE vec_id < {n_queries}
),
scored AS (
  SELECT q_id, vec_id,
         list_dot_product(n.v, queries.q) / (n.v_norm * queries.q_norm) AS cosine
  FROM norms n CROSS JOIN queries WHERE vec_id <> q_id
),
ranked AS (
  SELECT q_id, vec_id, cosine,
         row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rank
  FROM scored
)"""


def _knn_ranked_cte_dim(n_queries: int, d: int, suffix: str) -> str:
    """Dim-truncated variant of _knn_ranked_cte (corpus sliced to the
    first ``d`` dims), CTE names suffixed so multiple dims compose."""
    return f"""
corpus{suffix} AS (
  SELECT vec_id, (embedding[1:{d}])::DOUBLE[] AS v FROM embeddings
),
norms{suffix} AS (
  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS v_norm
  FROM corpus{suffix}
),
queries{suffix} AS (
  SELECT vec_id AS q_id, v AS q, v_norm AS q_norm FROM norms{suffix}
  WHERE vec_id < {n_queries}
),
scored{suffix} AS (
  SELECT q_id, vec_id,
         list_dot_product(n.v, queries{suffix}.q)
           / (n.v_norm * queries{suffix}.q_norm) AS cosine
  FROM norms{suffix} n CROSS JOIN queries{suffix} WHERE vec_id <> q_id
),
ranked{suffix} AS (
  SELECT q_id, vec_id,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY cosine DESC, vec_id) AS rank
  FROM scored{suffix}
)"""


def truncation_recall_sql(
    dims: tuple[int, ...] = (8, 16, 32), n_queries: int = 25, k: int = 5
) -> str:
    """Mirrors similarity.truncation_recall: per truncation dim, recall@k
    of the sliced-corpus exact kNN against full-dim ground truth."""
    ctes = [_knn_ranked_cte(n_queries).strip()]
    selects = []
    for d in dims:
        ctes.append(_knn_ranked_cte_dim(n_queries, d, f"_{d}").strip())
        selects.append(
            f"""SELECT {d}::BIGINT AS dim, count(*)::BIGINT AS n_matches,
       count(*)::DOUBLE / {float(n_queries * k)} AS recall
FROM (SELECT q_id, vec_id FROM ranked_{d} WHERE rank <= {k}) t
JOIN (SELECT q_id, vec_id FROM ranked WHERE rank <= {k}) f
  USING (q_id, vec_id)"""
        )
    body = "\nUNION ALL\n".join(selects)
    return (
        "\nWITH " + ",\n".join(ctes) + "\n" + body + "\nORDER BY dim"
    )


def knn_sql(n_queries: int = 5, k: int = 5) -> str:
    return f"""
WITH {_knn_ranked_cte(n_queries)}
SELECT q_id, rank::BIGINT AS rank, vec_id, round(cosine, 6) AS cosine
FROM ranked WHERE rank <= {k} ORDER BY q_id, rank"""


def knn_label_vote_sql(n_queries: int = 25, k: int = 5) -> str:
    """Mirrors similarity.knn_label_vote: majority label among the k
    exact-cosine neighbors (ties -> smaller label), per-label accuracy."""
    return f"""
WITH {_knn_ranked_cte(n_queries)},
nbrs AS (SELECT q_id, vec_id FROM ranked WHERE rank <= {k}),
votes AS (
  SELECT q_id, e.label, count(*) AS n_votes
  FROM nbrs JOIN embeddings e ON e.vec_id = nbrs.vec_id GROUP BY 1, 2
),
pred AS (
  SELECT q_id, label AS predicted FROM (
    SELECT q_id, label,
           row_number() OVER (PARTITION BY q_id
                              ORDER BY n_votes DESC, label) AS rn
    FROM votes) WHERE rn = 1
),
actual AS (
  SELECT vec_id AS q_id, label AS actual FROM embeddings
  WHERE vec_id < {n_queries}
)
SELECT actual::BIGINT AS label, count(*)::BIGINT AS n_queries,
       sum(CASE WHEN predicted = actual THEN 1 ELSE 0 END)::BIGINT
         AS n_correct
FROM pred JOIN actual USING (q_id) GROUP BY 1 ORDER BY 1"""


def hard_negative_mining_sql(n_queries: int = 25, k: int = 10) -> str:
    """Mirrors similarity.hard_negative_mining: hardest wrong-label
    neighbor in the exact-cosine top-k, per query label. Shares
    ``_knn_ranked_cte`` so the neighbor sets cannot drift."""
    return f"""
WITH {_knn_ranked_cte(n_queries)},
nbrs AS (
  SELECT q_id, vec_id, rank, round(cosine, 6) AS cosine
  FROM ranked WHERE rank <= {k}
),
cand AS (
  SELECT nbrs.q_id, nbrs.vec_id, nbrs.rank, nbrs.cosine,
         e.label, q.label AS q_label
  FROM nbrs
  JOIN embeddings e ON e.vec_id = nbrs.vec_id
  JOIN embeddings q ON q.vec_id = nbrs.q_id
  WHERE e.label <> q.label
),
hardest AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY q_id
                                 ORDER BY cosine DESC, vec_id) AS rn
    FROM cand) WHERE rn = 1
)
SELECT q_label::BIGINT AS label,
       count(*)::BIGINT AS n_queries_with_negatives,
       round(sum(round(cosine * 1000000.0, 0)) / (count(*) * 1000000.0), 6)
           AS avg_hardest_neg_cos,
       round(sum(rank)::DOUBLE / count(*), 6) AS avg_hardest_neg_rank
FROM hardest GROUP BY 1 ORDER BY 1"""


def boilerplate_ngrams_sql(n: int = 3, min_df: int = 2, top: int = 20) -> str:
    """Mirrors text.boilerplate_ngrams: cross-doc repeated n-grams ranked
    by document frequency (deterministic total order: df desc,
    occurrences desc, gram asc — so LIMIT picks the same set)."""
    gram = " || ' ' || ".join(f"words[i+{j}]" for j in range(n))
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') AS words
  FROM documents
),
grams AS (
  SELECT doc_id, unnest(
    CASE WHEN len(words) >= {n}
      THEN list_transform(generate_series(1, len(words) - {n - 1}),
                          i -> {gram})
      ELSE [] END) AS gram
  FROM toks
),
per_doc AS (SELECT gram, doc_id, count(*) AS c FROM grams GROUP BY 1, 2),
stats AS (
  SELECT gram, count(*)::BIGINT AS df, sum(c)::BIGINT AS n_occurrences
  FROM per_doc GROUP BY 1
)
SELECT gram, df, n_occurrences FROM stats WHERE df >= {min_df}
ORDER BY df DESC, n_occurrences DESC, gram LIMIT {top}"""


def source_contamination_sql(
    n: int = 3,
    n_perms: int = N_PERMS,
    n_bands: int = N_BANDS,
    tau: float = 0.5,
    max_df: int = 100,
) -> str:
    """Mirrors dedup.source_contamination_matrix: verified MinHash pairs
    (the shared stack) rolled up to a canonical (source, source) matrix."""
    return f"""
WITH {_minhash_stack(n, n_perms, n_bands, max_df)},
src AS (SELECT doc_id, source FROM documents)
SELECT least(sa.source, sb.source) AS source_a,
       greatest(sa.source, sb.source) AS source_b,
       count(*)::BIGINT AS n_pairs
FROM pairs p
JOIN src sa ON sa.doc_id = p.doc_a
JOIN src sb ON sb.doc_id = p.doc_b
WHERE p.jaccard >= {tau}
GROUP BY 1, 2 ORDER BY 1, 2"""


def _pagerank_chain_sql(n_iters: int) -> tuple[str, str]:
    """The unrolled PageRank iteration CTEs over (nodes, nn, weighted,
    pr0) — shared by every PageRank oracle so all of them evaluate the
    IDENTICAL arithmetic the Spark ``graph._pagerank`` core does. The
    damping constants are written as (1.0 - 0.85), not 0.15 — the two
    differ in the last ulp. Returns (chain_sql, final_cte_name)."""
    prev = "pr0"
    iters = []
    for i in range(1, n_iters + 1):
        iters.append(
            f"""c{i} AS (
  SELECT dst, sum(pr * frac) AS in_sum
  FROM weighted JOIN {prev} ON src = node GROUP BY 1
),
pr{i} AS (
  SELECT node, (1.0 - 0.85) / n + 0.85 * coalesce(in_sum, 0.0) AS pr
  FROM nodes LEFT JOIN c{i} ON node = dst, nn
)"""
        )
        prev = f"pr{i}"
    return ",\n".join(iters), prev


def keyword_pagerank_sql(
    window: int = 3, min_count: int = 5, n_iters: int = 2, top: int = 20
) -> str:
    """Mirrors graph.keyword_pagerank (TextRank): the term_cooccurrence
    pair stream, canonicalized undirected weights, shared PageRank tail."""
    chain, prev = _pagerank_chain_sql(n_iters)
    return f"""
WITH tok AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS word,
         generate_subscripts(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}'), 1)
           - 1 AS pos
  FROM documents
),
prs AS (
  SELECT a.word AS w_a, b.word AS w_b
  FROM tok a JOIN tok b
    ON a.doc_id = b.doc_id AND b.pos BETWEEN a.pos + 1 AND a.pos + {window}
  WHERE a.word <> b.word
),
und AS (
  SELECT least(w_a, w_b) AS wa, greatest(w_a, w_b) AS wb,
         count(*)::DOUBLE AS w
  FROM prs GROUP BY 1, 2 HAVING count(*) >= {min_count}
),
directed AS (
  SELECT wa AS src, wb AS dst, w FROM und
  UNION ALL
  SELECT wb AS src, wa AS dst, w FROM und
),
out_w AS (SELECT src, sum(w) AS out_w FROM directed GROUP BY 1),
nodes AS (SELECT src AS node FROM out_w),
nn AS (SELECT count(*) AS n FROM nodes),
weighted AS (
  SELECT src, dst, w / out_w AS frac FROM directed JOIN out_w USING (src)
),
pr0 AS (SELECT node, 1.0 / n AS pr FROM nodes, nn),
{chain}
SELECT node AS term, round(pr, 6) AS pagerank
FROM {prev} ORDER BY pagerank DESC, term LIMIT {top}"""


def part_pagerank_sql(n_iters: int = 2, top: int = 20) -> str:
    """Mirrors graph.part_pagerank: weighted PageRank on the co-purchase
    graph, ``n_iters`` unrolled rounds from uniform init; shared chain
    (see _pagerank_chain_sql); rank order uses the 6dp-rounded score."""
    chain, prev = _pagerank_chain_sql(n_iters)
    return f"""
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
edges AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         count(*)::DOUBLE AS w
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
),
directed AS (
  SELECT part_a AS src, part_b AS dst, w FROM edges
  UNION ALL
  SELECT part_b AS src, part_a AS dst, w FROM edges
),
out_w AS (SELECT src, sum(w) AS out_w FROM directed GROUP BY 1),
nodes AS (SELECT src AS node FROM out_w),
nn AS (SELECT count(*) AS n FROM nodes),
weighted AS (
  SELECT src, dst, w / out_w AS frac FROM directed JOIN out_w USING (src)
),
pr0 AS (SELECT node, 1.0 / n AS pr FROM nodes, nn),
{chain}
SELECT node, round(pr, 6) AS pagerank
FROM {prev} ORDER BY pagerank DESC, node LIMIT {top}"""


def dup_span_stats_sql(window: int = 10) -> str:
    """Mirrors dedup.dup_span_stats: per (lang, source) fraction of
    ``window``-token sliding spans whose fingerprint occurs in >= 2
    distinct documents. Same normalization / tokenizer / fingerprint as
    the Spark side; the fraction is one exact-int division."""
    span = " || ' ' || ".join(f"words[i+{j}]" for j in range(window))
    return f"""
WITH toks AS (
  SELECT doc_id, lang, source,
         regexp_extract_all({_NORM_TEXT}, '{TOKEN_RE_SQL}') AS words
  FROM documents WHERE doc_id IS NOT NULL
),
spans AS (
  SELECT doc_id, lang, source,
         {_fp('s')} AS spfp
  FROM (
    SELECT doc_id, lang, source,
           unnest(list_transform(
             generate_series(1, len(words) - {window - 1}), i -> {span})) AS s
    FROM toks WHERE len(words) >= {window}
  )
),
span_df AS (
  SELECT spfp, count(DISTINCT doc_id) AS df FROM spans GROUP BY 1
)
SELECT lang, source,
       count(DISTINCT doc_id)::BIGINT AS n_docs,
       count(*)::BIGINT AS n_spans,
       sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_dup_spans,
       sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END)::DOUBLE / count(*)
         AS dup_fraction
FROM spans JOIN span_df USING (spfp)
GROUP BY 1, 2 ORDER BY 1, 2"""


def _offs_sql(n_total: int) -> str:
    """Mean-centering offsets CTE body — mirrors ``similarity.lsh_corpus``:
    o_p = round(dot(mean-vector, plane_p), 4) over ALL n_planes*n_tables
    planes (dot-of-avg == avg-of-dot by linearity; the 4dp round absorbs
    the last-ulp fp difference between the two formulations and between
    engines). Consumes the ``mean`` CTE (64 per-dimension avg())."""
    return ", ".join(
        f"round(list_dot_product(m, {_plane_sql_array(p)}), 4) AS o_{p}"
        for p in range(n_total)
    )


def _bucket_terms_sql(t: int, n_planes: int) -> str:
    """Table t's bucket id: bit j from global plane p = t*n_planes + j."""
    return " + ".join(
        f"(CASE WHEN list_dot_product(v, {_plane_sql_array(t * n_planes + j)})"
        f" >= o_{t * n_planes + j} THEN {1 << j} ELSE 0 END)"
        for j in range(n_planes)
    )


def _lsh_norms_sql(n_planes: int, n_tables: int) -> str:
    """Shared CTE stack: corpus -> centering offsets -> per-table buckets ->
    long (vec_id, t, bucket) form. Mirrors similarity.lsh_corpus[_long]."""
    buckets = ",\n         ".join(
        f"({_bucket_terms_sql(t, n_planes)}) AS bucket_{t}"
        for t in range(n_tables)
    )
    long_union = "\n  UNION ALL\n  ".join(
        f"SELECT vec_id, {t} AS t, bucket_{t} AS bucket FROM norms"
        for t in range(n_tables)
    )
    # coalesce(avg, 0): on an EMPTY corpus avg() is NULL and DuckDB's
    # list_dot_product ERRORS on NULL elements (round-12 empty sweep;
    # VERDICT r12 #3) — 0-offsets are harmless there because ``norms``
    # (FROM corpus, offs) is empty anyway; value-identical whenever any
    # row exists. Spark side already returns the correct empty result.
    mean_list = ", ".join(
        f"coalesce(avg(v[{d + 1}]), 0.0)" for d in range(DIM)
    )
    return f"""corpus AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
mean AS (
  SELECT [{mean_list}] AS m FROM corpus
),
offs AS (
  SELECT {_offs_sql(n_planes * n_tables)} FROM mean
),
norms AS (
  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS v_norm,
         {buckets}
  FROM corpus, offs
),
long AS (
  {long_union}
)"""


def knn_lsh_sql(
    n_queries: int = 5, k: int = 5,
    n_planes: int = N_PLANES, n_tables: int = N_TABLES,
) -> str:
    return f"""
WITH {_lsh_norms_sql(n_planes, n_tables)},
cand AS (
  SELECT DISTINCT q.vec_id AS q_id, c.vec_id
  FROM long q JOIN long c ON q.t = c.t AND q.bucket = c.bucket
  WHERE q.vec_id < {n_queries} AND c.vec_id <> q.vec_id
),
scored AS (
  SELECT q_id, cand.vec_id,
         list_dot_product(n.v, nq.v) / (n.v_norm * nq.v_norm) AS cosine
  FROM cand
  JOIN norms n ON cand.vec_id = n.vec_id
  JOIN norms nq ON cand.q_id = nq.vec_id
),
ranked AS (
  SELECT q_id, vec_id, cosine,
         row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rank
  FROM scored
)
SELECT q_id, rank::BIGINT AS rank, vec_id, round(cosine, 6) AS cosine
FROM ranked WHERE rank <= {k} ORDER BY q_id, rank"""


def doc_chunks_sql(chunk_size: int = 64) -> str:
    fp = _fp("chunk_text")
    return f"""
WITH tok AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS word,
         generate_subscripts(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}'), 1)
           AS pos
  FROM documents WHERE doc_id IS NOT NULL
),
chunks AS (
  SELECT doc_id, ((pos - 1) // {chunk_size})::BIGINT AS chunk_id,
         count(*) AS n_tokens,
         string_agg(word, ' ' ORDER BY pos) AS chunk_text
  FROM tok GROUP BY doc_id, (pos - 1) // {chunk_size}
)
SELECT doc_id, chunk_id, n_tokens, {fp} AS chunk_fp
FROM chunks ORDER BY doc_id, chunk_id"""


def chunk_dedup_stats_sql(chunk_size: int = 64) -> str:
    """Mirrors text.chunk_dedup_stats over the doc_chunks chunking."""
    fp = _fp("chunk_text")
    return f"""
WITH tok AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS word,
         generate_subscripts(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}'), 1)
           AS pos
  FROM documents WHERE doc_id IS NOT NULL
),
chunks AS (
  SELECT doc_id, ((pos - 1) // {chunk_size})::BIGINT AS chunk_id,
         string_agg(word, ' ' ORDER BY pos) AS chunk_text
  FROM tok GROUP BY doc_id, (pos - 1) // {chunk_size}
),
per_fp AS (
  SELECT {fp} AS chunk_fp, count(*) AS c FROM chunks GROUP BY 1
)
SELECT sum(c)::BIGINT AS n_chunks,
       count(*)::BIGINT AS n_distinct_chunks,
       sum(CASE WHEN c > 1 THEN c ELSE 0 END)::BIGINT AS n_dup_chunks,
       sum(CASE WHEN c > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dup_groups,
       sum(CASE WHEN c > 1 THEN c ELSE 0 END)::DOUBLE / sum(c) AS dup_frac
FROM per_fp"""


def doc_chunks_overlapping_sql(chunk_size: int = 64, stride: int = 48) -> str:
    fp = _fp("chunk_text")
    return f"""
WITH tok AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS word,
         generate_subscripts(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}'), 1)
           - 1 AS pos
  FROM documents WHERE doc_id IS NOT NULL
),
fanned AS (
  SELECT doc_id, pos, word,
         unnest(generate_series(
           greatest(0, (pos - {chunk_size} + {stride}) // {stride}),
           pos // {stride})) AS chunk_id
  FROM tok
),
chunks AS (
  SELECT doc_id, chunk_id::BIGINT AS chunk_id, count(*) AS n_tokens,
         string_agg(word, ' ' ORDER BY pos) AS chunk_text
  FROM fanned GROUP BY doc_id, chunk_id
)
SELECT doc_id, chunk_id, (chunk_id * {stride})::BIGINT AS start_pos,
       n_tokens, {fp} AS chunk_fp
FROM chunks ORDER BY doc_id, chunk_id"""


def decontamination_sql(
    test_pct: int = 10,
    n: int = 3,
    max_df: int = 100,
    min_shared: int = 5,
    salt: str = "split-v1",
) -> str:
    fp = _fp(f"concat_ws(':', '{salt}', doc_id)")
    return f"""
WITH {_docs_cte(n)},
{_inv_cte(max_df)},
sp AS (
  SELECT doc_id,
         CASE WHEN {fp} % 100 < {test_pct} THEN 'test' ELSE 'train' END AS split
  FROM documents
),
tr AS (
  SELECT inv.doc_id AS train_doc, shfp
  FROM inv JOIN sp USING (doc_id) WHERE split = 'train'
),
te AS (
  SELECT inv.doc_id AS test_doc, shfp
  FROM inv JOIN sp USING (doc_id) WHERE split = 'test'
),
sizes AS (SELECT test_doc, count(*) AS n_test_sh FROM te GROUP BY test_doc),
shared AS (
  SELECT test_doc, train_doc, count(*) AS shared
  FROM tr JOIN te USING (shfp)
  GROUP BY test_doc, train_doc HAVING count(*) >= {min_shared}
)
SELECT test_doc, train_doc, shared, n_test_sh,
       round(shared / n_test_sh::DOUBLE, 6) AS overlap
FROM shared JOIN sizes USING (test_doc)
ORDER BY test_doc, train_doc"""


def cohort_retention_sql() -> str:
    return """
WITH uw AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events
),
fw AS (SELECT user_id, min(week) AS cohort_week FROM uw GROUP BY user_id),
cs AS (SELECT cohort_week, count(*) AS cohort_size FROM fw GROUP BY cohort_week),
act AS (
  SELECT uw.user_id, fw.cohort_week,
         ((epoch_us(uw.week) - epoch_us(fw.cohort_week))
          // 604800000000)::BIGINT AS weeks_since
  FROM uw JOIN fw USING (user_id)
),
mat AS (
  SELECT cohort_week, weeks_since, count(*) AS n_active
  FROM act GROUP BY cohort_week, weeks_since
)
SELECT cohort_week::DATE AS cohort_week, weeks_since, n_active, cohort_size,
       round(n_active / cohort_size::DOUBLE, 6) AS retention
FROM mat JOIN cs USING (cohort_week)
ORDER BY cohort_week, weeks_since"""


def rfm_segments_sql() -> str:
    return """
WITH per_cust AS (
  SELECT o_custkey, max(o_orderdate) AS last_order, count(*) AS n_orders,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT::DOUBLE / 100.0 AS spend
  FROM orders GROUP BY o_custkey
),
tiled AS (
  SELECT o_custkey,
         ntile(4) OVER (ORDER BY last_order DESC, o_custkey) AS r_tile,
         ntile(4) OVER (ORDER BY n_orders DESC, o_custkey) AS f_tile,
         ntile(4) OVER (ORDER BY spend DESC, o_custkey) AS m_tile
  FROM per_cust
)
SELECT r_tile, f_tile, m_tile, count(*) AS n_customers
FROM tiled GROUP BY r_tile, f_tile, m_tile
ORDER BY r_tile, f_tile, m_tile"""


def funnel_conversion_sql() -> str:
    return """
WITH tv AS (
  SELECT user_id, min(ts) AS t_view FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
tc AS (
  SELECT e.user_id, min(e.ts) AS t_click
  FROM events e JOIN tv ON e.user_id = tv.user_id
  WHERE e.event_type = 'click' AND e.ts > tv.t_view
  GROUP BY e.user_id
),
tp AS (
  SELECT e.user_id, min(e.ts) AS t_purchase
  FROM events e JOIN tc ON e.user_id = tc.user_id
  WHERE e.event_type = 'purchase' AND e.ts > tc.t_click
  GROUP BY e.user_id
)
SELECT (SELECT count(*) FROM tv) AS n_view_users,
       (SELECT count(*) FROM tc) AS n_click_users,
       (SELECT count(*) FROM tp) AS n_purchase_users,
       round((SELECT count(*) FROM tc) / (SELECT count(*) FROM tv)::DOUBLE, 6)
         AS view_to_click,
       round((SELECT count(*) FROM tp) / (SELECT count(*) FROM tc)::DOUBLE, 6)
         AS click_to_purchase"""


def top_supplier_revenue_sql(
    start: str = "1996-01-01", end: str = "1996-04-01"
) -> str:
    return f"""
WITH rev AS (
  SELECT l_suppkey,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= '{start}' AND l_shipdate < '{end}'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
ORDER BY s_suppkey"""


def prefix_dedup_sql(prefix_len: int = 120) -> str:
    fp = _fp(f"substr({_NORM_TEXT}, 1, {prefix_len})")
    return f"""
SELECT fingerprint, count(*) AS n_docs, min(doc_id) AS canonical_doc_id
FROM (SELECT doc_id, {fp} AS fingerprint FROM documents)
GROUP BY fingerprint HAVING count(*) >= 2 ORDER BY fingerprint"""


def term_cooccurrence_sql(
    window: int = 3, k: int = 20, min_count: int = 5
) -> str:
    return f"""
WITH tok AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS word,
         generate_subscripts(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}'), 1)
           - 1 AS pos
  FROM documents
),
pairs AS (
  SELECT a.word AS w_a, b.word AS w_b
  FROM tok a JOIN tok b
    ON a.doc_id = b.doc_id AND b.pos BETWEEN a.pos + 1 AND a.pos + {window}
),
pc AS (SELECT w_a, w_b, count(*) AS pair_n FROM pairs GROUP BY w_a, w_b),
uni AS (SELECT word, count(*) AS cnt FROM tok GROUP BY word),
tot AS (
  SELECT (SELECT count(*) FROM tok)::DOUBLE AS n_tokens,
         (SELECT sum(pair_n) FROM pc)::DOUBLE AS n_pairs
)
SELECT w_a, w_b, pair_n, ua.cnt::BIGINT AS cnt_a, ub.cnt::BIGINT AS cnt_b,
       round(ln((pair_n / n_pairs)
                / ((ua.cnt / n_tokens) * (ub.cnt / n_tokens))), 6) AS pmi
FROM pc
CROSS JOIN tot
JOIN uni ua ON ua.word = w_a
JOIN uni ub ON ub.word = w_b
WHERE pair_n >= {min_count}
ORDER BY pair_n DESC, w_a, w_b LIMIT {k}"""


def mixture_rebalance_sql(
    targets: dict[str, float] | None = None, salt: str = "mix-v1"
) -> str:
    targets = targets or {"en": 0.2, "de": 0.2, "fr": 0.2, "es": 0.2, "zh": 0.2}
    tcase = " ".join(
        f"WHEN '{lg}' THEN {float(t)!r}" for lg, t in sorted(targets.items())
    )
    fp = _fp(f"concat_ws(':', '{salt}', doc_id)")
    return f"""
WITH counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
shares AS (
  SELECT lang, n, n / (SELECT sum(n) FROM counts)::DOUBLE AS share,
         (CASE lang {tcase} ELSE 0.0 END) AS target
  FROM counts
),
sc AS (SELECT min(share / target) AS scale FROM shares WHERE target > 0),
rates AS (
  SELECT lang, n, share,
         CASE WHEN target > 0
              THEN least(1.0, target * (SELECT scale FROM sc) / share)
              ELSE 0.0 END AS rate
  FROM shares
),
kept AS (
  SELECT d.lang, max(r.n) AS n_docs,
         round(max(r.share), 6) AS share, round(max(r.rate), 6) AS rate,
         sum(CASE WHEN (({fp}) % 1000000) / 1000000.0 < r.rate
             THEN 1 ELSE 0 END) AS n_kept
  FROM documents d JOIN rates r ON d.lang = r.lang
  GROUP BY d.lang
)
SELECT lang, n_docs, share, rate, n_kept::BIGINT AS n_kept,
       round(n_kept / (SELECT sum(n_kept) FROM kept)::DOUBLE, 6) AS kept_share
FROM kept ORDER BY lang"""


def temperature_mixture_sql(alpha: float = 0.7) -> str:
    return f"""
WITH counts AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
s AS (
  SELECT lang, n_docs,
         n_docs / (SELECT sum(n_docs) FROM counts)::DOUBLE AS share_raw,
         round(n_docs / (SELECT sum(n_docs) FROM counts)::DOUBLE, 6) AS share
  FROM counts
),
p AS (
  SELECT lang, n_docs, share_raw, share,
         round(pow(share, {float(alpha)!r}), 6) AS w
  FROM s
),
z AS (SELECT round(sum(w), 6) AS z FROM p)
SELECT lang, n_docs, share,
       round(w / (SELECT z FROM z), 6) AS temp_share,
       round((w / (SELECT z FROM z)) / share_raw, 6) AS sampling_factor
FROM p ORDER BY lang"""


def training_order_audit_sql(
    n_shards: int = 8, salt: str = "shuffle-v1"
) -> str:
    fp = _fp(f"concat_ws(':', '{salt}', doc_id)")
    return f"""
WITH a AS (
  SELECT doc_id, ({fp}) % {n_shards} AS shard, {fp} AS pos_key FROM documents
),
g AS (
  SELECT shard,
         abs(doc_id - lag(doc_id) OVER (PARTITION BY shard
                                        ORDER BY pos_key, doc_id)) AS gap
  FROM a
),
per AS (
  SELECT shard, count(*) AS n_docs, sum(gap)::BIGINT AS gap_sum,
         count(gap) AS n_gaps
  FROM g GROUP BY shard
)
SELECT shard, n_docs,
       round(n_docs / (SELECT sum(n_docs) FROM per)::DOUBLE, 6) AS share,
       round(gap_sum::DOUBLE / n_gaps, 6) AS mean_source_gap
FROM per ORDER BY shard"""


def delta_dedup_stats_sql(mod: int = 5) -> str:
    return f"""
WITH docs AS (
  SELECT doc_id, source, {_fp(_NORM_TEXT)} AS fp FROM documents
),
base AS (SELECT DISTINCT fp FROM docs WHERE doc_id % {mod} != 0),
inc AS (
  SELECT d.source, (b.fp IS NOT NULL) AS in_base,
         row_number() OVER (PARTITION BY d.fp ORDER BY d.doc_id) AS rn
  FROM docs d LEFT JOIN base b ON d.fp = b.fp
  WHERE d.doc_id % {mod} = 0
)
SELECT source, count(*) AS n_incoming,
       sum(CASE WHEN in_base THEN 1 ELSE 0 END)::BIGINT AS n_dup_vs_base,
       sum(CASE WHEN NOT in_base AND rn > 1 THEN 1 ELSE 0 END)::BIGINT
           AS n_dup_within_batch,
       sum(CASE WHEN NOT in_base AND rn = 1 THEN 1 ELSE 0 END)::BIGINT
           AS n_new_unique
FROM inc GROUP BY source ORDER BY source"""


def zipf_fit_sql(top_n: int = 1000) -> str:
    return f"""
WITH tok AS (
  SELECT unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS word
  FROM documents
),
top AS (
  SELECT word, count(*) AS cnt FROM tok GROUP BY 1
  ORDER BY cnt DESC, word LIMIT {top_n}
),
pts AS (
  SELECT round(ln((row_number() OVER (ORDER BY cnt DESC, word))::DOUBLE), 6)
             AS x,
         round(ln(cnt::DOUBLE), 6) AS y
  FROM top
),
s AS (
  SELECT count(*)::BIGINT AS n, round(sum(x), 6) AS sx,
         round(sum(y), 6) AS sy, round(sum(x*x), 6) AS sxx,
         round(sum(x*y), 6) AS sxy, round(sum(y*y), 6) AS syy
  FROM pts
)
SELECT n AS n_terms,
       round((n*sxy - sx*sy) / nullif(n*sxx - sx*sx, 0.0), 4) AS slope,
       round((sy - ((n*sxy - sx*sy) / nullif(n*sxx - sx*sx, 0.0)) * sx) / n, 4)
           AS intercept,
       round(((n*sxy - sx*sy) * (n*sxy - sx*sy))
             / nullif((n*sxx - sx*sx) * (n*syy - sy*sy), 0.0), 4) AS r2
FROM s"""


def _probe_rows_sql(positive_label: int, dim: int) -> str:
    """Shared bias-augmented row-form CTE for the linear/logistic probes
    (mirrors ml._design_arr): dim 0 = bias 1.0, dims 1..D = embedding."""
    return f"""rows_f AS MATERIALIZED (
  -- identified, labeled, vector-bearing rows only (mirrors the
  -- _design_arr filter; the null-key sweep caught NULL vec_ids
  -- collapsing into one row through the vec_id-keyed joins here)
  SELECT vec_id, i AS dim, (embedding[i])::DOUBLE AS val,
         CASE WHEN label = {positive_label} THEN 1.0 ELSE 0.0 END AS y
  FROM embeddings, generate_series(1, {dim}) s(i)
  WHERE vec_id IS NOT NULL AND embedding IS NOT NULL AND label IS NOT NULL
  UNION ALL
  SELECT vec_id, 0 AS dim, 1.0 AS val,
         CASE WHEN label = {positive_label} THEN 1.0 ELSE 0.0 END AS y
  FROM embeddings
  WHERE vec_id IS NOT NULL AND embedding IS NOT NULL AND label IS NOT NULL
)"""


def _gj_chain_ctes(prefix: str, src: str, d: int) -> tuple[list[str], str]:
    """Unrolled Gauss-Jordan elimination over an augmented (i, j, v)
    matrix CTE ``src`` (i in 0..d-1, j in 0..d; column d = rhs): one
    MATERIALIZED CTE per pivot step. Materialization is load-bearing —
    each step references its predecessor 4 times and inlining would blow
    up exponentially. The arithmetic is op-order-identical to
    ``ml.gauss_jordan_solve`` (divide, multiply, subtract — no pivoting,
    no FMA), so identical input cells give bit-identical solutions.
    Returns (ctes, final_name); the solution is final_name's j = d
    column."""
    ctes = []
    prev = src
    for k in range(d):
        name = f"{prefix}_{k + 1}"
        ctes.append(
            f"""{name} AS MATERIALIZED (
  SELECT m.i, m.j,
         CASE WHEN m.i = {k} THEN m.v / p.v
              ELSE m.v - c.v * (r.v / p.v) END AS v
  FROM {prev} m
  JOIN {prev} p ON p.i = {k} AND p.j = {k}
  JOIN {prev} r ON r.i = {k} AND r.j = m.j
  JOIN {prev} c ON c.i = m.i AND c.j = {k}
)"""
        )
        prev = name
    return ctes, prev


def ridge_probe_sql(
    positive_label: int = RIDGE_POS_LABEL,
    lam: float = RIDGE_LAM,
    dim: int = DIM,
) -> str:
    """Mirrors ml.ridge_probe — including the 65x65 normal-equations
    SOLVE, via ``_gj_chain_ctes``. Determinism contract (shared constants
    MICRO/RIDGE_LAM/RIDGE_POS_LABEL, same file the Spark side imports):
    every sufficient-statistic cell and every dot product is an
    exact-integer micro-unit sum, so both engines see bit-identical
    matrices; the elimination matches ``ml.gauss_jordan_solve`` op for
    op, so the weights and therefore the scored outputs agree
    bit-for-bit before the final 4dp rounding."""
    d = dim + 1  # bias feature at dim 0; embedding dims 1..dim
    micro = repr(MICRO)
    ctes = [
        _probe_rows_sql(positive_label, dim),
        f"""xtx AS (
  SELECT a.dim AS i, b.dim AS j,
         sum(floor(a.val * b.val * {micro} + 0.5)) / {micro} AS v
  FROM rows_f a JOIN rows_f b USING (vec_id)
  GROUP BY 1, 2
)""",
        f"""xty AS (
  SELECT dim AS i, sum(floor(val * y * {micro} + 0.5)) / {micro} AS v
  FROM rows_f GROUP BY 1
)""",
        f"""g0 AS MATERIALIZED (
  SELECT i, j, CASE WHEN i = j THEN v + {lam!r} ELSE v END AS v FROM xtx
  UNION ALL
  SELECT i, {d} AS j, v FROM xty
)""",
    ]
    chain, last = _gj_chain_ctes("g", "g0", d)
    ctes.extend(chain)
    ctes.append(f"w AS (SELECT i AS dim, v AS w FROM {last} WHERE j = {d})")
    ctes.append(
        f"""scored AS (
  SELECT r.vec_id, r.y,
         sum(floor(r.val * w.w * {micro} + 0.5)) / {micro} AS pred
  FROM rows_f r JOIN w USING (dim)
  GROUP BY 1, 2
)"""
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT count(*)::BIGINT AS n_vecs,
       round(sqrt(sum(round((pred - y) * (pred - y) * {micro}, 0))
                  / (count(*) * {micro})), 4) AS rmse,
       round(sum(CASE WHEN (pred > 0.5) = (y > 0.5) THEN 1
                 ELSE 0 END)::DOUBLE / count(*), 4) AS accuracy,
       round(avg(y), 4) AS pos_rate
FROM scored"""
    )


def logistic_probe_sql(
    positive_label: int = RIDGE_POS_LABEL,
    n_iters: int = 3,
    lam: float = RIDGE_LAM,
    dim: int = DIM,
) -> str:
    """Mirrors ml.logistic_probe: 3 unrolled IRLS iterations, each =
    micro-unit scoring pass -> 6dp-rounded sigmoid (the rounding kills
    1-ulp exp() differences between libm implementations per step, the
    repo's iterative-float rule) -> micro-unit gradient/Hessian ->
    Gauss-Jordan Newton solve (``_gj_chain_ctes``) -> weight update.
    ~220 generated CTEs; every cross-engine sum is association-free by
    construction, so the per-iteration weights are bit-identical."""
    d = dim + 1
    micro = repr(MICRO)
    ctes = [
        _probe_rows_sql(positive_label, dim),
        f"w0 AS (SELECT i AS dim, 0.0 AS w FROM range(0, {d}) t(i))",
    ]
    cur_w = "w0"
    for t in range(n_iters):
        ctes.append(
            f"""eta{t} AS (
  SELECT r.vec_id, r.y,
         sum(floor(r.val * w.w * {micro} + 0.5)) / {micro} AS eta
  FROM rows_f r JOIN {cur_w} w USING (dim)
  GROUP BY 1, 2
)"""
        )
        ctes.append(
            f"""resid{t} AS MATERIALIZED (
  SELECT vec_id, y - mu AS r, mu * (1.0 - mu) AS s
  FROM (SELECT vec_id, y, round(1.0 / (1.0 + exp(-eta)), 6) AS mu
        FROM eta{t})
)"""
        )
        ctes.append(
            f"""grad{t} AS (
  SELECT r.dim AS i, sum(floor(r.val * x.r * {micro} + 0.5)) / {micro} AS v
  FROM rows_f r JOIN resid{t} x USING (vec_id)
  GROUP BY 1
)"""
        )
        ctes.append(
            f"""hess{t} AS (
  SELECT a.dim AS i, b.dim AS j,
         sum(floor(a.val * b.val * a.s * {micro} + 0.5)) / {micro} AS v
  FROM (SELECT r.vec_id, r.dim, r.val, x.s
        FROM rows_f r JOIN resid{t} x USING (vec_id)) a
  JOIN rows_f b USING (vec_id)
  GROUP BY 1, 2
)"""
        )
        ctes.append(
            f"""aug{t} AS MATERIALIZED (
  SELECT i, j, CASE WHEN i = j THEN v + {lam!r} ELSE v END AS v
  FROM hess{t}
  UNION ALL
  SELECT g.i, {d} AS j, g.v - {lam!r} * w.w AS v
  FROM grad{t} g JOIN {cur_w} w ON w.dim = g.i
)"""
        )
        chain, last = _gj_chain_ctes(f"n{t}", f"aug{t}", d)
        ctes.extend(chain)
        ctes.append(
            f"""w{t + 1} AS MATERIALIZED (
  SELECT w.dim, w.w + s.v AS w
  FROM {cur_w} w
  JOIN (SELECT i AS dim, v FROM {last} WHERE j = {d}) s USING (dim)
)"""
        )
        cur_w = f"w{t + 1}"
    ctes.append(
        f"""etaf AS (
  SELECT r.vec_id, r.y,
         sum(floor(r.val * w.w * {micro} + 0.5)) / {micro} AS eta
  FROM rows_f r JOIN {cur_w} w USING (dim)
  GROUP BY 1, 2
)"""
    )
    ctes.append(
        "muf AS (SELECT y, round(1.0 / (1.0 + exp(-eta)), 6) AS mu FROM etaf)"
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT count(*)::BIGINT AS n_vecs,
       {n_iters}::BIGINT AS n_iters,
       round(sum(CASE WHEN (mu > 0.5) = (y > 0.5) THEN 1
                 ELSE 0 END)::DOUBLE / count(*), 4) AS accuracy,
       round(sum(round(-(y * ln(mu + 1e-12)
                         + (1.0 - y) * ln(1.0 - mu + 1e-12))
                       * {micro}, 0)) / (count(*) * {micro}), 4) AS log_loss
FROM muf"""
    )


def bpe_merge_candidates_sql(top_k: int = 20) -> str:
    return f"""
WITH w AS (
  SELECT unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS word
  FROM documents
),
p AS (
  SELECT unnest(list_transform(range(1, len(word)),
                               i -> substr(word, i, 2))) AS pair
  FROM w WHERE len(word) >= 2
)
SELECT pair, count(*) AS cnt FROM p GROUP BY 1
ORDER BY cnt DESC, pair LIMIT {top_k}"""


def bpe_learn_sql(n_merges: int = 5) -> str:
    """DuckDB twin of ``text.bpe_learn`` — the full sequential BPE
    training loop, UNROLLED to ``n_merges`` CTE stages (the loop bound is
    a compile-time constant, so unrolling is exact, not an
    approximation). Each stage: adjacent-pair counts over the previous
    segmentation, the deterministic (cnt DESC, a, b) top-1 pick, then a
    greedy left-to-right ``list_reduce`` re-segmentation capturing the
    picked pair from a cross-joined 1-row CTE — the same fold semantics
    as the Spark side's ``aggregate`` expression (singleton-list initial
    accumulator == empty-accumulator fold, because the fold's first step
    always appends). Converts the registry's last rows-only entry into a
    full value-hash oracle: every emitted fact (round, pair, merged
    token, weighted count) is integer/string-exact."""
    stages = [
        f"""wf AS (
  SELECT word, count(*)::BIGINT AS freq
  FROM (SELECT unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}'))
               AS word
        FROM documents)
  GROUP BY 1
),
s0 AS (
  SELECT list_transform(generate_series(1, length(word)), i -> word[i])
           AS sym,
         freq
  FROM wf
)"""
    ]
    for r in range(1, n_merges + 1):
        stages.append(f"""p{r} AS (
  SELECT pr[1] AS a, pr[2] AS b, sum(freq)::BIGINT AS cnt
  FROM (SELECT unnest(list_transform(generate_series(1, len(sym) - 1),
                                     i -> [sym[i], sym[i + 1]])) AS pr,
               freq
        FROM s{r - 1} WHERE len(sym) >= 2)
  GROUP BY 1, 2
),
t{r} AS (
  SELECT a, b, a || b AS m, cnt FROM p{r} ORDER BY cnt DESC, a, b LIMIT 1
),
s{r} AS (
  SELECT list_reduce(
           list_transform(sym, s -> [s]),
           (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = t{r}.a
                                 AND x[1] = t{r}.b
                       THEN list_append(list_slice(acc, 1, len(acc) - 1),
                                        t{r}.m)
                       ELSE list_append(acc, x[1]) END) AS sym,
         freq
  FROM s{r - 1}, t{r}
)""")
    union = "\nUNION ALL ".join(
        f'SELECT {r}::INT AS round, a AS "left", b AS "right", m AS merged, '
        f"cnt AS pair_count FROM t{r}"
        for r in range(1, n_merges + 1)
    )
    return "WITH " + ",\n".join(stages) + "\n" + union + "\nORDER BY round"


def epochs_plan_sql(budget_factor: float = 2.0, alpha: float = 0.7) -> str:
    return f"""
WITH per AS (
  SELECT lang, count(*) AS n_docs,
         sum(len(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')))::BIGINT
             AS corpus_tokens
  FROM documents GROUP BY 1
),
t AS (SELECT sum(corpus_tokens)::BIGINT AS total_tokens FROM per),
s AS (
  SELECT lang, n_docs, corpus_tokens,
         round(corpus_tokens / (SELECT total_tokens FROM t)::DOUBLE, 6)
             AS token_share
  FROM per
),
p AS (
  SELECT *, round(pow(token_share, {float(alpha)!r}), 6) AS w FROM s
),
z AS (SELECT round(sum(w), 6) AS z FROM p),
e AS (
  SELECT lang, n_docs, corpus_tokens, token_share,
         round(w / (SELECT z FROM z), 6) AS temp_share
  FROM p
)
SELECT lang, n_docs, corpus_tokens, token_share, temp_share,
       round({float(budget_factor)!r} * (SELECT total_tokens FROM t)
             * temp_share / corpus_tokens, 4) AS epochs,
       (round({float(budget_factor)!r} * (SELECT total_tokens FROM t)
              * temp_share / corpus_tokens, 4) > 4.0) AS repeat_warning
FROM e ORDER BY lang"""


def train_test_split_sql(test_pct: int = 10, salt: str = "split-v1") -> str:
    fp = _fp(f"concat_ws(':', '{salt}', doc_id)")
    return f"""
WITH t AS (
  SELECT CASE WHEN {fp} % 100 < {test_pct} THEN 'test' ELSE 'train' END AS split,
         lang,
         len(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS n_tokens
  FROM documents
)
SELECT split, lang, count(*) AS n_docs,
       sum(n_tokens)::BIGINT AS total_tokens,
       round(avg(n_tokens), 6) AS avg_tokens
FROM t GROUP BY split, lang ORDER BY split, lang"""


def stratified_sample_sql(k: int = 5, salt: str = "sample-v1") -> str:
    fp = _fp(f"concat_ws(':', '{salt}', doc_id)")
    return f"""
WITH t AS (
  SELECT doc_id, lang, {fp} AS tag FROM documents
),
r AS (
  SELECT lang, doc_id, tag,
         row_number() OVER (PARTITION BY lang ORDER BY tag, doc_id) AS rank
  FROM t
)
SELECT lang, rank::BIGINT AS rank, doc_id, tag
FROM r WHERE rank <= {k} ORDER BY lang, rank"""


def length_histogram_sql(bucket_width: int = 50) -> str:
    return f"""
WITH t AS (
  SELECT (floor(len(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}'))
                / {bucket_width}) * {bucket_width})::BIGINT AS bucket_lo,
         n_chars::DOUBLE AS n_chars
  FROM documents
)
SELECT bucket_lo, count(*) AS n_docs, round(avg(n_chars), 6) AS avg_chars
FROM t GROUP BY bucket_lo ORDER BY bucket_lo"""


def brand_promo_revenue_sql() -> str:
    return """
SELECT p_brand, count(*) AS n_items,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
         AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
         AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
         AND l_quantity BETWEEN 20 AND 30)
GROUP BY p_brand ORDER BY p_brand"""


def sequence_packing_sql(
    budget: int = 2048, n_shards: int = 32, salt: str = "pack-v1"
) -> str:
    fp = _fp(f"concat_ws(':', '{salt}', doc_id)")
    return f"""
WITH staged AS (
  SELECT doc_id,
         len(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS n_tokens,
         ({fp}) % {n_shards} AS shard
  FROM documents
),
packed AS (
  SELECT shard,
         (coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          // {budget})::BIGINT AS pack_id,
         n_tokens
  FROM staged
)
SELECT shard, pack_id, count(*) AS n_docs,
       sum(n_tokens)::BIGINT AS pack_tokens,
       round(sum(n_tokens) / {budget}, 6) AS fill_ratio
FROM packed GROUP BY shard, pack_id ORDER BY shard, pack_id"""


def embedding_neardup_sql(
    tau: float = 0.35, n_planes: int = N_PLANES, n_tables: int = N_TABLES
) -> str:
    return f"""
WITH {_lsh_norms_sql(n_planes, n_tables)},
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM long a JOIN long b ON a.t = b.t AND a.bucket = b.bucket
  WHERE a.vec_id < b.vec_id
)
SELECT vec_a, vec_b,
       round(list_dot_product(na.v, nb.v) / (na.v_norm * nb.v_norm), 6) AS cosine
FROM cand
JOIN norms na ON cand.vec_a = na.vec_id
JOIN norms nb ON cand.vec_b = nb.vec_id
WHERE list_dot_product(na.v, nb.v) / (na.v_norm * nb.v_norm) >= {tau}
ORDER BY vec_a, vec_b"""


def embedding_quantization_sql(dim: int = DIM) -> str:
    return f"""
WITH vd AS (
  SELECT vec_id, i AS dim, (embedding[i])::DOUBLE AS val
  FROM embeddings, generate_series(1, {dim}) s(i)
),
ds AS (SELECT dim, min(val) AS lo, max(val) AS hi FROM vd GROUP BY dim),
err AS (
  SELECT vec_id,
         CASE WHEN hi - lo = 0 THEN 0.0 ELSE
         (val - (lo + round((val - lo) / (hi - lo) * 255) * (hi - lo) / 255))
         * (val - (lo + round((val - lo) / (hi - lo) * 255) * (hi - lo) / 255))
         END AS sq_err
  FROM vd JOIN ds USING (dim)
),
sse AS (SELECT vec_id, sum(sq_err) AS sse FROM err GROUP BY vec_id)
SELECT label, count(*) AS n_vecs,
       round(avg(sse), 6) AS avg_sse, round(max(sse), 6) AS max_sse
FROM embeddings JOIN sse USING (vec_id)
GROUP BY label ORDER BY label"""


def _pq_stack(m: int = 8, k: int = 4, dim: int = DIM) -> str:
    """Shared CTE stack for the PQ oracles (mirrors similarity.pq_index):
    subspaced dims -> seed codebooks -> assign -> Lloyd update -> codes."""
    sub_dim = dim // m
    seed_rows = ",\n        ".join(
        f"({s}, {c}, {s * sub_dim + d + 1}, {plane_weight(s * 41 + c, d)!r})"
        for s in range(m)
        for c in range(k)
        for d in range(sub_dim)
    )
    return f"""vd AS (
  SELECT vec_id, i AS dim, ((i - 1) // {sub_dim})::INT AS s,
         (embedding[i])::DOUBLE AS val
  FROM embeddings, generate_series(1, {dim}) t(i)
),
c0 AS (
  SELECT * FROM (VALUES
        {seed_rows}
  ) v(s, c, dim, cval)
),
d0 AS (
  SELECT vd.vec_id, vd.s, c0.c,
         sum((vd.val - c0.cval) * (vd.val - c0.cval)) AS dist2
  FROM vd JOIN c0 ON vd.s = c0.s AND vd.dim = c0.dim
  GROUP BY vd.vec_id, vd.s, c0.c
),
a0 AS (
  SELECT vec_id, s, c FROM (
    SELECT vec_id, s, c,
           row_number() OVER (PARTITION BY vec_id, s ORDER BY dist2, c) AS rn
    FROM d0) WHERE rn = 1
),
c1 AS (
  SELECT vd.s, a0.c, vd.dim, avg(vd.val) AS cval
  FROM vd JOIN a0 ON vd.vec_id = a0.vec_id AND vd.s = a0.s
  GROUP BY vd.s, a0.c, vd.dim
),
d1 AS (
  SELECT vd.vec_id, vd.s, c1.c,
         sum((vd.val - c1.cval) * (vd.val - c1.cval)) AS dist2
  FROM vd JOIN c1 ON vd.s = c1.s AND vd.dim = c1.dim
  GROUP BY vd.vec_id, vd.s, c1.c
),
codes AS (
  SELECT vec_id, s, c FROM (
    SELECT vec_id, s, c,
           row_number() OVER (PARTITION BY vec_id, s ORDER BY dist2, c) AS rn
    FROM d1) WHERE rn = 1
)"""


def pq_quantization_sql(m: int = 8, k: int = 4, dim: int = DIM) -> str:
    return f"""
WITH {_pq_stack(m, k, dim)},
err AS (
  SELECT vd.vec_id,
         sum((vd.val - c1.cval) * (vd.val - c1.cval)) AS sse
  FROM vd
  JOIN codes ON vd.vec_id = codes.vec_id AND vd.s = codes.s
  JOIN c1 ON c1.s = codes.s AND c1.c = codes.c AND c1.dim = vd.dim
  GROUP BY vd.vec_id
)
SELECT label, count(*) AS n_vecs,
       round(avg(sse), 6) AS avg_sse, round(max(sse), 6) AS max_sse
FROM embeddings JOIN err USING (vec_id)
GROUP BY label ORDER BY label"""


def knn_pq_sql(
    n_queries: int = 5, topk: int = 5, m: int = 8, k: int = 4, dim: int = DIM
) -> str:
    sub_dim = dim // m
    return f"""
WITH {_pq_stack(m, k, dim)},
qd AS (
  SELECT vec_id AS q_id, ((i - 1) // {sub_dim})::INT AS s, i AS dim,
         (embedding[i])::DOUBLE AS val
  FROM embeddings, generate_series(1, {dim}) t(i)
  WHERE vec_id < {n_queries}
),
lut AS (
  SELECT qd.q_id, qd.s, c1.c,
         sum((qd.val - c1.cval) * (qd.val - c1.cval)) AS pdist
  FROM qd JOIN c1 ON qd.s = c1.s AND qd.dim = c1.dim
  GROUP BY qd.q_id, qd.s, c1.c
),
scored AS (
  SELECT lut.q_id, codes.vec_id, round(sum(lut.pdist), 6) AS adist2
  FROM codes JOIN lut ON codes.s = lut.s AND codes.c = lut.c
  GROUP BY lut.q_id, codes.vec_id
  HAVING codes.vec_id <> lut.q_id
),
ranked AS (
  SELECT q_id, vec_id, adist2,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY adist2, vec_id) AS rank
  FROM scored
)
SELECT q_id, rank::BIGINT AS rank, vec_id, adist2
FROM ranked WHERE rank <= {topk} ORDER BY q_id, rank"""


def _centroid_values_sql(n_cells: int = 8, dim: int = DIM) -> str:
    rows = []
    for c in range(n_cells):
        vals = ", ".join(repr(plane_weight(c, d)) for d in range(dim))
        rows.append(f"({c}, [{vals}]::DOUBLE[])")
    return ",\n        ".join(rows)


def _ivf_stack(
    n_cells: int = 8, n_queries: int = 5, dim: int = DIM, where: str = ""
) -> str:
    """CTE stack shared by knn_ivf / ivf_cell_sizes / ivf_delta_assign
    (mirrors operators.similarity: seed centroids -> assign -> Lloyd
    update -> final assignment). ``where`` filters the TRAINING corpus
    (the delta-assign oracle trains on the base split only)."""
    return f"""c0 AS (
  SELECT cell, i AS dim, arr[i] AS cval
  FROM (VALUES {_centroid_values_sql(n_cells, dim)}) t(cell, arr),
       generate_series(1, {dim}) s(i)
),
vd AS (
  SELECT vec_id, i AS dim, (embedding[i])::DOUBLE AS val
  FROM embeddings, generate_series(1, {dim}) s(i)
  {where}
),
d1 AS (
  SELECT vd.vec_id, c0.cell,
         sum((vd.val - c0.cval) * (vd.val - c0.cval)) AS dist2
  FROM vd JOIN c0 USING (dim) GROUP BY 1, 2
),
a1 AS (
  SELECT vec_id, cell FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY dist2, cell) AS rn FROM d1)
  WHERE rn = 1
),
c1 AS (
  SELECT cell, dim, avg(val) AS cval
  FROM vd JOIN a1 USING (vec_id) GROUP BY 1, 2
),
d2 AS (
  SELECT vd.vec_id, c1.cell,
         sum((vd.val - c1.cval) * (vd.val - c1.cval)) AS dist2
  FROM vd JOIN c1 USING (dim) GROUP BY 1, 2
),
fa AS (
  SELECT vec_id, cell FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY dist2, cell) AS rn FROM d2)
  WHERE rn = 1
)"""


def knn_ivf_sql(
    n_queries: int = 5, k: int = 5, n_cells: int = 8, n_probe: int = 2
) -> str:
    return f"""
WITH {_ivf_stack(n_cells, n_queries)},
corpus AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
norms AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS v_norm FROM corpus),
queries AS (SELECT vec_id AS q_id, v AS q, v_norm AS q_norm
            FROM norms WHERE vec_id < {n_queries}),
probes AS (
  SELECT q_id, cell FROM (
    SELECT vec_id AS q_id, cell, dist2,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY dist2, cell) AS rn
    FROM d2 WHERE vec_id < {n_queries})
  WHERE rn <= {n_probe}
),
scored AS (
  SELECT q.q_id, n.vec_id,
         list_dot_product(n.v, q.q) / (n.v_norm * q.q_norm) AS cosine
  FROM norms n
  JOIN fa ON n.vec_id = fa.vec_id
  JOIN probes p ON p.cell = fa.cell
  JOIN queries q ON q.q_id = p.q_id
  WHERE n.vec_id <> q.q_id
),
ranked AS (
  SELECT q_id, vec_id, cosine,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY cosine DESC, vec_id) AS rank
  FROM scored
)
SELECT q_id, rank::BIGINT AS rank, vec_id, round(cosine, 6) AS cosine
FROM ranked WHERE rank <= {k} ORDER BY q_id, rank"""


def embedding_spectrum_sql(n_iters: int = 3, dim: int = DIM) -> str:
    """Mirrors similarity.embedding_spectrum: rounded covariance cells,
    rounded power-iteration vectors, Rayleigh eigenvalue."""
    ctes = [
        f"""vd AS (
  SELECT vec_id, i AS dim, (embedding[i])::DOUBLE AS val
  FROM embeddings, generate_series(1, {dim}) s(i)
)""",
        """means AS (SELECT dim, round(avg(val), 6) AS m FROM vd GROUP BY 1)""",
        """c AS (
  SELECT vec_id, vd.dim, val - m AS cv FROM vd JOIN means USING (dim)
)""",
        """cov AS (
  SELECT a.dim AS i, b.dim AS j,
         round(sum(a.cv * b.cv) / count(*), 6) AS v
  FROM c a JOIN c b USING (vec_id) GROUP BY 1, 2
)""",
        """b0 AS (
  SELECT dim, round(dim / (SELECT sqrt(sum(dim * dim)) FROM means), 6)
           AS bval
  FROM means
)""",
    ]
    prev = "b0"
    for k in range(1, n_iters + 1):
        ctes.append(
            f"""mv{k} AS (
  SELECT i AS dim, sum(v * bval) AS raw
  FROM cov JOIN {prev} ON cov.j = {prev}.dim GROUP BY 1
)"""
        )
        ctes.append(
            f"""b{k} AS (
  SELECT dim,
         CASE WHEN (SELECT sqrt(sum(raw * raw)) FROM mv{k}) > 0
              THEN round(raw / (SELECT sqrt(sum(raw * raw)) FROM mv{k}), 6)
              ELSE 0.0 END AS bval
  FROM mv{k}
)"""
        )
        prev = f"b{k}"
    ctes.append(
        f"""mvf AS (
  SELECT i AS dim, sum(v * bval) AS raw
  FROM cov JOIN {prev} ON cov.j = {prev}.dim GROUP BY 1
)"""
    )
    return (
        "\nWITH "
        + ",\n".join(ctes)
        + f"""
SELECT (SELECT count(*) FROM embeddings)::BIGINT AS n_vecs,
       (SELECT round(sum(v), 4) FROM cov WHERE i = j) AS trace,
       (SELECT round(sum({prev}.bval * mvf.raw), 4)
        FROM {prev} JOIN mvf USING (dim)) AS top_eigenvalue,
       CASE WHEN (SELECT round(sum(v), 4) FROM cov WHERE i = j) > 0
            THEN round((SELECT round(sum({prev}.bval * mvf.raw), 4)
                        FROM {prev} JOIN mvf USING (dim))
                       / (SELECT round(sum(v), 4) FROM cov WHERE i = j), 6)
            ELSE 0.0 END AS explained_frac"""
    )


def kmeans_inertia_sql(n_cells: int = 8, n_iters: int = 2, dim: int = DIM) -> str:
    """Mirrors similarity.kmeans_inertia: Lloyd descent trace from the
    hash-seeded centroids, one inertia row per iteration level."""
    ctes = [
        f"""c0 AS (
  SELECT cell, i AS dim, arr[i] AS cval
  FROM (VALUES {_centroid_values_sql(n_cells, dim)}) t(cell, arr),
       generate_series(1, {dim}) s(i)
)""",
        f"""vd AS (
  SELECT vec_id, i AS dim, (embedding[i])::DOUBLE AS val
  FROM embeddings, generate_series(1, {dim}) s(i)
)""",
    ]
    selects = []
    for k in range(n_iters + 1):
        ctes.append(
            f"""d{k + 1} AS (
  SELECT vd.vec_id, c{k}.cell,
         sum((vd.val - c{k}.cval) * (vd.val - c{k}.cval)) AS dist2
  FROM vd JOIN c{k} USING (dim) GROUP BY 1, 2
)"""
        )
        selects.append(
            f"""SELECT {k}::BIGINT AS iteration,
       round((SELECT sum(m) FROM (
          SELECT vec_id, min(dist2) AS m FROM d{k + 1} GROUP BY 1)), 4)
         AS inertia"""
        )
        if k < n_iters:
            ctes.append(
                f"""a{k + 1} AS (
  SELECT vec_id, cell FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY dist2, cell) AS rn FROM d{k + 1})
  WHERE rn = 1
)"""
            )
            ctes.append(
                f"""c{k + 1} AS (
  SELECT cell, dim, avg(val) AS cval
  FROM vd JOIN a{k + 1} USING (vec_id) GROUP BY 1, 2
)"""
            )
    return (
        "\nWITH "
        + ",\n".join(ctes)
        + "\n"
        + "\nUNION ALL\n".join(selects)
        + "\nORDER BY iteration"
    )


def ivf_delta_assign_sql(
    watermark: int = 400, n_cells: int = 8, dim: int = DIM
) -> str:
    """Mirrors similarity.ivf_delta_assign: index trained on
    vec_id < watermark only; new arrivals assigned to the frozen c1."""
    return f"""
WITH {_ivf_stack(n_cells, dim=dim, where=f"WHERE vec_id < {watermark}")},
vdn AS (
  SELECT vec_id, i AS dim, (embedding[i])::DOUBLE AS val
  FROM embeddings, generate_series(1, {dim}) s(i)
  WHERE vec_id >= {watermark}
),
dn AS (
  SELECT vdn.vec_id, c1.cell,
         sum((vdn.val - c1.cval) * (vdn.val - c1.cval)) AS dist2
  FROM vdn JOIN c1 USING (dim) GROUP BY 1, 2
),
na AS (
  SELECT vec_id, cell FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY dist2, cell) AS rn FROM dn)
  WHERE rn = 1
),
nb AS (SELECT cell, count(*)::BIGINT AS n_base FROM fa GROUP BY 1),
nn AS (SELECT cell, count(*)::BIGINT AS n_new FROM na GROUP BY 1)
SELECT coalesce(nb.cell, nn.cell)::BIGINT AS cell,
       coalesce(n_base, 0)::BIGINT AS n_base,
       coalesce(n_new, 0)::BIGINT AS n_new
FROM nb FULL JOIN nn ON nb.cell = nn.cell
ORDER BY cell"""


def ivf_cell_sizes_sql(n_cells: int = 8) -> str:
    return f"""
WITH {_ivf_stack(n_cells)}
SELECT cell, count(*) AS n_vecs FROM fa GROUP BY 1 ORDER BY cell"""


def language_id_sql() -> str:
    hits = ",\n    ".join(
        f"len(list_filter(tokens, t -> t IN ({', '.join(repr(w) for w in words)})))"
        f"::BIGINT AS hits_{lg}"
        for lg, words in LANG_STOPWORDS.items()
    )
    langs = list(LANG_STOPWORDS)
    best = "greatest(" + ", ".join(f"hits_{lg}" for lg in langs) + ")"
    whens = "\n    ".join(
        f"WHEN hits_{lg} = {best} AND {best} > 0 THEN '{lg}'" for lg in langs
    )
    return f"""
WITH scored AS (
  SELECT doc_id, lang,
    {hits}
  FROM (SELECT doc_id, lang,
               regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') AS tokens
        FROM documents)
)
SELECT lang, pred_lang, count(*) AS n_docs
FROM (SELECT lang, CASE {whens} ELSE 'unknown' END AS pred_lang FROM scored)
GROUP BY lang, pred_lang ORDER BY lang, pred_lang"""


def quality_scores_sql() -> str:
    stop = ", ".join(repr(w) for w in LANG_STOPWORDS["en"])
    return f"""
WITH base AS (
  SELECT doc_id, lang, text,
         length(text)::BIGINT AS n_chars_m,
         regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') AS tokens,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::BIGINT AS n_alpha,
         length(regexp_replace(text, '[^.,;:!?]', '', 'g'))::BIGINT AS n_punct,
         length(regexp_replace(text, ' ', '', 'g'))::BIGINT AS n_nospace
  FROM documents
)
SELECT doc_id, lang, n_chars_m,
       len(tokens)::BIGINT AS n_tokens,
       round(n_alpha / greatest(n_chars_m, 1), 6) AS alpha_ratio,
       round(n_punct / greatest(n_chars_m, 1), 6) AS punct_ratio,
       round(len(list_filter(tokens, t -> t IN ({stop})))
             / greatest(len(tokens), 1), 6) AS stopword_ratio,
       round((n_chars_m - n_nospace) / greatest(len(tokens), 1), 6)
         AS spaces_per_token,
       -- coalesce: DuckDB's array_to_string([], '') is NULL where
       -- Spark's array_join gives '' — a token-less doc must score 0.0
       -- (round-11 sweep 10)
       round(coalesce(length(array_to_string(tokens, '')), 0)
             / greatest(len(tokens), 1), 6)
         AS mean_token_len
FROM base ORDER BY doc_id"""


def repetition_stats_sql() -> str:
    """Mirrors text.repetition_stats: token counts + duplicate-3-gram
    occurrence fraction. Ratios are the IDENTICAL plain-double division
    the Spark side emits (cast-numerator-then-divide, no round, no
    decimal) so the exact value hash matches."""
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') AS words
  FROM documents
),
tc AS (
  SELECT doc_id, tok, count(*) AS c
  FROM (SELECT doc_id, unnest(words) AS tok FROM toks) GROUP BY 1, 2
),
tstats AS (
  SELECT doc_id, sum(c)::BIGINT AS n_tokens, count(*)::BIGINT AS n_distinct,
         max(c)::BIGINT AS top_c
  FROM tc GROUP BY 1
),
grams AS (
  SELECT doc_id, unnest(
    CASE WHEN len(words) >= 3
      THEN list_transform(generate_series(1, len(words) - 2),
                          i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])
      ELSE [] END) AS gram
  FROM toks
),
gstats AS (
  SELECT doc_id, sum(c)::BIGINT AS total_g,
         sum(CASE WHEN c > 1 THEN c ELSE 0 END)::BIGINT AS dup_g
  FROM (SELECT doc_id, gram, count(*) AS c FROM grams GROUP BY 1, 2)
  GROUP BY 1
)
SELECT t.doc_id, n_tokens,
       n_distinct::DOUBLE / n_tokens AS distinct_ratio,
       top_c::DOUBLE / n_tokens AS top_token_frac,
       CASE WHEN coalesce(total_g, 0) > 0
            THEN dup_g::DOUBLE / total_g ELSE 0.0 END AS dup_3gram_frac
FROM tstats t LEFT JOIN gstats g ON t.doc_id = g.doc_id
ORDER BY t.doc_id"""


def pii_scan_sql() -> str:
    """Mirrors text.pii_scan (patterns from the same constants)."""
    return f"""
WITH counts AS (
  SELECT source,
         len(regexp_extract_all(text, '{EMAIL_RE}')) AS ne,
         len(regexp_extract_all(text, '{PHONE_RE}')) AS np
  FROM documents
)
SELECT source, count(*) AS n_docs,
       sum(CASE WHEN ne > 0 THEN 1 ELSE 0 END)::BIGINT AS docs_with_email,
       sum(CASE WHEN np > 0 THEN 1 ELSE 0 END)::BIGINT AS docs_with_phone,
       sum(ne)::BIGINT AS total_emails,
       sum(np)::BIGINT AS total_phones
FROM counts GROUP BY source ORDER BY source"""


def pii_redact_stats_sql() -> str:
    """Mirrors text.pii_redact_stats (patterns from the same constants;
    same order — emails first, phones counted on the email-redacted
    text)."""
    return f"""
WITH r AS (
  SELECT source,
         len(regexp_extract_all(text, '{EMAIL_RE}')) AS ne,
         len(regexp_extract_all(
               regexp_replace(text, '{EMAIL_RE}', '[EMAIL]', 'g'),
               '{PHONE_RE}')) AS np,
         len(text) AS len0,
         len(regexp_replace(
               regexp_replace(text, '{EMAIL_RE}', '[EMAIL]', 'g'),
               '{PHONE_RE}', '[PHONE]', 'g')) AS len1
  FROM documents
)
SELECT source, count(*) AS n_docs,
       sum(CASE WHEN ne > 0 OR np > 0 THEN 1 ELSE 0 END)::BIGINT
         AS docs_redacted,
       sum(ne)::BIGINT AS emails_redacted,
       sum(np)::BIGINT AS phones_redacted,
       sum(len0)::BIGINT AS chars_before,
       sum(len1)::BIGINT AS chars_after
FROM r GROUP BY source ORDER BY source"""


def quality_dup_correlation_sql() -> str:
    """Mirrors curation.quality_dup_correlation: alpha-ratio decile band
    x exact-dup group membership (same normalized-text fingerprint as
    dedup_exact)."""
    return f"""
WITH banded AS (
  SELECT least(floor(round(
           length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
           / greatest(length(text), 1), 6) * 10)::BIGINT, 9) AS alpha_band,
         {_fp(_NORM_TEXT)} AS fingerprint
  FROM documents
),
sized AS (
  SELECT alpha_band,
         count(*) OVER (PARTITION BY fingerprint) AS group_size
  FROM banded
)
SELECT alpha_band, count(*) AS n_docs,
       sum(CASE WHEN group_size > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dup_docs,
       round(sum(CASE WHEN group_size > 1 THEN 1 ELSE 0 END)::DOUBLE
             / count(*), 6) AS dup_rate
FROM sized GROUP BY alpha_band ORDER BY alpha_band"""


def filter_funnel_sql() -> str:
    """Mirrors curation.filter_funnel — generated from the SAME gate
    constants (FUNNEL_*) so the two sides cannot drift independently."""
    from xboard_spark.operators.curation import (
        FUNNEL_MIN_ALPHA_RATIO,
        FUNNEL_MIN_STOPWORD_RATIO,
        FUNNEL_MIN_TOKENS,
        FUNNEL_TOKEN_LEN_RANGE,
    )

    lo, hi = FUNNEL_TOKEN_LEN_RANGE
    stop = ", ".join(repr(w) for w in LANG_STOPWORDS["en"])
    return f"""
WITH feats AS (
  SELECT regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') AS tokens,
         length(text)::BIGINT AS n_chars,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::BIGINT AS n_alpha
  FROM documents
),
gates AS (
  SELECT len(tokens)::BIGINT AS n_tokens,
         (len(tokens) >= {FUNNEL_MIN_TOKENS}) AS g1,
         (n_alpha / greatest(n_chars, 1) >= {FUNNEL_MIN_ALPHA_RATIO}) AS g2,
         (len(list_filter(tokens, t -> t IN ({stop})))
            / greatest(len(tokens), 1) >= {FUNNEL_MIN_STOPWORD_RATIO}) AS g3,
         (coalesce(list_sum(list_transform(tokens, t -> length(t))), 0)
            / greatest(len(tokens), 1) BETWEEN {lo} AND {hi}) AS g4
  FROM feats
),
agg AS (
  SELECT
    sum(CASE WHEN NOT g1 THEN 1 ELSE 0 END)::BIGINT AS f1,
    sum(CASE WHEN NOT g2 THEN 1 ELSE 0 END)::BIGINT AS f2,
    sum(CASE WHEN NOT g3 THEN 1 ELSE 0 END)::BIGINT AS f3,
    sum(CASE WHEN NOT g4 THEN 1 ELSE 0 END)::BIGINT AS f4,
    sum(CASE WHEN g1 THEN 1 ELSE 0 END)::BIGINT AS c1,
    sum(CASE WHEN g1 AND g2 THEN 1 ELSE 0 END)::BIGINT AS c2,
    sum(CASE WHEN g1 AND g2 AND g3 THEN 1 ELSE 0 END)::BIGINT AS c3,
    sum(CASE WHEN g1 AND g2 AND g3 AND g4 THEN 1 ELSE 0 END)::BIGINT AS c4,
    sum(CASE WHEN g1 THEN n_tokens ELSE 0 END)::BIGINT AS t1,
    sum(CASE WHEN g1 AND g2 THEN n_tokens ELSE 0 END)::BIGINT AS t2,
    sum(CASE WHEN g1 AND g2 AND g3 THEN n_tokens ELSE 0 END)::BIGINT AS t3,
    sum(CASE WHEN g1 AND g2 AND g3 AND g4 THEN n_tokens ELSE 0 END)::BIGINT
      AS t4
  FROM gates
)
SELECT * FROM (
  SELECT 1::BIGINT AS gate_idx, 'min_tokens' AS gate,
         f1 AS n_fail_alone, c1 AS n_pass_cum, t1 AS tokens_pass_cum FROM agg
  UNION ALL
  SELECT 2::BIGINT, 'alpha_ratio', f2, c2, t2 FROM agg
  UNION ALL
  SELECT 3::BIGINT, 'stopword_ratio', f3, c3, t3 FROM agg
  UNION ALL
  SELECT 4::BIGINT, 'mean_token_len', f4, c4, t4 FROM agg
) ORDER BY gate_idx"""


def canonical_docs_sql(
    n: int = 3,
    n_perms: int = N_PERMS,
    n_bands: int = N_BANDS,
    tau: float = 0.5,
    max_df: int = 100,
) -> str:
    """Mirrors dedup.canonical_docs: the dedup_clusters recursive
    fixpoint, then per-cluster representative = max tokens, tie -> min
    doc_id."""
    return f"""
WITH RECURSIVE {_minhash_stack(n, n_perms, n_bands, max_df)},
dup AS (SELECT doc_a, doc_b FROM pairs WHERE jaccard >= {tau}),
edges AS (
  SELECT doc_a AS s, doc_b AS d FROM dup
  UNION ALL
  SELECT doc_b, doc_a FROM dup
),
reach(v, m) AS (
  SELECT DISTINCT s, s FROM edges
  UNION
  SELECT r.v, e.d FROM reach r JOIN edges e ON e.s = r.m
),
lab AS (SELECT v AS doc_id, min(m) AS cluster_id FROM reach GROUP BY v),
toks AS (
  SELECT doc_id,
         len(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}'))::BIGINT
           AS n_tokens
  FROM documents
),
sized AS (
  SELECT lab.cluster_id, lab.doc_id, toks.n_tokens,
         row_number() OVER (PARTITION BY cluster_id
                            ORDER BY n_tokens DESC, lab.doc_id) AS rn,
         count(*) OVER (PARTITION BY cluster_id) AS n_members
  FROM lab JOIN toks USING (doc_id)
)
SELECT cluster_id, doc_id AS rep_doc_id, n_tokens AS rep_tokens,
       n_members::BIGINT AS n_members, (n_members - 1)::BIGINT AS n_removed
FROM sized WHERE rn = 1 ORDER BY cluster_id"""


def dedup_token_savings_sql(
    n: int = 3,
    n_perms: int = N_PERMS,
    n_bands: int = N_BANDS,
    tau: float = 0.5,
    max_df: int = 100,
) -> str:
    """Mirrors curation.dedup_token_savings: the dedup_clusters recursive
    fixpoint, keep-the-richest representative per cluster, per-lang token
    totals and the removed-token share."""
    return f"""
WITH RECURSIVE {_minhash_stack(n, n_perms, n_bands, max_df)},
dup AS (SELECT doc_a, doc_b FROM pairs WHERE jaccard >= {tau}),
edges AS (
  SELECT doc_a AS s, doc_b AS d FROM dup
  UNION ALL
  SELECT doc_b, doc_a FROM dup
),
reach(v, m) AS (
  SELECT DISTINCT s, s FROM edges
  UNION
  SELECT r.v, e.d FROM reach r JOIN edges e ON e.s = r.m
),
lab AS (SELECT v AS doc_id, min(m) AS cluster_id FROM reach GROUP BY v),
toks AS (
  SELECT doc_id, lang,
         len(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}'))::BIGINT
           AS n_tokens
  FROM documents
),
removed AS (
  SELECT doc_id FROM (
    SELECT lab.doc_id,
           row_number() OVER (PARTITION BY cluster_id
                              ORDER BY n_tokens DESC, lab.doc_id) AS rn
    FROM lab JOIN toks USING (doc_id)
  ) WHERE rn > 1
)
SELECT lang, count(*)::BIGINT AS n_docs,
       sum(n_tokens)::BIGINT AS total_tokens,
       sum(CASE WHEN r.doc_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         AS n_removed,
       coalesce(sum(CASE WHEN r.doc_id IS NOT NULL THEN n_tokens END), 0)
         ::BIGINT AS removed_tokens,
       CASE WHEN sum(n_tokens) > 0 THEN
         round(coalesce(sum(CASE WHEN r.doc_id IS NOT NULL THEN n_tokens END),
                        0)::DOUBLE / sum(n_tokens), 6)
       ELSE 0.0 END AS savings_rate
FROM toks t LEFT JOIN removed r USING (doc_id)
GROUP BY lang ORDER BY lang"""


def ngram_novelty_sql(
    test_pct: int = 10,
    n: int = 3,
    max_df: int = 100,
    salt: str = "split-v1",
) -> str:
    """Mirrors dedup.ngram_novelty: per test-split doc, fraction of its
    df-capped shingles absent from the train split."""
    fp = _fp(f"concat_ws(':', '{salt}', doc_id)")
    return f"""
WITH {_docs_cte(n)},
{_inv_cte(max_df)},
sp AS (
  SELECT doc_id,
         CASE WHEN {fp} % 100 < {test_pct} THEN 'test' ELSE 'train' END AS split
  FROM documents
),
trs AS (
  SELECT DISTINCT shfp FROM inv JOIN sp USING (doc_id) WHERE split = 'train'
),
te AS (
  SELECT inv.doc_id AS doc_id, inv.shfp
  FROM inv JOIN sp USING (doc_id) WHERE split = 'test'
)
SELECT te.doc_id, count(*)::BIGINT AS n_shingles,
       sum(CASE WHEN trs.shfp IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         AS n_overlap,
       1.0 - sum(CASE WHEN trs.shfp IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
               / count(*) AS novelty
FROM te LEFT JOIN trs ON te.shfp = trs.shfp
GROUP BY te.doc_id ORDER BY te.doc_id"""


def semantic_decontam_sql(n_test: int = 50, tau: float = 0.9) -> str:
    """Mirrors similarity.semantic_decontam: nearest training vector per
    held-out vector, contamination flag at cosine >= tau."""
    return f"""
WITH corpus AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
norms AS (
  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS v_norm FROM corpus
),
te AS (
  SELECT vec_id AS q_id, v AS q, v_norm AS q_norm FROM norms
  WHERE vec_id < {n_test}
),
tr AS (SELECT vec_id, v, v_norm FROM norms WHERE vec_id >= {n_test}),
scored AS (
  SELECT q_id, vec_id,
         list_dot_product(tr.v, te.q) / (tr.v_norm * te.q_norm) AS cosine
  FROM tr CROSS JOIN te
),
ranked AS (
  SELECT q_id, vec_id, cosine,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY cosine DESC, vec_id) AS rn
  FROM scored
)
SELECT q_id, vec_id AS train_id, round(cosine, 6) AS max_cosine,
       (CASE WHEN cosine >= {tau} THEN 1 ELSE 0 END)::BIGINT
         AS is_contaminated
FROM ranked WHERE rn = 1 ORDER BY q_id"""


def _bounds_audit_col_sql(
    table: str,
    col: str,
    kind: str,
    col_expr: str | None = None,
    value_fence: float = 1.0e12,
    ts_lo: str = "1990-01-01",
    ts_hi: str = "2035-01-01",
    quantized: bool = False,
) -> str:
    """One (table, column) row of the intake bounds audit — mirrors
    operators.profiling.bounds_audit: NULL / non-finite / out-of-fence /
    off-x100-grid / clean counts, exact integers only. ``quantized``
    mirrors the Spark side's quantized_cols (ADVICE r12): identical double
    expression ``abs(v*100 - round(v*100)) > 1e-9 + abs(v)*1e-13`` on
    identical inputs, so the verdict is cross-engine-stable by
    construction; NULL n_offgrid = no quantization contract."""
    v = col_expr or col
    offgrid_cnt = "NULL"
    if kind == "numeric":
        nonfin = f"(isnan({v}) OR isinf({v}))"
        nonfin_cnt = (
            f"coalesce(sum(CASE WHEN {v} IS NOT NULL AND {nonfin}"
            f" THEN 1 ELSE 0 END), 0)"
        )
        oob_cnt = (
            f"coalesce(sum(CASE WHEN {v} IS NOT NULL AND NOT {nonfin}"
            f" AND abs({v}) > {value_fence!r} THEN 1 ELSE 0 END), 0)"
        )
        if quantized:
            offgrid_cnt = (
                f"coalesce(sum(CASE WHEN {v} IS NOT NULL AND NOT {nonfin}"
                f" AND abs({v}) <= {value_fence!r}"
                f" AND abs({v} * 100 - round({v} * 100))"
                f" > 1e-9 + abs({v}) * 1e-13"
                f" THEN 1 ELSE 0 END), 0)"
            )
    else:
        nonfin_cnt = "0"
        oob_cnt = (
            f"coalesce(sum(CASE WHEN {v} IS NOT NULL AND"
            f" ({v} < TIMESTAMP '{ts_lo}'"
            f" OR {v} >= TIMESTAMP '{ts_hi}') THEN 1 ELSE 0 END), 0)"
        )
    # coalesce: an empty table audits as all-zero counters (mirrors the
    # Spark side's coalesce(sum, 0))
    null_cnt = f"coalesce(sum(CASE WHEN {v} IS NULL THEN 1 ELSE 0 END), 0)"
    return f"""
SELECT '{table}' AS table_name, '{col}' AS col_name, '{kind}' AS kind,
       count(*)::BIGINT AS n_rows,
       {null_cnt}::BIGINT AS n_null,
       ({nonfin_cnt})::BIGINT AS n_nonfinite,
       ({oob_cnt})::BIGINT AS n_oob,
       ({offgrid_cnt})::BIGINT AS n_offgrid,
       (count(*) - {null_cnt} - ({nonfin_cnt}) - ({oob_cnt}))::BIGINT AS n_ok
FROM {table}"""


def capture_merge_audit_sql() -> str:
    """Twin of ingest.capture_merge_demo: re-derive the per-id winning
    version from the fixture's modulo splits alone — page 1 (evens)
    beats page 0, and within page 1 the later-listed v3 re-serve
    (id % 10 == 0) beats the v2 listing. Ids on neither page
    (odd AND id % 3 == 2) are absent."""
    return """
WITH tagged AS (
  SELECT c_custkey AS id,
         CASE WHEN c_custkey % 10 = 0 THEN 'v3'
              WHEN c_custkey % 2 = 0 THEN 'v2'
              WHEN c_custkey % 3 != 2 THEN 'v1'
         END AS version_tag
  FROM customer
)
SELECT version_tag, count(*)::BIGINT AS n_customers,
       count(DISTINCT id)::BIGINT AS n_ids,
       sum(id)::BIGINT AS id_sum
FROM tagged WHERE version_tag IS NOT NULL
GROUP BY 1 ORDER BY 1"""


def input_bounds_audit_sql() -> str:
    parts = [
        _bounds_audit_col_sql("events", "value", "numeric", quantized=True),
        _bounds_audit_col_sql("events", "ts", "timestamp", EVENTS_TS),
        _bounds_audit_col_sql(
            "orders", "o_totalprice", "numeric", quantized=True
        ),
        _bounds_audit_col_sql("orders", "o_orderdate", "timestamp"),
        _bounds_audit_col_sql(
            "lineitem", "l_discount", "numeric", quantized=True
        ),
        _bounds_audit_col_sql(
            "lineitem", "l_extendedprice", "numeric", quantized=True
        ),
        _bounds_audit_col_sql("lineitem", "l_tax", "numeric", quantized=True),
        _bounds_audit_col_sql("lineitem", "l_shipdate", "timestamp"),
    ]
    return (
        "SELECT * FROM ("
        + "\nUNION ALL\n".join(parts)
        + ") ORDER BY table_name, col_name"
    )


# ------------------------------------------------------- static oracle SQL

EVENTS_TS = "ts::TIMESTAMP"
_DELIVERY_HASH = _fp(
    "concat_ws('|', user_id::VARCHAR, epoch_us(ts::TIMESTAMP)::VARCHAR, event_type)"
)


def all_oracles() -> dict[str, str]:
    rev = "l_extendedprice * (1 - l_discount)"

    def _hc(c: str) -> str:
        """exact integer cents (or percent) of a 2-decimal-clean column"""
        return f"CAST(round({c} * 100) AS BIGINT)::HUGEINT"
    return {
        "overview": """
SELECT
  (SELECT count(*) FROM customer) AS total_customers,
  (SELECT count(*) FROM orders) AS total_orders,
  (SELECT coalesce(sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT::DOUBLE / 100.0, 0) FROM orders) AS total_revenue,
  (SELECT min(o_orderstatus) FROM orders) AS sample_status""",
        "orders_by_date": """
SELECT CAST(o_orderdate AS DATE) AS order_date,
       count(*) AS order_count,
       sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT::DOUBLE / 100.0 AS revenue
FROM orders GROUP BY 1 ORDER BY order_date DESC""",
        "orders_by_date_range": """
SELECT CAST(o_orderdate AS DATE) AS order_date,
       count(*) AS order_count,
       sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT::DOUBLE / 100.0 AS revenue
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <= TIMESTAMP '1996-12-31 00:00:00'
GROUP BY 1 ORDER BY order_date DESC""",
        "top_customers": """
SELECT coalesce(c_custkey, -1) AS cust_id,
       coalesce(c_name, 'Guest Customer') AS cust_name,
       count(o_orderkey) AS orders_count,
       sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT::DOUBLE / 100.0 AS total_spent
FROM orders LEFT JOIN customer ON o_custkey = c_custkey
GROUP BY 1, 2 ORDER BY total_spent DESC, cust_id LIMIT 5""",
        "recent_orders": """
SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus, o_orderdate
FROM orders ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 10""",
        "customer_lookup": """
SELECT c_custkey, c_name, n_name AS nation_name, r_name AS region_name,
       round(c_acctbal, 2) AS acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE c_custkey = 42""",
        "upsert_merge": """
WITH updates AS (
  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
         round(o_totalprice * 1.1, 2) AS o_totalprice,
         o_orderdate, o_orderpriority, 1 AS _batch_priority
  FROM orders WHERE o_orderkey % 100 = 0
),
unioned AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
         o_orderpriority, 0 AS _batch_priority FROM orders
  UNION ALL
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
         o_orderpriority, _batch_priority FROM updates
),
merged AS (
  SELECT *, row_number() OVER (PARTITION BY o_orderkey
                               ORDER BY _batch_priority DESC) AS rn
  FROM unioned
)
SELECT o_orderstatus, count(*) AS n_orders,
       sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT::DOUBLE / 100.0
         AS total_price
FROM merged WHERE rn = 1 GROUP BY 1 ORDER BY 1""",
        # exact integer-unit arithmetic end-to-end (functions.exact,
        # round 12): HUGEINT mirrors the engine's DECIMAL(38,0) — sums
        # are bit-identical by construction and every rounding happens
        # in integer space, never on a double
        "pricing_summary": f"""
WITH u AS (
  SELECT l_returnflag, l_linestatus,
         {_hc("l_quantity")} AS qty_c,
         {_hc("l_extendedprice")} AS price_c,
         {_hc("l_discount")} AS d_pct,
         {duck_disc_price_units("l_extendedprice", "l_discount")} AS disc_u,
         {duck_charge_units("l_extendedprice", "l_discount", "l_tax")} AS chg_u
  FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
),
a AS (
  SELECT l_returnflag, l_linestatus,
         sum(qty_c) AS sq, sum(price_c) AS sp, sum(disc_u) AS sd,
         sum(chg_u) AS sc, sum(d_pct) AS spct, count(*) AS n
  FROM u GROUP BY 1, 2
)
SELECT l_returnflag, l_linestatus,
       {duck_round_div_units("sq", "1::HUGEINT", "100.0")} AS sum_qty,
       {duck_round_div_units("sp", "1::HUGEINT", "100.0")} AS sum_base_price,
       {duck_round_div_units("sd", "100::HUGEINT", "100.0")} AS sum_disc_price,
       {duck_round_div_units("sc", "10000::HUGEINT", "100.0")} AS sum_charge,
       {duck_round_div_units("(sq * 10000)", "n", "1000000.0")} AS avg_qty,
       {duck_round_div_units("(sp * 10000)", "n", "1000000.0")} AS avg_price,
       {duck_round_div_units("(spct * 10000)", "n", "1000000.0")} AS avg_disc,
       n::BIGINT AS count_order
FROM a ORDER BY 1, 2""",
        "revenue_by_nation": f"""
SELECT n_name AS nation_name,
       round(sum({rev}), 2) AS revenue,
       count(*) AS n_lineitems
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND c_nationkey = s_nationkey
GROUP BY 1 ORDER BY revenue DESC, nation_name""",
        "top_parts_by_revenue": f"""
WITH per_part AS (
  SELECT l_partkey,
         {duck_round_div_units(
             "sum(" + duck_disc_price_units("l_extendedprice", "l_discount") + ")",
             "100::HUGEINT", "100.0")} AS revenue,
         {duck_round_div_units("sum(" + _hc("l_quantity") + ")",
                               "1::HUGEINT", "100.0")} AS total_qty
  FROM lineitem GROUP BY 1
)
SELECT p_partkey, p_name, p_brand, revenue, total_qty
FROM per_part JOIN part ON l_partkey = p_partkey
ORDER BY revenue DESC, p_partkey LIMIT 10""",
        "segment_top_orders": f"""
SELECT o_orderkey, o_orderdate, round(sum({rev}), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1, 2 ORDER BY revenue DESC, o_orderkey LIMIT 10""",
        "order_priority_counts": """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey
    AND l_shipdate > o_orderdate + INTERVAL 30 DAY
)
GROUP BY 1 ORDER BY 1""",
        "volume_shipping": """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       year(l_shipdate) AS l_year,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE sn.n_name IN ('NATION_1', 'NATION_2')
  AND cn.n_name IN ('NATION_1', 'NATION_2')
  AND sn.n_name <> cn.n_name
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",
        "returned_items_report": """
SELECT c_custkey, c_name, n_name AS nation,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS lost_revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= '1996-01-01'::TIMESTAMP
  AND o_orderdate < '1997-01-01'::TIMESTAMP
GROUP BY 1, 2, 3
ORDER BY lost_revenue DESC, c_custkey ASC LIMIT 20""",
        "customer_order_distribution": """
SELECT n_orders, count(*) AS n_customers
FROM (
  SELECT c_custkey, count(o_orderkey) AS n_orders
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY 1
)
GROUP BY 1 ORDER BY n_customers DESC, n_orders DESC""",
        "small_qty_part_revenue": """
WITH li AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#13'
),
cuts AS (
  SELECT l_partkey AS ak, round(avg(l_quantity) * 0.2, 6) AS qty_cut
  FROM li GROUP BY 1
)
SELECT count(*)::BIGINT AS n_small_lineitems,
       round(coalesce(sum(l_extendedprice), 0) / 7.0, 2) AS avg_yearly
FROM li JOIN cuts ON l_partkey = ak
WHERE l_quantity < qty_cut""",
        "large_volume_orders": """
WITH big AS (
  SELECT l_orderkey, sum(l_quantity) AS total_qty
  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 300
)
SELECT c_custkey, c_name, o_orderkey,
       CAST(o_orderdate AS DATE) AS order_date, o_totalprice, total_qty
FROM orders
JOIN big ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20""",
        "nation_market_share": f"""
WITH a AS (
  SELECT year(o_orderdate)::BIGINT AS order_year,
         sum(CASE WHEN n_name = 'NATION_7'
                  THEN {duck_disc_price_units("l_extendedprice", "l_discount")}
                  ELSE 0::HUGEINT END) AS num,
         sum({duck_disc_price_units("l_extendedprice", "l_discount")}) AS den
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1
)
SELECT order_year,
       {duck_round_div_units("(num * 1000000)", "den", "1000000.0")} AS mkt_share,
       {duck_round_div_units("den", "100::HUGEINT", "100.0")} AS total_revenue
FROM a ORDER BY 1""",
        # threshold in exact integer cents: price > avg as cents*n >
        # sum_cents (functions.exact, round 12) — the double-avg threshold
        # flipped row MEMBERSHIP on boundary rows across engines
        "orders_above_cust_avg": f"""
WITH ca AS (
  SELECT o_custkey, sum({_hc("o_totalprice")}) AS cust_cents,
         count(*) AS cust_n
  FROM orders GROUP BY 1
)
SELECT o_orderstatus, count(*) AS n_above_avg,
       sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT::DOUBLE / 100.0
         AS revenue_above_avg
FROM orders JOIN ca USING (o_custkey)
WHERE {_hc("o_totalprice")} * cust_n > cust_cents
GROUP BY 1 ORDER BY 1""",
        "part_type_breakdown": """
SELECT regexp_extract(p_name, '([a-z]+)$', 1) AS noun,
       count(*) AS n_parts,
       round(sum(round(p_retailprice * 100)::BIGINT) / (count(*) * 100.0), 4)
         AS avg_price,
       count(DISTINCT p_brand) AS n_brands
FROM part WHERE p_type IN ('STANDARD', 'SMALL')
GROUP BY 1 ORDER BY 1""",
        "tenant_orders_overview": """
SELECT o_orderstatus, count(*) AS n_orders,
       sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT::DOUBLE / 100.0 AS revenue,
       count(DISTINCT o_custkey) AS n_customers
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE c_nationkey = 7
GROUP BY 1 ORDER BY 1""",
        "events_dedup": f"""
WITH h AS (SELECT *, {_DELIVERY_HASH} AS delivery_hash FROM events),
d AS (SELECT *, row_number() OVER (PARTITION BY delivery_hash
                                   ORDER BY event_id) AS rn FROM h)
SELECT event_type, count(*) AS n_events,
       sum(CAST(round(value * 100) AS BIGINT))::BIGINT::DOUBLE / 100.0 AS total_value,
       count(DISTINCT user_id) AS n_users
FROM d WHERE rn = 1 GROUP BY 1 ORDER BY 1""",
        "events_daily": """
SELECT CAST(ts AS DATE) AS event_date, event_type,
       count(*) AS n_events,
       -- exact integer-cent sum (mirrors events._cent_value_sum):
       -- associative long arithmetic, magnitude-robust cross-engine
       sum(CAST(round(value * 100) AS BIGINT))::BIGINT::DOUBLE / 100.0
         AS total_value
FROM events GROUP BY 1, 2 ORDER BY event_date DESC, event_type""",
        "session_stats": f"""
WITH base AS (
  SELECT user_id, event_id, value, ts::TIMESTAMP AS ts FROM events
),
flagged AS (
  SELECT user_id, event_id, value, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                   > {30 * 60 * 1_000_000}
              THEN 1 ELSE 0 END AS new_session
  FROM base
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT *, sum(new_session) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS session_seq
  FROM flagged
),
per AS (
  SELECT user_id, session_seq, count(*) AS n_events,
         (epoch_us(max(ts)) - epoch_us(min(ts))) AS duration_us
  FROM sess GROUP BY 1, 2
)
SELECT user_id, count(*) AS n_sessions, sum(n_events)::BIGINT AS n_events,
       (sum(duration_us)::DOUBLE / count(*)) / 1e6 AS avg_session_sec
FROM per GROUP BY 1 ORDER BY user_id""",
        "events_json_variant": """
-- json_valid guard: DuckDB's json_extract_string ERRORS on malformed
-- JSON where Spark's get_json_object / try_parse_json degrade to NULL
-- (round-11 sweep 9) — guarded, malformed rows extract NULL identically.
-- TRY_CAST behind an integer-literal regex, not ::BIGINT (ADVICE r11):
-- VALID json with a wrong-TYPE k must degrade to NULL exactly like
-- Spark's string-probe + try_cast — a bare TRY_CAST would still ROUND
-- {"k":1.5} to 2 where Spark yields NULL, and a strict ::BIGINT raised
-- ConversionException on {"k":"abc"}
WITH jx AS (
  SELECT event_type,
         CASE WHEN props IS NOT NULL AND json_valid(props)
              THEN json_extract_string(props, '$.k') END AS ks
  FROM events
),
j AS (
  SELECT event_type,
         TRY_CAST(CASE WHEN regexp_matches(ks, '^\\s*[+-]?[0-9]+\\s*$')
                       THEN ks END AS BIGINT) AS k
  FROM jx
)
SELECT event_type,
       round(avg(k), 6) AS avg_k,
       min(k) AS min_k,
       max(k) AS max_k,
       count(DISTINCT k) AS distinct_k
FROM j GROUP BY 1 ORDER BY 1""",
        "events_json": """
-- json_valid guard: DuckDB's json_extract_string ERRORS on malformed
-- JSON where Spark's get_json_object / try_parse_json degrade to NULL
-- (round-11 sweep 9) — guarded, malformed rows extract NULL identically.
-- TRY_CAST behind an integer-literal regex, not ::BIGINT (ADVICE r11):
-- VALID json with a wrong-TYPE k must degrade to NULL exactly like
-- Spark's string-probe + try_cast — a bare TRY_CAST would still ROUND
-- {"k":1.5} to 2 where Spark yields NULL, and a strict ::BIGINT raised
-- ConversionException on {"k":"abc"}
WITH jx AS (
  SELECT event_type,
         CASE WHEN props IS NOT NULL AND json_valid(props)
              THEN json_extract_string(props, '$.k') END AS ks
  FROM events
),
j AS (
  SELECT event_type,
         TRY_CAST(CASE WHEN regexp_matches(ks, '^\\s*[+-]?[0-9]+\\s*$')
                       THEN ks END AS BIGINT) AS k
  FROM jx
)
SELECT event_type,
       round(avg(k), 6) AS avg_k,
       min(k) AS min_k,
       max(k) AS max_k,
       count(DISTINCT k) AS distinct_k
FROM j GROUP BY 1 ORDER BY 1""",
        "user_rollup": """
SELECT user_id, count(*) AS n_events,
       count(DISTINCT event_type) AS n_types,
       TRUE AS types_within_bound,
       sum(CAST(round(value * 100) AS BIGINT))::BIGINT::DOUBLE / 100.0
         AS total_value,
       min(ts::TIMESTAMP) AS first_seen,
       max(ts::TIMESTAMP) AS last_seen
FROM events GROUP BY 1 ORDER BY user_id""",
        "doc_stats": f"""
SELECT lang, source, count(*) AS n_docs,
       sum(n_chars)::BIGINT AS total_chars,
       sum(n_chars)::DOUBLE / count(*) AS avg_chars,
       sum(n_tokens)::BIGINT AS total_tokens,
       sum(n_tokens)::DOUBLE / count(*) AS avg_tokens
FROM (SELECT *, len(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}'))::BIGINT
             AS n_tokens
      FROM documents)
GROUP BY 1, 2 ORDER BY 1, 2""",
        "doc_fingerprints": f"""
SELECT doc_id, {_fp(_NORM_TEXT)} AS fingerprint, lang, source
FROM documents ORDER BY doc_id""",
        "dedup_exact": f"""
SELECT fingerprint, count(*) AS n_docs, min(doc_id) AS canonical_doc_id
FROM (SELECT doc_id, {_fp(_NORM_TEXT)} AS fingerprint FROM documents)
GROUP BY 1 HAVING count(*) >= 2 ORDER BY fingerprint""",
        "quality_scores": quality_scores_sql(),
        "language_id": language_id_sql(),
        "repetition_stats": repetition_stats_sql(),
        "pii_scan": pii_scan_sql(),
        "pii_redact_stats": pii_redact_stats_sql(),
        "quality_dup_correlation": quality_dup_correlation_sql(),
        "ngram_jaccard": ngram_jaccard_sql(),
        "dup_span_stats": dup_span_stats_sql(),
        "basket_pairs": """
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
       count(*)::BIGINT AS n_orders
FROM op a JOIN op b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
ORDER BY n_orders DESC, part_a, part_b LIMIT 20""",
        "value_outliers": """
WITH moments AS (
  SELECT event_type, count(*)::BIGINT AS n_events,
         count(value) AS n_vals, sum(value) AS s, sum(value * value) AS ss
  FROM events GROUP BY 1
),
stats AS (
  -- NULLIF guards mirror the Spark side's degenerate-denominator
  -- contract: n=1 group -> std NULL (no sample variance), all-NULL
  -- group -> mean NULL; inert for any group with >= 2 values
  SELECT event_type, n_events,
         round(s / NULLIF(n_vals, 0), 6) AS mean_value,
         round(sqrt((ss - s * s / NULLIF(n_vals, 0))
                    / NULLIF(n_vals - 1, 0)), 6) AS std_value
  FROM moments
)
SELECT e.event_type, st.n_events, st.mean_value, st.std_value,
       sum(CASE WHEN abs(e.value - st.mean_value) > 3.0 * st.std_value
                THEN 1 ELSE 0 END)::BIGINT AS n_outliers
FROM events e JOIN stats st USING (event_type)
GROUP BY 1, 2, 3, 4 ORDER BY 1""",
        "table_profile": "\nUNION ALL\n".join(
            f"""
SELECT '{c}' AS col_name, count(*)::BIGINT AS n_rows,
       sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_nulls,
       count(DISTINCT {c})::BIGINT AS n_distinct,
       {f"CASE WHEN isfinite(min({c})) THEN TRY_CAST(min({c}) AS DECIMAL(38,2)) END::VARCHAR" if c == "o_totalprice" else f"min({c})::VARCHAR"} AS min_repr,
       {f"CASE WHEN isfinite(max({c})) THEN TRY_CAST(max({c}) AS DECIMAL(38,2)) END::VARCHAR" if c == "o_totalprice" else f"max({c})::VARCHAR"} AS max_repr
FROM orders"""
            for c in sorted(
                [
                    "o_orderkey",
                    "o_custkey",
                    "o_orderstatus",
                    "o_totalprice",
                    "o_orderdate",
                    "o_orderpriority",
                ]
            )
        ),
        "input_bounds_audit": input_bounds_audit_sql(),
        "capture_merge_audit": capture_merge_audit_sql(),
        "decayed_engagement": f"""
WITH anchor AS (SELECT max({EVENTS_TS}) AS t_max FROM events)
SELECT user_id, count(*)::BIGINT AS n_events,
       round(sum(value * pow(0.5,
         ((epoch_us(t_max) - epoch_us({EVENTS_TS}))::DOUBLE
          / 86400000000.0) / 7.0)), 6) AS decayed_value,
       max({EVENTS_TS}) AS last_seen
FROM events, anchor GROUP BY 1 ORDER BY 1""",
        "part_pagerank": part_pagerank_sql(),
        "keyword_pagerank": keyword_pagerank_sql(),
        "truncation_recall": truncation_recall_sql(),
        "simhash_neardup": simhash_neardup_sql(),
        "chunk_dedup_stats": chunk_dedup_stats_sql(),
        "bounce_rate_by_dow": f"""
WITH e AS (
  SELECT user_id, {EVENTS_TS} AS ts, event_id FROM events
),
f AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts, sum(new_session) OVER (PARTITION BY user_id
               ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM f
),
sess AS (
  SELECT user_id, session_seq, count(*) AS n_events,
         min(ts) AS session_start
  FROM s GROUP BY 1, 2
)
SELECT (dayofweek(session_start) + 1)::BIGINT AS dow,
       count(*)::BIGINT AS n_sessions,
       sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)::BIGINT AS n_bounces,
       sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)::DOUBLE / count(*)
         AS bounce_rate
FROM sess GROUP BY 1 ORDER BY 1""",
        "quality_weighted_sample": f"""
WITH staged AS (
  SELECT lang, source,
         len(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}'))::BIGINT
           AS n_tokens,
         ({_fp("concat_ws(':', 'qsample-v1', doc_id)")} % 1000000)
           / 1000000.0 AS u
  FROM documents
),
flagged AS (
  SELECT lang, source, n_tokens,
         CASE WHEN u < least(1.0, n_tokens / 200.0) THEN 1 ELSE 0 END AS kept
  FROM staged
)
SELECT lang, source, count(*)::BIGINT AS n_docs,
       sum(kept)::BIGINT AS n_kept,
       sum(n_tokens)::BIGINT AS total_tokens,
       sum(kept * n_tokens)::BIGINT AS kept_tokens
FROM flagged GROUP BY 1, 2 ORDER BY 1, 2""",
        "first_purchase_latency": f"""
WITH pu AS (
  SELECT user_id, min(epoch_us({EVENTS_TS})) AS first_us,
         min(CASE WHEN event_type = 'purchase'
                  THEN epoch_us({EVENTS_TS}) END) AS fp_us
  FROM events GROUP BY 1
)
SELECT (CASE WHEN fp_us IS NULL THEN -1
             ELSE floor((fp_us - first_us) / 86400000000) END)::BIGINT
         AS days_to_purchase,
       count(*)::BIGINT AS n_users
FROM pu GROUP BY 1 ORDER BY 1""",
        "prospect_customers": """
WITH thr AS (
  SELECT (CASE WHEN (sum(CAST(round(c_acctbal * 100) AS BIGINT)::HUGEINT) < 0) != (NULLIF(count(c_acctbal), 0)::HUGEINT < 0) THEN -((2 * abs(sum(CAST(round(c_acctbal * 100) AS BIGINT)::HUGEINT)) + abs(NULLIF(count(c_acctbal), 0)::HUGEINT)) // (2 * abs(NULLIF(count(c_acctbal), 0)::HUGEINT))) ELSE ((2 * abs(sum(CAST(round(c_acctbal * 100) AS BIGINT)::HUGEINT)) + abs(NULLIF(count(c_acctbal), 0)::HUGEINT)) // (2 * abs(NULLIF(count(c_acctbal), 0)::HUGEINT))) END)::BIGINT::DOUBLE / 100.0 AS thr FROM customer WHERE c_acctbal > 0.0
)
SELECT c_nationkey, count(*)::BIGINT AS n_prospects,
       sum(CAST(round(c_acctbal * 100) AS BIGINT))::BIGINT::DOUBLE / 100.0 AS total_acctbal
FROM customer, thr
WHERE c_acctbal > thr
  -- NOT EXISTS, deliberately not NOT IN: the operator's left_anti join
  -- has NOT EXISTS semantics. A NULL o_custkey in the subquery collapses
  -- NOT IN to zero rows under three-valued logic (found by the round-10
  -- null-key sweep: spark=21 / duck=0 on a 5%-null-key corpus), while
  -- NOT EXISTS — like the anti join — simply never matches a NULL key.
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
GROUP BY 1 ORDER BY 1""",
        "segment_priority_chi2": """
WITH observed AS (
  SELECT c_mktsegment, o_orderpriority, count(*)::BIGINT AS n
  FROM orders JOIN customer ON o_custkey = c_custkey
  -- NULL category values are out of the test population (mirrors the
  -- Spark side): the grid equi-join can never match a NULL key, so a
  -- NULL-category row would zero-fill its real counts while n_cells
  -- counted the phantom cell and the DISTINCT-based dof excluded it
  WHERE c_mktsegment IS NOT NULL AND o_orderpriority IS NOT NULL
  GROUP BY 1, 2
),
-- dense grid over observed category values (mirrors the Spark side):
-- empty (segment, priority) cells enter with n = 0 so their
-- (0-E)^2/E = E term counts toward the statistic
cells AS (
  SELECT s.c_mktsegment, p.o_orderpriority, coalesce(o.n, 0)::BIGINT AS n
  FROM (SELECT DISTINCT c_mktsegment FROM observed) s
  CROSS JOIN (SELECT DISTINCT o_orderpriority FROM observed) p
  LEFT JOIN observed o USING (c_mktsegment, o_orderpriority)
),
m AS (
  SELECT c_mktsegment, o_orderpriority, n,
         sum(n) OVER (PARTITION BY c_mktsegment) AS row_tot,
         sum(n) OVER (PARTITION BY o_orderpriority) AS col_tot,
         sum(n) OVER () AS total
  FROM cells
)
SELECT count(*)::BIGINT AS n_cells,
       ((count(DISTINCT c_mktsegment) - 1)
        * (count(DISTINCT o_orderpriority) - 1))::BIGINT AS dof,
       round(sum((n - row_tot * col_tot / total)
                 * (n - row_tot * col_tot / total)
                 / (row_tot * col_tot / total)), 6) AS chi2
FROM m""",
        "similar_docs": f"""
WITH {_docs_cte(3)},
{_inv_cte(100)},
q AS (SELECT shfp FROM inv WHERE doc_id = 0),
sizes AS (SELECT doc_id, count(*)::BIGINT AS n_sh FROM inv GROUP BY 1),
qs AS (SELECT n_sh AS q_sh FROM sizes WHERE doc_id = 0),
shared AS (
  SELECT inv.doc_id, count(*)::BIGINT AS shared
  FROM inv JOIN q USING (shfp)
  WHERE inv.doc_id <> 0 GROUP BY 1
)
SELECT doc_id, shared, n_sh,
       round(shared / (n_sh + q_sh - shared), 6) AS jaccard
FROM shared JOIN sizes USING (doc_id), qs
ORDER BY jaccard DESC, doc_id LIMIT 10""",
        "cluster_size_profile": f"""
WITH RECURSIVE {_minhash_stack(3, N_PERMS, N_BANDS, 100)},
dup AS (SELECT doc_a, doc_b FROM pairs WHERE jaccard >= 0.5),
edges AS (
  SELECT doc_a AS s, doc_b AS d FROM dup
  UNION ALL
  SELECT doc_b, doc_a FROM dup
),
reach(v, m) AS (
  SELECT DISTINCT s, s FROM edges
  UNION
  SELECT r.v, e.d FROM reach r JOIN edges e ON e.s = r.m
),
lab AS (SELECT v AS doc_id, min(m) AS cluster_id FROM reach GROUP BY v),
csz AS (SELECT cluster_id, count(*)::BIGINT AS cluster_size
        FROM lab GROUP BY 1)
SELECT cluster_size, count(*)::BIGINT AS n_clusters
FROM csz GROUP BY 1 ORDER BY 1""",
        "props_key_coverage": """
WITH j AS (
  SELECT event_type,
         CASE WHEN props IS NOT NULL AND json_valid(props)
              THEN json_extract_string(props, '$.k') END AS k
  FROM events
)
SELECT event_type, count(*)::BIGINT AS n_events,
       sum(CASE WHEN k IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_with_key,
       sum(CASE WHEN k IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE / count(*)
         AS coverage
FROM j GROUP BY 1 ORDER BY 1""",
        "revenue_concentration": """
WITH spend AS (
  SELECT o_custkey,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS cents
  FROM orders GROUP BY 1
),
f AS (
  SELECT floor(quantile_cont(cents, 0.99))::BIGINT AS f99,
         floor(quantile_cont(cents, 0.95))::BIGINT AS f95,
         floor(quantile_cont(cents, 0.90))::BIGINT AS f90
  FROM spend
)
SELECT count(*)::BIGINT AS n_customers,
       sum(cents)::DOUBLE / 100.0 AS total_revenue,
       sum(CASE WHEN cents >= f99 THEN cents ELSE 0 END)::DOUBLE
         / sum(cents) AS top1_share,
       sum(CASE WHEN cents >= f95 THEN cents ELSE 0 END)::DOUBLE
         / sum(cents) AS top5_share,
       sum(CASE WHEN cents >= f90 THEN cents ELSE 0 END)::DOUBLE
         / sum(cents) AS top10_share
FROM spend, f""",
        "supplier_panel": """
SELECT n_name,
       count(*)::BIGINT AS n_suppliers,
       sum(CAST(round(s_acctbal * 100) AS BIGINT))::BIGINT::DOUBLE / 100.0 AS total_acctbal,
       (CASE WHEN (sum(CAST(round(s_acctbal * 100) AS BIGINT)::HUGEINT) < 0) != (NULLIF(count(s_acctbal), 0)::HUGEINT < 0) THEN -((2 * abs(sum(CAST(round(s_acctbal * 100) AS BIGINT)::HUGEINT)) + abs(NULLIF(count(s_acctbal), 0)::HUGEINT)) // (2 * abs(NULLIF(count(s_acctbal), 0)::HUGEINT))) ELSE ((2 * abs(sum(CAST(round(s_acctbal * 100) AS BIGINT)::HUGEINT)) + abs(NULLIF(count(s_acctbal), 0)::HUGEINT)) // (2 * abs(NULLIF(count(s_acctbal), 0)::HUGEINT))) END)::BIGINT::DOUBLE / 100.0 AS avg_acctbal,
       sum(CASE WHEN s_acctbal < 0 THEN 1 ELSE 0 END)::BIGINT AS n_negative
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY 1 ORDER BY 1""",
        "watermark_delay_profile": f"""
WITH st AS (
  SELECT epoch_us({EVENTS_TS}) AS us,
         max(epoch_us({EVENTS_TS})) OVER (PARTITION BY user_id
             ORDER BY event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS seen_max
  -- identified rows only (mirrors the operator): NULL sort keys order
  -- differently across engines (Spark NULLS FIRST, DuckDB NULLS LAST)
  FROM events WHERE user_id IS NOT NULL AND event_id IS NOT NULL
),
lat AS (SELECT greatest(seen_max - us, 0) AS late_us FROM st)
SELECT count(*)::BIGINT AS n_events,
       sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END)::BIGINT AS n_late,
       sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END)::DOUBLE / count(*)
         AS late_frac,
       max(late_us)::DOUBLE / 1e6 AS max_lateness_sec,
       floor(quantile_cont(late_us, 0.99))::DOUBLE / 1e6
         AS p99_lateness_sec
FROM lat""",
        "customer_spend_percentiles": """
WITH spend AS (
  SELECT c_nationkey, c_custkey, sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT::DOUBLE / 100.0 AS spend
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2
),
ranked AS (
  SELECT c_nationkey, c_custkey, spend,
         round(percent_rank() OVER w, 6) AS pct_rank,
         round(cume_dist() OVER w, 6) AS cume
  FROM spend
  WINDOW w AS (PARTITION BY c_nationkey ORDER BY spend, c_custkey)
)
SELECT * FROM ranked WHERE pct_rank >= 0.9
ORDER BY c_nationkey, c_custkey""",
        "order_fanout_profile": """
WITH per_order AS (
  SELECT l_orderkey, count(*)::BIGINT AS n_lines FROM lineitem GROUP BY 1
)
SELECT n_lines, count(*)::BIGINT AS n_orders
FROM per_order GROUP BY 1 ORDER BY 1""",
        "effective_tokens": f"""
WITH staged AS (
  -- identified documents only, same population as the chunk path
  -- below: the panel's numerators and denominators must cover the
  -- same corpus (ADVICE r10; doc_chunks structurally needs doc_id)
  SELECT len(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}'))::BIGINT
           AS n_tokens,
         {_fp(_NORM_TEXT)} AS fp
  FROM documents WHERE doc_id IS NOT NULL
),
tok AS (
  -- mirrors text.doc_chunks' doc-identity filter (chunk dedup needs a
  -- document identity; see doc_chunks_sql)
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS word,
         generate_subscripts(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}'), 1)
           AS pos
  FROM documents WHERE doc_id IS NOT NULL
),
chunks AS (
  SELECT doc_id, ((pos - 1) // 64)::BIGINT AS chunk_id,
         count(*)::BIGINT AS n_tokens,
         string_agg(word, ' ' ORDER BY pos) AS chunk_text
  FROM tok GROUP BY doc_id, (pos - 1) // 64
),
t AS (SELECT sum(n_tokens)::BIGINT AS total_tokens FROM staged),
du AS (
  SELECT sum(t)::BIGINT AS doc_unique_tokens
  FROM (SELECT fp, min(n_tokens) AS t FROM staged GROUP BY 1)
),
cu AS (
  SELECT sum(t)::BIGINT AS chunk_unique_tokens
  FROM (SELECT {_fp("chunk_text")} AS cfp, min(n_tokens) AS t
        FROM chunks GROUP BY 1)
)
SELECT total_tokens, doc_unique_tokens, chunk_unique_tokens,
       doc_unique_tokens::DOUBLE / total_tokens AS doc_unique_frac,
       chunk_unique_tokens::DOUBLE / total_tokens AS chunk_unique_frac
FROM t, du, cu""",
        "orders_mom_growth": """
WITH m AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         count(*)::BIGINT AS n_orders,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT::DOUBLE / 100.0 AS revenue
  FROM orders GROUP BY 1
)
SELECT month, n_orders, revenue,
       lag(revenue) OVER w AS prev_revenue,
       CASE WHEN lag(revenue) OVER w IS NOT NULL
            THEN (revenue - lag(revenue) OVER w) / lag(revenue) OVER w
       END AS mom_growth
FROM m WINDOW w AS (ORDER BY month) ORDER BY month""",
        "seasonal_naive_error": f"""
WITH hourly AS (
  SELECT CAST({EVENTS_TS} AS DATE) AS d, hour({EVENTS_TS})::BIGINT AS h,
         count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2
),
scored AS (
  SELECT a.n AS actual, p.n AS predicted
  FROM hourly a JOIN hourly p
    ON a.d = p.d + INTERVAL 7 DAY AND a.h = p.h
)
SELECT count(*)::BIGINT AS n_hours,
       sum(abs(actual - predicted))::DOUBLE / count(*) AS mae,
       round(sum(abs(actual - predicted)::DOUBLE
                 / greatest(actual, 1)) / count(*), 6) AS mape
FROM scored""",
        "customer_entity_clusters": """
WITH RECURSIVE fp AS (
  SELECT a.c_custkey AS ka, b.c_custkey AS kb
  FROM customer a JOIN customer b
    ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
  WHERE levenshtein(a.c_name, b.c_name) <= 1
),
edges AS (
  SELECT ka AS s, kb AS d FROM fp
  UNION ALL
  SELECT kb, ka FROM fp
),
reach(v, m) AS (
  SELECT DISTINCT s, s FROM edges
  UNION
  SELECT r.v, e.d FROM reach r JOIN edges e ON e.s = r.m
),
lab AS (SELECT v AS member, min(m) AS entity_id FROM reach GROUP BY v)
SELECT entity_id, count(*)::BIGINT AS n_members,
       min(member) AS rep_custkey
FROM lab GROUP BY 1 ORDER BY 1""",
        "ann_recall_audit": f"""
SELECT * FROM (
  SELECT 'ivf' AS method, count(*)::BIGINT AS n_hits,
         count(*) / 25.0 AS recall
  FROM ({knn_ivf_sql()}) a
  JOIN ({knn_sql()}) t USING (q_id, vec_id)
  UNION ALL
  SELECT 'lsh', count(*)::BIGINT, count(*) / 25.0
  FROM ({knn_lsh_sql()}) a
  JOIN ({knn_sql()}) t USING (q_id, vec_id)
  UNION ALL
  SELECT 'pq', count(*)::BIGINT, count(*) / 25.0
  FROM ({knn_pq_sql()}) a
  JOIN ({knn_sql()}) t USING (q_id, vec_id)
) ORDER BY method""",
        "top_orders_per_segment": """
WITH j AS (
  SELECT c_mktsegment, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY o_totalprice DESC, o_orderkey) AS rnk
  FROM orders JOIN customer ON o_custkey = c_custkey
)
SELECT c_mktsegment, rnk::BIGINT AS rnk, o_orderkey,
       round(o_totalprice, 2) AS o_totalprice
FROM j WHERE rnk <= 3 ORDER BY c_mktsegment, rnk""",
        "bootstrap_mean_ci": f"""
WITH params(b, ha, hb) AS (
  VALUES {_boot_params_values()}
),
staged AS (
  SELECT o_totalprice,
         ({_fp("concat_ws(':', 'boot-v1', o_orderkey)")} & {_X_MASK}) AS x,
         b, ha, hb
  FROM orders, params
),
coined AS (
  SELECT o_totalprice, b,
         (((x * ha + hb) % {MINHASH_P}) % 1000000) / 1000000.0 AS u
  FROM staged
),
weighted AS (
  -- exact integer replicate sums (functions.exact, round 12): integer
  -- Poisson weight x integer cents in HUGEINT, rounding in integer space
  SELECT b,
         (CASE WHEN u < 0.367879 THEN 0
               WHEN u < 0.735759 THEN 1
               WHEN u < 0.919699 THEN 2
               WHEN u < 0.981012 THEN 3
               WHEN u < 0.996340 THEN 4
               ELSE 5 END)::BIGINT AS w,
         (CASE WHEN u < 0.367879 THEN 0
               WHEN u < 0.735759 THEN 1
               WHEN u < 0.919699 THEN 2
               WHEN u < 0.981012 THEN 3
               WHEN u < 0.996340 THEN 4
               ELSE 5 END)::HUGEINT
           * CAST(round(o_totalprice * 100) AS BIGINT)::HUGEINT AS wc
  FROM coined
),
reps AS (
  SELECT b,
         CASE WHEN sum(w) > 0
              THEN {duck_round_div_units("(sum(wc) * 100)",
                                         "sum(w)::HUGEINT", "10000.0")}
         END AS rep_mean
  FROM weighted GROUP BY 1
),
ranked AS (
  -- NULLS FIRST pinned explicitly: Spark windows default NULLS FIRST,
  -- DuckDB defaults NULLS LAST — measured MIRRORED CI bounds on a
  -- degenerate 1-row corpus ((NULL, v) vs (v, NULL)) before the pin
  SELECT rep_mean,
         row_number() OVER (ORDER BY rep_mean NULLS FIRST) AS rn FROM reps
)
SELECT (SELECT count(*) FROM orders)::BIGINT AS n_rows,
       32::BIGINT AS n_replicas,
       (SELECT {duck_round_div_units(
           "(sum(CAST(round(o_totalprice * 100) AS BIGINT)::HUGEINT) * 100)",
           "count(*)::HUGEINT", "10000.0")} FROM orders) AS point_mean,
       (SELECT rep_mean FROM ranked WHERE rn = 1) AS ci_lo,
       (SELECT rep_mean FROM ranked WHERE rn = 32) AS ci_hi""",
        "text_embedding_alignment": f"""
WITH {_minhash_stack(3, N_PERMS, N_BANDS, 100)},
corpus AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
nrm AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nn FROM corpus),
dupc AS (
  SELECT round(list_dot_product(x.v, y.v) / (x.nn * y.nn), 6) AS cosine
  FROM (SELECT doc_a, doc_b FROM pairs WHERE jaccard >= 0.5) p
  JOIN nrm x ON x.vec_id = p.doc_a
  JOIN nrm y ON y.vec_id = p.doc_b
),
basec AS (
  SELECT round(list_dot_product(x.v, y.v) / (x.nn * y.nn), 6) AS cosine
  FROM nrm x JOIN nrm y ON y.vec_id = x.vec_id + 1
)
SELECT (SELECT count(*) FROM dupc)::BIGINT AS n_dup_pairs,
       (SELECT round(avg(cosine), 6) FROM dupc) AS avg_dup_cosine,
       (SELECT count(*) FROM basec)::BIGINT AS n_base_pairs,
       (SELECT round(avg(cosine), 6) FROM basec) AS avg_base_cosine,
       round((SELECT round(avg(cosine), 6) FROM dupc)
             - (SELECT round(avg(cosine), 6) FROM basec), 6) AS lift""",
        "daily_type_unpivot": f"""
WITH d AS (
  SELECT DISTINCT CAST({EVENTS_TS} AS DATE) AS event_date FROM events
),
t AS (
  SELECT unnest(['click','error','purchase','signup','view']) AS event_type
),
c AS (
  SELECT CAST({EVENTS_TS} AS DATE) AS event_date, event_type,
         count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2
)
SELECT d.event_date, t.event_type, coalesce(c.n, 0)::BIGINT AS n_events
FROM d CROSS JOIN t
LEFT JOIN c ON c.event_date = d.event_date AND c.event_type = t.event_type
ORDER BY d.event_date, t.event_type""",
        "sql_orders_since": """
SELECT CAST(o_orderdate AS DATE) AS order_date,
       count(*)::BIGINT AS n_orders,
       sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT::DOUBLE / 100.0 AS revenue
FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
GROUP BY 1 ORDER BY 1""",
        # avg_price rounds in INTEGER space (round 12): round() on the
        # bit-identical double quotient was the avg-round divergence class
        "sql_status_panel": """
WITH a AS (
  SELECT o_orderstatus, count(*)::BIGINT AS n_orders,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS cents
  FROM orders GROUP BY 1
),
q AS (
  SELECT *, (2 * abs(cents) + n_orders) // (2 * n_orders) AS qc FROM a
)
SELECT o_orderstatus, n_orders,
       cents::DOUBLE / 100.0 AS revenue,
       (CASE WHEN cents < 0 THEN -qc ELSE qc END)::DOUBLE / 100.0 AS avg_price
FROM q ORDER BY 1""",
        "dataset_card": f"""
WITH staged AS (
  SELECT lang, source, length(text)::BIGINT AS n_chars,
         len(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}'))::BIGINT
           AS n_tokens,
         {_fp(_NORM_TEXT)} AS fp
  FROM documents
),
base AS (
  SELECT count(*)::BIGINT AS n_docs,
         count(DISTINCT lang)::BIGINT AS n_langs,
         count(DISTINCT source)::BIGINT AS n_sources,
         sum(n_tokens)::BIGINT AS total_tokens,
         sum(n_chars)::BIGINT AS total_chars,
         sum(n_tokens)::DOUBLE / count(*) AS avg_doc_tokens
  FROM staged
),
dups AS (
  SELECT sum(CASE WHEN c > 1 THEN c ELSE 0 END)::BIGINT AS exact_dup_docs
  FROM (SELECT fp, count(*) AS c FROM staged GROUP BY 1)
)
SELECT * FROM base, dups""",
        "lsh_recall_audit": f"""
WITH {_minhash_stack(3, N_PERMS, N_BANDS, 100)},
tshared AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS shared
  FROM inv a JOIN inv b USING (shfp)
  WHERE a.doc_id < b.doc_id GROUP BY 1, 2
),
tru AS (
  SELECT doc_a, doc_b
  FROM tshared s
  JOIN sizes sa ON sa.doc_id = s.doc_a
  JOIN sizes sb ON sb.doc_id = s.doc_b
  WHERE round(shared / (sa.n_sh + sb.n_sh - shared), 6) >= 0.5
),
rec AS (SELECT doc_a, doc_b FROM pairs WHERE jaccard >= 0.5)
SELECT (SELECT count(*) FROM tru)::BIGINT AS n_true_pairs,
       (SELECT count(*) FROM rec)::BIGINT AS n_recalled,
       (SELECT count(*) FROM rec)::DOUBLE
         / greatest((SELECT count(*) FROM tru), 1) AS recall""",
        "conversion_attribution": f"""
WITH e AS (
  SELECT user_id, {EVENTS_TS} AS ts, event_id, event_type, value FROM events
),
f AS (
  SELECT *, CASE WHEN lag(ts) OVER w IS NULL
                      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                 THEN 1 ELSE 0 END AS new_session
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT *, sum(new_session) OVER (PARTITION BY user_id
               ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM f
),
t AS (
  SELECT *, last_value(CASE WHEN event_type <> 'purchase'
                            THEN event_type END IGNORE NULLS)
              OVER (PARTITION BY user_id, session_seq ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              AS touch
  FROM s
),
p AS (
  SELECT coalesce(touch, 'direct') AS touch, value FROM t
  WHERE event_type = 'purchase'
),
rolled AS (
  SELECT touch, count(*)::BIGINT AS n_purchases,
         sum(CAST(round(value * 100) AS BIGINT))::BIGINT::DOUBLE / 100.0
           AS attributed_value
  FROM p GROUP BY 1
)
SELECT touch, n_purchases, attributed_value,
       n_purchases / sum(n_purchases) OVER () AS purchase_share
FROM rolled ORDER BY touch""",
        "copurchase_triangles": """
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
),
deg AS (
  SELECT node, count(*) AS deg FROM (
    SELECT pa AS node FROM e UNION ALL SELECT pb FROM e) GROUP BY 1
),
tri AS (
  SELECT count(*) AS t
  FROM e e1
  JOIN e e2 ON e2.pa = e1.pa AND e2.pb > e1.pb
  JOIN e e3 ON e3.pa = e1.pb AND e3.pb = e2.pb
)
SELECT (SELECT count(*) FROM e)::BIGINT AS n_edges,
       (SELECT t FROM tri)::BIGINT AS n_triangles,
       (SELECT sum(deg * (deg - 1) / 2) FROM deg)::BIGINT AS n_wedges,
       3.0 * (SELECT t FROM tri)
         / greatest((SELECT sum(deg * (deg - 1) / 2) FROM deg), 1)
         AS clustering_coefficient""",
        "part_degree_profile": """
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
),
deg AS (
  SELECT part, count(*) AS degree FROM (
    SELECT part_a AS part FROM e UNION ALL SELECT part_b FROM e)
  GROUP BY 1
)
SELECT degree::BIGINT AS degree, count(*)::BIGINT AS n_parts
FROM deg GROUP BY 1 ORDER BY 1""",
        "revenue_change_forecast": """
SELECT count(*)::BIGINT AS n_lineitems,
       (CASE WHEN (sum(CAST(round((l_extendedprice) * 100) AS BIGINT)::HUGEINT * CAST(round((l_discount) * 100) AS BIGINT)::HUGEINT) < 0) != (100::HUGEINT < 0) THEN -((2 * abs(sum(CAST(round((l_extendedprice) * 100) AS BIGINT)::HUGEINT * CAST(round((l_discount) * 100) AS BIGINT)::HUGEINT)) + abs(100::HUGEINT)) // (2 * abs(100::HUGEINT))) ELSE ((2 * abs(sum(CAST(round((l_extendedprice) * 100) AS BIGINT)::HUGEINT * CAST(round((l_discount) * 100) AS BIGINT)::HUGEINT)) + abs(100::HUGEINT)) // (2 * abs(100::HUGEINT))) END)::BIGINT::DOUBLE / 100.0 AS potential_revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24""",
        "reading_level": f"""
WITH counts AS (
  SELECT doc_id, source,
         greatest(len(regexp_extract_all(text, '[.!?]+')), 1)::BIGINT
           AS n_sentences,
         greatest(len(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')),
                  1)::BIGINT AS n_tokens,
         len(regexp_extract_all(lower(text), '[aeiouy]+'))::BIGINT
           AS n_syllables
  FROM documents
)
SELECT doc_id, source, n_sentences, n_tokens, n_syllables,
       206.835 - 1.015 * (n_tokens / n_sentences)
               - 84.6 * (n_syllables / n_tokens) AS flesch
FROM counts ORDER BY doc_id""",
        "ivf_delta_assign": ivf_delta_assign_sql(),
        "embedding_spectrum": embedding_spectrum_sql(),
        "kmeans_inertia": kmeans_inertia_sql(),
        "brand_supplier_diversity": """
SELECT p_brand, count(*)::BIGINT AS n_lineitems,
       count(DISTINCT l_suppkey)::BIGINT AS n_suppliers,
       count(DISTINCT l_partkey)::BIGINT AS n_parts
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY 1 ORDER BY 1""",
        "fk_integrity_audit": """
SELECT * FROM (
  SELECT 'lineitem->orders' AS relationship, count(*)::BIGINT AS n_child_rows,
         sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)::BIGINT
           AS n_orphans
  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
  UNION ALL
  SELECT 'orders->customer', count(*)::BIGINT,
         sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)::BIGINT
  FROM orders o2 LEFT JOIN customer c ON o2.o_custkey = c.c_custkey
) ORDER BY relationship""",
        "volume_gaps": f"""
WITH daily AS (
  SELECT CAST({EVENTS_TS} AS DATE) AS event_date, count(*)::BIGINT AS n_events
  FROM events GROUP BY 1
),
scanned AS (
  SELECT event_date, n_events,
         lag(event_date) OVER w AS prev_date,
         lag(n_events) OVER w AS prev_events
  FROM daily WINDOW w AS (ORDER BY event_date)
)
SELECT event_date, n_events, prev_date, prev_events::BIGINT AS prev_events,
       date_diff('day', prev_date, event_date)::BIGINT AS gap_days,
       n_events / prev_events AS dod_ratio,
       (CASE WHEN prev_date IS NOT NULL
             AND (date_diff('day', prev_date, event_date) > 1
                  OR n_events / prev_events <= 0.5
                  OR n_events / prev_events >= 2.0)
             THEN 1 ELSE 0 END)::BIGINT AS is_anomaly
FROM scanned
ORDER BY event_date""",
        "user_erasure_audit": """
SELECT * FROM (
  SELECT 'events' AS table_name, count(*)::BIGINT AS n_rows,
         sum(CASE WHEN user_id % 97 = 0 THEN 1 ELSE 0 END)::BIGINT
           AS n_in_scope,
         sum(CASE WHEN user_id % 97 = 0 THEN 1 ELSE 0 END)::DOUBLE
           / count(*) AS scope_share
  FROM events
  UNION ALL
  SELECT 'orders', count(*)::BIGINT,
         sum(CASE WHEN o_custkey % 97 = 0 THEN 1 ELSE 0 END)::BIGINT,
         sum(CASE WHEN o_custkey % 97 = 0 THEN 1 ELSE 0 END)::DOUBLE
           / count(*)
  FROM orders
) ORDER BY table_name""",
        "session_paths": f"""
WITH e AS (
  SELECT user_id, {EVENTS_TS} AS ts, event_id, event_type FROM events
),
f AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT *, sum(new_session) OVER (PARTITION BY user_id
               ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM f
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY user_id, session_seq
                               ORDER BY ts, event_id) AS rn
  FROM s
),
p AS (
  SELECT user_id, session_seq,
         string_agg(event_type, '>' ORDER BY ts, event_id) AS path
  FROM r WHERE rn <= 3 GROUP BY user_id, session_seq
)
SELECT path, count(*)::BIGINT AS n_sessions
FROM p GROUP BY path ORDER BY n_sessions DESC, path LIMIT 20""",
        "shipping_lag_stats": """
WITH lagged AS (
  SELECT o_orderpriority,
         date_diff('day', CAST(o_orderdate AS DATE),
                   CAST(l_shipdate AS DATE)) AS lag_days
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
)
SELECT o_orderpriority,
       count(*)::BIGINT AS n_items,
       sum(lag_days)::BIGINT AS total_lag_days,
       sum(lag_days)::DOUBLE / count(*) AS avg_lag_days,
       max(lag_days)::BIGINT AS max_lag_days
FROM lagged GROUP BY 1 ORDER BY 1""",
        "lsh_candidate_profile": f"""
WITH {_minhash_stack(3, N_PERMS, N_BANDS, 100)}
SELECT floor(jaccard * 10)::BIGINT AS decile, count(*)::BIGINT AS n_pairs
FROM pairs GROUP BY 1 ORDER BY 1""",
        "key_skew_profile": """
WITH kc AS (
  SELECT o_custkey AS key, count(*)::BIGINT AS n_rows FROM orders GROUP BY 1
),
tot AS (SELECT sum(n_rows)::BIGINT AS total FROM kc),
topk AS (
  SELECT key, n_rows FROM kc ORDER BY n_rows DESC, key LIMIT 20
)
SELECT row_number() OVER (ORDER BY n_rows DESC, key)::BIGINT AS rank,
       key, n_rows, n_rows / total AS share
FROM topk, tot ORDER BY rank""",
        "traffic_anomalies": f"""
WITH obs AS (
  SELECT CAST({EVENTS_TS} AS DATE) AS event_date,
         hour({EVENTS_TS})::BIGINT AS hour,
         count(*)::BIGINT AS n_obs
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT min(CAST({EVENTS_TS} AS DATE)) AS d0,
         max(CAST({EVENTS_TS} AS DATE)) AS d1
  FROM events
),
grid AS (
  SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS event_date,
         h.range::BIGINT AS hour
  FROM bounds, range(24) h
),
b AS (
  SELECT grid.event_date, grid.hour,
         coalesce(obs.n_obs, 0)::BIGINT AS n_events
  FROM grid LEFT JOIN obs
    ON grid.event_date = obs.event_date AND grid.hour = obs.hour
),
base AS (
  SELECT hour, count(*)::BIGINT AS n_days, sum(n_events)::BIGINT AS s1,
         sum(n_events * n_events)::BIGINT AS s2
  FROM b GROUP BY 1
),
sc AS (
  SELECT event_date, b.hour AS hour, n_events,
         s1::DOUBLE / n_days AS hour_mean,
         sqrt(greatest(s2::DOUBLE / n_days
                       - (s1::DOUBLE / n_days) * (s1::DOUBLE / n_days),
                       0.0)) AS hour_std
  FROM b JOIN base ON b.hour = base.hour
)
SELECT event_date, hour, n_events, hour_mean, hour_std,
       (n_events - hour_mean) / hour_std AS zscore
FROM sc
WHERE hour_std > 0 AND abs((n_events - hour_mean) / hour_std) >= 2.0
ORDER BY event_date, hour""",
        "temporal_split_audit": f"""
WITH cut AS (
  SELECT floor(quantile_cont(epoch_us({EVENTS_TS}), 0.8))::BIGINT AS cut_us
  FROM events
),
pu AS (
  SELECT user_id,
         sum(CASE WHEN epoch_us({EVENTS_TS}) < cut_us
                  THEN 1 ELSE 0 END)::BIGINT AS n_tr,
         sum(CASE WHEN epoch_us({EVENTS_TS}) >= cut_us
                  THEN 1 ELSE 0 END)::BIGINT AS n_te
  FROM events, cut GROUP BY 1
)
SELECT sum(n_tr)::BIGINT AS n_train_events,
       sum(n_te)::BIGINT AS n_test_events,
       sum(CASE WHEN n_tr > 0 THEN 1 ELSE 0 END)::BIGINT AS n_train_users,
       sum(CASE WHEN n_te > 0 THEN 1 ELSE 0 END)::BIGINT AS n_test_users,
       sum(CASE WHEN n_tr > 0 AND n_te > 0 THEN 1 ELSE 0 END)::BIGINT
         AS n_leaky_users
FROM pu""",
        "filter_funnel": filter_funnel_sql(),
        "canonical_docs": canonical_docs_sql(),
        "dedup_token_savings": dedup_token_savings_sql(),
        "ngram_novelty": ngram_novelty_sql(),
        "semantic_decontam": semantic_decontam_sql(),
        "activity_heatmap": f"""
WITH cells AS (
  SELECT (dayofweek({EVENTS_TS}) + 1)::BIGINT AS dow,
         hour({EVENTS_TS})::BIGINT AS hour,
         count(*)::BIGINT AS n_events,
         count(DISTINCT user_id)::BIGINT AS n_users
  FROM events GROUP BY 1, 2
)
SELECT dow, hour, n_events, n_users,
       n_events / sum(n_events) OVER () AS share
FROM cells ORDER BY dow, hour""",
        "knn_rrf": """
WITH corpus AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
norms AS (
  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS v_norm FROM corpus
),
queries AS (
  SELECT vec_id AS q_id, v AS q, v_norm AS q_norm FROM norms
  WHERE vec_id < 25
),
scored AS (
  SELECT q_id, vec_id, list_dot_product(n.v, queries.q) AS dot,
         n.v_norm AS v_norm, q_norm
  FROM norms n CROSS JOIN queries WHERE vec_id <> q_id
),
metr AS (
  SELECT q_id, vec_id, dot / (v_norm * q_norm) AS cosine,
         v_norm * v_norm + q_norm * q_norm - 2.0 * dot AS dist2
  FROM scored
),
rk AS (
  SELECT q_id, vec_id,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY cosine DESC, vec_id) AS r_cos,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY dist2, vec_id) AS r_l2
  FROM metr
),
fused AS (
  SELECT q_id, vec_id,
         (CASE WHEN r_cos <= 10 THEN 1.0 / (60.0 + r_cos) ELSE 0.0 END
          + CASE WHEN r_l2 <= 10 THEN 1.0 / (60.0 + r_l2) ELSE 0.0 END)
           AS rrf_score
  FROM rk WHERE r_cos <= 10 OR r_l2 <= 10
),
final AS (
  SELECT q_id, vec_id, rrf_score,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY rrf_score DESC, vec_id) AS rank
  FROM fused
)
SELECT q_id, rank::BIGINT AS rank, vec_id, round(rrf_score, 6) AS rrf_score
FROM final WHERE rank <= 5 ORDER BY q_id, rank""",
        "char_lm_fluency": f"""
WITH staged AS (
  SELECT lang, source, {_NORM_TEXT} AS norm FROM documents
  WHERE len({_NORM_TEXT}) >= 2
),
bg AS (
  SELECT lang, source,
         unnest(list_transform(generate_series(1, len(norm) - 1),
                               i -> substr(norm, i, 2))) AS bg
  FROM staged
),
sc AS (SELECT lang, source, bg, count(*) AS n FROM bg GROUP BY 1, 2, 3),
bgc AS (SELECT bg, sum(n) AS c_bg FROM sc GROUP BY 1),
ctx AS (
  SELECT substr(bg, 1, 1) AS ctx, sum(c_bg) AS c_ctx FROM bgc GROUP BY 1
),
model AS (
  SELECT bg, ln(c_bg::DOUBLE / c_ctx) AS logp
  FROM bgc JOIN ctx ON substr(bgc.bg, 1, 1) = ctx.ctx
)
SELECT s.lang, s.source, sum(n)::BIGINT AS n_bigrams,
       round(sum(n * logp) / sum(n), 6) AS avg_logp
FROM sc s JOIN model USING (bg)
GROUP BY 1, 2 ORDER BY 1, 2""",
        "vocab_coverage": f"""
WITH toks AS (
  SELECT lang, source,
         unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS word
  FROM documents
),
vocab AS (
  SELECT word FROM (
    SELECT word, count(*) AS cnt FROM toks GROUP BY 1
  ) ORDER BY cnt DESC, word LIMIT 1000
)
SELECT t.lang, t.source, count(*)::BIGINT AS n_tokens,
       sum(CASE WHEN v.word IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         AS n_covered,
       sum(CASE WHEN v.word IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
         / count(*) AS coverage
FROM toks t LEFT JOIN vocab v ON t.word = v.word
GROUP BY 1, 2 ORDER BY 1, 2""",
        "source_contamination": source_contamination_sql(),
        "winsorized_stats": """
WITH ev AS (SELECT event_type, value FROM events WHERE value IS NOT NULL),
fences AS (
  SELECT event_type,
         round(quantile_cont(value, 0.05), 4) AS lo,
         round(quantile_cont(value, 0.95), 4) AS hi
  FROM ev GROUP BY 1
),
clipped AS (
  SELECT e.event_type, f.lo, f.hi,
         greatest(f.lo, least(f.hi, e.value)) AS cv
  FROM ev e JOIN fences f USING (event_type)
)
SELECT event_type, count(cv)::BIGINT AS n_values, lo, hi,
       round(sum(cv) / count(cv), 4) AS winsorized_mean
FROM clipped GROUP BY 1, 3, 4 ORDER BY 1""",
        "value_equidepth": """
WITH t AS (
  SELECT value, ntile(10) OVER (ORDER BY value, event_id) AS bucket
  FROM events WHERE value IS NOT NULL
)
SELECT bucket::BIGINT AS bucket, count(*)::BIGINT AS n_events,
       min(value) AS lo, max(value) AS hi
FROM t GROUP BY 1 ORDER BY 1""",
        "event_transitions": f"""
WITH trans AS (
  SELECT coalesce(
           lag(event_type) OVER (PARTITION BY user_id
                                 ORDER BY {EVENTS_TS}, event_id),
           '_start') AS from_type,
         event_type AS to_type
  FROM events
),
counts AS (
  SELECT from_type, to_type, count(*)::BIGINT AS n_transitions
  FROM trans GROUP BY 1, 2
)
SELECT from_type, to_type, n_transitions,
       round(n_transitions::DOUBLE
             / sum(n_transitions) OVER (PARTITION BY from_type), 6)
         AS p_transition
FROM counts ORDER BY from_type, to_type""",
        # full-recompute oracle for the INCREMENTAL rollup — the gate
        # verifies incremental-merge == recompute, the maintenance contract
        "incremental_nation_rollup": """
SELECT n_name AS nation, count(*)::BIGINT AS order_count,
       sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT::DOUBLE / 100.0 AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY 1 ORDER BY 1""",
        "incremental_daily_rollup": """
SELECT CAST(o_orderdate AS DATE) AS order_date,
       count(*)::BIGINT AS order_count,
       sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT::DOUBLE / 100.0 AS revenue
FROM orders GROUP BY 1 ORDER BY 1""",
        "orders_cdc_summary": """
WITH old_snap AS (SELECT o_orderkey, o_totalprice FROM orders),
new_snap AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 100 = 0 THEN round(o_totalprice * 1.1, 2)
              ELSE o_totalprice END AS o_totalprice
  FROM orders WHERE o_orderkey % 100 <> 97
  UNION ALL
  SELECT o_orderkey + 10000000, o_totalprice FROM orders
  WHERE o_orderkey % 100 = 50
),
j AS (
  SELECT CASE WHEN o.o_orderkey IS NULL THEN 'inserted'
              WHEN n.o_orderkey IS NULL THEN 'deleted'
              WHEN o.o_totalprice IS NOT DISTINCT FROM n.o_totalprice
                THEN 'unchanged'
              ELSE 'updated' END AS change
  FROM old_snap o FULL OUTER JOIN new_snap n USING (o_orderkey)
)
SELECT change, count(*)::BIGINT AS n_keys FROM j GROUP BY 1 ORDER BY 1""",
        "fuzzy_customer_pairs": """
SELECT a.c_nationkey::BIGINT AS nationkey, a.c_custkey AS custkey_a,
       b.c_custkey AS custkey_b,
       levenshtein(a.c_name, b.c_name)::BIGINT AS name_dist
FROM customer a JOIN customer b
  ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 1
ORDER BY custkey_a, custkey_b""",
        "value_drift_psi": f"""
WITH ev AS (
  SELECT value, epoch_us({EVENTS_TS}) AS tus FROM events
  WHERE value IS NOT NULL
),
bounds AS (
  SELECT min(value) AS vmin, max(value) AS vmax,
         min(tus) AS tmin, max(tus) AS tmax FROM ev
),
tagged AS (
  SELECT CASE WHEN vmax = vmin THEN 0
              ELSE least(floor((value - vmin) / ((vmax - vmin) / 10.0)), 9)
         END::BIGINT AS bucket,
         CASE WHEN tus < (tmin + tmax) / 2.0 THEN 'early' ELSE 'late' END
           AS half
  FROM ev, bounds
),
counts AS (
  SELECT bucket,
         sum(CASE WHEN half = 'early' THEN 1 ELSE 0 END)::BIGINT AS n_early,
         sum(CASE WHEN half = 'late' THEN 1 ELSE 0 END)::BIGINT AS n_late
  FROM tagged GROUP BY 1
),
totals AS (
  SELECT sum(n_early) AS tot_early, sum(n_late) AS tot_late FROM counts
)
SELECT bucket, n_early, n_late,
       round((n_early::DOUBLE / tot_early - n_late::DOUBLE / tot_late)
             * ln((n_early::DOUBLE / tot_early)
                  / (n_late::DOUBLE / tot_late)), 6) AS psi_term
FROM counts, totals
WHERE n_early > 0 AND n_late > 0 ORDER BY bucket""",
        "salted_event_rollup": """
SELECT event_type, count(event_id)::BIGINT AS n_events,
       sum(CAST(round(value * 100) AS BIGINT))::BIGINT::DOUBLE / 100.0 AS sum_value,
       min(value) AS min_value, max(value) AS max_value
FROM events GROUP BY 1 ORDER BY 1""",
        "scd2_history": """
SELECT o_custkey,
       row_number() OVER w::BIGINT AS version,
       o_orderkey, o_orderstatus, o_totalprice,
       o_orderdate AS valid_from,
       lead(o_orderdate) OVER w AS valid_to,
       (lead(o_orderdate) OVER w IS NULL) AS is_current
FROM orders WHERE o_custkey < 20
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_custkey, version""",
        "sole_late_suppliers": """
WITH li AS (
  SELECT l_orderkey, l_suppkey,
         CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
                             CAST(l_shipdate AS DATE)) > 60
              THEN 1 ELSE 0 END AS late_line
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
),
per_os AS (
  SELECT l_orderkey, l_suppkey, max(late_line) AS late
  FROM li GROUP BY 1, 2
),
per_o AS (
  SELECT l_orderkey, count(*) AS n_supp, sum(late) AS n_late
  FROM per_os GROUP BY 1
),
w AS (
  SELECT p.l_suppkey AS suppkey, count(*) AS numwait
  FROM per_os p JOIN per_o o USING (l_orderkey)
  WHERE p.late = 1 AND o.n_supp > 1 AND o.n_late = 1
  GROUP BY 1
)
SELECT s_suppkey, s_name, numwait::BIGINT AS numwait
FROM supplier JOIN w ON s_suppkey = suppkey
ORDER BY numwait DESC, s_name, s_suppkey LIMIT 20""",
        "curation_stats": curation_sql(),
        "minhash_dedup": minhash_sql(),
        "streaming_dedup_pairs": dedup_stream_sql(),
        "dedup_clusters": dedup_clusters_sql(),
        "simhash": simhash_sql(),
        "knn_bruteforce": knn_sql(),
        "knn_label_vote": knn_label_vote_sql(),
        "hard_negative_mining": hard_negative_mining_sql(),
        "boilerplate_ngrams": boilerplate_ngrams_sql(),
        "knn_lsh": knn_lsh_sql(),
        "embedding_neardup": embedding_neardup_sql(),
        "embedding_quantization": embedding_quantization_sql(),
        "pq_quantization": pq_quantization_sql(),
        "knn_pq": knn_pq_sql(),
        "train_test_split": train_test_split_sql(),
        "doc_chunks": doc_chunks_sql(),
        "sequence_packing": sequence_packing_sql(),
        "brand_promo_revenue": brand_promo_revenue_sql(),
        "doc_chunks_overlapping": doc_chunks_overlapping_sql(),
        "term_cooccurrence": term_cooccurrence_sql(),
        "dedup_prefix": prefix_dedup_sql(),
        "funnel_conversion": funnel_conversion_sql(),
        "decontamination": decontamination_sql(),
        "cohort_retention": cohort_retention_sql(),
        "rfm_segments": rfm_segments_sql(),
        "top_supplier_revenue": top_supplier_revenue_sql(),
        "stratified_sample": stratified_sample_sql(),
        "mixture_rebalance": mixture_rebalance_sql(),
        "temperature_mixture": temperature_mixture_sql(),
        "training_order_audit": training_order_audit_sql(),
        "delta_dedup_stats": delta_dedup_stats_sql(),
        "zipf_fit": zipf_fit_sql(),
        "ridge_probe": ridge_probe_sql(),
        "logistic_probe": logistic_probe_sql(),
        "bpe_merge_candidates": bpe_merge_candidates_sql(),
        "bpe_learn": bpe_learn_sql(),
        "epochs_plan": epochs_plan_sql(),
        "length_histogram": length_histogram_sql(),
        "knn_ivf": knn_ivf_sql(),
        "ivf_cell_sizes": ivf_cell_sizes_sql(),

        "nation_customer_ranks": """
WITH j AS (
  SELECT c_custkey, c_name, c_acctbal, n_name
  FROM customer JOIN nation ON c_nationkey = n_nationkey
),
r AS (
  SELECT *,
         row_number() OVER (PARTITION BY n_name
                            ORDER BY c_acctbal DESC, c_custkey) AS rnk,
         round(c_acctbal / sum(c_acctbal) OVER (PARTITION BY n_name), 6)
           AS balance_share,
         round(sum(c_acctbal) OVER (PARTITION BY n_name
                                    ORDER BY c_acctbal DESC, c_custkey
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND CURRENT ROW)
               / sum(c_acctbal) OVER (PARTITION BY n_name), 6)
           AS running_share
  FROM j
)
SELECT n_name AS nation_name, rnk::BIGINT AS rnk, c_custkey, c_name,
       round(c_acctbal, 2) AS acctbal, balance_share, running_share
FROM r WHERE rnk <= 3 ORDER BY nation_name, rnk""",
        "segment_setops": """
WITH building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
big AS (SELECT o_custkey AS c_custkey FROM orders
        GROUP BY 1 HAVING sum(o_totalprice) > 150000)
SELECT 'union' AS set_op, count(*) AS n_customers
FROM (SELECT c_custkey FROM building UNION SELECT c_custkey FROM big)
UNION ALL
SELECT 'intersect', count(*)
FROM (SELECT c_custkey FROM building INTERSECT SELECT c_custkey FROM big)
UNION ALL
SELECT 'except', count(*)
FROM (SELECT c_custkey FROM building EXCEPT SELECT c_custkey FROM big)
ORDER BY set_op""",
        "status_distinct_aggs": """
SELECT o_orderstatus,
       count(DISTINCT o_custkey) AS n_customers,
       count(DISTINCT date_trunc('month', o_orderdate)) AS n_months,
       count(*) AS n_orders
FROM orders GROUP BY 1 ORDER BY 1""",
        "revenue_rollup": f"""
SELECT l_returnflag, l_linestatus,
       {duck_round_div_units(
           "sum(" + duck_disc_price_units("l_extendedprice", "l_discount") + ")",
           "100::HUGEINT", "100.0")} AS revenue,
       count(*) AS n_items,
       (2 * GROUPING(l_returnflag) + GROUPING(l_linestatus))::BIGINT AS gid
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
        "value_percentiles": """
SELECT event_type,
       round(quantile_cont(value, 0.5), 4) AS p50,
       round(quantile_cont(value, 0.9), 4) AS p90,
       round(quantile_cont(value, 0.99), 4) AS p99,
       round(avg(value), 4) AS mean_value
FROM events GROUP BY 1 ORDER BY 1""",
        # invariant-oracle form (VERDICT r8 #2): the hashed surface is the
        # EXACT side + the bound the twin re-derives + TRUE for the
        # within-bound booleans the Spark side computes against its own
        # sketch — a sketch outside its contract now hash-fails. Bound is
        # integer-only arithmetic (see events.approx_cardinality).
        "approx_cardinality": """
SELECT event_type,
       count(*) AS n_events,
       count(DISTINCT user_id) AS exact_users,
       (count(DISTINCT user_id) * 3 // 25 + 4)::BIGINT AS users_err_bound,
       TRUE AS users_within_bound
FROM events GROUP BY 1 ORDER BY 1""",
        # the reference's DECLARED (defective) top_customers semantics —
        # tenant-key-only join (routes/analytics.js:92) — reproduced over
        # one synthetic tenant; the same defective SQL on both engines
        # documents the fan-out divergence in driver-hashed evidence
        # (analytics.top_customers_faithful_panel)
        "top_customers_faithful": """
WITH o AS (SELECT * FROM orders WHERE o_custkey % 797 = 7),
     c AS (SELECT * FROM customer WHERE c_custkey % 797 = 7)
SELECT coalesce(c_name, 'Guest Customer') AS cust_name,
       count(o_orderkey) AS orders_count,
       sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT::DOUBLE / 100.0 AS total_spent
FROM o LEFT JOIN c ON 1 = 1
GROUP BY 1 ORDER BY total_spent DESC, cust_name""",
        # batch-equivalence twin of the ST4 streaming chain
        # (streaming/webhook.py silver_merge_demo): recompute the expected
        # final silver table directly from events — redeliveries deduped
        # (each purchase once), batch-2 price updates (exact DECIMAL x2 on
        # event_id % 3 == 0) winning the keyed merge. Money goes DECIMAL
        # before the update multiply and stays DECIMAL (a x1.1 on the
        # DOUBLE split the engines by a cent at .005 boundaries — see the
        # silver_merge_demo docstring); the only double is the final
        # rounded cast.
        "streaming_silver_merge": """
WITH p AS (
  SELECT event_id, user_id % 5 + 1 AS tenant_id,
         CAST(round(value, 2) AS DECIMAL(18,2)) AS base_price
  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
    AND event_id IS NOT NULL AND user_id IS NOT NULL
),
silver AS (
  SELECT tenant_id, event_id AS shopify_order_id,
         CASE WHEN event_id % 3 = 0
              THEN CAST(base_price * 2 AS DECIMAL(18,2))
              ELSE base_price END AS total_price
  FROM p
)
SELECT tenant_id, count(*) AS n_orders,
       round(sum(total_price), 2)::DOUBLE AS revenue
FROM silver GROUP BY 1 ORDER BY 1""",
        # decode-integrity twin of the multimodal layer
        # (multimodal.media_decode_audit): every payload byte is a
        # closed-form integer formula of (doc_id, position), so the
        # expected decoded statistics are re-derived here WITHOUT parsing
        # any binary — the Spark side must recover them through the REAL
        # WAV/PPM/y4m decoders. range() upper bounds are the formula
        # maxima (audio n<=640, image 3wh<=2304, video frames<=7,
        # wh<=640); decode_ok is TRUE by the FEATURE_DIM-finite contract.
        "media_decode_audit": """
WITH sel AS (
  SELECT doc_id FROM documents WHERE doc_id % 11 = 3 ORDER BY doc_id LIMIT 45
),
meta AS (
  SELECT doc_id,
         CASE CAST(doc_id % 3 AS INTEGER)
              WHEN 0 THEN 'audio' WHEN 1 THEN 'image' ELSE 'video'
         END AS kind,
         256 + (doc_id % 7) * 64 AS a_n,
         16 + (doc_id % 5) * 4 AS i_w,
         12 + (doc_id % 4) * 4 AS i_h,
         16 + (doc_id % 4) * 8 AS v_w,
         8 + (doc_id % 2) * 8 AS v_h,
         3 + (doc_id % 5) AS v_f
  FROM sel
),
audio AS (
  SELECT m.doc_id AS media_id, 'audio' AS kind,
         (44 + 2 * m.a_n)::BIGINT AS payload_bytes,
         count(*)::BIGINT AS n_units,
         sum((1103515245 * (m.doc_id + 1) + 12345 * t.range) % 65521
             - 32760)::BIGINT AS value_sum,
         min((1103515245 * (m.doc_id + 1) + 12345 * t.range) % 65521
             - 32760)::BIGINT AS value_min,
         max((1103515245 * (m.doc_id + 1) + 12345 * t.range) % 65521
             - 32760)::BIGINT AS value_max
  FROM meta m JOIN range(0, 640) t ON t.range < m.a_n
  WHERE m.kind = 'audio'
  GROUP BY m.doc_id, m.a_n
),
image AS (
  SELECT m.doc_id AS media_id, 'image' AS kind,
         (length('P6' || chr(10) || m.i_w || ' ' || m.i_h || chr(10)
                 || '255' || chr(10)) + 3 * m.i_w * m.i_h)::BIGINT
           AS payload_bytes,
         count(*)::BIGINT AS n_units,
         sum((m.doc_id * 31 + t.range * 17) % 256)::BIGINT AS value_sum,
         min((m.doc_id * 31 + t.range * 17) % 256)::BIGINT AS value_min,
         max((m.doc_id * 31 + t.range * 17) % 256)::BIGINT AS value_max
  FROM meta m JOIN range(0, 2304) t ON t.range < 3 * m.i_w * m.i_h
  WHERE m.kind = 'image'
  GROUP BY m.doc_id, m.i_w, m.i_h
),
video AS (
  SELECT m.doc_id AS media_id, 'video' AS kind,
         (length('YUV4MPEG2 W' || m.v_w || ' H' || m.v_h || ' F10:1 C420'
                 || chr(10))
          + m.v_f * (6 + (3 * m.v_w * m.v_h) // 2))::BIGINT
           AS payload_bytes,
         count(*)::BIGINT AS n_units,
         sum((m.doc_id * 13 + f.range * 7 + j.range * 5) % 256)::BIGINT
           AS value_sum,
         min((m.doc_id * 13 + f.range * 7 + j.range * 5) % 256)::BIGINT
           AS value_min,
         max((m.doc_id * 13 + f.range * 7 + j.range * 5) % 256)::BIGINT
           AS value_max
  FROM meta m
  JOIN range(0, 8) f ON f.range < m.v_f
  JOIN range(0, 640) j ON j.range < m.v_w * m.v_h
  WHERE m.kind = 'video'
  GROUP BY m.doc_id, m.v_w, m.v_h, m.v_f
)
SELECT media_id, kind, payload_bytes, n_units, value_sum, value_min,
       value_max, TRUE AS decode_ok
FROM (SELECT * FROM audio UNION ALL SELECT * FROM image
      UNION ALL SELECT * FROM video)
ORDER BY media_id""",
        # same contract: exact percentiles at the driver-proven 4-decimal
        # precision (see value_percentiles); the rank-space sketch checks
        # are TRUE by the approx_percentile accuracy contract
        # (events.quantile_sketch_error docstring)
        "quantile_sketch_error": """
SELECT event_type,
       count(*) AS n_values,
       round(quantile_cont(value, 0.5), 4) AS exact_p50,
       round(quantile_cont(value, 0.95), 4) AS exact_p95,
       TRUE AS p50_within_bound,
       TRUE AS p95_within_bound
FROM events WHERE value IS NOT NULL GROUP BY 1 ORDER BY 1""",
        "daily_type_pivot": """
SELECT CAST(ts AS DATE) AS event_date,
       (count(*) FILTER (WHERE event_type = 'click'))::BIGINT AS click,
       (count(*) FILTER (WHERE event_type = 'error'))::BIGINT AS error,
       (count(*) FILTER (WHERE event_type = 'purchase'))::BIGINT AS purchase,
       (count(*) FILTER (WHERE event_type = 'signup'))::BIGINT AS signup,
       (count(*) FILTER (WHERE event_type = 'view'))::BIGINT AS view
FROM events GROUP BY 1 ORDER BY 1""",
        "customers_without_orders": """
SELECT n_name AS nation_name, count(*) AS n_silent,
       sum(CAST(round(c_acctbal * 100) AS BIGINT))::BIGINT::DOUBLE / 100.0 AS idle_balance
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey
    AND o_orderdate < TIMESTAMP '1995-07-01 00:00:00'
)
GROUP BY 1 ORDER BY 1""",
        "purchase_asof_view": """
WITH base AS (
  SELECT event_id, user_id, event_type, ts::TIMESTAMP AS ts
  FROM events WHERE event_type IN ('view', 'purchase')
),
scan AS (
  SELECT *,
         last_value(CASE WHEN event_type = 'view'
                         THEN struct_pack(vts := ts, vid := event_id) END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id
                 ORDER BY ts,
                          CASE WHEN event_type = 'view' THEN 0 ELSE 1 END,
                          event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lv
  FROM base
)
SELECT event_id AS purchase_id, user_id, lv.vid AS view_id,
       round((epoch_us(ts) - epoch_us(lv.vts)) / 1e6, 3) AS gap_sec
FROM scan WHERE event_type = 'purchase' ORDER BY purchase_id""",
        "views_before_purchase": """
WITH base AS (
  SELECT event_id, user_id, event_type, epoch_us(ts::TIMESTAMP) AS tus
  FROM events WHERE event_type IN ('view', 'purchase')
),
c AS (
  SELECT *,
         sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY tus
                 RANGE BETWEEN 600000000 PRECEDING AND 1 PRECEDING) AS nv
  FROM base
)
SELECT event_id AS purchase_id, user_id,
       coalesce(nv, 0)::BIGINT AS n_views_before
FROM c WHERE event_type = 'purchase' ORDER BY purchase_id""",
        # twin of streaming.windows.windows_stream_demo: the streaming
        # tumbling-window path (two availableNow runs over one
        # checkpoint, state merged across the restart) must equal the
        # plain batch day-grain rollup over the same rows; NULL ts /
        # event_type rows are excluded on both sides (no event-time
        # analog), and revenue is the exact cent-sum convention
        "streaming_tumbling_windows": """
SELECT date_trunc('day', ts::TIMESTAMP)::TIMESTAMP AS window_start,
       event_type,
       count(*)::BIGINT AS n_events,
       sum(CAST(round(value * 100) AS BIGINT))::BIGINT::DOUBLE / 100.0
         AS revenue
FROM events
WHERE ts IS NOT NULL AND event_type IS NOT NULL
GROUP BY 1, 2 ORDER BY window_start, event_type""",
        "hourly_windows": """
SELECT date_trunc('hour', ts::TIMESTAMP) AS window_start,
       date_trunc('hour', ts::TIMESTAMP) + INTERVAL 1 HOUR AS window_end,
       event_type,
       count(*) AS n_events,
       sum(CAST(round(value * 100) AS BIGINT))::BIGINT::DOUBLE / 100.0
         AS total_value
FROM events GROUP BY 1, 2, 3 ORDER BY window_start, event_type""",
        "tfidf_top_terms": """
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
nd AS (SELECT count(*) AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         round(tf.tf * (ln((nd.n + 1) / (df.df + 1)) + 1), 6) AS tfidf
  FROM tf JOIN df USING (term) CROSS JOIN nd
  WHERE tf.doc_id < 50
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY tfidf DESC, term) AS rnk
  FROM scored
)
SELECT doc_id, rnk::BIGINT AS rnk, term, tf, df, tfidf
FROM r WHERE rnk <= 3 ORDER BY doc_id, rnk""",
        "label_centroids": """
SELECT label, i AS dim_idx, round(avg(embedding[i]), 6) AS centroid_val
FROM embeddings, generate_series(1, 64) t(i)
GROUP BY 1, 2 ORDER BY label, dim_idx""",
        "rolling_revenue": """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS order_date,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS rev_cents
  FROM orders GROUP BY 1
)
SELECT order_date, rev_cents::DOUBLE / 100.0 AS revenue,
       round(sum(rev_cents) OVER w / (count(*) OVER w * 100.0), 4) AS ma7
FROM daily
WINDOW w AS (ORDER BY order_date ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
ORDER BY order_date""",
        "customer_order_gaps": """
WITH g AS (
  SELECT o_custkey,
         date_diff('day',
                   lag(o_orderdate) OVER (PARTITION BY o_custkey
                                          ORDER BY o_orderdate, o_orderkey),
                   o_orderdate) AS gap
  FROM orders
)
SELECT c_mktsegment, round(avg(gap), 4) AS avg_gap_days,
       count(gap) AS n_gaps
FROM g JOIN customer ON o_custkey = c_custkey
GROUP BY 1 ORDER BY 1""",
        "orders_cube": """
SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
       sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT::DOUBLE / 100.0 AS total_price,
       (2 * GROUPING(o_orderstatus) + GROUPING(o_orderpriority))::BIGINT AS gid
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""",
        "embedding_stats": """
SELECT label, count(*) AS n_vecs,
       round(avg(sqrt(list_dot_product(embedding::DOUBLE[],
                                       embedding::DOUBLE[]))), 6) AS avg_norm
FROM embeddings GROUP BY 1 ORDER BY label""",
    }
