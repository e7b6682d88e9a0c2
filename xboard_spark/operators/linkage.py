"""Record linkage / entity resolution: blocked fuzzy-duplicate detection
over dimension tables — the structured-data sibling of the document dedup
family (``operators/dedup.py``). The reference's world gets this for free
from UNIQUE constraints on upstream ids (``migrations/init.sql:43``); a
lake ingesting from many sources has no shared id space and has to MATCH
records instead.

Method (Fellegi-Sunter-style pipeline, reduced to its scalable core):
blocking first — records only ever compare within a block, so the
pairwise cost is sum(block_size^2), never |table|^2 — then an exact
pairwise similarity (Levenshtein edit distance, a built-in JVM expression
in Spark AND DuckDB with identical classic semantics, so the operator
stays oracle-checkable) inside each block.

Blocking key choice is THE scale lever, and it was measured here: nation
alone (25 blocks) left ~600-row blocks at sf0.1 — 4.5M Levenshtein
evaluations, 55s. The default path now blocks on the DELETION
NEIGHBORHOOD (SymSpell / Garbe's symmetric-delete idea, also FastSS,
Bocek et al. 2007): every name emits itself plus each single-character
deletion; two strings within edit distance 1 ALWAYS share a neighborhood
element (substitution -> delete the differing position from both;
indel -> the deletion of the longer IS the shorter), so the
neighborhood join is a complete, exact candidate generator for
max_dist=1 — same 55s workload: 2.5s, identical output. Candidates
per bucket are the
handful of true near-matches, so cost is O(rows * name_len) variants +
near-linear join, not sum(block^2). Verification stays the exact
Levenshtein filter, so false candidates cost nothing but the probe."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from xboard_spark.cache import BoundedFrameCache

# Session caches, keyed by (customer-plan semanticHash, max_dist) — the
# verified fuzzy pair set and the entity-cluster labels derived from it.
# The Levenshtein candidate join is ~75% of customer_entity_clusters'
# cost (VERDICT r6), and THREE consumers want its output per session
# (fuzzy_customer_pairs, customer_entity_clusters, and any downstream
# linkage audit) — at scale both frames are persisted tables next to the
# dedup pair index, refreshed with the corpus; in-session the analogue is
# a persist + explicit release via ``clear_index_caches`` (same contract
# as dedup._PAIRS_CACHE/_CLUSTERS_CACHE).
_FUZZY_PAIRS_CACHE: dict[tuple[int, int], DataFrame] = BoundedFrameCache()
# star-rounds diagnostic sidecar, restored on cache hits (kept out of the
# frame caches so clear_index_caches' unpersist loop only sees frames;
# the cluster cache's on_evict keeps the two keyed in lockstep)
_ENTITY_ROUNDS: dict[tuple[int, int], int] = {}
_ENTITY_CLUSTERS_CACHE: dict[tuple[int, int], DataFrame] = BoundedFrameCache(
    on_evict=lambda k: _ENTITY_ROUNDS.pop(k, None)
)


def _deletion_neighborhood(name_col: str) -> F.Column:
    """{name} ∪ {name with position i removed}: the symmetric-delete
    candidate key set for edit distance <= 1. The producing column must be
    a bound attribute (see shingle_fps) so the HOF lambda stays cheap."""
    n = F.col(name_col)
    deletions = F.transform(
        F.sequence(F.lit(1), F.length(n)),
        lambda i: F.concat(
            n.substr(F.lit(1), i - 1), n.substr(i + 1, F.length(n))
        ),
    )
    return F.array_distinct(F.concat(F.array(n), deletions))


def fuzzy_customer_pairs(customer: DataFrame, max_dist: int = 1) -> DataFrame:
    """Near-duplicate customer pairs: same nation AND name edit distance
    <= ``max_dist``. For ``max_dist == 1`` (the default) candidates come
    from the deletion-neighborhood join (exact — see module docstring);
    larger distances fall back to the per-nation quadratic with its
    documented sum(block^2) cost.

    The VERIFIED pair set is cached per (corpus plan, max_dist) — built
    once, shared by every consumer in the session (see module-level
    cache comment); the orderBy stays outside the cache so the persisted
    frame is the cheap unordered form."""
    key = (customer.semanticHash(), max_dist)
    if key in _FUZZY_PAIRS_CACHE:
        return _ordered_pairs(_FUZZY_PAIRS_CACHE[key])
    probe = customer.select("c_custkey", "c_name", "c_nationkey")
    if max_dist == 1:
        # The variant frame the self-join shuffles is NARROW on purpose:
        # (custkey, 8-byte hash of (nationkey, variant)) — names never
        # ride the ~(len+1)-way explode, and the candidate distinct
        # dedups 16-byte rows instead of 5 string columns. A hash
        # collision can only ADD a false candidate (within or across
        # nations), and every candidate is verified by the exact
        # nationkey-equality + Levenshtein filter after the name
        # join-back, so the output is provably identical. Measured at
        # sf0.1: 2.18s -> 1.15s, same 10435 pairs.
        variants = probe.select(
            "c_custkey",
            "c_nationkey",
            F.explode(_deletion_neighborhood("c_name")).alias("v"),
        ).select(
            "c_custkey",
            F.xxhash64("c_nationkey", "v").alias("vh"),
        )
        a = variants.alias("a")
        b = variants.alias("b")
        cand = (
            a.join(
                b,
                (F.col("a.vh") == F.col("b.vh"))
                & (F.col("a.c_custkey") < F.col("b.c_custkey")),
            )
            .select(
                F.col("a.c_custkey").alias("custkey_a"),
                F.col("b.c_custkey").alias("custkey_b"),
            )
            .distinct()
        )
        na = probe.select(
            F.col("c_custkey").alias("custkey_a"),
            F.col("c_name").alias("name_a"),
            F.col("c_nationkey").alias("nationkey"),
        )
        nb = probe.select(
            F.col("c_custkey").alias("custkey_b"),
            F.col("c_name").alias("name_b"),
            F.col("c_nationkey").alias("nationkey_b"),
        )
        pairs = (
            cand.join(na, "custkey_a")
            .join(nb, "custkey_b")
            .filter(F.col("nationkey") == F.col("nationkey_b"))
            .withColumn("name_dist", F.levenshtein("name_a", "name_b"))
            .filter(F.col("name_dist") <= 1)
        )
    else:
        a = probe.alias("a")
        b = probe.alias("b")
        pairs = (
            a.join(
                b,
                (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
                & (F.col("a.c_custkey") < F.col("b.c_custkey")),
            )
            .select(
                F.col("a.c_nationkey").alias("nationkey"),
                F.col("a.c_custkey").alias("custkey_a"),
                F.col("b.c_custkey").alias("custkey_b"),
                F.levenshtein(F.col("a.c_name"), F.col("b.c_name")).alias(
                    "name_dist"
                ),
            )
            .filter(F.col("name_dist") <= max_dist)
        )
    flat = pairs.select(
        F.col("nationkey").cast("long").alias("nationkey"),
        "custkey_a",
        "custkey_b",
        F.col("name_dist").cast("long").alias("name_dist"),
    )
    _FUZZY_PAIRS_CACHE[key] = flat.persist()
    return _ordered_pairs(flat)


def _ordered_pairs(flat: DataFrame) -> DataFrame:
    return flat.orderBy("custkey_a", "custkey_b")


def customer_entity_clusters(customer: DataFrame, max_dist: int = 1) -> DataFrame:
    """Entity RESOLUTION (pairs -> entities): connected components over
    the fuzzy-match pair graph, one row per resolved entity:
    (entity_id = min custkey, n_members, rep_custkey = min member) — the
    step that turns pairwise record linkage into a deduplicated customer
    dimension (a transitive chain A~B~C is ONE entity even when A!~C,
    which per-pair output cannot express).

    Scale shape: reuses the bounded fuzzy candidate join and the
    dedup family's ``components_star`` engine (Kiveris large-star/
    small-star, O(log n) rounds) — the fuzzy-name graph grows DIAMETER
    with data (the sf0.1 sweep measured it), so the O(diameter)
    propagation engine paid one barrier per hop (9.05s at sf0.1 vs
    ~3s); star rounds collapse chains geometrically and are
    hypothesis-proven output-identical. The component LABELS are cached
    under the same (corpus plan, max_dist) key as the pair set — warm
    calls skip both the Levenshtein candidate join and the star loop
    (``components_star.last_rounds`` is restored from the sidecar on
    hits, same contract as ``dedup.dedup_clusters``)."""
    from xboard_spark.operators.dedup import components_star

    key = (customer.semanticHash(), max_dist)
    if key not in _ENTITY_CLUSTERS_CACHE:
        pairs = fuzzy_customer_pairs(customer, max_dist).select(
            F.col("custkey_a").alias("doc_a"),
            F.col("custkey_b").alias("doc_b"),
        )
        _ENTITY_CLUSTERS_CACHE[key] = components_star(pairs).persist()
        _ENTITY_ROUNDS[key] = components_star.last_rounds
    else:
        components_star.last_rounds = _ENTITY_ROUNDS[key]
    comp = _ENTITY_CLUSTERS_CACHE[key]
    return (
        comp.groupBy(F.col("cluster_id").alias("entity_id"))
        .agg(
            F.count("*").cast("long").alias("n_members"),
            F.min("doc_id").alias("rep_custkey"),
        )
        .orderBy("entity_id")
    )
