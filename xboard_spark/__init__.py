"""xboard_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of PranavSaluja/XBoard (multi-tenant Shopify
ingestion + analytics), re-expressed Spark-first, plus the large-scale
training-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing) the 100 TB deployment target needs.

Layout
------
- ``session``    SparkSession factory (UTC, AQE, tuned shuffle defaults)
- ``io``         parquet/JSON readers + temp-view registration
- ``schemas``    StructTypes for the XBoard domain tables and testdata tables
- ``operators``  batch query operators (analytics, tpch, events, text, dedup,
                 similarity, multimodal)
- ``functions``  reusable column expressions (portable hashing, vectors, text)
- ``streaming``  Structured Streaming: webhook intake, dedup, windowed aggs
- ``ingest``     Shopify-shaped JSON -> typed tables -> merge-by-window upsert
- ``plans``      plan inspection + tenant-filter lint

All query semantics derive from the public reference (see SURVEY.md §2,
citations in each operator's docstring) and the public PySpark API.
"""

__version__ = "0.1.0"


def clear_index_caches() -> int:
    """Unpersist and drop every in-session shared index artifact (shingle
    index, LSH-verified pair set, LSH corpus, IVF and PQ indexes). The
    caches make repeated queries cheap (the indexes ARE the product —
    built once, consumed many times); this is the explicit release valve
    for long-lived sessions that move on to a different corpus. Returns
    the number of artifacts released.

    Since round 9 each cache is a ``BoundedFrameCache`` (per-type LRU,
    unpersist-on-evict — see ``xboard_spark/cache.py``), so a session
    that never calls this no longer leaks persisted frames without
    bound; this function remains the immediate full release.

    Caveat: cache keys are ``DataFrame.semanticHash()`` of the source plan
    (plus the index parameters). The hash identifies the PLAN, not the
    bytes behind it — if files at the same path are overwritten mid-session
    the cache serves the stale persisted index; call this function after
    any in-place rewrite. (At scale the index is a persisted table whose
    freshness is owned by the pipeline, so the in-session analogue keeps
    the same contract: explicit invalidation, not mtime-watching.)"""
    from xboard_spark.operators import dedup, graph, linkage, similarity

    # release semantics live on BoundedFrameCache.release_all (unpersist
    # + on_evict, which empties the star-rounds sidecars in lockstep)
    return sum(
        cache.release_all()
        for cache in (
            dedup._INDEX_CACHE,
            dedup._PAIRS_CACHE,
            dedup._CLUSTERS_CACHE,
            graph._EDGE_CACHE,
            graph._RAW_EDGE_CACHE,
            graph._ORIENTED_CACHE,
            graph._KW_GRAPH_CACHE,
            linkage._FUZZY_PAIRS_CACHE,
            linkage._ENTITY_CLUSTERS_CACHE,
            similarity._NORM_CACHE,
            similarity._CORPUS_CACHE,
            similarity._IVF_CACHE,
            similarity._PQ_CACHE,
        )
    )
