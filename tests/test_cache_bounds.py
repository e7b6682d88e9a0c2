"""Bounded index caches (VERDICT r8 #7): the per-type LRU must evict
least-recently-used entries, UNPERSIST what it evicts, and keep the
standard build-on-miss idiom correct — an evicted index is rebuilt and
its consumer's output is unchanged (coherence)."""

from __future__ import annotations

from xboard_spark.cache import BoundedFrameCache


class _FakeFrame:
    def __init__(self) -> None:
        self.unpersisted = 0

    def unpersist(self):
        self.unpersisted += 1
        return self


def test_lru_evicts_and_unpersists():
    c = BoundedFrameCache(max_entries=2)
    a, b, d = _FakeFrame(), _FakeFrame(), _FakeFrame()
    c["a"] = a
    c["b"] = b
    _ = c["a"]  # bump a -> b is now LRU
    c["d"] = d
    assert set(c) == {"a", "d"}
    assert b.unpersisted == 1 and a.unpersisted == 0 and d.unpersisted == 0
    assert c.evictions == 1


def test_tuple_entries_release_every_frame():
    c = BoundedFrameCache(max_entries=1)
    t1 = (_FakeFrame(), _FakeFrame(), _FakeFrame())
    c["x"] = t1
    c["y"] = _FakeFrame()
    assert all(f.unpersisted == 1 for f in t1)


def test_overwrite_releases_replaced_entry():
    c = BoundedFrameCache(max_entries=4)
    old, new = _FakeFrame(), _FakeFrame()
    c["k"] = old
    c["k"] = new
    assert old.unpersisted == 1 and new.unpersisted == 0
    assert c.evictions == 0  # replacement is not an eviction


def test_contains_does_not_bump_recency():
    c = BoundedFrameCache(max_entries=2)
    a, b = _FakeFrame(), _FakeFrame()
    c["a"] = a
    c["b"] = b
    assert "a" in c  # membership probe must NOT save "a" from eviction
    c["c"] = _FakeFrame()
    assert set(c) == {"b", "c"} and a.unpersisted == 1


def test_eviction_then_rebuild_is_coherent(spark):
    """End-to-end on a real cache: force _INDEX_CACHE evictions by
    building indexes for more corpora than the bound, then re-run the
    FIRST corpus's consumer — output must be bit-identical to its
    pre-eviction result (build-on-miss after eviction)."""
    from xboard_spark.operators import dedup

    def docs(tag: str, n: int = 12):
        rows = [
            (i, f"{tag} alpha beta gamma delta common text {i % 3}", "en")
            for i in range(n)
        ]
        return spark.createDataFrame(rows, "doc_id long, text string, lang string")

    first = docs("corpus0")
    before = sorted(map(tuple, dedup.ngram_jaccard_pairs(first).collect()))
    key0 = set(dedup._INDEX_CACHE)

    old_bound = dedup._INDEX_CACHE.max_entries
    dedup._INDEX_CACHE.max_entries = 2
    try:
        ev0 = dedup._INDEX_CACHE.evictions
        for i in range(1, 4):  # 3 more corpora through a bound of 2
            dedup.ngram_jaccard_pairs(docs(f"corpus{i}")).collect()
        assert dedup._INDEX_CACHE.evictions > ev0, "bound never evicted"
        assert not (key0 & set(dedup._INDEX_CACHE)), "corpus0 survived LRU"
        after = sorted(map(tuple, dedup.ngram_jaccard_pairs(first).collect()))
        assert after == before
    finally:
        dedup._INDEX_CACHE.max_entries = old_bound


def test_clear_index_caches_still_releases_everything(spark):
    """The manual release valve must keep working on the bounded caches
    (it unpersists + clears without going through eviction)."""
    import xboard_spark
    from xboard_spark.operators import dedup

    rows = [(i, f"release valve text sample {i % 2}", "en") for i in range(8)]
    d = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    dedup.ngram_jaccard_pairs(d).collect()
    assert len(dedup._INDEX_CACHE) >= 1
    released = xboard_spark.clear_index_caches()
    assert released >= 1
    assert len(dedup._INDEX_CACHE) == 0


def test_on_evict_fires_only_on_true_eviction():
    gone: list = []
    c = BoundedFrameCache(max_entries=2, on_evict=gone.append)
    a, b = _FakeFrame(), _FakeFrame()
    c["a"] = a
    c["a"] = _FakeFrame()  # replacement: key stays -> no callback
    assert gone == []
    c["b"] = b
    c["c"] = _FakeFrame()  # evicts "a"
    assert gone == ["a"]


def test_sidecar_keys_evict_in_lockstep(spark):
    """The star-rounds sidecars must not outlive their cluster frames:
    evicting a key from the bounded cluster cache pops its sidecar."""
    from xboard_spark.operators import dedup

    dedup._CLUSTERS_CACHE["k1"] = _FakeFrame()
    dedup._CLUSTERS_ROUNDS["k1"] = 3
    old_bound = dedup._CLUSTERS_CACHE.max_entries
    dedup._CLUSTERS_CACHE.max_entries = 1
    try:
        dedup._CLUSTERS_CACHE["k2"] = _FakeFrame()  # evicts k1
        assert "k1" not in dedup._CLUSTERS_CACHE
        assert "k1" not in dedup._CLUSTERS_ROUNDS
    finally:
        dedup._CLUSTERS_CACHE.max_entries = old_bound
        dedup._CLUSTERS_CACHE.pop("k2", None)


def test_cache_model_property():
    """Model-based check: against a reference model of LRU-with-release,
    a random (seeded, deterministic) op sequence must agree on contents,
    order, eviction count, and exactly-once release of dead frames."""
    import random

    rng = random.Random(90210)
    keys = [f"k{i}" for i in range(12)]
    c = BoundedFrameCache(max_entries=4)
    model: dict[str, _FakeFrame] = {}  # insertion==recency order (py3.7+)
    released: list[_FakeFrame] = []

    for step in range(600):
        op = rng.random()
        k = rng.choice(keys)
        if op < 0.55:  # insert/replace
            f = _FakeFrame()
            if k in model:  # replacement releases the old frame
                released.append(model.pop(k))
            model[k] = f
            if len(model) > 4:
                lru = next(iter(model))
                released.append(model.pop(lru))
            c[k] = f
        elif op < 0.85:  # get (bumps recency on hit)
            if k in model:
                model[k] = model.pop(k)
                assert c[k] is model[k]
            else:
                assert k not in c
        else:  # membership probe (must NOT bump)
            assert (k in c) == (k in model)
        assert list(c) == list(model), f"order diverged at step {step}"
        assert all(f.unpersisted == 0 for f in model.values())
        assert all(f.unpersisted == 1 for f in released)
    assert c.evictions > 0  # the sequence actually exercised eviction


def test_release_all_unpersists_fires_on_evict_and_counts():
    gone: list = []
    c = BoundedFrameCache(max_entries=8, on_evict=gone.append)
    t = (_FakeFrame(), _FakeFrame())
    single = _FakeFrame()
    c["t"] = t
    c["s"] = single
    n = c.release_all()
    assert n == 3  # counts FRAMES, not keys (tuple = 2)
    assert len(c) == 0 and c.evictions == 0  # release != LRU pressure
    assert sorted(gone) == ["s", "t"]
    assert all(f.unpersisted == 1 for f in (*t, single))


def test_release_rejects_non_frame_entries():
    """A non-DataFrame inside an entry is consumer misuse: _release must
    raise, not swallow the AttributeError and silently skip the
    unpersist (reintroducing the storage leak the cache exists to fix)."""
    import pytest

    from xboard_spark.cache import BoundedFrameCache

    with pytest.raises(TypeError, match="must be DataFrames"):
        BoundedFrameCache._release((object(),))
