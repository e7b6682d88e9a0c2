"""Incremental LSH dedup: batches arriving over time, duplicates detected
against the accumulated index (including cross-batch pairs), matching the
batch operator's verdicts."""

from __future__ import annotations

import json
import os

import pytest

from xboard_spark.operators.dedup import minhash_dedup_pairs
from xboard_spark.streaming.dedup import IncrementalDedupIndex, start_dedup_stream


@pytest.fixture()
def texts():
    base = " ".join(f"word{i} tok{i * 5 % 11}" for i in range(30))
    near = base.replace("word9", "changed9")
    other = " ".join(f"other{i} thing{i * 3 % 7}" for i in range(30))
    return base, near, other


def test_incremental_matches_batch(spark, tmp_path, texts):
    base, near, other = texts
    b1 = spark.createDataFrame(
        [(1, base), (2, other)], "doc_id long, text string"
    )
    b2 = spark.createDataFrame(
        [(3, near), (4, other)], "doc_id long, text string"
    )
    idx = IncrementalDedupIndex(spark, str(tmp_path / "idx"))
    p1 = {(r.doc_a, r.doc_b) for r in idx.add_batch(b1).collect()}
    assert p1 == set()  # batch 1 has no dups
    p2 = {(r.doc_a, r.doc_b) for r in idx.add_batch(b2).collect()}
    # cross-batch near-dup (1,3) and exact dup (2,4) must surface
    assert (1, 3) in p2
    assert (2, 4) in p2

    # verdicts match the batch operator over the full corpus
    full = spark.createDataFrame(
        [(1, base), (2, other), (3, near), (4, other)],
        "doc_id long, text string",
    )
    batch_pairs = {
        (r.doc_a, r.doc_b) for r in minhash_dedup_pairs(full).collect()
    }
    assert p2 <= batch_pairs


def test_dedup_stream_end_to_end(spark, tmp_path, texts):
    base, near, _ = texts
    src = tmp_path / "src"
    os.makedirs(src)
    with open(src / "batch.json", "w") as f:
        for i, t in [(10, base), (11, near)]:
            f.write(json.dumps({"doc_id": i, "text": t, "lang": "en", "source": "s"}) + "\n")
    pairs_out = str(tmp_path / "pairs")
    q = start_dedup_stream(
        spark, str(src), str(tmp_path / "stream_idx"), pairs_out
    )
    q.awaitTermination(120)
    got = spark.read.parquet(pairs_out).collect()
    assert {(r.doc_a, r.doc_b) for r in got} == {(10, 11)}
    assert all(r.jaccard >= 0.5 for r in got)


def test_sink_crash_before_index_commit_replays_same_pairs(spark, tmp_path, texts):
    """Durability ordering contract: the pairs sink hook runs BEFORE the
    index grows, so a crash mid-sink leaves the index unchanged and the
    replayed batch re-derives the SAME pairs (the old write-after-append
    shape silently lost a crashed batch's pairs forever: the replay's
    anti-join dropped every document)."""
    base, near, other = texts
    idx = IncrementalDedupIndex(spark, str(tmp_path / "idx"))
    idx.add_batch(
        spark.createDataFrame([(1, base), (2, other)], "doc_id long, text string")
    )
    b2 = spark.createDataFrame(
        [(3, near), (4, other)], "doc_id long, text string"
    )

    class SinkCrash(RuntimeError):
        pass

    seen: list[set] = []

    def crashing_sink(pairs):
        seen.append({(r.doc_a, r.doc_b) for r in pairs.collect()})
        raise SinkCrash("simulated crash during the pairs write")

    with pytest.raises(SinkCrash):
        idx.add_batch(b2, on_pairs=crashing_sink)
    # the crash aborted BEFORE the appends: batch 2's docs are not indexed
    assert idx._read("inv").filter("doc_id >= 3").count() == 0

    # replay (at-least-once source redelivers the batch): same pairs again
    replay = {(r.doc_a, r.doc_b) for r in idx.add_batch(b2).collect()}
    assert replay == seen[0]
    assert {(1, 3), (2, 4)} <= replay
