"""Build the round-12 "empty corpus" fixture: a copy of an sf dir where
EVERY table has ZERO rows with its schema preserved (pyarrow slice(0,0),
physical types intact). The degenerate boundary every operator meets on
day one of a new deployment — before any data lands — and the shape that
exposed the bootstrap CI's crossJoin-with-empty collapse (round 12: a
1-row FILTER over an empty corpus yields zero rows and nukes the whole
panel, where a scalar subquery yields one NULL-bound row).

Expected baseline (round 13): **173/176 PASS, 3 failures** — all three
by-design loud Spark guards (ridge_probe / logistic_probe: "embeddings
table is empty"; streaming_silver_merge: "no usable purchase events").
The round-12 classified non-passes were closed in round 13: the three
oracle-twin empty-index CTE errors (embedding_neardup / knn_lsh /
ann_recall_audit) by coalescing the mean-centering CTE's avg() to 0 on
empty input, and the ROLLUP/CUBE-on-empty-relation boundary by
``window_ops._grand_total_if_empty`` (Spark now emits the standard's
``()`` grand-total row; pinned by tests/test_grouping_sets_empty.py).

Usage: python tools/empty_sweep.py [src_sf_dir] [out_dir]
Then:  python tools/check_oracle.py <out_dir>
"""

from __future__ import annotations

import os
import shutil
import sys

import pyarrow.parquet as pq


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/empty_fixture"
    if os.path.exists(out):
        shutil.rmtree(out)
    os.makedirs(out)
    for f in sorted(os.listdir(src)):
        if f.endswith(".parquet"):
            t = pq.read_table(os.path.join(src, f))
            # version 2.6 keeps TIMESTAMP(NANOS) columns nanos
            pq.write_table(t.slice(0, 0), os.path.join(out, f), version="2.6")
            print(f"{f}: 0 rows, {len(t.schema)} columns preserved")
    print(out)


if __name__ == "__main__":
    main()
