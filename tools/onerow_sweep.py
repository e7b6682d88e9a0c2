"""Build the "sweep 7" single-row-corpus fixture: a copy of an sf dir
where each of the four CORPUS tables (lineitem, events, documents,
embeddings) holds exactly its FIRST row and every dimension table
(region nation customer supplier part) plus orders stays full. The
boundary between the empty sweep (zero rows — day-one deployment) and
normal data: n = 1, where every degenerate denominator lives —

- sample variance / stddev / correlation: n-1 = 0 -> NULL on both
  engines (and anything dividing by it downstream);
- lag/lead/gap analysis: every lag is NULL, gap aggregates see zero
  samples;
- percentiles/median over a single value: all quantiles equal it,
  interpolation is inert;
- pair miners (shingle index, MinHash bands, aHash, co-purchase):
  one doc/vector can never pair — every pair surface must be EMPTY,
  not error;
- clustering/IVF/kmeans: k > n — centroid sets collapse to the one
  point; assignment must still be deterministic;
- TF-IDF / df statistics: df = N = 1 -> idf = ln(1) = 0 class of
  boundary;
- bootstrap/sampling: resampling a 1-row corpus, splits where one
  side is necessarily empty.

Keeping dims + orders full (vs the empty sweep's all-empty) isolates
the n=1 semantics: FK joins still land, so a divergence here is a
degenerate-denominator bug, not an empty-join artifact.

Expected baseline (round 13, after the value_outliers fix this sweep
found): **175/176 PASS** — the one non-pass is streaming_silver_merge's
by-design loud guard (the single event is not a purchase -> "no usable
purchase events"). The first run also crashed value_outliers with an
ANSI DIVIDE_BY_ZERO (sample variance's n-1 denominator at n=1) —
fixed with engine-mirrored NULLIF guards, so a re-run reads clean.
ridge_probe/logistic_probe handle n=1 without their empty-table
guards firing (the single-point fit is degenerate but deterministic
and engine-identical).

Usage: python tools/onerow_sweep.py [src_sf_dir] [out_dir]
Then:  python tools/check_oracle.py <out_dir>
"""

from __future__ import annotations

import os
import shutil
import sys

import pyarrow.parquet as pq

CORPUS = {"lineitem", "events", "documents", "embeddings"}


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/onerow_fixture"
    if os.path.exists(out):
        shutil.rmtree(out)
    os.makedirs(out)
    for f in sorted(os.listdir(src)):
        if not f.endswith(".parquet"):
            continue
        name = f[:-len(".parquet")]
        if name in CORPUS:
            t = pq.read_table(os.path.join(src, f))
            # version 2.6 keeps TIMESTAMP(NANOS) columns nanos
            pq.write_table(t.slice(0, 1), os.path.join(out, f), version="2.6")
            print(f"{f}: 1 row (of {t.num_rows})")
        else:
            shutil.copy(os.path.join(src, f), os.path.join(out, f))
            print(f"{f}: full copy")
    print(out)


if __name__ == "__main__":
    main()
