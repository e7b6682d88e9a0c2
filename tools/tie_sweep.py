"""Build the "sweep 8" sort-key-collision fixture: a copy of an sf dir
where (a) 20% of events.ts are floored to the hour — mass (user_id, ts)
ties that every sessionization / lag / rank / running-aggregate surface
must break deterministically — and (b) ~2% of embeddings duplicate the
PREVIOUS row's vector under a different vec_id, creating exact cosine
ties at top-k boundaries that only a vec_id tie-break resolves. Every
ORDER BY that forgot its full tie-break diverges cross-engine on this
fixture and is invisible on the clean testdata (which has unique
timestamps and distinct vectors).

Columns are rewritten through pyarrow so physical types are preserved.

Usage: python tools/tie_sweep.py [src_sf_dir] [out_dir]
Then:  python tools/check_oracle.py <out_dir>
"""

from __future__ import annotations

import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

HOUR_US = 3_600_000_000


def coarsen_events_ts(path: str) -> int:
    t = pq.read_table(path)
    idx = t.schema.get_field_index("ts")
    typ = t.schema.field(idx).type
    unit = typ.unit
    per_hour = {"s": 3600, "ms": 3_600_000, "us": HOUR_US,
                "ns": HOUR_US * 1000}[unit]
    vals = t.column(idx).cast(pa.int64()).to_pylist()
    n = 0
    for i in range(len(vals)):
        if vals[i] is not None and i % 5 == 0:
            vals[i] = (vals[i] // per_hour) * per_hour
            n += 1
    new = pa.array(vals, type=pa.int64()).cast(typ)
    pq.write_table(
        t.set_column(idx, t.schema.field(idx), new), path, version="2.6"
    )
    return n


def duplicate_vectors(path: str) -> int:
    t = pq.read_table(path)
    idx = t.schema.get_field_index("embedding")
    vals = t.column(idx).to_pylist()
    n = 0
    for i in range(1, len(vals)):
        if i % 50 == 1 and vals[i - 1] is not None:
            vals[i] = vals[i - 1]
            n += 1
    new = pa.array(vals, type=t.schema.field(idx).type)
    pq.write_table(
        t.set_column(idx, t.schema.field(idx), new), path, version="2.6"
    )
    return n


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sweep8_fixture"
    if os.path.exists(out):
        shutil.rmtree(out)
    os.makedirs(out)
    for f in sorted(os.listdir(src)):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(src, f), os.path.join(out, f))
    n = coarsen_events_ts(os.path.join(out, "events.parquet"))
    print(f"events.ts: {n} rows floored to the hour")
    n = duplicate_vectors(os.path.join(out, "embeddings.parquet"))
    print(f"embeddings.embedding: {n} vectors duplicated")
    print(out)


if __name__ == "__main__":
    main()
