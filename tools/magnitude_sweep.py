"""Rebuild the round-10 "sweep 7" hostile-magnitude fixture: a copy of
an sf dir with ~2% of the money/metric columns (events.value,
orders.o_totalprice, lineitem.l_extendedprice, customer.c_acctbal)
replaced by ±1e15-scale outliers — the corrupt-ingest shape that pushes
double-rounding and double-sum association order across the engines'
float boundary. Columns are rewritten through pyarrow so PHYSICAL types
are preserved (the round-10 lesson: a pandas-built fixture silently
turned BIGINT keys into DOUBLE and produced pure dtype-artifact
failures).

Usage: python tools/magnitude_sweep.py [src_sf_dir] [out_dir]
Then:  python tools/check_oracle.py <out_dir>        # the actual sweep

Outlier rule (deterministic, no RNG): non-null row i of a targeted
column is replaced when i % 50 == 0, with +9.99e15 when i % 100 == 0
else -9.99e15 (~2% of rows, both signs).
"""

from __future__ import annotations

import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

TARGETS = {
    "events": "value",
    "orders": "o_totalprice",
    "lineitem": "l_extendedprice",
    "customer": "c_acctbal",
}


def corrupt_column(path: str, col: str) -> int:
    t = pq.read_table(path)
    idx = t.schema.get_field_index(col)
    vals = t.column(idx).to_pylist()
    n = 0
    for i in range(len(vals)):
        if vals[i] is not None and i % 50 == 0:
            vals[i] = 9.99e15 if i % 100 == 0 else -9.99e15
            n += 1
    new = pa.array(vals, type=t.schema.field(idx).type)
    t = t.set_column(idx, t.schema.field(idx), new)
    # version 2.6 keeps TIMESTAMP(NANOS) columns nanos (events.ts)
    pq.write_table(t, path, version="2.6")
    return n


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sweep7_fixture"
    if os.path.exists(out):
        shutil.rmtree(out)
    os.makedirs(out)
    for f in sorted(os.listdir(src)):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(src, f), os.path.join(out, f))
    for table, col in sorted(TARGETS.items()):
        n = corrupt_column(os.path.join(out, f"{table}.parquet"), col)
        print(f"{table}.{col}: {n} outliers planted")
    print(out)


if __name__ == "__main__":
    main()
