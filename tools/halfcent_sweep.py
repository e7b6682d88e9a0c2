"""Build the "sweep 8b" half-boundary fixture: a copy of an sf dir where
~1% of every money/rate/value column sits exactly ON the decimal
half-boundary in its shortest repr while being OFF the cent/percent
grid — 8.165, 1.005, x.165, 0.045-class values. The sharpest corner of
cross-engine rounding: Spark's round(v, s) quantizes HALF_UP on the
shortest decimal REPR (8.165 -> 8.17) while DuckDB's round() follows
the BINARY value (8.165 -> 8.16), so any surface that pre-rounds a raw
input at fixed scale silently splits engines on exactly these inputs —
invisible on clean testdata, where every money value is cent-quantized
and round() is the identity.

What the round-13 probe established (and this sweep regression-pins):

- the EXACT integer paths are immune by construction: round(v * 100)
  rounds the PRODUCT (816.4999999999999), whose binary value and repr
  agree on the downhill side — both engines emit 816;
- both engines' double->DECIMAL(38,2) casts are repr-faithful and
  AGREE (8.165 -> 8.17) — the portable boundary-exact rendering form,
  now used by table_profile (pre-round dropped on both sides);
- multi-row aggregates wash the boundary out (a sum containing 8.165
  almost never lands on a repr half-boundary itself).

Expected baseline: **176/176 PASS, zero divergences** — any failure
here is a surface still pre-rounding a raw per-row double at fixed
scale (the table_profile class) and must get the direct-cast form.
The planted rows are off the x100 grid, so ``input_bounds_audit``'s
``n_offgrid`` counters (ADVICE r12) must read EXACTLY the planted
counts printed below — the fence and the failure mode this sweep
exercises are the same contract.

Usage: python tools/halfcent_sweep.py [src_sf_dir] [out_dir]
Then:  python tools/check_oracle.py <out_dir>
"""

from __future__ import annotations

import math
import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq


def _plant(path: str, col: str, every: int, make) -> int:
    """Rewrite every ``every``-th non-null row's value via ``make(v, i)``.
    Returns rows planted."""
    t = pq.read_table(path)
    idx = t.schema.get_field_index(col)
    typ = t.schema.field(idx).type
    vals = t.column(idx).to_pylist()
    n = 0
    for i in range(len(vals)):
        if vals[i] is not None and i % every == 0:
            vals[i] = make(vals[i], i)
            n += 1
    pq.write_table(
        t.set_column(idx, t.schema.field(idx), pa.array(vals, type=typ)),
        path,
        version="2.6",
    )
    return n


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/halfcent_fixture"
    if os.path.exists(out):
        shutil.rmtree(out)
    os.makedirs(out)
    for f in sorted(os.listdir(src)):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(src, f), os.path.join(out, f))
    p = lambda f: os.path.join(out, f)  # noqa: E731

    # money columns: integer dollars + .165 / .005 half-boundary cents
    # (off the cent grid; round(v*100) products land identically on both
    # engines, but any raw round(v, 2) splits)
    money = lambda v, i: math.floor(abs(v)) + (0.165 if i % 2 else 0.005)  # noqa: E731
    n = _plant(p("orders.parquet"), "o_totalprice", 100, money)
    print(f"orders.o_totalprice: {n} rows -> x.165/x.005")
    n = _plant(p("lineitem.parquet"), "l_extendedprice", 100, money)
    print(f"lineitem.l_extendedprice: {n} rows -> x.165/x.005")
    n = _plant(p("events.parquet"), "value", 100, money)
    print(f"events.value: {n} rows -> x.165/x.005")
    # rate columns: percent half-boundaries off the integer-percent grid
    n = _plant(p("lineitem.parquet"), "l_discount", 200,
               lambda v, i: 0.045 if i % 400 else 0.125)
    print(f"lineitem.l_discount: {n} rows -> 0.045/0.125")
    n = _plant(p("lineitem.parquet"), "l_tax", 200,
               lambda v, i: 0.015 if i % 400 else 0.375)
    print(f"lineitem.l_tax: {n} rows -> 0.015/0.375")
    # balances: one boundary value per dimension table
    n = _plant(p("customer.parquet"), "c_acctbal", 75, lambda v, i: 8.165)
    print(f"customer.c_acctbal: {n} rows -> 8.165")
    n = _plant(p("supplier.parquet"), "s_acctbal", 7, lambda v, i: 1.005)
    print(f"supplier.s_acctbal: {n} rows -> 1.005")
    print(out)


if __name__ == "__main__":
    main()
