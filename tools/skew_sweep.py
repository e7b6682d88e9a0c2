"""Build the "sweep 6" extreme-key-skew fixture: a copy of an sf dir
where 90% of every fact-table foreign key collapses onto ONE hot key
(the minimum key of its dimension — so referential integrity is
preserved), 50% of documents are byte-identical copies of one document,
and a third of embeddings are copies of one vector. The production
pathology every 100 TB pipeline meets — one viral customer / SKU /
user / template document dominating the corpus.

Skew is a PERFORMANCE property, not a semantic one, so the expected
baseline is **176/176 engine-identical, zero classified divergences**.
Anything that diverges here is a real bug in one of the classes this
fixture is built to expose and the clean testdata (near-uniform keys,
distinct texts) can never show:

- salt leakage: salted aggregation must produce byte-identical results
  whether or not the salt path engages (the hot event_type engages it);
- bucketed pair-join mega-buckets: MinHash / SimHash / aHash banding and
  the df-capped shingle index must enumerate the SAME pair set as the
  oracle when one bucket holds half the corpus (250-doc exact-dup
  cluster -> the df cap engages on BOTH engines identically or not at
  all);
- giant-component convergence: connected components over the 250-node
  dup cluster must still converge and label identically;
- top-k under mass value ties: 50% identical texts mean identical
  quality scores / TF-IDF weights / fingerprints — every top-k that
  forgot a full deterministic tie-break diverges here even though
  tie_sweep's (ts, vector) collisions missed it.

Columns are rewritten through pyarrow with physical types preserved;
only FK/label columns and text/embedding payloads change — every
measure column (prices, values, discounts) is untouched, so the
magnitude fences and bounds audits are inert.

Usage: python tools/skew_sweep.py [src_sf_dir] [out_dir]
Then:  python tools/check_oracle.py <out_dir>
"""

from __future__ import annotations

import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq


def _rewrite(path: str, col: str, pick_hot, frac_mod: int) -> int:
    """Set rows where i % frac_mod != 0 to the hot value (so 1/frac_mod
    of rows keep their original key — variety survives for guards that
    need it). Returns rows rewritten."""
    t = pq.read_table(path)
    idx = t.schema.get_field_index(col)
    typ = t.schema.field(idx).type
    vals = t.column(idx).to_pylist()
    hot = pick_hot(vals)
    n = 0
    for i in range(len(vals)):
        if vals[i] is not None and i % frac_mod != 0:
            vals[i] = hot
            n += 1
    pq.write_table(
        t.set_column(idx, t.schema.field(idx), pa.array(vals, type=typ)),
        path,
        version="2.6",
    )
    return n


def _recompute_n_chars(path: str) -> None:
    """Keep the n_chars metadata column consistent with the rewritten
    texts (the intake contract the clean generator upholds)."""
    t = pq.read_table(path)
    texts = t.column("text").to_pylist()
    idx = t.schema.get_field_index("n_chars")
    typ = t.schema.field(idx).type
    new = [None if s is None else len(s) for s in texts]
    pq.write_table(
        t.set_column(idx, t.schema.field(idx), pa.array(new, type=typ)),
        path,
        version="2.6",
    )


BOILERPLATE = (
    "all rights reserved unauthorized reproduction of this document "
    "is strictly prohibited"
)


def _append_boilerplate(path: str, frac_mod: int) -> int:
    """Append one shared boilerplate sentence to rows where
    i % frac_mod != 0 — a HOT SHINGLE spanning many DISTINCT documents
    (the exact-dup cluster above makes shingles hot only via identical
    texts; this makes the df cap's own aggregation key skewed across
    otherwise-unique docs, the shape VERDICT r13 #1 called out for the
    filtered_index df path). Returns rows rewritten."""
    t = pq.read_table(path)
    idx = t.schema.get_field_index("text")
    typ = t.schema.field(idx).type
    vals = t.column(idx).to_pylist()
    n = 0
    for i in range(len(vals)):
        if vals[i] is not None and i % frac_mod != 0:
            vals[i] = vals[i] + " " + BOILERPLATE
            n += 1
    pq.write_table(
        t.set_column(idx, t.schema.field(idx), pa.array(vals, type=typ)),
        path,
        version="2.6",
    )
    return n


def _min_not_null(vals):
    return min(v for v in vals if v is not None)


def _first_not_null(vals):
    return next(v for v in vals if v is not None)


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/skew_fixture"
    if os.path.exists(out):
        shutil.rmtree(out)
    os.makedirs(out)
    for f in sorted(os.listdir(src)):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(src, f), os.path.join(out, f))

    p = lambda f: os.path.join(out, f)  # noqa: E731
    # fact-table FKs -> the minimum key of the referenced dimension
    # (guaranteed present there), 90% hot
    n = _rewrite(p("orders.parquet"), "o_custkey", _min_not_null, 10)
    print(f"orders.o_custkey: {n} rows -> hot customer")
    n = _rewrite(p("lineitem.parquet"), "l_partkey", _min_not_null, 10)
    print(f"lineitem.l_partkey: {n} rows -> hot part")
    n = _rewrite(p("lineitem.parquet"), "l_suppkey", _min_not_null, 10)
    print(f"lineitem.l_suppkey: {n} rows -> hot supplier")
    n = _rewrite(p("events.parquet"), "user_id", _min_not_null, 10)
    print(f"events.user_id: {n} rows -> hot user")
    # hot event_type engages the salted-aggregation path for real
    n = _rewrite(p("events.parquet"), "event_type", _first_not_null, 10)
    print(f"events.event_type: {n} rows -> hot type")
    # mass exact-duplicate document cluster (50%) + hot lang/source
    n = _rewrite(p("documents.parquet"), "text", _first_not_null, 2)
    print(f"documents.text: {n} rows -> copies of one document")
    # hot shingle across DISTINCT documents: 90% of docs share one
    # boilerplate sentence, so its shingles' df dwarfs max_df while the
    # docs stay unique — the df-cap aggregation itself is skewed
    n = _append_boilerplate(p("documents.parquet"), 10)
    print(f"documents.text: {n} rows -> shared boilerplate shingle")
    _recompute_n_chars(p("documents.parquet"))
    n = _rewrite(p("documents.parquet"), "lang", _first_not_null, 10)
    print(f"documents.lang: {n} rows -> hot lang")
    n = _rewrite(p("documents.parquet"), "source", _first_not_null, 10)
    print(f"documents.source: {n} rows -> hot source")
    # mega-bucket for every LSH family: a third of vectors identical
    n = _rewrite(p("embeddings.parquet"), "embedding", _first_not_null, 3)
    print(f"embeddings.embedding: {n} rows -> copies of one vector")
    print(out)


if __name__ == "__main__":
    main()
