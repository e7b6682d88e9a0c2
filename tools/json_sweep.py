"""Build the "sweep 9" malformed-JSON fixture: a copy of an sf dir where
~5% of events.props carry the malformation shapes a real webhook feed
produces — empty string, truncated object, non-JSON text, bare null,
NULL. Spark's ``get_json_object`` is LENIENT (malformed → NULL); DuckDB's
``json_extract_string`` ERRORS on malformed input — so any twin that
feeds raw props to the JSON extractor without a validity guard fails
LOUDLY on this fixture rather than silently diverging.

Usage: python tools/json_sweep.py [src_sf_dir] [out_dir]
Then:  python tools/check_oracle.py <out_dir>
"""

from __future__ import annotations

import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

SHAPES = [
    # malformed (the original sweep-9 shapes)
    "", '{"k": ', "not json", "null", None,
    # VALID json, wrong-TYPE k (ADVICE r11): every engine/path must
    # degrade these to NULL — the typed variant probe coerced true->1
    # and 1.5->1, and DuckDB's bare TRY_CAST rounded "1.5"->2, before
    # the string-probe + integer-literal-guard convention
    '{"k": "abc"}', '{"k": true}', '{"k": 1.5}', '{"k": [1,2]}',
    '{"k": {"x": 1}}', '{"k": null}', "{}",
]


def corrupt_props(path: str) -> int:
    t = pq.read_table(path)
    idx = t.schema.get_field_index("props")
    vals = t.column(idx).to_pylist()
    n = 0
    for i in range(len(vals)):
        if i % 20 == 0:
            vals[i] = SHAPES[(i // 20) % len(SHAPES)]
            n += 1
    new = pa.array(vals, type=t.schema.field(idx).type)
    pq.write_table(
        t.set_column(idx, t.schema.field(idx), new), path, version="2.6"
    )
    return n


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sweep9_fixture"
    if os.path.exists(out):
        shutil.rmtree(out)
    os.makedirs(out)
    for f in sorted(os.listdir(src)):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(src, f), os.path.join(out, f))
    n = corrupt_props(os.path.join(out, "events.parquet"))
    print(f"events.props: {n} rows malformed")
    print(out)


if __name__ == "__main__":
    main()
