"""Build the "sweep 10" extreme-text fixture: a copy of an sf dir where
5% of documents.text rotates through degenerate shapes — empty string,
whitespace-only, a single character, punctuation-only (zero tokens under
the [a-z0-9]+ class), and a ~20k-char repeated-phrase giant — with
n_chars recomputed to stay consistent. Every tokenizer, shingler,
chunker, quality gate, and fingerprint must agree cross-engine on
token-less and pathologically long documents; the clean corpus never
exercises those branches.

Usage: python tools/text_sweep.py [src_sf_dir] [out_dir]
Then:  python tools/check_oracle.py <out_dir>
"""

from __future__ import annotations

import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

SHAPES = [
    "",
    "   \t\n  ",
    "x",
    "?!.,;: ?!.,;: ?!.,;:",
    ("the quick brown fox jumps over the lazy dog " * 450).strip(),
]


def corrupt_text(path: str) -> int:
    t = pq.read_table(path)
    ti = t.schema.get_field_index("text")
    ni = t.schema.get_field_index("n_chars")
    texts = t.column(ti).to_pylist()
    nchars = t.column(ni).to_pylist()
    n = 0
    for i in range(len(texts)):
        if i % 20 == 0:
            texts[i] = SHAPES[(i // 20) % len(SHAPES)]
            nchars[i] = len(texts[i])
            n += 1
    t = t.set_column(
        ti, t.schema.field(ti), pa.array(texts, type=t.schema.field(ti).type)
    )
    t = t.set_column(
        ni, t.schema.field(ni), pa.array(nchars, type=t.schema.field(ni).type)
    )
    pq.write_table(t, path, version="2.6")
    return n


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sweep10_fixture"
    if os.path.exists(out):
        shutil.rmtree(out)
    os.makedirs(out)
    for f in sorted(os.listdir(src)):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(src, f), os.path.join(out, f))
    n = corrupt_text(os.path.join(out, "documents.parquet"))
    print(f"documents.text: {n} rows degenerate")
    print(out)


if __name__ == "__main__":
    main()
