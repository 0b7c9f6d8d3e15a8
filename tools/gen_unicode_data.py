"""Produce a unicode-adversarial copy of a test sf dir: non-ASCII text
mixed into ``documents.text`` (emoji/astral plane, CJK, RTL scripts,
combining marks, zero-width joiners, long unicode runs) so the oracle
harness can prove Spark↔DuckDB parity holds beyond ASCII — regex
classes, lower(), length (chars-vs-bytes), md5-of-utf8, substring and
split semantics all differ between engines if either one is byte-based.

Usage: python tools/gen_unicode_data.py [src_sf_dir] [dest_dir]
Then:  python tools/check_correctness.py <dest_dir>
"""

from __future__ import annotations

import glob
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

# cycled deterministically over the doc rows; each exercises a different
# unicode hazard class
SNIPPETS = [
    " café résumé naïve ñoño",                      # latin-1 accents
    " 中文测试数据 日本語のテキスト 한국어 텍스트",      # CJK
    " 🚀🔥😀🎉 𝕦𝕟𝕚𝕔𝕠𝕕𝕖 𓀀𓀁",                      # astral plane / emoji
    " עברית ערבית مرحبا بالعالم",                    # RTL scripts
    " éé å combining marks",       # combining sequences
    " zero‍width​joined",                  # ZWJ / ZWSP
    " Ω≈ç√∫˜µ≤≥÷ 𐍈𐍉𐍊",                            # symbols + Gothic
    "",                                              # unchanged control row
]


def mutate(src: str, dest: str) -> None:
    os.makedirs(dest, exist_ok=True)
    for path in sorted(glob.glob(f"{src}/*.parquet")):
        base = os.path.basename(path)
        table = pq.read_table(path)
        if base == "documents.parquet":
            i = table.schema.get_field_index("text")
            texts = table.column(i).to_pylist()
            texts = [
                (t + SNIPPETS[r % len(SNIPPETS)] * (1 + r % 3))
                if t is not None
                else None
                for r, t in enumerate(texts)
            ]
            # one pathologically long unicode run (10K astral chars)
            if texts and texts[0] is not None:
                texts[0] = texts[0] + " " + "𝕏☂🚀" * 3000
            table = table.set_column(
                i, table.schema.field(i), pa.array(texts, pa.string())
            )
        pq.write_table(table, os.path.join(dest, base))


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    dest = sys.argv[2] if len(sys.argv) > 2 else "/tmp/unicode_sf"
    mutate(src, dest)
    print(f"wrote unicode-mutated tables to {dest}")
