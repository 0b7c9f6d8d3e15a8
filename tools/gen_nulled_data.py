"""Produce a null-injected copy of a test sf dir: every 7th row of the
nullable VALUE columns (documents.text, embeddings.embedding,
events.props/value) set to NULL, including row 0 so first-row probes see
a null. Used to prove cross-engine null-semantics parity
(CORRECTNESS_nulled.json) — null grouping, ranking, and rendering are
classic divergence points between engines.

Usage: python tools/gen_nulled_data.py [src_sf_dir] [dest_dir]
Then:  python tools/check_correctness.py <dest_dir>
"""

from __future__ import annotations

import glob
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

NULL_COLS = {
    "documents.parquet": ["text"],
    "embeddings.parquet": ["embedding"],
    "events.parquet": ["props", "value"],
}


def mutate(src: str, dest: str) -> None:
    os.makedirs(dest, exist_ok=True)
    for path in sorted(glob.glob(f"{src}/*.parquet")):
        base = os.path.basename(path)
        table = pq.read_table(path)
        for col in NULL_COLS.get(base, []):
            i = table.schema.get_field_index(col)
            mask = pa.array([r % 7 == 0 for r in range(len(table))])
            nulled = pa.compute.if_else(
                mask, pa.nulls(len(table), table.column(i).type),
                table.column(i).combine_chunks(),
            )
            table = table.set_column(i, table.schema.field(i), nulled)
        pq.write_table(table, os.path.join(dest, base))


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    dest = sys.argv[2] if len(sys.argv) > 2 else "/tmp/nulled_sf"
    mutate(src, dest)
    print(f"wrote null-injected tables to {dest}")
