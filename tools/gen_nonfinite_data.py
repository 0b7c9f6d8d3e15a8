"""Produce a non-finite-injected copy of a test sf dir: NaN/Inf
components planted in embeddings (every 11th row gets a NaN component,
every 13th an Inf; row 0 all-NaN) and NaN into events.value (every
17th). Used to prove cross-engine parity of the engine's non-finite
quarantine (CORRECTNESS_nonfinite.json): Spark orders NaN above every
number while engines differ on NaN grouping/ranking, so unfiltered NaN
is a classic divergence generator.

Usage: python tools/gen_nonfinite_data.py [src_sf_dir] [dest_dir]
Then:  python tools/check_correctness.py <dest_dir>
"""

from __future__ import annotations

import glob
import math
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

NAN, INF = float("nan"), float("inf")


def mutate(src: str, dest: str) -> None:
    os.makedirs(dest, exist_ok=True)
    for path in sorted(glob.glob(f"{src}/*.parquet")):
        base = os.path.basename(path)
        table = pq.read_table(path)
        if base == "embeddings.parquet":
            i = table.schema.get_field_index("embedding")
            vecs = table.column(i).to_pylist()
            for r, v in enumerate(vecs):
                if v is None:
                    continue
                if r == 0:
                    vecs[r] = [NAN] * len(v)
                elif r % 11 == 0:
                    vecs[r] = [NAN] + list(v[1:])
                elif r % 13 == 0:
                    vecs[r] = [INF] + list(v[1:])
            table = table.set_column(
                i, table.schema.field(i),
                pa.array(vecs, table.column(i).type),
            )
        if base == "events.parquet":
            i = table.schema.get_field_index("value")
            vals = table.column(i).to_pylist()
            vals = [
                NAN if (r % 17 == 0 and v is not None) else v
                for r, v in enumerate(vals)
            ]
            table = table.set_column(
                i, table.schema.field(i), pa.array(vals, pa.float64())
            )
        pq.write_table(table, os.path.join(dest, base))


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    dest = sys.argv[2] if len(sys.argv) > 2 else "/tmp/nonfinite_sf"
    mutate(src, dest)
    print(f"wrote non-finite-injected tables to {dest}")
