"""Null-value robustness: every registered gate query must run on tables
where nullable VALUE columns contain nulls (keys/ids stay non-null).

At 100 TB null text, null embeddings, and null event payloads are
guaranteed somewhere in the corpus. Expression-path operators get null
propagation for free; this sweep exists for the Pandas/Arrow kernels and
driver-side probes (`first()`, train-on-sample), which crash on None
unless they filter it. The contract asserted here is "no crash, sane
result type" — not specific row counts, since null handling legitimately
varies per operator (drop vs propagate).
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entrymod

# value columns to null out per table (every 7th row, INCLUDING row 0 so
# first-row probes see a null); ids/keys/timestamps stay non-null
_NULL_COLS = {
    "documents.parquet": ["text"],
    "embeddings.parquet": ["embedding"],
    "events.parquet": ["props", "value"],
}


@pytest.fixture(scope="module")
def nulled_sf_dir(tmp_path_factory, sf_dir):
    out = tmp_path_factory.mktemp("nulled_sf")
    for path in sorted(glob.glob(f"{sf_dir}/*.parquet")):
        base = os.path.basename(path)
        table = pq.read_table(path)
        for col in _NULL_COLS.get(base, []):
            i = table.schema.get_field_index(col)
            mask = pa.array([r % 7 == 0 for r in range(len(table))])
            nulled = pa.compute.if_else(
                mask, pa.nulls(len(table), table.column(i).type),
                table.column(i).combine_chunks(),
            )
            table = table.set_column(i, table.schema.field(i), nulled)
        pq.write_table(table, str(out / base))
    return str(out)


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_gate_on_nulled_tables(spark, nulled_sf_dir, name):
    fn = entrymod.queries()[name]
    df = fn(spark, nulled_sf_dir)
    rows = df.collect()  # must not raise
    assert rows is not None
