"""Empty-input robustness: every registered gate query must run on
ZERO-row tables without crashing and return an empty (or well-defined
constant-row) result.

At 100 TB empty inputs are not an edge case — they are every run's
reality somewhere: an empty date partition, a filter that matches
nothing, a resume where everything is already cached. Operators that
`.take(1)`/train-on-sample/divide-by-count on the driver are exactly the
ones that crash there, so this sweep drives the full gate registry over
a schema-identical zero-row copy of the test tables.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entrymod

# Gates whose result is legitimately non-empty on empty input: a
# per-column/constant row independent of the data (still asserted
# below to be WELL-DEFINED zeros, not nulls or a crash).
_CONST_ROW_OK = {"profile_docs"}


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory, sf_dir):
    """Schema-identical zero-row copy of every test table."""
    out = tmp_path_factory.mktemp("empty_sf")
    for path in sorted(glob.glob(f"{sf_dir}/*.parquet")):
        schema = pq.read_schema(path)
        pq.write_table(schema.empty_table(), str(out / os.path.basename(path)))
    return str(out)


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_gate_on_empty_tables(spark, empty_sf_dir, name):
    fn = entrymod.queries()[name]
    df = fn(spark, empty_sf_dir)
    rows = df.collect()
    if name not in _CONST_ROW_OK:
        assert rows == [], (
            f"{name}: expected empty result on empty input, got {len(rows)} rows"
        )
    elif name == "profile_docs":
        # a profile of an empty table: one row per column, all-zero counts
        assert rows, "profile of an empty table should still list columns"
        for r in rows:
            d = r.asDict()
            assert d["n_rows"] == 0 and d["n_nulls"] == 0 and d["n_distinct"] == 0
