"""Unicode parity: Spark↔DuckDB oracle agreement beyond ASCII.

A 100 TB corpus is multilingual; `tools/gen_unicode_data.py` mutates the
test tables with emoji/astral-plane, CJK, RTL, combining-mark, and
zero-width content. This found 4 divergences (round 3): byte-vs-char
length proxies in the multimodal oracles, char-indexed byte access in the
winnowing polynomial oracle, and an ASCII-scoped preprocessing oracle
missing the NFC/scrub steps. All four oracles are now byte/unicode-
faithful; this module pins them at sf0.001 plus a property fuzz of the
preprocessing transcription.
"""

from __future__ import annotations

import math
import random

import duckdb
import pytest

import __spark_entry__ as entrymod
from tools.gen_unicode_data import mutate

# the gates the unicode probe originally broke (the preprocess/truncate
# surface lives inside prompt_render since the r9 cap swap)
GATES = ["prompt_render", "mm_meta_hist", "mm_frames", "winnow_pairs"]

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{v:.10g}"
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def _rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(cols), sorted(tuple(_norm(r[i]) for i in order) for r in rows)


@pytest.fixture(scope="module")
def unicode_sf_dir(tmp_path_factory, sf_dir):
    out = tmp_path_factory.mktemp("unicode_sf")
    mutate(sf_dir, str(out))
    return str(out)


@pytest.fixture(scope="module")
def oracle_con(unicode_sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{unicode_sf_dir}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", GATES)
def test_gate_oracle_parity_on_unicode(spark, unicode_sf_dir, oracle_con, name):
    sdf = entrymod.queries()[name](spark, unicode_sf_dir)
    scols, srows = _rows(sdf.columns, [tuple(r) for r in sdf.collect()])
    res = oracle_con.execute(entrymod.oracle_sql()[name])
    ocols = [d[0] for d in res.description]
    ocols, orows = _rows(ocols, res.fetchall())
    assert scols == ocols
    assert srows == orows


def test_preprocess_transcription_property_fuzz():
    """The DuckDB transcription of preprocess_text must match the Python
    chain char-for-char on random unicode (the oracle's load-bearing
    claim; Python \\w is isalnum-based — no combining marks — and Python
    \\s includes \\p{Z}, both encoded in the RE2 classes)."""
    from ondine_spark.functions.preprocessing import preprocess_text

    sql = entrymod._PREPROCESS_SQL
    con = duckdb.connect()
    rng = random.Random(13)
    samples = [
        "héllo wörld 🚀🔥 𝕦𝕟𝕚 中文 éé Ω≈ç√ zero‍width​j ®™ “q” ‘a’",
        "tab\tnew\nline\rmix  nbsp 　ideo ​‍﻿",
        "à̂ é̃ combining x́̂̃", "עברית مرحبا", "", "   ",
    ]
    for _ in range(150):
        n = rng.randint(0, 220)
        samples.append("".join(
            chr(rng.choice([
                rng.randint(32, 126), rng.randint(0xA0, 0x2FFF),
                rng.randint(0x1F300, 0x1F6FF), rng.randint(0x4E00, 0x9FFF),
                32, 32,
            ]))
            for _ in range(n)
        ))
    con.execute("CREATE TABLE documents (doc_id INT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)", list(enumerate(samples))
    )
    got = dict(con.execute(sql).fetchall())
    for i, s in enumerate(samples):
        assert got[i] == preprocess_text(s, max_length=200), repr(s)
