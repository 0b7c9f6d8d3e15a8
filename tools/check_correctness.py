"""Local replica of the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() on DuckDB over the same parquet tables,
compare row count, schema-ish (column names), and order-insensitive values.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def frame_to_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(normalize(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out)


# results larger than this compare by STREAMING order-insensitive hash
# instead of collect-and-sort: collecting 10M wide rows on both engines
# OOMs the comparison harness (a harness limit, not an engine one)
STREAM_THRESHOLD = 3_000_000


def stream_digest(cols, row_iter):
    """Order-insensitive digest: per-row md5 over the normalized tuple
    (columns sorted by name), xor-folded + summed so row order does not
    matter but multiplicity does. Constant memory at any row count."""
    import hashlib

    order = sorted(range(len(cols)), key=lambda i: cols[i])
    xor, total, n = 0, 0, 0
    for r in row_iter:
        h = hashlib.md5(
            "\x1f".join(normalize(r[i]) for i in order).encode()
        ).digest()
        v = int.from_bytes(h[:16], "big")
        xor ^= v
        total = (total + v) % (1 << 128)
        n += 1
    return sorted(cols), (xor, total, n)


def spark_stream_digest(sdf, cols):
    """stream_digest for the SPARK side, distributed: each partition
    folds its own (xor, sum, n) with the SAME normalize+md5 as the
    driver-side digest (the fold is associative/commutative, so the
    partition combine is order-free), then the driver combines. At
    100M rows the single-threaded toLocalIterator loop was the harness
    bottleneck (~20 min for the sf100h sessions gate); this is the
    identical computation 32-way parallel. Workers import THIS module
    by reference — run the tools from the repo root."""

    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def fold(rows):
        import hashlib

        from tools.check_correctness import normalize as norm

        xor = tot = n = 0
        for r in rows:
            h = hashlib.md5(
                "\x1f".join(norm(r[i]) for i in order).encode()
            ).digest()
            v = int.from_bytes(h[:16], "big")
            xor ^= v
            tot = (tot + v) % (1 << 128)
            n += 1
        yield (xor, tot, n)

    xor = tot = n = 0
    for x, t, c in sdf.rdd.mapPartitions(fold).collect():
        xor ^= x
        tot = (tot + t) % (1 << 128)
        n += c
    return sorted(cols), (xor, tot, n)


def duckdb_iter(res, batch=100_000):
    while True:
        rows = res.fetchmany(batch)
        if not rows:
            return
        yield from rows


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    # let the oracle spill instead of OOMing on the heavy sf10 queries
    # (in-memory duckdb has no temp dir by default, so it cannot spill)
    try:
        import tempfile

        con.execute(
            f"PRAGMA temp_directory='{tempfile.mkdtemp(prefix='duck_spill_')}'"
        )
    except Exception:
        pass
    import os

    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        # driver testdata = single files; generated scale dirs = Spark
        # multi-part directories — glob those for duckdb
        if os.path.isdir(os.path.realpath(path)):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            n_spark = sdf.count()
            stream = n_spark > STREAM_THRESHOLD
            if stream:
                srows = None
            else:
                srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle ({n_spark} rows)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            if stream:
                oc, odig = stream_digest(ocols, duckdb_iter(res))
            else:
                orows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: oracle error: {type(e).__name__}: {e}")
            continue
        if stream:
            try:
                sc, sdig = spark_stream_digest(sdf, scols)
            except Exception as e:
                failures.append(name)
                print(f"FAIL {name}: spark error: {type(e).__name__}: {e}")
                continue
            if sc != oc:
                failures.append(name)
                print(f"FAIL {name}: columns {sc} vs {oc}")
            elif sdig[2] != odig[2]:
                failures.append(name)
                print(f"FAIL {name}: rows {sdig[2]} vs {odig[2]}")
            elif sdig != odig:
                failures.append(name)
                print(f"FAIL {name}: value digest mismatch over {sdig[2]} rows")
            else:
                print(f"OK   {name}: {sdig[2]} rows (streamed digest)")
            continue
        sc, sv = frame_to_rows(scols, srows)
        oc, ov = frame_to_rows(ocols, orows)
        if sc != oc:
            failures.append(name)
            print(f"FAIL {name}: columns {sc} vs {oc}")
            continue
        if len(sv) != len(ov):
            failures.append(name)
            print(f"FAIL {name}: rows {len(sv)} vs {len(ov)}")
            continue
        if sv != ov:
            failures.append(name)
            diff = [(a, b) for a, b in zip(sv, ov) if a != b][:5]
            print(f"FAIL {name}: value mismatch; first diffs: {diff}")
            continue
        print(f"OK   {name}: {len(sv)} rows")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
