"""Run a set of oracle gates and emit the driver-style JSON artifact
(rows_match / schema_match / hash_match / spark_rows / oracle_rows / err
per gate, plus _meta). Reuses check_correctness's comparison semantics,
including the streaming order-insensitive digest above 3M rows.

Usage: python tools/correctness_json.py <sf_dir> <out.json> [gate ...]
"""

from __future__ import annotations

import json
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_correctness import (  # noqa: E402
    STREAM_THRESHOLD,
    TABLES,
    duckdb_iter,
    frame_to_rows,
    spark_stream_digest,
    stream_digest,
)


def main() -> None:
    sf_dir, out_path = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])

    import __spark_entry__ as entry
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    import tempfile

    con.execute(
        f"PRAGMA temp_directory='{tempfile.mkdtemp(prefix='duck_spill_')}'"
    )
    # DuckDB's default memory_limit is 80% of PHYSICAL RAM, blind to the
    # 48g Spark JVM sharing the box — the big-gate oracles (10M-row asof/
    # range digests, the paragraph explode) then die with a bad-alloc
    # instead of spilling. An explicit cap makes DuckDB spill to the temp
    # dir the moment it nears the budget that is actually free.
    con.execute(
        f"SET memory_limit='{os.environ.get('DUCKDB_MEM', '40GB')}'"
    )
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(os.path.realpath(path)):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    out: dict = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        rec = {
            "rows_match": False, "schema_match": False, "hash_match": False,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        out[name] = rec
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            n_spark = sdf.count()
            rec["spark_rows"] = n_spark
            stream = n_spark > STREAM_THRESHOLD
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            if stream:
                oc, odig = stream_digest(ocols, duckdb_iter(res))
                sc, sdig = spark_stream_digest(sdf, scols)
                rec["oracle_rows"] = odig[2]
                rec["rows_match"] = sdig[2] == odig[2]
                rec["schema_match"] = sc == oc
                rec["hash_match"] = sdig == odig and sc == oc
            else:
                srows = [tuple(r) for r in sdf.collect()]
                orows = res.fetchall()
                rec["oracle_rows"] = len(orows)
                sc, sv = frame_to_rows(scols, srows)
                oc, ov = frame_to_rows(ocols, orows)
                rec["rows_match"] = len(sv) == len(ov)
                rec["schema_match"] = sc == oc
                rec["hash_match"] = sv == ov and sc == oc
        except Exception as e:  # noqa: BLE001 - recorded in the artifact
            rec["err"] = f"{type(e).__name__}: {e}"[:500]
        status = "OK " if rec["hash_match"] else "FAIL"
        print(f"{status} {name}: {rec['spark_rows']} vs {rec['oracle_rows']}"
              + (f" err={rec['err']}" if rec["err"] else ""))

    n_ok = sum(1 for r in out.values() if r["hash_match"])
    artifact = {"_meta": {"sf_dir": sf_dir, "gates": len(out), "green": n_ok}}
    artifact.update(out)
    with open(out_path, "w") as fh:
        json.dump(artifact, fh, indent=1)
    print(f"{n_ok}/{len(out)} green -> {out_path}")


if __name__ == "__main__":
    main()
