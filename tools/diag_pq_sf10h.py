"""Diagnose the pq_codes_adc hash mismatch at sf10h: materialize the
Spark result and the DuckDB oracle result, full-outer-join on
(query_id, vec_id), and report exactly which columns differ and by how
much — distinguishes float last-ulp rounding flips from semantic bugs.

Usage: python tools/diag_pq_sf10h.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "localdata/sf10h"

    import __spark_entry__ as entry
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry.queries()
    sdf = qs["pq_codes_adc"](spark, sf_dir)
    spark_out = "/tmp/diag_pq_spark.parquet"
    sdf.write.mode("overwrite").parquet(spark_out)
    print("spark side written")

    con = duckdb.connect()
    con.execute("SET memory_limit='40GB'")
    for t in ["embeddings"]:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(os.path.realpath(path)):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    con.execute(
        "CREATE TABLE oracle AS " + entry.oracle_sql()["pq_codes_adc"]
    )
    con.execute(
        f"CREATE VIEW spark AS SELECT * FROM '{spark_out}/*.parquet'"
    )
    print("oracle rows:", con.execute("SELECT count(*) FROM oracle").fetchone())
    print("spark rows:", con.execute("SELECT count(*) FROM spark").fetchone())

    diff = con.execute(
        """
        SELECT
          count(*) FILTER (s.vec_id IS NULL) AS only_oracle,
          count(*) FILTER (o.vec_id IS NULL) AS only_spark,
          count(*) FILTER (s.c0 IS DISTINCT FROM o.c0
                        OR s.c1 IS DISTINCT FROM o.c1
                        OR s.c2 IS DISTINCT FROM o.c2
                        OR s.c3 IS DISTINCT FROM o.c3) AS code_diff,
          count(*) FILTER (s.c0 = o.c0 AND s.c1 = o.c1 AND s.c2 = o.c2
                       AND s.c3 = o.c3
                       AND s.adc_r IS DISTINCT FROM o.adc_r) AS adc_only_diff,
          max(abs(s.adc_r - o.adc_r)) AS max_adc_delta
        FROM spark s FULL OUTER JOIN oracle o
          ON s.query_id = o.query_id AND s.vec_id = o.vec_id
        """
    ).fetchall()
    print("summary (only_oracle, only_spark, code_diff, adc_only_diff,"
          " max_adc_delta):", diff)

    print("\nsample code diffs:")
    for r in con.execute(
        """
        SELECT s.query_id, s.vec_id, s.c0, o.c0, s.c1, o.c1, s.c2, o.c2,
               s.c3, o.c3, s.adc_r, o.adc_r
        FROM spark s JOIN oracle o
          ON s.query_id = o.query_id AND s.vec_id = o.vec_id
        WHERE s.c0 IS DISTINCT FROM o.c0 OR s.c1 IS DISTINCT FROM o.c1
           OR s.c2 IS DISTINCT FROM o.c2 OR s.c3 IS DISTINCT FROM o.c3
        LIMIT 5
        """
    ).fetchall():
        print(" ", r)

    print("\nsample adc-only diffs:")
    for r in con.execute(
        """
        SELECT s.query_id, s.vec_id, s.adc_r, o.adc_r, s.adc_r - o.adc_r
        FROM spark s JOIN oracle o
          ON s.query_id = o.query_id AND s.vec_id = o.vec_id
        WHERE s.c0 = o.c0 AND s.c1 = o.c1 AND s.c2 = o.c2 AND s.c3 = o.c3
          AND s.adc_r IS DISTINCT FROM o.adc_r
        LIMIT 10
        """
    ).fetchall():
        print(" ", r)


if __name__ == "__main__":
    main()
