"""Capture .explain("formatted") for every bench query into plans/<tag>/.

Usage: python tools/capture_plans.py <suffix> [sf_dir] [query ...]
  suffix: "before" or "after" (file name suffix)
  sf_dir: defaults to /root/testdata/sf0.1
  query:  optional subset; defaults to all bench queries

Writes plans/r08/<query>_<suffix>.txt. Plans are captured lazily (no
execution), so this is cheap and can run alongside other work.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    subset = set(sys.argv[3:])

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("capture_plans")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry
    import bench

    qs = dict(entry.queries())
    qs["ivfpq_topk"] = bench._q_ivfpq_topk
    qs["dsir_select"] = bench._q_dsir_select
    qs["winnow_pairs"] = bench._q_winnow("expr")
    qs["winnow_pairs_fast"] = bench._q_winnow("arrow")

    names = [n for n in bench.BENCH_QUERIES if not subset or n in subset]
    # non-bench oracle gates can be requested explicitly by name
    names += [n for n in subset if n not in names and n in qs]

    out_dir = os.path.join(REPO, "plans", os.environ.get("PLANS_TAG", "r09"))
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        try:
            plan = plan_of(qs[name](spark, sf_dir))
        except Exception as exc:  # keep going; record the failure
            plan = f"PLAN CAPTURE FAILED: {exc!r}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        n_ex = plan.count("Exchange")
        joins = [
            j for j in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
                        "BroadcastNestedLoopJoin", "CartesianProduct")
            if j in plan
        ]
        py = [
            p for p in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                        "MapInArrow", "FlatMapGroupsInPandas")
            if p in plan
        ]
        print(f"{name}: Exchange={n_ex} joins={joins} python={py}")


if __name__ == "__main__":
    main()
