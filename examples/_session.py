"""Shared SparkSession for the examples (local mode, quiet)."""

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
# Python UDF workers are separate interpreters: they need the package on
# THEIR path too (equivalent to running with PYTHONPATH=<repo>)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

from pyspark.sql import SparkSession


def session(app: str = "ondine_spark_example") -> SparkSession:
    s = (
        SparkSession.builder.master("local[4]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    return s
