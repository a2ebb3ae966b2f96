"""End-to-end proof of the SparkSessionExtensions custom Catalyst rule.

Must run in a FRESH python process: spark.driver.extraClassPath and
spark.sql.extensions only take effect on the first SparkSession of a JVM.
Builds the jar (cached), starts a session with pcsext.EngineExtensions
injected, and checks on a nested-case query that:

  1. the analyzed plan still holds upper(upper(...)) / lower(lower(...)),
  2. the optimized plan holds exactly one application of each, and
  3. the rewritten query returns byte-identical rows to the
     single-application form (the rule is semantics-preserving).

Prints one JSON line: {"analyzed_upper": 2, "optimized_upper": 1, ...}.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from parquet_to_clickhouse_schema_spark.extensions import (
        EXTENSION_CLASS,
        build_extension_jar,
    )

    if SparkSession.getActiveSession() is not None:
        print("error: a SparkSession already exists; run from a fresh process", file=sys.stderr)
        return 2

    jar = build_extension_jar()
    spark = (
        SparkSession.builder.master("local[2]")
        .appName("pcs-extensions-demo")
        .config("spark.driver.extraClassPath", jar)
        .config("spark.jars", jar)
        .config("spark.sql.extensions", EXTENSION_CLASS)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "2")
        .getOrCreate()
    )
    try:
        base = spark.range(100)
        s = F.format_string("x%d", F.col("id"))
        nested = base.select(
            F.upper(F.upper(s)).alias("u"), F.lower(F.lower(s)).alias("l")
        )
        single = base.select(F.upper(s).alias("u"), F.lower(s).alias("l"))

        qe = nested._jdf.queryExecution()
        analyzed = qe.analyzed().toString()
        optimized = qe.optimizedPlan().toString()
        out = {
            "analyzed_upper": analyzed.count("upper("),
            "analyzed_lower": analyzed.count("lower("),
            "optimized_upper": optimized.count("upper("),
            "optimized_lower": optimized.count("lower("),
            "rows_equal": sorted(map(tuple, nested.collect()))
            == sorted(map(tuple, single.collect())),
        }
        ok = (
            out["analyzed_upper"] == 2
            and out["analyzed_lower"] == 2
            and out["optimized_upper"] == 1
            and out["optimized_lower"] == 1
            and out["rows_equal"]
        )
        out["ok"] = ok
        print(json.dumps(out))
        return 0 if ok else 1
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
