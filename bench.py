#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced through full execution with the noop sink
(df.write.format("noop")) — no driver-side collect, no column pruning
shortcut a count() would allow. One shared SparkSession (BASELINE.md's
dominant lever); first query pays codegen/JIT warmup, reported as-is.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from parquet_to_clickhouse_schema_spark import registry, schema_to_clickhouse
from parquet_to_clickhouse_schema_spark.session import get_spark

HEADLINE = [
    "q_agg_hash",
    "q_join_broadcast",
    "q_join_multiway",
    "q_join_sortmerge",
    "q_join_asof",
    "q_window_rank",
    "q_topk",
    "q_tumbling_window",
    "q_session_window",
    "q_dedup_exact",
    "q_text_stats",
    "q_near_dedup_minhash",
    "q_cosine_topk",
    "q_udf_pandas",
    "q_report_top_orders",
    "q_report_returned_customers",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("bench")
    queries = registry.all_queries()

    times: dict[str, float] = {}

    # the reference's core op: footer-only DDL (no Spark job expected)
    t0 = time.time()
    schema_to_clickhouse(f"{sf_dir}/lineitem.parquet", "lineitem", "l_orderkey", spark=spark)
    times["schema_to_clickhouse"] = round(time.time() - t0, 3)

    for name in HEADLINE:
        df = queries[name](spark, sf_dir)
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        times[name] = round(time.time() - t0, 3)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
