#!/usr/bin/env python
"""Dump `explain("formatted")` for named queries to plans/<tag>/<key>_<suffix>.txt.

Optimization-round evidence: the judge reads these files instead of running
Spark, so every before/after plan claim in OPTIMIZATION_r*.md must have a
matching file here.

Usage: python scripts/dump_plans.py --tag r18 --suffix before [q_key ...]
With no keys, dumps bench.py's HEADLINE set plus schema_to_clickhouse's
(empty) plan note.

r19 (VERDICT r18 #4): queries that localCheckpoint intermediates explain to
opaque `Scan ExistingRDD` nodes, hiding the lineage the optimization claims
are about. When `--subplans` is given, every localCheckpoint call made while
constructing a query ALSO records the checkpointed frame's pre-truncation
formatted plan, and the script writes them to `<key>_<suffix>_subplans.txt`
(checkpoint order, eager flag noted). Execution is untouched — the original
localCheckpoint still runs, so the dumped main plan matches production.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame

from parquet_to_clickhouse_schema_spark import registry
from parquet_to_clickhouse_schema_spark.session import get_spark


def _explain(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    tag, suffix = "r18", "before"
    subplans = False
    keys: list[str] = []
    args = iter(sys.argv[1:])
    for a in args:
        if a == "--tag":
            tag = next(args)
        elif a == "--suffix":
            suffix = next(args)
        elif a == "--subplans":
            subplans = True
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

    captured: list[tuple[bool, str]] = []
    if subplans:
        # patch the CONCRETE class: in Spark 4 pyspark.sql.DataFrame is the
        # abstract parent and classic sessions instantiate
        # pyspark.sql.classic.dataframe.DataFrame, which overrides
        # localCheckpoint — patching the parent would never intercept
        try:
            from pyspark.sql.classic.dataframe import DataFrame as _CDF
        except ImportError:  # older Spark: one concrete class
            _CDF = DataFrame
        orig_ckpt = _CDF.localCheckpoint

        def capturing_ckpt(self, eager: bool = True):
            captured.append((eager, _explain(self)))
            return orig_ckpt(self, eager)

        _CDF.localCheckpoint = capturing_ckpt

    for key in keys:
        captured.clear()
        df = queries[key](spark, sf_dir)
        plan = _explain(df)
        path = os.path.join(outdir, f"{key}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
        if subplans and captured:
            sp_path = os.path.join(outdir, f"{key}_{suffix}_subplans.txt")
            with open(sp_path, "w") as fh:
                fh.write(
                    f"Pre-checkpoint subplans for {key} ({len(captured)} "
                    "localCheckpoint calls during query construction, in "
                    "call order). Each block is the checkpointed frame's "
                    "plan BEFORE lineage truncation; the main plan file "
                    "shows what executes above the checkpoints.\n"
                )
                for i, (eager, sp) in enumerate(captured):
                    fh.write(
                        f"\n{'=' * 70}\n== localCheckpoint #{i + 1} "
                        f"(eager={eager})\n{'=' * 70}\n{sp}\n"
                    )
            print(f"wrote {sp_path} ({len(captured)} subplans)")


if __name__ == "__main__":
    main()
