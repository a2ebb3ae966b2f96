"""Physical-plan introspection: the assertions behind every scale claim.

Each operator docstring in this engine claims a plan property (filter pushed
to the scan, dimension broadcast, window group-limit, whole-stage codegen).
These helpers read the executed plan so tests — and users tuning at 100 TB —
can verify the claim instead of trusting it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    # Spark 4's explainString takes an ExplainMode enum, not a string
    jvm = df.sparkSession.sparkContext._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def scan_read_schema(df: DataFrame) -> str:
    """The ReadSchema the parquet scan actually requests (column pruning)."""
    plan = executed_plan(df)
    for line in plan.splitlines():
        if "ReadSchema" in line:
            return line.split("ReadSchema:", 1)[1].strip().rstrip(",")
    return ""


def pushed_filters(df: DataFrame) -> str:
    plan = executed_plan(df)
    for line in plan.splitlines():
        if "PushedFilters" in line:
            return line.split("PushedFilters:", 1)[1].split("]", 1)[0] + "]"
    return ""


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df) or "BroadcastNestedLoopJoin" in executed_plan(df)


def uses_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in executed_plan(df)

def shuffle_count(df: DataFrame) -> int:
    """Number of SHUFFLE exchanges in the plan — the metric to minimize at
    scale. BroadcastExchange is excluded: broadcasting a dimension table is
    the cheap alternative to a shuffle, not a shuffle."""
    plan = executed_plan(df)
    return sum(
        plan.count(f"Exchange {kind}")
        for kind in ("hashpartitioning", "rangepartitioning", "SinglePartition")
    )


def codegen_stage_count(df: DataFrame) -> int:
    """Whole-stage-codegen spans, shown as `*(n)` node prefixes in the final
    plan. Under AQE the final plan only materializes after an action ON THIS
    DataFrame's own queryExecution (df.collect() — note df.count() builds a
    separate plan and does NOT finalize this one)."""
    plan = executed_plan(df)
    return max(plan.count("WholeStageCodegen"), plan.count("*("))


def explain_query(name: str, spark=None, sf_dir: str = "/root/testdata/sf0.001") -> str:
    """Formatted physical plan for any registered query key — the
    introspection entry point (`python -c "from
    parquet_to_clickhouse_schema_spark.plans.inspect import explain_query;
    print(explain_query('q_agg_hash'))"`). Builds the plan only; nothing
    executes."""
    from parquet_to_clickhouse_schema_spark import registry
    from parquet_to_clickhouse_schema_spark.session import get_spark

    spark = spark or get_spark("explain")
    return formatted_plan(registry.all_queries()[name](spark, sf_dir))
