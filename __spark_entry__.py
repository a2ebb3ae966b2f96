"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``parquet_to_clickhouse_schema_spark/`` (see
SURVEY.md §2.2 for the operator inventory; registry.py merges the
per-module query/oracle tables).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from parquet_to_clickhouse_schema_spark import registry  # noqa: E402
from parquet_to_clickhouse_schema_spark.operators.relational import (  # noqa: E402
    q_join_multiway,
)
from parquet_to_clickhouse_schema_spark.session import tune  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is the 5-way star join + revenue rollup
    (q_join_multiway): broadcast dimensions, single fact shuffle,
    map-side partial aggregation — the plan shape this engine is built
    around.
    """
    tune(spark)
    return q_join_multiway(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every hash-gated query (rows-only keys omitted)."""
    return registry.all_oracles()
