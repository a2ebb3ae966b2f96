"""Central query registry: merges every operator module's QUERIES/ORACLES.

`queries()` / `oracle_sql()` in __spark_entry__.py are thin wrappers over
this module. Every key here is a row of SURVEY.md §2.2; a key appears in
ORACLES only when its DuckDB twin hash-matches (rows-only otherwise).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from parquet_to_clickhouse_schema_spark.functions import scalar, text
from parquet_to_clickhouse_schema_spark.operators import (
    aggregation,
    core,
    llm,
    relational,
    reports,
    sortset,
    sqlfeatures,
    training,
    udfs,
    windows,
)
from parquet_to_clickhouse_schema_spark.streaming import batch_twins

_MODULES = [
    core,
    relational,
    reports,
    aggregation,
    windows,
    sortset,
    sqlfeatures,
    scalar,
    text,
    batch_twins,
    llm,
    training,
    udfs,
]

QueryFn = Callable[[SparkSession, str], DataFrame]


def all_queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {}
    for m in _MODULES:
        overlap = set(out) & set(m.QUERIES)
        if overlap:
            raise ValueError(f"duplicate query keys: {overlap}")
        out.update(m.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        overlap = set(out) & set(m.ORACLES)
        if overlap:
            raise ValueError(f"duplicate oracle keys: {overlap}")
        out.update(m.ORACLES)
    return out
