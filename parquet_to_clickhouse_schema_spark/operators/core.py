"""Core queries: the reference's own capability exposed as `queries()` keys.

q_schema_infer — Parquet footer → one row per leaf field (the reference's
schema walk, src/parquetutils.rs:26-39, surfaced as data).
q_ddl_clickhouse — the DDL generator run over every testdata table.
q_ddl_sparksql — the same walk emitting Spark SQL DDL.

All three are rows-only checks (string/metadata artifacts; byte-fidelity is
unit-tested against the reference golden in tests/test_ddl.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from parquet_to_clickhouse_schema_spark.ddl import (
    infer_parquet_schema,
    struct_to_clickhouse_ddl,
    struct_to_spark_ddl,
)
from parquet_to_clickhouse_schema_spark.sources.io import TABLES

# Primary keys used for the DDL demos (first column of each table).
_PKS = {
    "region": "r_regionkey",
    "nation": "n_nationkey",
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "lineitem": "l_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}

_LEAF_SCHEMA = T.StructType(
    [
        T.StructField("table_name", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("spark_type", T.StringType(), False),
        T.StructField("nullable", T.BooleanType(), False),
    ]
)


def _leaves(prefix: str, dtype: T.DataType, nullable: bool):
    """Flatten a (possibly nested) type into leaf rows, dotted-path style."""
    if isinstance(dtype, T.StructType):
        for f in dtype.fields:
            yield from _leaves(f"{prefix}.{f.name}", f.dataType, f.nullable)
    elif isinstance(dtype, T.ArrayType):
        yield from _leaves(f"{prefix}.element", dtype.elementType, dtype.containsNull)
    elif isinstance(dtype, T.MapType):
        yield from _leaves(f"{prefix}.key", dtype.keyType, False)
        yield from _leaves(f"{prefix}.value", dtype.valueType, dtype.valueContainsNull)
    else:
        yield (prefix, dtype.simpleString(), nullable)


def q_schema_infer(spark: SparkSession, sf_dir: str) -> DataFrame:
    rows = []
    for t in TABLES:
        schema = infer_parquet_schema(f"{sf_dir}/{t}.parquet", spark)
        for f in schema.fields:
            for path, st, nl in _leaves(f.name, f.dataType, f.nullable):
                rows.append((t, path, st, bool(nl)))
    return spark.createDataFrame(rows, _LEAF_SCHEMA)


_DDL_SCHEMA = T.StructType(
    [
        T.StructField("table_name", T.StringType(), False),
        T.StructField("ddl", T.StringType(), False),
    ]
)


def q_ddl_clickhouse(spark: SparkSession, sf_dir: str) -> DataFrame:
    rows = [
        (
            t,
            struct_to_clickhouse_ddl(
                infer_parquet_schema(f"{sf_dir}/{t}.parquet", spark), t, _PKS[t]
            ),
        )
        for t in TABLES
    ]
    return spark.createDataFrame(rows, _DDL_SCHEMA)


def q_ddl_sparksql(spark: SparkSession, sf_dir: str) -> DataFrame:
    rows = [
        (
            t,
            struct_to_spark_ddl(
                infer_parquet_schema(f"{sf_dir}/{t}.parquet", spark),
                t,
                location=f"{sf_dir}/{t}.parquet",
            ),
        )
        for t in TABLES
    ]
    return spark.createDataFrame(rows, _DDL_SCHEMA)


QUERIES = {
    "q_schema_infer": q_schema_infer,
    "q_ddl_clickhouse": q_ddl_clickhouse,
    "q_ddl_sparksql": q_ddl_sparksql,
}

# q_schema_infer IS oracle-checkable: DuckDB's DESCRIBE over the same
# pre-registered views, reshaped to (table_name, path, spark_type, nullable)
# with the DuckDB→Spark type-name map inlined (list columns become the
# `.element` leaf, matching the Spark-side _leaves walk). The two DDL keys
# stay rows-only: their output is an engine-specific DDL string, byte-fidelity
# golden-tested against the reference in tests/test_ddl.py instead.
_SCHEMA_INFER_ORACLE = (
    "WITH raw AS (\n"
    + "\n  UNION ALL ".join(
        f"SELECT '{t}' AS table_name, column_name, column_type, \"null\" AS nl "
        f"FROM (DESCRIBE {t})"
        for t in TABLES
    )
    + """
)
SELECT table_name,
       CASE WHEN column_type LIKE '%[]' THEN column_name || '.element'
            ELSE column_name END AS path,
       CASE replace(column_type, '[]', '')
            WHEN 'BIGINT' THEN 'bigint' WHEN 'INTEGER' THEN 'int'
            WHEN 'DOUBLE' THEN 'double' WHEN 'VARCHAR' THEN 'string'
            WHEN 'TIMESTAMP' THEN 'timestamp' WHEN 'FLOAT' THEN 'float'
            ELSE lower(replace(column_type, '[]', '')) END AS spark_type,
       CAST(nl = 'YES' AS BOOLEAN) AS nullable
FROM raw
"""
)

ORACLES: dict[str, str] = {"q_schema_infer": _SCHEMA_INFER_ORACLE}
