"""PySpark-native analytics engine with the capabilities of
ahmedriza/parquet-to-clickhouse-schema.

Core capability (the reference's whole surface, see
/root/reference/src/parquetutils.rs): infer a Parquet file's schema from
footer metadata only and emit ClickHouse ``CREATE TABLE ... MergeTree`` DDL.
Around that core, the package declares a full DataFrame/SQL operator surface
(scans, joins, aggregations, windows, set ops, scalar function families,
streaming-window semantics) plus LLM-data-pipeline operators (dedup,
similarity search, text stats, multimodal columns), every operator designed
for Spark's distributed execution at large scale.
"""

from parquet_to_clickhouse_schema_spark.ddl import (
    SchemaDriftError,
    UnsupportedTypeError,
    fragment_schemas,
    hive_partition_fields,
    incremental_drift_scan,
    infer_parquet_schema,
    schema_diff,
    schema_diff_to_clickhouse_alter,
    schema_drift_report,
    schema_to_clickhouse,
    struct_to_clickhouse_ddl,
    struct_to_spark_ddl,
    unified_parquet_schema,
)
from parquet_to_clickhouse_schema_spark.session import get_spark, tune

__all__ = [
    "get_spark",
    "tune",
    "SchemaDriftError",
    "UnsupportedTypeError",
    "fragment_schemas",
    "hive_partition_fields",
    "incremental_drift_scan",
    "infer_parquet_schema",
    "schema_diff",
    "schema_diff_to_clickhouse_alter",
    "schema_drift_report",
    "schema_to_clickhouse",
    "struct_to_clickhouse_ddl",
    "struct_to_spark_ddl",
    "unified_parquet_schema",
]
