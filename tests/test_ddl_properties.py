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


# --- r14: hive partition-value typing (Spark PartitioningUtils parity) ---

_part_values = st.one_of(
    st.integers(-(2**70), 2**70).map(str),
    st.floats(allow_nan=False, allow_infinity=False).map(repr),
    st.dates().map(str),
    st.text(min_size=0, max_size=20),
    st.sampled_from(["NaN", "Infinity", "-Infinity", "2024-1-1", "2024-13-01",
                     "2024-01-01 00:00:00", "2024-01-01T23:59:59.123456", ""]),
)


@settings(max_examples=300, deadline=None)
@given(raw=_part_values)
def test_partition_value_type_total_and_consistent(raw):
    """Inference is total (never raises), deterministic, and honors the
    headline invariants: int32-range integers are IntegerType, valid
    ISO-dates are DateType, values failing the strict zero-padded
    round-trip shape are NEVER DateType/TimestampType."""
    import re

    from parquet_to_clickhouse_schema_spark.ddl import _partition_value_type

    t1 = _partition_value_type(raw)
    t2 = _partition_value_type(raw)
    assert t1 == t2
    assert isinstance(t1, T.DataType)
    if re.fullmatch(r"[+-]?\d+", raw):
        v = int(raw)
        if -(2**31) <= v < 2**31:
            assert t1 == T.IntegerType()
        elif -(2**63) <= v < 2**63:
            assert t1 == T.LongType()
        else:
            # past int64: decimal up to 38 digits, then Spark's chain
            # falls through to parseDouble — DOUBLE beyond that
            assert isinstance(t1, (T.DecimalType, T.DoubleType))
    if isinstance(t1, T.DateType):
        assert re.fullmatch(r"\d{4}-\d{2}-\d{2}", raw)
    if isinstance(t1, T.TimestampType):
        assert re.fullmatch(
            r"\d{4}-\d{2}-\d{2}[ T]\d{2}:\d{2}:\d{2}(\.\d{1,6})?", raw
        )


_part_types = st.sampled_from(
    [
        T.IntegerType(),
        T.LongType(),
        T.DecimalType(20, 0),  # DecimalType.forType(Long) — the r15 edge
        T.DecimalType(26, 0),
        T.DoubleType(),
        T.DateType(),
        T.TimestampType(),
        T.StringType(),
    ]
)


@settings(max_examples=200, deadline=None)
@given(t1=_part_types, t2=_part_types, t3=_part_types)
def test_widen_partition_types_lattice(t1, t2, t3):
    """Widening is commutative, idempotent, and never loses to a narrower
    type: the result must absorb both inputs under a second widen (the
    property that makes multi-directory reduction order-independent,
    combined with associativity up to the string top element)."""
    from parquet_to_clickhouse_schema_spark.ddl import _widen_partition_types as w

    assert w(t1, t2) == w(t2, t1)  # commutative
    assert w(t1, t1) == t1  # idempotent
    r = w(t1, t2)
    # absorbing: widening the result with either input is a no-op
    assert w(r, t1) == r
    assert w(r, t2) == r
    # SPARK-26188 pin: double x LONG/DECIMAL (the lossy pairs) is STRING;
    # double x INT widens losslessly to DOUBLE (probed against Spark's
    # reader: x=1/ + x=1.5/ → DoubleType)
    if isinstance(t1, T.DoubleType) and isinstance(t2, (T.LongType, T.DecimalType)):
        assert r == T.StringType()
    if isinstance(t1, T.DoubleType) and isinstance(t2, T.IntegerType):
        assert r == T.DoubleType()
    # associativity on the sampled lattice
    assert w(w(t1, t2), t3) == w(t1, w(t2, t3))
