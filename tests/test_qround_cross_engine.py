"""Cross-engine determinism evidence for qround: Spark and DuckDB must
produce BIT-IDENTICAL doubles for the floor-quantize on adversarial values
(exact-half decimals, float noise, negatives) — the property every
oracle-gated float column relies on."""

import struct

import duckdb
from pyspark.sql import functions as F

from parquet_to_clickhouse_schema_spark.functions.compat import qround, sql_qround


def _bits(x):
    return None if x is None else struct.pack("<d", x)


def test_qround_bit_identical_spark_vs_duckdb(spark):
    # adversarial: exact-half money values, accumulated-noise shapes,
    # negatives, tiny and large magnitudes + a seeded pseudo-random sweep
    values = [
        49574.425, 49574.435, 0.005, -0.005, 2.675, -2.675, 1.0 / 3.0,
        123456789.985, -123456789.985, 1e-9, -1e-9, 0.0,
    ]
    seed = 123456789
    for _ in range(500):
        seed = (1103515245 * seed + 12345) % (2**31)
        values.append((seed / 2**31) * 2e5 - 1e5)

    df = spark.createDataFrame([(v,) for v in values], "x double")
    got_spark = [
        r.q2 for r in df.select(qround(F.col("x"), 2).alias("q2")).collect()
    ]

    con = duckdb.connect()
    con.execute("CREATE TABLE t(x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in values])
    got_duck = [r[0] for r in con.execute(f"SELECT {sql_qround('x', 2)} FROM t").fetchall()]

    assert [_bits(a) for a in got_spark] == [_bits(b) for b in got_duck]


def test_builtin_round_actually_diverges(spark):
    """Documents WHY qround exists: Spark round() and DuckDB round()
    disagree on at least one exact-half value in this set."""
    values = [49574.425, 2.675, 0.005, 1.005, 2.5, 1234.565]
    df = spark.createDataFrame([(v,) for v in values], "x double")
    got_spark = [r.r for r in df.select(F.round("x", 2).alias("r")).collect()]
    con = duckdb.connect()
    got_duck = [
        con.execute("SELECT round(?::DOUBLE, 2)", [v]).fetchone()[0] for v in values
    ]
    assert got_spark != got_duck  # the divergence qround is designed around
