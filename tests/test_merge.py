"""MERGE/upsert/SCD2 emulation semantics."""

from datetime import datetime

from pyspark.sql import functions as F

from parquet_to_clickhouse_schema_spark.operators.merge import (
    scd2_apply,
    scd2_merge,
    upsert,
)


def _t(s):
    return datetime.fromisoformat(s)


def test_upsert_replaces_and_inserts(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "id long, name string, v double"
    )
    updates = spark.createDataFrame(
        [(2, "b2", 25.0), (4, "d", 40.0)], "id long, name string, v double"
    )
    out = {r.id: (r.name, r.v) for r in upsert(target, updates, "id").collect()}
    assert out == {1: ("a", 10.0), 2: ("b2", 25.0), 3: ("c", 30.0), 4: ("d", 40.0)}


def test_upsert_idempotent(spark):
    target = spark.createDataFrame([(1, "a")], "id long, name string")
    updates = spark.createDataFrame([(1, "a2")], "id long, name string")
    once = upsert(target, updates, "id")
    twice = upsert(once, updates, "id")
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_scd2_intervals(spark):
    hist = spark.createDataFrame(
        [
            (1, "v1", _t("2024-01-01")),
            (1, "v2", _t("2024-02-01")),
            (1, "v3", _t("2024-03-01")),
            (2, "x1", _t("2024-01-15")),
        ],
        "id long, val string, changed timestamp",
    )
    out = scd2_apply(hist, "id", "changed")
    rows = {(r.id, r.val): (r.valid_from, r.valid_to, r.is_current) for r in out.collect()}
    assert rows[(1, "v1")] == (_t("2024-01-01"), _t("2024-02-01"), False)
    assert rows[(1, "v2")] == (_t("2024-02-01"), _t("2024-03-01"), False)
    assert rows[(1, "v3")] == (_t("2024-03-01"), None, True)
    assert rows[(2, "x1")] == (_t("2024-01-15"), None, True)


def test_scd2_merge_appends_new_version(spark):
    hist = spark.createDataFrame(
        [(1, "v1", _t("2024-01-01"))], "id long, val string, changed timestamp"
    )
    upd = spark.createDataFrame(
        [(1, "v2", _t("2024-06-01")), (2, "w1", _t("2024-06-02"))],
        "id long, val string, changed timestamp",
    )
    out = scd2_merge(hist, upd, "id", "changed")
    current = {r.id: r.val for r in out.filter(F.col("is_current")).collect()}
    assert current == {1: "v2", 2: "w1"}
    old = out.filter(~F.col("is_current")).collect()
    assert len(old) == 1 and old[0].val == "v1" and old[0].valid_to == _t("2024-06-01")
