"""MERGE / upsert / SCD2 emulation without a lakehouse table format.

Delta/Iceberg's MERGE INTO needs jars not present in this image
(sources/formats.py gates the probe); these are the plain-parquet
equivalents, which are also the portable semantics definition:

- upsert (SCD type 1): updates replace matching target rows, inserts pass
  through — target.anti(updates) ∪ updates. One shuffle per side on the key.
- scd2_apply (type 2 history): every key keeps its full version history
  with [valid_from, valid_to) intervals; current rows have valid_to = NULL.
  Built from union + lead() window per key — the gaps-free interval form
  downstream as-of joins consume.

At 100 TB both run as key-partitioned joins/windows; with the target stored
bucketed on the key (write_bucketed) the upsert join is shuffle-free on the
target side, which is exactly what a lakehouse MERGE does under the hood.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parquet_to_clickhouse_schema_spark._registry import new_registry
from parquet_to_clickhouse_schema_spark.sources.io import load_table

QUERIES, ORACLES, _q = new_registry()


def upsert(target: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """SCD1 merge: rows from `updates` win on key collision; all other
    target rows survive. Columns must match."""
    assert target.columns == updates.columns, "schemas must match"
    kept = target.join(updates.select(key), on=key, how="left_anti")
    return kept.unionAll(updates)


def scd2_apply(history: DataFrame, key: str, change_ts: str) -> DataFrame:
    """Version rows -> validity intervals: each (key, change_ts) version is
    valid until the next version's timestamp (NULL for current).

    change_ts must be unique per key: equal timestamps make the lead()
    ordering ambiguous (same determinism rule as the window operators —
    include a version sequence in change_ts semantics if ties can occur)."""
    w = Window.partitionBy(key).orderBy(change_ts)
    return (
        history.withColumn("valid_from", F.col(change_ts))
        .withColumn("valid_to", F.lead(change_ts).over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
    )


@_q(
    "q_scd1_merge",
    """
    WITH upd AS (
      SELECT c_custkey, 'UPDATED' AS c_mktsegment, c_acctbal + 100.0 AS c_acctbal
      FROM customer WHERE c_custkey % 10 = 0
    ),
    tgt AS (SELECT c_custkey, c_mktsegment, c_acctbal FROM customer)
    SELECT * FROM tgt WHERE c_custkey NOT IN (SELECT c_custkey FROM upd)
    UNION ALL
    SELECT * FROM upd
    """,
)
def q_scd1_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD1 upsert gated against its relational definition (anti-join ∪
    updates). The update set is derived deterministically from the customer
    table itself (every 10th key gets a new segment and +100 balance), so
    both engines construct identical inputs. The +100.0 is a single IEEE
    double add — bit-identical across engines, no rounding needed."""
    c = load_table(spark, sf_dir, "customer")
    target = c.select("c_custkey", "c_mktsegment", "c_acctbal")
    updates = (
        c.filter(F.col("c_custkey") % 10 == 0)
        .select(
            "c_custkey",
            F.lit("UPDATED").alias("c_mktsegment"),
            (F.col("c_acctbal") + F.lit(100.0)).alias("c_acctbal"),
        )
    )
    return upsert(target, updates, "c_custkey")


@_q(
    "q_scd2_apply",
    """
    SELECT o_custkey, o_orderkey, o_orderstatus,
           lead(o_orderkey) OVER w AS valid_to,
           (lead(o_orderkey) OVER w IS NULL) AS is_current
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
    """,
)
def q_scd2_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 interval derivation over the orders table: each customer's
    orders become versioned rows valid until the next version. o_orderkey is
    the change sequence (unique per key — the determinism rule for lead()
    ordering; a timestamp column with ties would make the window ambiguous)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderstatus"
    )
    return scd2_apply(o, "o_custkey", "o_orderkey").select(
        "o_custkey", "o_orderkey", "o_orderstatus", "valid_to", "is_current"
    )


def scd2_merge(
    current_history: DataFrame, updates: DataFrame, key: str, change_ts: str
) -> DataFrame:
    """Append new versions into an SCD2 history and recompute intervals.
    `current_history` columns: key..., attributes..., change_ts (the
    valid_from/valid_to/is_current columns are derived, not stored)."""
    base_cols = [c for c in current_history.columns if c not in ("valid_from", "valid_to", "is_current")]
    merged = current_history.select(base_cols).unionAll(updates.select(base_cols))
    return scd2_apply(merged, key, change_ts)


@_q(
    "q_cdc_apply",
    """
    WITH feed AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op
      FROM events
    ),
    ranked AS (
      SELECT user_id, ts, event_id, value, op,
             count(*) OVER (PARTITION BY user_id) AS n_changes,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM feed
    )
    SELECT user_id, ts AS last_ts,
           floor(value * 1000000.0 + 0.5) / 1000000.0 AS last_value,
           CAST(n_changes AS BIGINT) AS n_changes
    FROM ranked WHERE rn = 1 AND op <> 'D'
    """,
)
def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture compaction: apply a keyed change feed (upserts +
    deletes, ordered by (ts, event_id)) to produce the final table state —
    the Debezium-feed → snapshot primitive every lakehouse ingestion runs.
    The events stream is read as a feed on a user-profile table: 'error'
    events are tombstones (DELETE), everything else upserts the row.

    Scale shape: ONE map-side-combinable aggregate — max(struct(ts,
    event_id, op, value)) per key picks the latest change and count(*)
    rides along, then tombstoned keys are filtered. No window over the
    feed (the row_number form the oracle uses funnels each key's history
    through a sort; max(struct) pre-combines within every map task, so
    the shuffle carries one candidate row per key per task). Struct
    comparison is lexicographic by field order, matching the (ts DESC,
    event_id DESC) ranking exactly."""
    ev = load_table(spark, sf_dir, "events")
    feed = ev.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
    )
    latest = feed.groupBy("user_id").agg(
        F.max(F.struct("ts", "event_id", "op", "value")).alias("last"),
        F.count("*").cast("bigint").alias("n_changes"),
    )
    from parquet_to_clickhouse_schema_spark.functions.compat import qround

    return latest.filter(F.col("last.op") != "D").select(
        "user_id",
        F.col("last.ts").alias("last_ts"),
        qround(F.col("last.value"), 6).alias("last_value"),
        "n_changes",
    )


@_q(
    "q_incremental_agg",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           floor((sum(value)) * 10000.0 + 0.5) / 10000.0 AS total_value,
           floor((avg(value)) * 10000.0 + 0.5) / 10000.0 AS avg_value
    FROM events GROUP BY event_type
    """,
)
def q_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance: the per-type stats are kept as
    MERGEABLE partials — (count, sum), never avg — so a new day's batch
    folds into the standing aggregate without rescanning history. Here the
    stream splits at Jan 21: 'history' partials and 'batch' partials are
    computed independently (in production the history side is a stored
    table), unioned, and re-reduced; the oracle is the full recompute the
    merge must equal. Deriving avg at the END from merged (sum, count) is
    the entire discipline — averaging averages would be wrong under
    unequal group sizes.

    Scale shape: each side is one map-side-combinable aggregate to
    |types| rows; the merge re-aggregates a handful of partial rows. A
    backfill never touches the fact history again."""
    from parquet_to_clickhouse_schema_spark.functions.compat import qround

    ev = load_table(spark, sf_dir, "events")
    cut = F.lit("2024-01-21").cast("timestamp")

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count("*").cast("bigint").alias("pn"),
            F.sum("value").alias("psum"),
        )

    hist = partials(ev.filter(F.col("ts") < cut))
    batch = partials(ev.filter(F.col("ts") >= cut))
    merged = (
        hist.unionByName(batch)
        .groupBy("event_type")
        .agg(F.sum("pn").alias("n"), F.sum("psum").alias("s"))
    )
    return merged.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_events"),
        qround(F.col("s"), 4).alias("total_value"),
        qround(F.col("s") / F.col("n"), 4).alias("avg_value"),
    )


SNAP_T1 = "2024-01-15 00:00:00"


@_q(
    "q_snapshot_diff",
    f"""
    WITH a AS (
      SELECT user_id, event_type, value FROM (
        SELECT user_id, event_type, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts <= TIMESTAMP '{SNAP_T1}'
      ) WHERE rn = 1
    ),
    b AS (
      SELECT user_id, event_type, value FROM (
        SELECT user_id, event_type, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
      ) WHERE rn = 1
    )
    SELECT b.user_id,
           CASE WHEN a.user_id IS NULL THEN 'added'
                WHEN a.event_type <> b.event_type OR a.value <> b.value
                THEN 'changed'
                ELSE 'unchanged' END AS change,
           a.event_type AS old_type,
           b.event_type AS new_type
    FROM b LEFT JOIN a ON a.user_id = b.user_id
    """,
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation — the DIFF GENERATOR that complements
    q_cdc_apply's applier: reconstruct each user's latest-event state at
    two cut points (mid-month vs now) and classify every current key as
    added / changed / unchanged, the table you hand an incremental
    downstream (or an auditor asking what yesterday's run changed)
    when the upstream has no change feed of its own. Keys cannot be
    'removed' under append-only ingestion, so the classification is total
    over snapshot B.

    State equality compares the STORED event_type/value (no arithmetic —
    both engines read identical parquet doubles, so <> is exact). Scale
    shape: two keep-latest windows partitioned by user (the q_cdc_apply
    reduce; the early-cut snapshot prunes its scan by timestamp) and one
    user-keyed equi-join."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )

    def snap(df: DataFrame, prefix: str) -> DataFrame:
        return (
            df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(
                "user_id",
                F.col("event_type").alias(f"{prefix}_type"),
                F.col("value").alias(f"{prefix}_value"),
            )
        )

    a = snap(ev.filter(F.col("ts") <= F.lit(SNAP_T1).cast("timestamp")), "old")
    b = snap(ev, "new")
    change = (
        F.when(F.col("old_type").isNull(), "added")
        .when(
            (F.col("old_type") != F.col("new_type"))
            | (F.col("old_value") != F.col("new_value")),
            "changed",
        )
        .otherwise("unchanged")
    )
    return b.join(a, "user_id", "left").select(
        "user_id",
        change.alias("change"),
        F.col("old_type"),
        F.col("new_type").alias("new_type"),
    )
