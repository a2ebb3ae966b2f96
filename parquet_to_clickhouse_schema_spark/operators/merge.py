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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


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


def scd2_merge(
    current_history: DataFrame, updates: DataFrame, key: str, change_ts: str
) -> DataFrame:
    """Append new versions into an SCD2 history and recompute intervals.
    `current_history` columns: key..., attributes..., change_ts (the
    valid_from/valid_to/is_current columns are derived, not stored)."""
    base_cols = [c for c in current_history.columns if c not in ("valid_from", "valid_to", "is_current")]
    merged = current_history.select(base_cols).unionAll(updates.select(base_cols))
    return scd2_apply(merged, key, change_ts)
