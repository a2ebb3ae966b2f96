"""Custom stateful streaming operator via applyInPandasWithState.

The operator Spark's built-in windows can't express: per-user cumulative
spend with threshold-crossing alerts — emit one row each time a user's
running total of purchase value crosses another multiple of `step`. State is
one double per user (bounded, watermark-evictable), which is the shape that
keeps a stateful operator viable on an unbounded 100 TB/day stream: O(keys)
state, not O(events).

The batch twin (`spend_alerts_batch`) expresses the same semantics with a
window cumsum — used by tests to pin the streaming operator's output, same
pattern as the gated streaming queries.
"""

from __future__ import annotations

import math
from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from parquet_to_clickhouse_schema_spark.functions.compat import qround
from parquet_to_clickhouse_schema_spark.sources.io import load_table
from parquet_to_clickhouse_schema_spark.streaming.stream_demo import read_events_stream

OUTPUT_SCHEMA = "user_id long, alert_level long, ts timestamp, total double"
STATE_SCHEMA = "total double"


def _alerts_fn(step: float):
    def fn(
        key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (total,) = state.get if state.exists else (0.0,)
        rows = []
        # A key's micro-batch input can span several Arrow chunks; sorting
        # each chunk independently would accumulate out of event-time order.
        # Concat the whole key's input first, then one global sort.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(["ts", "event_id"])
            for ts, value in zip(pdf["ts"], pdf["value"]):
                before = int(total // step)
                total += float(value)
                after = int(total // step)
                for level in range(before + 1, after + 1):
                    # floor-quantize (matches compat.qround), not Python round()
                    # whose half-even ties would diverge from the batch twin
                    rows.append((key[0], level, ts, math.floor(total * 100 + 0.5) / 100))
        state.update((total,))
        if rows:
            yield pd.DataFrame(rows, columns=["user_id", "alert_level", "ts", "total"])

    return fn


def spend_alerts_stream(
    spark: SparkSession, sf_dir: str, step: float = 100.0
) -> DataFrame:
    """Streaming threshold-crossing alerts (purchases only)."""
    ev = read_events_stream(spark, sf_dir).filter(F.col("event_type") == "purchase")
    return (
        ev.groupBy("user_id")
        .applyInPandasWithState(
            _alerts_fn(step),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def spend_alerts_transform_with_state(
    spark: SparkSession, sf_dir: str, step: float = 100.0
) -> DataFrame:
    """The same operator on Spark 4's transformWithStateInPandas — the
    successor API to applyInPandasWithState: named state variables created
    in init() (here one ValueState per user), multiple state types
    (value/list/map), timers, and TTL, instead of one monolithic
    GroupState tuple. Requires the RocksDB state store provider, which is
    also the right provider at 100 TB: state lives off-heap/on-disk with
    changelog checkpointing, so state size is bounded by local disk, not
    executor heap. Output is identical to spend_alerts_stream /
    spend_alerts_batch (the pin test runs wherever the API's protobuf
    dependency is available; this container lacks `google.protobuf`, so
    the test import-gates — same policy as the multimodal codecs)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class SpendAlerts(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._total = handle.getValueState("total", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            total = self._total.get()[0] if self._total.exists() else 0.0
            out = []
            # same chunk-spanning fix as _alerts_fn: concat, then one sort
            chunks = [pdf for pdf in rows if len(pdf)]
            if chunks:
                pdf = pd.concat(chunks, ignore_index=True).sort_values(
                    ["ts", "event_id"]
                )
                for ts, value in zip(pdf["ts"], pdf["value"]):
                    before = int(total // step)
                    total += float(value)
                    after = int(total // step)
                    for level in range(before + 1, after + 1):
                        out.append(
                            (key[0], level, ts, math.floor(total * 100 + 0.5) / 100)
                        )
            self._total.update((total,))
            if out:
                yield pd.DataFrame(
                    out, columns=["user_id", "alert_level", "ts", "total"]
                )

        def close(self) -> None:
            pass

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    ev = read_events_stream(spark, sf_dir).filter(F.col("event_type") == "purchase")
    return ev.groupBy("user_id").transformWithStateInPandas(
        SpendAlerts(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )


def spend_alerts_batch(spark: SparkSession, sf_dir: str, step: float = 100.0) -> DataFrame:
    """Batch twin: cumulative sum per user, keep rows where the running
    total crosses a new multiple of `step` (possibly several levels in one
    event — exploded with sequence)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = ev.select(
        "user_id",
        "ts",
        F.sum("value").over(w).alias("total"),
        (F.sum("value").over(w) - F.col("value")).alias("prev_total"),
    )
    lvl_before = F.floor(F.col("prev_total") / step)
    lvl_after = F.floor(F.col("total") / step)
    return (
        run.filter(lvl_after > lvl_before)
        .select(
            "user_id",
            F.explode(F.sequence(lvl_before + 1, lvl_after)).alias("alert_level"),
            "ts",
            qround(F.col("total"), 2).alias("total"),
        )
    )
