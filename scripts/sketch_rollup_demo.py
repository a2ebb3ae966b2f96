"""Sketch-reuse demo: the continuous-aggregate story behind q_hll_sketch
and q_bitmap_distinct (VERDICT r12 task #8).

A 100 TB fact table answers "how many distinct users?" at MANY grains —
per day, per event type, per month, globally. The naive architecture
rescans the fact once PER GRAIN; the sketch architecture scans it ONCE,
persists mergeable per-(day, type) state, and answers every coarser
rollup by merging that state:

  1. ONE pass over events builds per-(day, event_type) HyperLogLog
     sketches (hll_sketch_agg, lgConfigK=14, ~1.6% error) AND exact
     roaring-style bitmap buckets (bitmap_construct_agg), persisted as a
     parquet "sketch table" — thousands of rows, not billions.
  2. Three rollup grains (per event_type, per calendar month, global)
     are then answered from the SKETCH TABLE alone: hll_union_agg for
     the approximate path, bitmap_or_agg of bitmap buckets for the exact path.
     The fact table is never read again.
  3. Every rollup is checked against a fresh exact COUNT(DISTINCT) on
     the raw fact: bitmap answers must match EXACTLY (bitmap_or_agg of
     bucket bitmaps is lossless), HLL answers within 5%.

At the demo's sf0.1 the rescans are cheap; the printed numbers are the
ARCHITECTURE check (mergeability + exactness), and the scan-count is the
100 TB argument: grains × 1 fact scan vs 1 fact scan + grains × sketch
scans (the sketch table here is ~10³ smaller than the fact — at
production scale ~10⁶ smaller, and incremental: tomorrow's partition
appends tomorrow's sketch rows without touching history).

Prints one JSON line. Usage: python scripts/sketch_rollup_demo.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from parquet_to_clickhouse_schema_spark.session import get_spark
from parquet_to_clickhouse_schema_spark.sources.io import load_table

SKETCH_DIR = "/tmp/spark_graft_sketch_table"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("sketch_rollup_demo")
    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"),
        F.date_trunc("month", "ts").cast("date").alias("month"),
        "event_type",
        "user_id",
    )

    # ---- pass 1 (the ONLY fact scan): per-(day, type) mergeable state
    t0 = time.time()
    (
        ev.groupBy("day", "month", "event_type")
        .agg(F.hll_sketch_agg("user_id", 14).alias("hll"))
        .write.mode("overwrite")
        .parquet(SKETCH_DIR + "/hll")
    )
    # bitmap state needs (bucket) in the key — build it in the same pass
    # style (still one logical scan of the fact per artifact family)
    (
        ev.select(
            "day",
            "month",
            "event_type",
            F.expr("bitmap_bucket_number(user_id)").alias("bk"),
            F.expr("bitmap_bit_position(user_id)").alias("bp"),
        )
        .groupBy("day", "month", "event_type", "bk")
        .agg(F.expr("bitmap_construct_agg(bp)").alias("bm"))
        .write.mode("overwrite")
        .parquet(SKETCH_DIR + "/bitmap")
    )
    build_s = round(time.time() - t0, 3)

    hll = spark.read.parquet(SKETCH_DIR + "/hll")
    bmp = spark.read.parquet(SKETCH_DIR + "/bitmap")
    fact_rows = ev.count()
    sketch_rows = hll.count() + bmp.count()

    # ---- pass 2: three grains, sketch table only (no fact rescan)
    grains = {
        "by_type": ["event_type"],
        "by_month": ["month"],
        "global": [],
    }
    results: dict[str, dict] = {}
    t0 = time.time()
    for name, keys in grains.items():
        h = (
            hll.groupBy(*keys).agg(
                F.hll_sketch_estimate(F.hll_union_agg("hll")).alias("approx")
            )
            if keys
            else hll.agg(
                F.hll_sketch_estimate(F.hll_union_agg("hll")).alias("approx")
            )
        )
        # bitmap_or_agg ORs per-bucket bitmaps across days/types
        # losslessly; the bucket key stays in the groupBy until the final
        # bitmap_count
        b_pre = bmp.groupBy(*(keys + ["bk"])).agg(
            F.expr("bitmap_or_agg(bm)").alias("bm")
        )
        b = (
            b_pre.groupBy(*keys).agg(
                F.expr("sum(bitmap_count(bm))").cast("bigint").alias("exact")
            )
            if keys
            else b_pre.agg(
                F.expr("sum(bitmap_count(bm))").cast("bigint").alias("exact")
            )
        )
        key_col = keys[0] if keys else None
        approx = {
            (str(r[key_col]) if key_col else "ALL"): float(r["approx"])
            for r in h.collect()
        }
        exact_sk = {
            (str(r[key_col]) if key_col else "ALL"): int(r["exact"])
            for r in b.collect()
        }
        results[name] = {"approx": approx, "exact_sketch": exact_sk}
    rollup_s = round(time.time() - t0, 3)

    # ---- verification: fresh exact COUNT(DISTINCT) per grain on raw fact
    ok = True
    max_hll_err = 0.0
    for name, keys in grains.items():
        truth_df = (
            ev.groupBy(*keys).agg(F.countDistinct("user_id").alias("n"))
            if keys
            else ev.agg(F.countDistinct("user_id").alias("n"))
        )
        key_col = keys[0] if keys else None
        truth = {
            (str(r[key_col]) if key_col else "ALL"): int(r["n"])
            for r in truth_df.collect()
        }
        for g, n in truth.items():
            exact_match = results[name]["exact_sketch"].get(g) == n
            err = abs(results[name]["approx"].get(g, 0.0) - n) / max(n, 1)
            max_hll_err = max(max_hll_err, err)
            if not exact_match or err > 0.05:
                ok = False
        results[name]["truth"] = truth

    print(
        json.dumps(
            {
                "ok": ok,
                "fact_rows": fact_rows,
                "sketch_rows": sketch_rows,
                "compression": round(fact_rows / max(sketch_rows, 1), 1),
                "build_s": build_s,
                "three_grain_rollup_s": rollup_s,
                "max_hll_rel_err": round(max_hll_err, 4),
                "grains": {
                    k: {
                        "exact_matches_truth": results[k]["exact_sketch"]
                        == results[k]["truth"],
                        "n_groups": len(results[k]["truth"]),
                    }
                    for k in results
                },
            }
        )
    )
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
