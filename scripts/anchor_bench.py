#!/usr/bin/env python
"""Clean-median anchor measurement for named keys (BASELINE.md method).

bench.py parity, codified after the r15/r16 anchor-method adjudications so
re-anchors stop being ad-hoc /tmp scripts:
  - construction INSIDE the timer (the r16 method correction: keys whose
    plan construction does eager work — localCheckpoint materialization,
    per-round collect loops — must pay it in the anchor exactly as the
    in-suite bench timer does);
  - 8 discarded canary warmups (the measured r13 JIT knee), then a 3-rep
    canary median before AND after (contention sentinel);
  - noop sink, one shared session, median of N reps (default 5), all rep
    samples printed so the discarded outlier stays visible.

Usage: python scripts/anchor_bench.py q_bpe_train [q_other ...] [--reps=5]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).

Run on an UNCONTENDED machine (no concurrent Spark jobs) — the sentinel
pair detects within-run contention but a busy host inflates everything.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parquet_to_clickhouse_schema_spark import registry
from parquet_to_clickhouse_schema_spark.session import get_spark


def main() -> None:
    keys = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 5
    for a in sys.argv[1:]:
        if a.startswith("--reps="):
            reps = int(a[len("--reps="):])
    if not keys:
        sys.exit("usage: anchor_bench.py q_key [q_key ...] [--reps=N]")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("anchor_bench")
    queries = registry.all_queries()

    def canary() -> float:
        df = queries["q_topk"](spark, sf_dir)
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    for _ in range(8):
        canary()
    before = round(statistics.median([canary() for _ in range(3)]), 3)

    out: dict[str, dict] = {}
    for key in keys:
        samples = []
        for _ in range(reps):
            t0 = time.time()
            df = queries[key](spark, sf_dir)  # construction inside timer
            df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
        out[key] = {
            "median_s": round(statistics.median(samples), 3),
            "reps": samples,
        }

    after = round(statistics.median([canary() for _ in range(3)]), 3)
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "sentinel_before_s": before,
                "sentinel_after_s": after,
                "loadavg": [round(x, 2) for x in os.getloadavg()],
                "anchors": out,
            }
        )
    )


if __name__ == "__main__":
    main()
