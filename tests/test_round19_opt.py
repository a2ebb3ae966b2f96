"""Round-19 optimization pins.

1. The novelty/boilerplate token guard moved from a filter on the computed
   array (pushdown-duplicated: split ran twice per row in the scan stage)
   to a space-count predicate on the raw text column. Pin the equivalence
   `size(split(text, ' ')) >= N  <=>  spaces(text) >= N-1` on the edge
   cases that could break it (empty text, multi-space runs, exactly-N
   tokens, null text).
2. state_partitions_for sizes state-store instances to live keys, capped
   by the session setting and floored at 1.
3. connected_components' one-job-per-round form (lazy checkpoint + count
   fold + hopped persist) still converges and labels stay exact on a
   planted worst case (long chain bridged to a clique).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from parquet_to_clickhouse_schema_spark.functions.text_models import (
    NOVELTY_N,
    _docs_with_min_toks,
)
from parquet_to_clickhouse_schema_spark.operators.graph import connected_components
from parquet_to_clickhouse_schema_spark.streaming.stream_demo import (
    STATE_KEYS_PER_PARTITION,
    state_partitions_for,
)


def test_space_count_guard_matches_size_split(spark):
    rows = [
        (1, ""),                      # empty string: split -> [''], size 1
        (2, "one"),
        (3, "one two"),
        (4, "one two three"),         # exactly NOVELTY_N tokens
        (5, "a  b"),                  # double space -> ['a','','b'], size 3
        (6, "   "),                   # 3 spaces -> 4 empty tokens
        (7, None),                    # null text: dropped by both forms
        (8, "w1 w2 w3 w4 w5"),
    ]
    d = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    old = (
        d.select("doc_id", F.split("text", " ").alias("_toks"))
        .filter(F.size("_toks") >= NOVELTY_N)
    )
    new = _docs_with_min_toks(d, NOVELTY_N)
    assert sorted(r.doc_id for r in old.collect()) == sorted(
        r.doc_id for r in new.collect()
    )
    # and the kept token arrays are identical, not just the row set
    assert {r.doc_id: r._toks for r in old.collect()} == {
        r.doc_id: r._toks for r in new.collect()
    }


def test_state_partitions_for_bounds(spark):
    cap = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert state_partitions_for(spark, 0) == 1
    assert state_partitions_for(spark, 1) == 1
    assert (
        state_partitions_for(spark, STATE_KEYS_PER_PARTITION * 3) == min(3, cap)
    )
    assert state_partitions_for(spark, 10**9) == cap


def test_cc_one_job_per_round_converges_exactly(spark):
    # 30-node chain bridged into a 5-clique: pointer jumping must close the
    # chain in O(log n) rounds and every vertex lands on min id 0
    chain = [(i, i + 1) for i in range(30)]
    clique = [(100 + a, 100 + b) for a in range(5) for b in range(a + 1, 5)]
    bridge = [(30, 100)]
    df = spark.createDataFrame(
        chain + clique + bridge, "doc_a LONG, doc_b LONG"
    )
    got = {r.doc_id: r.cluster_id for r in connected_components(df).collect()}
    assert set(got.values()) == {0}
    assert len(got) == 36
