"""Round-18 optimization-internals tests.

The r18 optimization round rewired several operator internals without
changing what any query computes (all rewrites are oracle-gated in
test_oracle.py / scripts/check_oracle.py). These tests pin the new
helpers' contracts directly:

1. fanout_scan: repartitions a below-target frame to exactly the
   shuffle-partition count, and is a NO-OP (same plan object) when the
   input already has at least that many partitions — the gate that makes
   it safe at 100 TB (a real multi-file scan never pays the exchange).
2. shingle_array_of_toks over a projected token column is row-identical
   to the original shingle_array(text) form (the per-element re-split
   fix must not change a single shingle).
3. connected_components' convergence now rides the `old` column through
   the hop union instead of a compare-join; the counter must still stop
   the loop at the right round and produce min-member labels.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from parquet_to_clickhouse_schema_spark.operators.graph import connected_components
from parquet_to_clickhouse_schema_spark.operators.llm_dedup import (
    shingle_array,
    shingle_array_of_toks,
)
from parquet_to_clickhouse_schema_spark.sources.io import fanout_scan


def test_fanout_scan_spreads_single_partition(spark):
    df = spark.range(1000).coalesce(1)
    assert df.rdd.getNumPartitions() == 1
    out = fanout_scan(df, spark)
    target = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert out.rdd.getNumPartitions() == target
    assert sorted(r.id for r in out.collect()) == list(range(1000))


def test_fanout_scan_noop_when_already_parallel(spark):
    target = int(spark.conf.get("spark.sql.shuffle.partitions"))
    df = spark.range(1000).repartition(target)
    out = fanout_scan(df, spark)
    # identity, not merely equal partition count: no extra exchange
    assert out is df


def test_shingle_of_toks_matches_shingle_of_text(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g"),
            (2, "x y"),  # shorter than SHINGLE_K: single short shingle
            (3, "one"),
            (4, "p q r s t u v w x y z aa bb cc"),
        ],
        "doc_id bigint, text string",
    )
    old = docs.select("doc_id", shingle_array("text").alias("sh"))
    new = docs.select(
        "doc_id", F.split("text", " ").alias("_toks")
    ).select("doc_id", shingle_array_of_toks(F.col("_toks")).alias("sh"))
    assert sorted(map(tuple, old.collect())) == sorted(map(tuple, new.collect()))


def test_connected_components_old_carry_converges(spark):
    # a 9-chain plus a separate triangle: labels must reach the chain's
    # min in ceil(log2(diameter)) pointer-jumping rounds and stop
    edges = [(i, i + 1) for i in range(10, 19)] + [(1, 2), (2, 3), (1, 3)]
    df = spark.createDataFrame(edges, "doc_a bigint, doc_b bigint")
    got = {
        r.doc_id: r.cluster_id for r in connected_components(df).collect()
    }
    assert got == {**{i: 10 for i in range(10, 20)}, **{i: 1 for i in (1, 2, 3)}}
    # output schema carries no helper columns
    assert connected_components(df).columns == ["doc_id", "cluster_id"]
