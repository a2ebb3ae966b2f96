"""Skew mitigation: salted joins (+ AQE notes).

At 100 TB one hot key serializes a whole join task. Two remedies:

1. AQE skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in
   session.py): splits oversized partitions at runtime. Free, but only for
   sort-merge joins and only when stats detect the skew.
2. Salting (this module) — deterministic, works for any join: the skewed
   (fact) side gets a salt derived from non-key columns; the dimension side
   is replicated `n_salts` times; the join key becomes (key, salt), spreading
   one hot key over n_salts tasks.

The salt must be deterministic (no rand()) for reproducible runs: we hash a
set of carrier columns from the fact row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_to_clickhouse_schema_spark._registry import new_registry
from parquet_to_clickhouse_schema_spark.functions.compat import qround
from parquet_to_clickhouse_schema_spark.sources.io import load_table

QUERIES, ORACLES, _q = new_registry()


def salted_equi_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt_cols: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the dimension side replicated over n_salts salts.

    `salt_cols`: fact columns whose hash spreads the hot key's rows (must
    not be constant within the hot key — row identifiers are ideal).
    Result equals fact.join(dim, fact_key == dim_key, how) exactly for the
    fact-preserving join types; right/full outer are rejected because the
    replicated dimension side would emit one null-extended row per unmatched
    salt replica (n_salts duplicates) — salt the other side instead.
    """
    if how not in ("inner", "left", "left_semi", "left_anti"):
        raise ValueError(
            f"salted_equi_join supports fact-preserving joins only, got {how!r}"
        )
    salted_fact = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(n_salts))
    )
    salted_dim = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i).cast("bigint") for i in range(n_salts)]))
    )
    joined = salted_fact.join(
        salted_dim,
        (F.col(fact_key) == F.col(dim_key)) & (salted_fact["__salt"] == salted_dim["__salt"]),
        how,
    )
    return joined.drop("__salt")


@_q(
    "q_salted_join",
    """
    SELECT s_nationkey,
           CAST(count(*) AS BIGINT) AS n_items,
           floor((sum(l_quantity)) * 100.0 + 0.5) / 100.0 AS sum_qty
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_nationkey
    """,
)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant fact-dim join: the oracle is a plain equi-join because
    salting is EXACTLY result-preserving — the salt spreads each supplier key
    over n_salts tasks (dim replicated 8x, fact salted by row identity), so
    one hot l_suppkey no longer serializes a task at 100 TB. The aggregate on
    top proves the join multiset is unchanged."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_orderkey", "l_linenumber", "l_quantity"
    )
    su = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    joined = salted_equi_join(
        li, su, "l_suppkey", "s_suppkey", salt_cols=["l_orderkey", "l_linenumber"]
    )
    return joined.groupBy("s_nationkey").agg(
        F.count("*").alias("n_items"),
        qround(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


def top_key_skew_ratio(df: DataFrame, key: str) -> float:
    """Diagnostic: share of rows held by the hottest key (1.0/n_keys is
    perfectly uniform). Run on a sample before choosing n_salts."""
    counts = df.groupBy(key).count()
    row = counts.agg(
        (F.max("count") / F.sum("count")).cast("double").alias("ratio")
    ).first()
    return float(row.ratio)


@_q(
    "q_skew_stats",
    """
    WITH fo AS (SELECT o_custkey AS k, count(*) AS c FROM orders GROUP BY 1),
    so AS (
      SELECT 'orders.o_custkey' AS join_key,
             CAST(sum(c) AS BIGINT) AS n_rows,
             CAST(count(*) AS BIGINT) AS n_keys,
             floor((max(c) * 1.0 / sum(c)) * 1000000.0 + 0.5) / 1000000.0
                 AS top1_share,
             floor(quantile_cont(c, 0.99) / (sum(c) * 1.0 / count(*))
                   * 1000000.0 + 0.5) / 1000000.0 AS p99_to_mean
      FROM fo
    ),
    fl AS (SELECT l_partkey AS k, count(*) AS c FROM lineitem GROUP BY 1),
    sl AS (
      SELECT 'lineitem.l_partkey' AS join_key,
             CAST(sum(c) AS BIGINT) AS n_rows,
             CAST(count(*) AS BIGINT) AS n_keys,
             floor((max(c) * 1.0 / sum(c)) * 1000000.0 + 0.5) / 1000000.0
                 AS top1_share,
             floor(quantile_cont(c, 0.99) / (sum(c) * 1.0 / count(*))
                   * 1000000.0 + 0.5) / 1000000.0 AS p99_to_mean
      FROM fl
    )
    SELECT * FROM so UNION ALL SELECT * FROM sl
    """,
)
def q_skew_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-join skew diagnostics for the two fact-side join keys: key
    cardinality, the hottest key's row share, and the p99-frequency-to-mean
    ratio — the numbers that decide BEFORE a 100 TB join whether plain
    sort-merge is safe, AQE skew-split suffices, or salting
    (salted_equi_join above) is required. top1_share × n_rows is the
    hottest task's row count under naive hash partitioning.

    One map-side-combined count per key column, then 1-row statistics over
    the (key, count) table — the diagnostic costs one scan per audited key
    and is itself skew-immune (the reduce key IS the audited key).
    Exact percentile over integer counts; ratios quantized at 1e-6."""
    def stats(df: DataFrame, key: str, label: str) -> DataFrame:
        f = df.groupBy(F.col(key).alias("k")).agg(F.count("*").alias("c"))
        return f.agg(
            F.lit(label).alias("join_key"),
            F.sum("c").cast("bigint").alias("n_rows"),
            F.count("*").cast("bigint").alias("n_keys"),
            qround(F.max("c") * 1.0 / F.sum("c"), 6).alias("top1_share"),
            qround(
                F.percentile("c", F.lit(0.99))
                / (F.sum("c") * 1.0 / F.count("*")),
                6,
            ).alias("p99_to_mean"),
        ).select("join_key", "n_rows", "n_keys", "top1_share", "p99_to_mean")

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return stats(o, "o_custkey", "orders.o_custkey").unionAll(
        stats(li, "l_partkey", "lineitem.l_partkey")
    )
