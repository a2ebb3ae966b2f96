"""Sort / limit / top-k / set operations.

Top-k never globally sorts: Spark plans orderBy+limit as
TakeOrderedAndProject — each partition keeps a k-row heap and the driver
merges partitions' heaps, O(n) scan + O(k) memory instead of a full shuffle
sort. That is the only top-k shape that survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parquet_to_clickhouse_schema_spark._registry import new_registry
from parquet_to_clickhouse_schema_spark.sources.io import load_table

QUERIES, ORACLES, _q = new_registry()


@_q(
    "q_topk",
    """
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 100
    """,
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-100 (TakeOrderedAndProject). The unique tiebreak
    (orderkey, linenumber) makes the selected SET deterministic, which is
    what the order-insensitive hash checks."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .limit(100)
    )


@_q(
    "q_topk_per_group",
    """
    SELECT o_custkey, o_orderkey, o_totalprice
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer: row_number window + filter. Spark pushes a
    per-partition k-limit into the sort (WindowGroupLimit) so each group
    keeps only 3 rows before the full window evaluation."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


@_q(
    "q_union",
    """
    SELECT o_orderkey AS k, 'big' AS src FROM orders WHERE o_totalprice > 300000
    UNION ALL
    SELECT o_orderkey AS k, 'open' AS src FROM orders WHERE o_orderstatus = 'O'
    """,
)
def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union (UNION ALL): pure concatenation of partitions, no shuffle."""
    o = load_table(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 300000).select(
        F.col("o_orderkey").alias("k"), F.lit("big").alias("src")
    )
    open_ = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_orderkey").alias("k"), F.lit("open").alias("src")
    )
    return big.unionAll(open_)


@_q(
    "q_intersect",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set intersect (distinct semantics — Spark .intersect == SQL INTERSECT;
    planned as an aggregate + left-semi join on all columns)."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@_q(
    "q_except",
    """
    SELECT l_partkey AS partkey FROM lineitem
    EXCEPT ALL
    SELECT p_partkey AS partkey FROM part
    """,
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag except (EXCEPT ALL — multiplicity-aware, deliberately distinct
    from set EXCEPT; SURVEY.md §7 calls out the difference)."""
    li = load_table(spark, sf_dir, "lineitem").select(F.col("l_partkey").alias("partkey"))
    p = load_table(spark, sf_dir, "part").select(F.col("p_partkey").alias("partkey"))
    return li.exceptAll(p)


@_q(
    "q_intersect_all",
    """
    SELECT l_partkey AS partkey FROM lineitem WHERE l_returnflag = 'A'
    INTERSECT ALL
    SELECT l_partkey AS partkey FROM lineitem WHERE l_returnflag = 'R'
    """,
)
def q_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag intersect (INTERSECT ALL): keeps min(multiplicity) per value —
    deliberately distinct from the set-semantics q_intersect."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "A").select(F.col("l_partkey").alias("partkey"))
    r = li.filter(F.col("l_returnflag") == "R").select(F.col("l_partkey").alias("partkey"))
    return a.intersectAll(r)


@_q(
    "q_except_set",
    """
    SELECT p_partkey AS partkey FROM part
    EXCEPT
    SELECT l_partkey AS partkey FROM lineitem WHERE l_quantity > 48
    """,
)
def q_except_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set except (distinct semantics, .subtract): parts never ordered in
    high quantity — the twin of bag-semantics q_except."""
    p = load_table(spark, sf_dir, "part").select(F.col("p_partkey").alias("partkey"))
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 48)
        .select(F.col("l_partkey").alias("partkey"))
    )
    return p.subtract(li)
