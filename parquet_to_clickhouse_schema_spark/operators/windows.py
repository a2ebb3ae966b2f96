"""Window function family: ranking, lag/lead, rows frames, range frames.

Windows shuffle once on partitionBy keys then sort within partitions — the
scale concern is partition skew (a single hot key serializes). The testdata
keys (returnflag/suppkey/custkey) are well distributed; for skewed keys the
mitigation is pre-aggregating or salting before the window.

Determinism rule (required for oracle hash-matching, SURVEY.md §7): the
window orderBy must include EVERY column the output observes (the value
columns the window functions read, plus the projected keys). The synthetic
lineitem data has duplicate (l_orderkey, l_linenumber) pairs — caught at
sf0.1 — so those two columns alone are NOT a unique tiebreak; once the
observed value column is in the ordering, any remaining tie is between
observationally identical rows and the output multiset is order-invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parquet_to_clickhouse_schema_spark._registry import new_registry
from parquet_to_clickhouse_schema_spark.functions.compat import qround
from parquet_to_clickhouse_schema_spark.sources.io import load_table

QUERIES, ORACLES, _q = new_registry()


@_q(
    "q_window_rank",
    """
    SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
           CAST(rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity DESC) AS BIGINT) AS rnk,
           CAST(dense_rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity DESC) AS BIGINT) AS drnk,
           CAST(row_number() OVER (PARTITION BY l_returnflag
                                   ORDER BY l_quantity DESC, l_orderkey, l_linenumber) AS BIGINT) AS rn
    FROM lineitem
    """,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank/row_number per return flag — the canonical ranking-window trio with a deterministic row_number tiebreak."""
    li = load_table(spark, sf_dir, "lineitem")
    w_rank = Window.partitionBy("l_returnflag").orderBy(F.col("l_quantity").desc())
    w_rn = Window.partitionBy("l_returnflag").orderBy(
        F.col("l_quantity").desc(), "l_orderkey", "l_linenumber"
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        "l_quantity",
        F.rank().over(w_rank).cast("bigint").alias("rnk"),
        F.dense_rank().over(w_rank).cast("bigint").alias("drnk"),
        F.row_number().over(w_rn).cast("bigint").alias("rn"),
    )


@_q(
    "q_window_lag",
    """
    SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
           lag(l_extendedprice) OVER w AS prev_price,
           lead(l_extendedprice) OVER w AS next_price,
           floor((l_extendedprice - lag(l_extendedprice) OVER w) * 100.0 + 0.5) / 100.0 AS delta
    FROM lineitem
    WINDOW w AS (PARTITION BY l_suppkey
                 ORDER BY l_shipdate, l_orderkey, l_linenumber, l_extendedprice)
    """,
)
def q_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead navigation over per-flag quantity order — previous/next-row deltas without a self-join."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_suppkey").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    prev = F.lag("l_extendedprice").over(w)
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        "l_extendedprice",
        prev.alias("prev_price"),
        F.lead("l_extendedprice").over(w).alias("next_price"),
        qround(F.col("l_extendedprice") - prev, 2).alias("delta"),
    )


@_q(
    "q_window_frame",
    """
    SELECT l_suppkey, l_orderkey, l_linenumber,
           floor((
             avg(l_quantity) OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)) * 1000000.0 + 0.5) / 1000000.0 AS mov_avg_qty,
           floor((
             sum(l_quantity) OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)) * 100.0 + 0.5) / 100.0 AS mov_sum_qty
    FROM lineitem
    """,
)
def q_window_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """running sum/avg/count over a rows-frame (unbounded preceding to current) — the cumulative-metrics window shape."""
    li = load_table(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber", "l_quantity")
        .rowsBetween(-2, Window.currentRow)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        qround(F.avg("l_quantity").over(w), 6).alias("mov_avg_qty"),
        qround(F.sum("l_quantity").over(w), 2).alias("mov_sum_qty"),
    )


@_q(
    "q_window_range_frame",
    """
    SELECT o_orderkey, o_custkey, o_orderdate,
           floor((
             sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 100.0 + 0.5) / 100.0 AS running_spend
    FROM orders
    """,
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame: peers (equal o_orderdate) are aggregated together, which
    makes the running total deterministic even with timestamp ties — the
    reason this query needs no unique tiebreak."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        qround(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


@_q(
    "q_window_dist",
    """
    SELECT o_orderkey, o_custkey, o_totalprice,
           CAST(ntile(4) OVER (PARTITION BY o_custkey
                               ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS quartile,
           floor((percent_rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice))
                 * 1000000.0 + 0.5) / 1000000.0 AS pct_rank,
           floor((cume_dist() OVER (PARTITION BY o_custkey ORDER BY o_totalprice))
                 * 1000000.0 + 0.5) / 1000000.0 AS cume
    FROM orders
    """,
)
def q_window_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution analytics: ntile needs the full (value, key) tiebreak
    (it assigns by row position); percent_rank/cume_dist depend only on the
    order values, so ties are inherently deterministic for them."""
    o = load_table(spark, sf_dir, "orders")
    w_tie = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    w_val = Window.partitionBy("o_custkey").orderBy("o_totalprice")
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.ntile(4).over(w_tie).cast("bigint").alias("quartile"),
        qround(F.percent_rank().over(w_val), 6).alias("pct_rank"),
        qround(F.cume_dist().over(w_val), 6).alias("cume"),
    )


@_q(
    "q_window_distinct_running",
    """
    SELECT o_custkey, o_orderkey,
           CAST(count(DISTINCT o_orderstatus)
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS statuses_so_far
    FROM orders
    """,
)
def q_window_distinct_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running count-distinct per partition: Spark has no DISTINCT window
    aggregates, so the engine expresses it as size(collect_set() OVER w) —
    set-valued window state whose size is bounded by the attribute's
    cardinality (3 statuses here), NOT the frame length, which is what
    keeps it viable over long histories at scale. DuckDB twin uses the
    native count(DISTINCT ...) OVER. The ordering carries the full
    (o_orderdate, o_orderkey) tiebreak so running prefixes agree."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.size(F.collect_set("o_orderstatus").over(w))
        .cast("bigint")
        .alias("statuses_so_far"),
    )


def rank_low_cardinality(
    df: DataFrame,
    part_cols: list[str],
    order_col: str,
    ascending: bool = True,
    tiebreak_cols: list[str] | None = None,
    output_col: str = "rnk",
    method: str = "rank",
    num_buckets: int | None = None,
) -> DataFrame:
    """Two-pass quantile-bucketed rank: the scale-safe form of
    ``rank()/row_number() OVER (PARTITION BY low_cardinality ORDER BY v)``.

    A plain window with a 3-value partition key funnels each group through
    ONE task — at 100 TB that is a single executor sorting billions of rows.
    This op keeps every stage wide:

    1. Per-group quantile boundaries of the order column
       (``percentile_approx``, one aggregation job; the driver collect is
       groups × num_buckets doubles — bounded, the same pattern as
       ivf_topk's centroid pull). Boundaries are a DETERMINISTIC function
       of the data, so every lineage that re-derives the bucket id agrees
       — no reliance on exchange reuse or partition-id stability (a
       spark_partition_id formulation was measured flaky for exactly that
       reason).
    2. ``_bkt = #boundaries < v``: rows equal on v always share a bucket,
       so rank ties never straddle a bucket boundary. The local window
       partitions on ``(part, _bkt)`` — a fine-grained, quantile-balanced
       key — and sorts slices that fit in executor memory.
    3. A tiny ``(part, _bkt) → count`` table (map-side combined) turned
       into per-bucket offsets via a cumulative window in rank order,
       broadcast-joined back: ``global = local + rows_in_earlier_buckets``.

    method='rank' (ties share rank — correct because equal order values
    share a bucket) or 'row_number' (pass ``tiebreak_cols`` forming a total
    order, same determinism rule as any row_number). dense_rank is NOT
    offset-composable (it would need distinct-counts, not row-counts) and
    is deliberately unsupported. Rows with NULL order values are not
    supported (filter or impute first).
    """
    if method not in ("rank", "row_number"):
        raise ValueError(f"method must be 'rank' or 'row_number', got {method!r}")
    sess = df.sparkSession
    if num_buckets:
        n = num_buckets
    else:
        # shuffle.partitions may be non-numeric on some deployments
        # (e.g. "auto" under Databricks AQE) — fall back to a sane default
        try:
            n = int(sess.conf.get("spark.sql.shuffle.partitions"))
        except (ValueError, TypeError):
            n = 200
    fracs = [i / n for i in range(1, n)]
    bounds = (
        df.groupBy(*part_cols)
        .agg(F.percentile_approx(order_col, fracs, 10_000).alias("_bounds"))
    )
    # empty part_cols = ONE global group (a total-order rank over the whole
    # table); the 1-row bounds table cross-joins instead of equi-joining
    tagged = (
        df.crossJoin(F.broadcast(bounds))
        if not part_cols
        else df.join(F.broadcast(bounds), part_cols)
    )
    v = F.col(order_col)
    tagged = tagged.withColumn(
        "_bkt", F.size(F.filter("_bounds", lambda b: b < v))
    ).drop("_bounds")

    order_exprs = [v.asc() if ascending else v.desc()] + [
        F.col(c) for c in (tiebreak_cols or [])
    ]
    loc_w = Window.partitionBy(*part_cols, "_bkt").orderBy(*order_exprs)
    fn = F.rank() if method == "rank" else F.row_number()
    local = tagged.withColumn("_lrk", fn.over(loc_w))

    counts = tagged.groupBy(*part_cols, "_bkt").agg(F.count("*").alias("_cnt"))
    off_w = (
        Window.partitionBy(*part_cols)
        .orderBy(F.col("_bkt").asc() if ascending else F.col("_bkt").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_cnt").over(off_w), F.lit(0))
    ).drop("_cnt")
    return (
        local.join(F.broadcast(offsets), [*part_cols, "_bkt"])
        .withColumn(output_col, (F.col("_lrk") + F.col("_off")).cast("bigint"))
        .drop("_bkt", "_lrk", "_off")
    )


@_q(
    "q_window_rank_scalable",
    """
    SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
           CAST(rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity DESC) AS BIGINT) AS rnk
    FROM lineitem
    """,
)
def q_window_rank_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_window_rank's ranking via rank_low_cardinality: identical output
    (oracle-gated against the same OVER clause), but no stage ever holds a
    whole l_returnflag group in one task — the plan that survives 100×."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"
    )
    return rank_low_cardinality(
        li,
        ["l_returnflag"],
        "l_quantity",
        ascending=False,
        output_col="rnk",
        method="rank",
    )
