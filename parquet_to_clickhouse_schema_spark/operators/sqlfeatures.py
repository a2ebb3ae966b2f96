"""SQL-surface features: pivot/unpivot, subquery forms (scalar / IN /
correlated), HAVING, exact percentiles, statistical aggregates, value
windows (first/last/nth).

These complete the "a user of an OLAP engine could run every query they run
today" surface. All Catalyst built-ins; subqueries exercise Spark's
subquery decorrelation (rewritten to joins — check optimizedPlan).

Float-rounding scales are chosen per statistic so cross-engine single-pass
aggregation noise (~1e-12 relative) stays orders of magnitude away from the
rounding boundary: corr (|x|<=1) rounds at 6, stddev (~1e4) at 2, variance
(~1e8) truncates to integer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parquet_to_clickhouse_schema_spark._registry import new_registry
from parquet_to_clickhouse_schema_spark.functions.compat import qround
from parquet_to_clickhouse_schema_spark.sources.io import load_table

QUERIES, ORACLES, _q = new_registry()


@_q(
    "q_pivot",
    """
    SELECT l_returnflag,
           floor((coalesce(sum(l_quantity) FILTER (WHERE l_linestatus = 'F'), 0)) * 100.0 + 0.5)
               / 100.0 AS qty_F,
           floor((coalesce(sum(l_quantity) FILTER (WHERE l_linestatus = 'O'), 0)) * 100.0 + 0.5)
               / 100.0 AS qty_O
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot linestatus into columns. The explicit value list ['F','O'] keeps
    the plan single-pass; without it Spark runs an extra distinct-values job
    first — a full extra scan at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    p = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum("l_quantity"))
    )
    return p.select(
        "l_returnflag",
        qround(F.coalesce(F.col("F"), F.lit(0.0)), 2).alias("qty_F"),
        qround(F.coalesce(F.col("O"), F.lit(0.0)), 2).alias("qty_O"),
    )


@_q(
    "q_unpivot",
    """
    SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS val FROM part
    UNION ALL
    SELECT p_partkey, 'price' AS metric, p_retailprice AS val FROM part
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) wide columns to rows via stack() — no shuffle, one
    pass, output = n_rows x n_metrics."""
    p = load_table(spark, sf_dir, "part")
    return p.selectExpr(
        "p_partkey",
        "stack(2, 'size', CAST(p_size AS DOUBLE), 'price', p_retailprice) AS (metric, val)",
    )


@_q(
    "q_subquery_scalar",
    """
    SELECT o_orderkey,
           floor((o_totalprice - (SELECT avg(o_totalprice) FROM orders)) * 100.0 + 0.5)
               / 100.0 AS diff_from_avg
    FROM orders
    """,
)
def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery: Spark evaluates it once and broadcasts
    the scalar — no per-row recomputation."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_sq")
    # 100.0D: Spark SQL parses a bare `100.0` literal as DECIMAL(4,1), which
    # would silently turn the whole expression decimal (DuckDB stays double)
    return spark.sql(
        """
        SELECT o_orderkey,
               floor((o_totalprice - (SELECT avg(o_totalprice) FROM orders_sq)) * 100.0D + 0.5D)
                   / 100.0D AS diff_from_avg
        FROM orders_sq
        """
    )


@_q(
    "q_subquery_in",
    """
    SELECT p_partkey, p_name FROM part
    WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 49)
    """,
)
def q_subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery — decorrelated by Catalyst into a left-semi join (verify
    in optimizedPlan); never a per-row probe."""
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part_sq")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_sq")
    return spark.sql(
        """
        SELECT p_partkey, p_name FROM part_sq
        WHERE p_partkey IN (SELECT l_partkey FROM lineitem_sq WHERE l_quantity > 49)
        """
    )


@_q(
    "q_subquery_corr",
    """
    SELECT o_orderkey, o_totalprice FROM orders o
    WHERE o_totalprice > (SELECT 20 * avg(l_extendedprice)
                          FROM lineitem WHERE l_orderkey = o.o_orderkey)
    """,
)
def q_subquery_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (TPC-H Q17 shape) — decorrelated into an
    aggregate + join on the correlation key, one pass over lineitem."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_cq")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_cq")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice FROM orders_cq o
        WHERE o_totalprice > (SELECT 20 * avg(l_extendedprice)
                              FROM lineitem_cq WHERE l_orderkey = o.o_orderkey)
        """
    )


@_q(
    "q_lateral_join",
    """
    SELECT n.n_name, t.c_name, t.c_acctbal
    FROM nation n,
    LATERAL (
      SELECT c_name, c_acctbal FROM customer c
      WHERE c.c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_name
      LIMIT 2
    ) t
    """,
)
def q_lateral_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery join (top-2 customers per nation) —
    the SQL-standard per-row table subquery. Catalyst decorrelates the
    LATERAL into a window-ranked join (DomainJoin rewrite), so execution
    is one shuffle on the correlation key + rank filter — identical cost
    to the hand-written q_topk_per_group, never a per-row re-execution.
    The ORDER BY carries the (c_acctbal DESC, c_name) tiebreak so the
    LIMIT 2 row set is deterministic on both engines."""
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation_lat")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_lat")
    return spark.sql(
        """
        SELECT n.n_name, t.c_name, t.c_acctbal
        FROM nation_lat n,
        LATERAL (
          SELECT c_name, c_acctbal FROM customer_lat c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_name
          LIMIT 2
        ) t
        """
    )


@_q(
    "q_having",
    """
    SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY l_suppkey
    HAVING count(*) > 550
    """,
)
def q_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING post-aggregation filter — planned as a filter above the aggregate, pushdown-safe."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_suppkey").agg(F.count("*").alias("n")).filter(F.col("n") > 550)
    )


@_q(
    "q_percentile",
    """
    SELECT l_returnflag,
           floor((quantile_cont(l_quantity, 0.25)) * 1000000.0 + 0.5) / 1000000.0 AS p25,
           floor((quantile_cont(l_quantity, 0.5)) * 1000000.0 + 0.5) / 1000000.0 AS p50,
           floor((quantile_cont(l_quantity, 0.75)) * 1000000.0 + 0.5) / 1000000.0 AS p75
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (linear interpolation — same definition as
    quantile_cont). At 100 TB the approximate sketch (percentile_approx,
    constant memory) replaces this; exact percentile buffers the group."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        qround(F.expr("percentile(l_quantity, 0.25)"), 6).alias("p25"),
        qround(F.expr("percentile(l_quantity, 0.5)"), 6).alias("p50"),
        qround(F.expr("percentile(l_quantity, 0.75)"), 6).alias("p75"),
    )


@_q("q_percentile_approx")  # rows-only: sketch ranks are approximate by design
def q_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100-TB percentile path: percentile_approx's Greenwald-Khanna
    sketch is constant-memory per group and merges across partitions
    (map-side partials), where exact percentile buffers the whole group.
    Accuracy 10000 bounds rank error to n/10000. Approximate → not
    oracle-gated; tests/test_smoke.py asserts each approximate quantile
    lands within one quantity unit of the exact q_percentile value."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_quantity", 0.25, 10000).alias("p25"),
        F.percentile_approx("l_quantity", 0.5, 10000).alias("p50"),
        F.percentile_approx("l_quantity", 0.75, 10000).alias("p75"),
    )


PV_SHARDS = 32  # simulated partition count (shard = l_orderkey % PV_SHARDS)
PV_M = 64  # samples kept per shard -> merged rank error <= 1/PV_M


@_q(
    "q_percentile_verified",
    f"""
    WITH base AS (
      SELECT l_returnflag AS grp, l_orderkey % {PV_SHARDS} AS shard,
             l_extendedprice AS val, l_orderkey, l_linenumber
      FROM lineitem
    ),
    ranked AS (
      SELECT grp, shard, val,
             row_number() OVER (PARTITION BY grp, shard
                                ORDER BY val, l_orderkey, l_linenumber) AS rn,
             count(*) OVER (PARTITION BY grp, shard) AS n
      FROM base
    ),
    kept AS (
      SELECT grp, shard, val, rn,
             rn - coalesce(lag(rn) OVER (PARTITION BY grp, shard ORDER BY rn),
                           0) AS w
      FROM ranked
      WHERE (rn * {PV_M}) // n > ((rn - 1) * {PV_M}) // n
    ),
    merged AS (
      SELECT grp, val,
             sum(w) OVER (PARTITION BY grp ORDER BY val, shard, rn
                          ROWS UNBOUNDED PRECEDING) AS cumw,
             sum(w) OVER (PARTITION BY grp) AS n_all
      FROM kept
    ),
    est AS (
      SELECT grp, CAST(max(n_all) AS BIGINT) AS n_rows,
             CAST(count(*) AS BIGINT) AS sketch_rows,
             min(CASE WHEN cumw * 4 >= n_all THEN val END) AS p25_est,
             min(CASE WHEN cumw * 2 >= n_all THEN val END) AS p50_est,
             min(CASE WHEN cumw * 4 >= 3 * n_all THEN val END) AS p75_est
      FROM merged GROUP BY grp
    )
    SELECT e.grp AS l_returnflag, e.n_rows, e.sketch_rows,
           e.p25_est, e.p50_est, e.p75_est,
           floor(abs(sum(CASE WHEN b.val <= e.p25_est THEN 1 ELSE 0 END) * 1.0
                     / e.n_rows - 0.25) * 1000000.0 + 0.5) / 1000000.0
               AS p25_rank_err,
           floor(abs(sum(CASE WHEN b.val <= e.p50_est THEN 1 ELSE 0 END) * 1.0
                     / e.n_rows - 0.5) * 1000000.0 + 0.5) / 1000000.0
               AS p50_rank_err,
           floor(abs(sum(CASE WHEN b.val <= e.p75_est THEN 1 ELSE 0 END) * 1.0
                     / e.n_rows - 0.75) * 1000000.0 + 0.5) / 1000000.0
               AS p75_rank_err
    FROM est e JOIN base b ON b.grp = e.grp
    GROUP BY e.grp, e.n_rows, e.sketch_rows, e.p25_est, e.p50_est, e.p75_est
    """,
)
def q_percentile_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-gated mergeable quantile sketch (q_percentile_approx's hash-
    gated mechanism proof — the q_minhash_union / q_ann_verified_topk move
    applied to quantile summaries).

    Mechanism (Manku-Rajagopalan-Lindsay mergeable summary, the family
    percentile_approx's GK sketch belongs to): each simulated partition
    (shard = l_orderkey % {PV_SHARDS} — deterministic, unlike real task
    splits) sorts its values and keeps the {PV_M} evenly-spaced rank
    samples p_i = ceil(i*n/m), each carrying its exact integer rank
    coverage w_i = p_i - p_(i-1); summaries merge by a weighted cumulative
    rank over (val, shard, rn) and the q-quantile estimate is the first
    sample whose cumulative weight reaches ceil(q*N) (integer threshold
    cumw*den >= num*N — no float rank math anywhere in the sketch). The
    estimates are exact data values and every merge step is integer
    arithmetic, so DuckDB rebuilds the whole path bit-for-bit: the SKETCH
    is oracle-gated, not just its output rows. Measured per-group rank
    error (|rank(est)/N - q|, bound 1/{PV_M}) rides on the row.

    100 TB shape: the per-shard summary is m rows regardless of shard
    size (two window passes over the shard's local sort — in production a
    per-partition mapPartitions pass, here windows so the oracle can
    mirror it); the merge shuffles groups x shards x m rows only. The
    truth join (base x 3-row broadcast est) exists to measure — drop it
    in production and the sketch never rescans the data."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        F.col("l_returnflag").alias("grp"),
        (F.col("l_orderkey") % PV_SHARDS).alias("shard"),
        F.col("l_extendedprice").alias("val"),
        "l_orderkey",
        "l_linenumber",
    )
    w_rank = Window.partitionBy("grp", "shard").orderBy(
        "val", "l_orderkey", "l_linenumber"
    )
    ranked = base.select(
        "grp",
        "shard",
        "val",
        F.row_number().over(w_rank).cast("bigint").alias("rn"),
        F.count("*").over(Window.partitionBy("grp", "shard")).alias("n"),
    )
    kept = ranked.filter(
        F.expr(f"(rn * {PV_M}) DIV n > ((rn - 1) * {PV_M}) DIV n")
    )
    w_lag = Window.partitionBy("grp", "shard").orderBy("rn")
    kept = kept.select(
        "grp",
        "shard",
        "val",
        "rn",
        (F.col("rn") - F.coalesce(F.lag("rn").over(w_lag), F.lit(0))).alias("w"),
    )
    w_cum = (
        Window.partitionBy("grp")
        .orderBy("val", "shard", "rn")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = kept.select(
        "grp",
        "val",
        F.sum("w").over(w_cum).alias("cumw"),
        F.sum("w").over(Window.partitionBy("grp")).alias("n_all"),
    )
    est = merged.groupBy("grp").agg(
        F.max("n_all").cast("bigint").alias("n_rows"),
        F.count("*").cast("bigint").alias("sketch_rows"),
        F.min(F.when(F.col("cumw") * 4 >= F.col("n_all"), F.col("val"))).alias(
            "p25_est"
        ),
        F.min(F.when(F.col("cumw") * 2 >= F.col("n_all"), F.col("val"))).alias(
            "p50_est"
        ),
        F.min(
            F.when(F.col("cumw") * 4 >= 3 * F.col("n_all"), F.col("val"))
        ).alias("p75_est"),
    )

    def rank_err(p_col: str, q: float):
        le = F.sum((F.col("val") <= F.col(p_col)).cast("int"))
        return qround(F.abs(le * 1.0 / F.col("n_rows") - q), 6)

    return (
        base.join(F.broadcast(est), "grp")
        .groupBy("grp", "n_rows", "sketch_rows", "p25_est", "p50_est", "p75_est")
        .agg(
            rank_err("p25_est", 0.25).alias("p25_rank_err"),
            rank_err("p50_est", 0.5).alias("p50_rank_err"),
            rank_err("p75_est", 0.75).alias("p75_rank_err"),
        )
        .withColumnRenamed("grp", "l_returnflag")
    )


@_q(
    "q_stats_agg",
    """
    SELECT l_returnflag,
           floor((corr(l_quantity, l_extendedprice)) * 1000000.0 + 0.5) / 1000000.0 AS qty_price_corr,
           floor((stddev_samp(l_extendedprice)) * 100.0 + 0.5) / 100.0 AS price_stddev,
           CAST(floor(var_samp(l_extendedprice)) AS BIGINT) AS price_var_floor,
           floor((covar_samp(l_quantity, l_discount)) * 1000000.0 + 0.5) / 1000000.0 AS qty_disc_covar
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (single-pass co-moment form in both engines).
    Rounding scale per statistic keeps ~1e-12 relative engine noise away
    from the rounding boundary (module docstring)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        qround(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        qround(F.stddev_samp("l_extendedprice"), 2).alias("price_stddev"),
        F.floor(F.var_samp("l_extendedprice")).cast("bigint").alias("price_var_floor"),
        qround(F.covar_samp("l_quantity", "l_discount"), 6).alias("qty_disc_covar"),
    )


@_q(
    "q_window_value",
    """
    SELECT o_custkey, o_orderkey,
           first_value(o_totalprice) OVER w AS first_spend,
           last_value(o_totalprice) OVER w AS latest_spend,
           nth_value(o_totalprice, 2) OVER w AS second_spend
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q_window_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth value windows with an explicit full frame — the
    default frame (unbounded-preceding..current) makes last_value a trap;
    the explicit frame is both correct and cross-engine deterministic."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_totalprice").over(w).alias("first_spend"),
        F.last("o_totalprice").over(w).alias("latest_spend"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_spend"),
    )


@_q(
    "q_islands",
    """
    WITH d AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events
    ),
    t AS (
      SELECT user_id, day,
             CAST(row_number() OVER (PARTITION BY user_id ORDER BY day) AS INT) AS rn
      FROM d
    )
    SELECT user_id,
           min(day) AS streak_start,
           CAST(count(*) AS BIGINT) AS streak_days
    FROM t GROUP BY user_id, day - rn
    """,
)
def q_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: consecutive-day activity streaks per user via the
    classic row_number-difference anchor (day - rn is constant within a
    run of consecutive days). One window + one aggregate, both partitioned
    by user — at 100 TB the input is first reduced to DISTINCT
    (user, day), so the window sorts O(users x active-days) rows, never
    raw events. The complement of session_window gap detection: this finds
    runs in DISCRETE sequences (days), not event-time gaps."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    t = d.withColumn("rn", F.row_number().over(w))
    return (
        t.groupBy("user_id", F.date_sub("day", F.col("rn")).alias("anchor"))
        .agg(
            F.min("day").alias("streak_start"),
            F.count("*").alias("streak_days"),
        )
        .select("user_id", "streak_start", "streak_days")
    )


@_q(
    "q_string_agg",
    """
    SELECT o_orderpriority,
           string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus)
               AS statuses,
           CAST(count(*) AS BIGINT) AS n
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG): distinct values joined in
    sorted order — the deterministic form (unordered string_agg is
    nondeterministic under parallel aggregation on BOTH engines, and would
    never hash-match). Spark expresses it as
    array_join(array_sort(collect_set(...))): collect_set's partial state
    is the distinct set, so the shuffle carries sets, not rows, and the
    sort happens once per group at the end."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.array_join(F.array_sort(F.collect_set("o_orderstatus")), ",").alias(
            "statuses"
        ),
        F.count("*").alias("n"),
    )


@_q(
    "q_recursive_cte",
    """
    WITH RECURSIVE months(m) AS (
      SELECT TIMESTAMP '1995-01-01 00:00:00'
      UNION ALL
      SELECT m + INTERVAL 1 MONTH FROM months
      WHERE m < TIMESTAMP '2001-08-01 00:00:00'
    ),
    rev AS (
      SELECT date_trunc('month', o_orderdate) AS om,
             floor((sum(o_totalprice)) * 100.0 + 0.5) / 100.0 AS month_revenue,
             CAST(count(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY om
    )
    SELECT CAST(m AS DATE) AS month_start,
           coalesce(month_revenue, 0.0) AS month_revenue,
           coalesce(n_orders, 0) AS n_orders
    FROM months LEFT JOIN rev ON m = om
    """,
)
def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4's WITH RECURSIVE): a monthly calendar spine
    generated by recursion, left-joined to monthly order revenue so months
    with no orders surface as explicit zero rows — the recursive companion
    to the sequence()-based spine in q_resample_gapfill.

    Scale shape: the recursion materializes ~80 spine rows on tiny local
    iterations (depth = months, well under
    spark.sql.cteRecursionLevelLimit); the fact-side aggregate is map-side
    combinable to |months| rows, so the join is a broadcast of the spine
    however large orders is."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_rcte")
    return spark.sql(
        """
        WITH RECURSIVE months(m) AS (
          SELECT TIMESTAMP '1995-01-01 00:00:00'
          UNION ALL
          SELECT m + INTERVAL 1 MONTH FROM months
          WHERE m < TIMESTAMP '2001-08-01 00:00:00'
        ),
        rev AS (
          SELECT date_trunc('month', o_orderdate) AS om,
                 floor((sum(o_totalprice)) * 100.0 + 0.5) / 100.0 AS month_revenue,
                 CAST(count(*) AS BIGINT) AS n_orders
          FROM orders_rcte GROUP BY om
        )
        SELECT CAST(m AS DATE) AS month_start,
               coalesce(month_revenue, 0.0D) AS month_revenue,
               coalesce(n_orders, CAST(0 AS BIGINT)) AS n_orders
        FROM months LEFT JOIN rev ON m = om
        """
    )


@_q(
    "q_distinct_on",
    """
    SELECT DISTINCT ON (o_custkey)
           o_custkey, o_orderkey AS last_orderkey,
           o_orderdate AS last_orderdate,
           floor(o_totalprice * 100.0 + 0.5) / 100.0 AS last_totalprice
    FROM orders
    ORDER BY o_custkey, o_orderdate DESC, o_orderkey DESC
    """,
)
def q_distinct_on(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT ON semantics (latest order per customer): pick ONE whole
    row per key by an explicit ordering. Spark has no DISTINCT ON; the
    scale-correct form is a single max(struct(...)) aggregate — the
    ordering columns lead the struct so struct comparison IS the ORDER BY
    (o_orderdate DESC, o_orderkey DESC), and the payload rides along.

    Unlike the row_number()-over-window form (full partition sort), the
    argmax struct is map-side combinable: every partition reduces to one
    candidate per key before the shuffle — the same pattern as
    q_dedup_keep_best / q_cdc_apply, stated here as the DISTINCT ON
    equivalence. Deterministic because o_orderkey is unique."""
    o = load_table(spark, sf_dir, "orders")
    best = (
        o.groupBy("o_custkey")
        .agg(
            F.max(
                F.struct("o_orderdate", "o_orderkey", "o_totalprice")
            ).alias("b")
        )
    )
    return best.select(
        "o_custkey",
        F.col("b.o_orderkey").alias("last_orderkey"),
        F.col("b.o_orderdate").alias("last_orderdate"),
        qround(F.col("b.o_totalprice"), 2).alias("last_totalprice"),
    )


@_q(
    "q_order_nulls",
    """
    SELECT o_orderkey, nullif(o_orderstatus, 'P') AS status_or_null,
           o_orderpriority
    FROM orders
    ORDER BY nullif(o_orderstatus, 'P') ASC NULLS FIRST,
             o_orderpriority ASC, o_orderkey ASC
    LIMIT 50
    """,
)
def q_order_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULL-ordering semantics, observable through a LIMIT: the
    engines DISAGREE by default (Spark ASC puts nulls first, DuckDB ASC
    puts nulls last), so any ordered-limit query over a nullable sort key
    MUST spell the null position or silently return different rows. The
    unique o_orderkey tiebreak makes the limit deterministic.

    Scale shape: ordered limit is TakeOrderedAndProject — per-partition
    top-50 then a driver merge, never a global sort."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status_or_null"),
            "o_orderpriority",
        )
        .orderBy(
            F.col("status_or_null").asc_nulls_first(),
            F.col("o_orderpriority").asc(),
            F.col("o_orderkey").asc(),
        )
        .limit(50)
    )


@_q(
    "q_skyline",
    """
    WITH pts AS (
      SELECT DISTINCT p_retailprice AS price, p_size AS size FROM part
    )
    SELECT price, size FROM pts a
    WHERE NOT EXISTS (
      SELECT 1 FROM pts b
      WHERE b.price <= a.price AND b.size <= a.size
        AND (b.price < a.price OR b.size < a.size)
    )
    """,
)
def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier): the (price, size) pairs not dominated
    by any other part — minimize both. The oracle states the O(n²)
    NOT-EXISTS definition; the engine runs the O(n log n) two-phase
    distributed algorithm:

    1. LOCAL skylines in parallel: within each scan partition
       (spark_partition_id as the window key), sort by (price, size) and
       keep rows whose strict-prefix running min size is above their own —
       a prefix row has price <= current, so prefix_min_size <= size IS
       domination. Skyline-of-local-skylines = global skyline (domination
       is transitive and partition-blind), so this pass is lossless.
    2. GLOBAL pass: the same prefix-min filter over the surviving
       candidates in one ordered window. Sound because step 1 already cut
       each partition to its frontier — expected O(log n) points per
       partition for independent dims (worst case, fully anti-correlated
       data, the frontier IS the dataset and no algorithm beats moving
       it).

    Exactly portable: prices/sizes pass through unchanged (no arithmetic),
    and the dominance test is pure comparison."""
    pts = (
        load_table(spark, sf_dir, "part")
        .select(F.col("p_retailprice").alias("price"), F.col("p_size").alias("size"))
        .distinct()
    )
    local = pts.withColumn("pid", F.spark_partition_id())
    w_local = (
        Window.partitionBy("pid")
        .orderBy("price", "size")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cand = (
        local.withColumn("pm", F.min("size").over(w_local))
        .filter(F.col("pm").isNull() | (F.col("pm") > F.col("size")))
        .drop("pid", "pm")
    )
    w_global = (
        Window.orderBy("price", "size").rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        cand.withColumn("pm", F.min("size").over(w_global))
        .filter(F.col("pm").isNull() | (F.col("pm") > F.col("size")))
        .drop("pm")
    )


@_q(
    "q_limit_offset",
    """
    SELECT o_orderkey, o_orderdate,
           floor(o_totalprice * 100.0 + 0.5) / 100.0 AS o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25 OFFSET 50
    """,
)
def q_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset-free pagination (page 3 of 25): ORDER BY ... LIMIT k OFFSET n
    — only deterministic with a total order (the unique o_orderkey
    tiebreak; without it the page boundary rows are engine-arbitrary).

    Scale shape: Spark executes OFFSET+LIMIT as a (n+k)-row TakeOrdered —
    per-partition top-75 then a driver merge that drops the first 50.
    Fine for UI pages; the docstring caveat a 100 TB user needs: OFFSET
    cost grows with n, so deep pagination should switch to keyset
    (WHERE sort_key > last_seen) — which is just q_filter_pred + q_topk."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            "o_orderdate",
            qround(F.col("o_totalprice"), 2).alias("o_totalprice"),
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .offset(50)
        .limit(25)
    )
