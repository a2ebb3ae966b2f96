"""Composite reporting queries — TPC-H-shaped multi-operator workloads
(Q3/Q6/Q10/Q4 adapted to this schema's columns).

These are the "real queries a user runs" tier: each composes joins +
aggregation + top-k in one plan, exercising the interaction of broadcast
choice, partial aggregation and ordered limits that single-operator queries
can't. All oracle-gated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parquet_to_clickhouse_schema_spark._registry import new_registry
from parquet_to_clickhouse_schema_spark.functions.compat import qround
from parquet_to_clickhouse_schema_spark.sources.io import load_table

QUERIES, ORACLES, _q = new_registry()


@_q(
    "q_report_top_orders",
    """
    SELECT o_orderkey, o_orderdate,
           floor((sum(l_extendedprice * (1 - l_discount))) * 100.0 + 0.5) / 100.0 AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY o_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def q_report_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment filter -> 3-way join -> revenue per order ->
    top 10. Customer grows with SF, so it carries no hint — AQE broadcasts
    it while the filtered side fits and falls back to SMJ beyond that;
    lineitem shuffles once for the orderkey aggregation; the limit is
    TakeOrderedAndProject."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-01-01").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            qround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), "o_orderkey")
        .limit(10)
    )


@_q(
    "q_report_revenue_delta",
    """
    SELECT floor((sum(l_extendedprice * l_discount)) * 100.0 + 0.5) / 100.0 AS promo_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q_report_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-sum, one row out. All four predicates
    push to the parquet scan; the only exchange is the SinglePartition reduce
    of one partial-sum row per partition — the cheapest possible plan shape
    for 100 TB (verified: shuffle_count == 1, all filters in PushedFilters)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.03, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        qround(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "promo_revenue"
        )
    )


@_q(
    "q_report_returned_customers",
    """
    SELECT c_custkey, c_name, n_name,
           floor((sum(l_extendedprice * (1 - l_discount))) * 100.0 + 0.5) / 100.0
               AS returned_revenue
    FROM customer
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY returned_revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q_report_returned_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: which customers return the most revenue. Returnflag
    filter reduces lineitem ~3x at the scan. nation (fixed 25 rows) keeps
    its broadcast hint; customer grows with SF so AQE picks its strategy at
    runtime — a forced broadcast would OOM at 100 TB instead of degrading
    to a sort-merge join."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            qround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "returned_revenue"
            )
        )
        .orderBy(F.col("returned_revenue").desc(), "c_custkey")
        .limit(20)
    )


@_q(
    "q_report_late_orders",
    """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_late_orders
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o.o_orderkey
                    AND l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def q_report_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (adapted: 'late' = shipped >60 days after order date —
    this schema has no commitdate). Correlated EXISTS becomes a left-semi
    join; the count per priority is a tiny final aggregate."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = li.join(o, li.l_orderkey == o.o_orderkey).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(late.select("l_orderkey").distinct(), o.o_orderkey == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_late_orders"))
    )


@_q(
    "q_report_regional_revenue",
    """
    SELECT n_name,
           floor((sum(l_extendedprice * (1 - l_discount))) * 100.0 + 0.5) / 100.0 AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q_report_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: local-supplier revenue per nation in one region. The
    hardest join topology in the suite — a 6-way join where the
    customer-supplier 'same nation' condition rides the lineitem join. Only
    lineitem x orders is a real shuffle. Nation/region carry explicit
    broadcast hints (fixed cardinality 25/5 at every SF); customer and
    supplier are SF-growing, so they carry NO hint — a forced broadcast is
    never demoted by AQE and would OOM at 100 TB, whereas unhinted joins let
    AQE broadcast them while they fit and degrade to SMJ beyond that (same
    policy as relational.q_join_multiway)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            qround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


@_q(
    "q_report_nation_profit",
    """
    SELECT n_name, CAST(year(l_shipdate) AS INT) AS yr,
           floor((sum(l_extendedprice * (1 - l_discount))) * 100.0 + 0.5) / 100.0 AS profit
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN part     ON l_partkey = p_partkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, yr
    """,
)
def q_report_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (adapted: no partsupp table, so profit = discounted
    revenue): per-(supplier nation, ship year) profit on parts matching a
    name substring. The part filter is the selectivity lever — Catalyst
    pushes the LIKE to the part scan, and AQE broadcasts the shrunken
    part/supplier sides while they fit (no forced hint: both grow with SF);
    nation keeps its hint (25 rows always)."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name", F.year("l_shipdate").cast("int").alias("yr"))
        .agg(
            qround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "profit"
            )
        )
    )


@_q(
    "q_report_promo_share",
    """
    SELECT floor((CAST(100.0 AS DOUBLE)
               * sum(CASE WHEN p_type = 'PROMO'
                          THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
               / sum(l_extendedprice * (1 - l_discount))) * 10000.0 + 0.5) / 10000.0
           AS promo_share_pct
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
    """,
)
def q_report_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: share of revenue from PROMO parts in a quarter.
    Conditional aggregation over one part join (AQE-sized: part grows with
    SF, so no forced hint) — both sums come out of a single pass (no second
    scan for the denominator)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            qround(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0.0)))
                / F.sum(disc),
                4,
            ).alias("promo_share_pct")
        )
    )


@_q(
    "q_report_disjunctive_revenue",
    """
    SELECT floor((sum(l_extendedprice * (1 - l_discount))) * 100.0 + 0.5) / 100.0 AS revenue
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1'  AND p_size BETWEEN 1  AND 15 AND l_quantity BETWEEN 1  AND 20)
       OR (p_brand = 'Brand#13' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#25' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 40)
    """,
)
def q_report_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive (OR-of-ANDs) predicates spanning both
    join sides. Catalyst can't push the whole OR to either scan, but it CAN
    push the union-of-ranges residuals per side (p_brand IN (...),
    l_quantity BETWEEN 1 AND 40) — the pattern to check in .explain when a
    disjunctive filter shows up at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#25")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            qround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


@_q(
    "q_funnel",
    """
    WITH v AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t1
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t2
      GROUP BY e.user_id
    )
    SELECT v.user_id,
           CAST(1 + (CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END)
                  + (CASE WHEN p.user_id IS NULL THEN 0 ELSE 1 END) AS INT)
               AS funnel_stage
    FROM v LEFT JOIN c ON v.user_id = c.user_id
           LEFT JOIN p ON v.user_id = p.user_id
    """,
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered event funnel (view -> click -> purchase): per user, the
    furthest stage reached with strictly increasing event times — the
    product-analytics sequence query. Each stage is a per-user MIN over a
    filtered scan joined to the previous stage's frontier, so ordering is
    enforced by time comparison against the prior stage's first-completion
    time, not by windowing over full per-user event lists: the shuffles
    carry one row per user per stage, never raw events, and each stage's
    filter prunes the event scan by type. Timestamp comparisons are safe
    cross-engine because the corpus carries no sub-microsecond components
    (asserted at generation scale; Spark truncates ns -> us on load)."""
    ev = load_table(spark, sf_dir, "events")

    def stage(event_type: str, prev: DataFrame, prev_t: str, out_t: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == event_type)
            .join(prev, "user_id")
            .filter(F.col("ts") > F.col(prev_t))
            .groupBy("user_id")
            .agg(F.min("ts").alias(out_t))
        )

    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = stage("click", v, "t1", "t2")
    p = stage("purchase", c, "t2", "t3")
    return (
        v.select("user_id")
        .join(c.select("user_id", F.lit(1).alias("hc")), "user_id", "left")
        .join(p.select("user_id", F.lit(1).alias("hp")), "user_id", "left")
        .select(
            "user_id",
            (1 + F.coalesce("hc", F.lit(0)) + F.coalesce("hp", F.lit(0)))
            .cast("int")
            .alias("funnel_stage"),
        )
    )


@_q(
    "q_retention",
    """
    WITH f AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cw
      FROM events GROUP BY user_id
    ),
    a AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS aw FROM events
    )
    SELECT CAST(f.cw AS DATE) AS cohort_week,
           CAST(date_diff('day', f.cw, a.aw) / 7 AS INT) AS week_offset,
           CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
    FROM a JOIN f ON a.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by acquisition week (first
    event; both engines truncate weeks to ISO Monday), counted in each
    subsequent week they were active — the companion to q_funnel in the
    product-analytics tier. Both inputs are per-user/per-week aggregates
    before the join, so the join and final aggregate shuffle
    O(users x active-weeks) rows, never raw events; the offset is an exact
    integer (day difference of week-truncated dates / 7), immune to
    engine-rounding boundaries."""
    ev = load_table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cw")
    )
    active = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("aw")
    ).distinct()
    return (
        active.join(first, "user_id")
        .groupBy(
            F.col("cw").cast("date").alias("cohort_week"),
            (F.datediff("aw", "cw") / 7).cast("int").alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@_q(
    "q_report_order_count_dist",
    """
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def q_report_order_count_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: the distribution of orders-per-customer, INCLUDING
    zero-order customers — the outer-join-then-double-aggregate pattern
    (count(o_orderkey) counts only matched rows, so the left join's null
    rows become the c_count = 0 bucket).

    Scale shape: one equi-shuffle customer⋈orders (both sides key-
    partitioned; AQE broadcasts customer while it fits), a per-customer
    count (map-side combinable), then the second aggregate collapses to
    |distinct counts| rows — a handful however large the tables."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count("*").cast("bigint").alias("custdist")
    )


@_q(
    "q_report_small_qty_revenue",
    """
    SELECT floor((sum(l_extendedprice) / 7.0) * 100.0 + 0.5) / 100.0
               AS avg_yearly
    FROM lineitem l
    JOIN (
      SELECT l_partkey AS pk, 0.2 * avg(l_quantity) AS qty_thresh
      FROM lineitem GROUP BY l_partkey
    ) t ON l.l_partkey = t.pk
    WHERE l.l_quantity < t.qty_thresh
    """,
)
def q_report_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue lost to small-quantity orders — every
    lineitem below 20% of its part's average quantity. The classic
    correlated-aggregate-subquery query; the scalable form is the
    explicit self-aggregation-then-join (exactly what Catalyst
    decorrelates the subquery into).

    Scale shape: the per-part average is a map-side-combinable aggregate
    whose output is |parts| rows; its join back onto lineitem shares the
    l_partkey shuffle key, and the final result is ONE row. No per-row
    subquery execution anywhere."""
    li = load_table(spark, sf_dir, "lineitem")
    thresh = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (0.2 * F.avg("l_quantity")).alias("qty_thresh")
    )
    return (
        li.join(thresh, li.l_partkey == thresh.pk)
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(qround(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@_q(
    "q_report_big_orders",
    """
    SELECT c.c_name, o.o_orderkey, o.o_orderdate,
           floor(o.o_totalprice * 100.0 + 0.5) / 100.0 AS o_totalprice,
           floor(t.sum_qty * 100.0 + 0.5) / 100.0 AS sum_qty
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN (
      SELECT l_orderkey, sum(l_quantity) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 250
    ) t ON o.o_orderkey = t.l_orderkey
    """,
)
def q_report_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: large-volume orders — customers whose orders total
    more than 250 units. The grouped-HAVING-as-semi-filter pattern: the
    aggregate-with-threshold runs FIRST, collapsing lineitem to the few
    qualifying orderkeys, and only those join onward to orders/customer.

    Scale shape: the lineitem aggregate is map-side combinable on
    l_orderkey; the HAVING filter drops ~all groups before any join, so
    the subsequent joins are near-broadcast-sized however large the fact
    table — the optimizer ordering a naive join-first formulation would
    miss."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .select(
            "c_name",
            "o_orderkey",
            "o_orderdate",
            qround(F.col("o_totalprice"), 2).alias("o_totalprice"),
            qround(F.col("sum_qty"), 2).alias("sum_qty"),
        )
    )


@_q(
    "q_report_volume_shipping",
    """
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INT) AS l_year,
           floor((sum(l_extendedprice * (1 - l_discount))) * 100.0 + 0.5) / 100.0
               AS revenue
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q_report_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between two trading nations per year,
    split by direction. The nation pair predicate can't be applied until
    BOTH nation joins resolve, but each side's nation filter
    (n_name IN (N1, N2)) IS pushable pre-join — we filter both broadcast
    nation dims to the 2-row pair first, so the fact rows that survive the
    supplier/customer joins are already restricted to the two nations and
    the residual direction predicate drops at most half.

    Scale shape: lineitem x orders is the only real shuffle; the 2-row
    nation dims keep explicit hints; supplier and customer are unhinted
    (SF-growing) so AQE broadcasts them while they fit."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    pair = ["NATION_1", "NATION_2"]
    n1 = (
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(pair))
        .select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    )
    n2 = (
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(pair))
        .select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            qround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


@_q(
    "q_report_market_share",
    """
    SELECT l_year,
           floor((sum(CASE WHEN supp_nation = 'NATION_2' THEN volume ELSE 0.0 END)
                  / sum(volume)) * 1000000.0 + 0.5) / 1000000.0 AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS INT) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n1.n_name AS supp_nation
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      JOIN region    ON n2.n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    GROUP BY l_year
    """,
)
def q_report_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one supplier nation's share of all revenue consumed
    in a region, per year. The numerator condition (supplier nation) rides
    a conditional aggregate over the SAME joined stream as the denominator
    — one pass, no second scan, no self-join.

    Scale shape: identical join topology to Q7; the region filter prunes
    the customer-side nation dim to 5 rows before it ever touches the
    fact."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_region") == F.col("r_regionkey"))
        .groupBy(F.year("o_orderdate").cast("int").alias("l_year"))
        .agg(
            qround(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_2", vol).otherwise(F.lit(0.0))
                )
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
    )


@_q(
    "q_report_ship_priority",
    """
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_linestatus
    """,
)
def q_report_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (adapted: this schema has no l_shipmode, so the
    grouping column is l_linestatus): per line status, how many lineitems
    shipped this year belong to urgent/high-priority vs other orders.
    Two conditional counts out of one joined pass.

    Scale shape: the date window prunes lineitem at the scan; the join is
    the single orderkey equi-shuffle; output is |linestatus| rows."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
    )


@_q(
    "q_report_top_supplier",
    """
    WITH rev AS (
      SELECT l_suppkey,
             floor((sum(l_extendedprice * (1 - l_discount))) * 100.0 + 0.5) / 100.0
                 AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
)
def q_report_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum quarterly revenue —
    the aggregate-then-compare-to-scalar-max pattern (the reference SQL
    uses a view; the DataFrame form materializes the per-supplier aggregate
    once and reuses it for both the max and the equality filter).

    The comparison happens on the ROUNDED revenue (2 decimals) so the
    engine-side float summation-order ulps can't decide who wins the max.

    Scale shape: per-supplier aggregate is map-side combinable to
    |suppliers| rows; the scalar max is a 1-row broadcast; the winner set
    is tiny so AQE broadcasts it into the unhinted supplier join."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        qround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    # no .cache(): a long-lived session sweeping 185 keys would pin one
    # cached copy per invocation forever; Spark reuses the aggregate's
    # exchange across the max and filter branches anyway (ReusedExchange)
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    winners = rev.join(F.broadcast(mx), rev.total_revenue == F.col("mx")).drop("mx")
    return s.join(winners, s.s_suppkey == winners.l_suppkey).select(
        "s_suppkey", "s_name", "total_revenue"
    )


@_q(
    "q_report_part_supp_count",
    """
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q_report_part_supp_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers can deliver each
    (brand, type, size) class — the partsupp table is synthesized as the
    DISTINCT (partkey, suppkey) projection of lineitem, exactly how a
    100 TB shop derives a relationship dim from the fact.

    Scale shape: the distinct pair projection is the only fact shuffle
    (16-byte keys); part joins with its filters applied (AQE-sized — part
    grows with SF); the distinct count rides the (brand,type,size) group —
    bounded output."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    ps = li.select("l_partkey", "l_suppkey").distinct()
    return (
        ps.join(p, ps.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
    )


@_q(
    "q_report_min_cost_supplier",
    """
    WITH ps AS (
      SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    regional AS (
      SELECT ps.l_partkey, ps.l_suppkey, ps.unit_cost, s_name, n_name
      FROM ps
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    )
    SELECT p_partkey, p_name, s_name, n_name,
           floor(unit_cost * 100.0 + 0.5) / 100.0 AS unit_cost
    FROM regional
    JOIN part ON p_partkey = l_partkey
    WHERE p_size <= 10
      AND unit_cost = (SELECT min(r2.unit_cost) FROM regional r2
                       WHERE r2.l_partkey = regional.l_partkey)
    """,
)
def q_report_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each small part, the European supplier(s)
    offering it at minimum unit cost (partsupp's supplycost synthesized as
    min observed extendedprice/quantity). The correlated-min subquery
    decorrelates to a per-part min aggregate joined back on the shared
    l_partkey key.

    The min/equality pair is EXACTLY portable cross-engine: unit_cost is a
    per-row division (bit-identical in both engines) and min is
    order-insensitive, so no rounding is needed before the comparison —
    unlike sum-based thresholds.

    Scale shape: the ps synthesis is one map-side-combinable aggregate on
    (partkey, suppkey); the region filter shrinks it BEFORE the per-part
    min via hinted nation/region plus AQE-sized supplier, and the min join
    shares the partkey shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    regional = (
        ps.join(s, ps.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("l_partkey", "l_suppkey", "unit_cost", "s_name", "n_name")
    )
    min_cost = regional.groupBy(F.col("l_partkey").alias("mc_key")).agg(
        F.min("unit_cost").alias("mc")
    )
    return (
        regional.join(
            min_cost,
            (regional.l_partkey == min_cost.mc_key)
            & (regional.unit_cost == min_cost.mc),
        )
        .join(p, regional.l_partkey == p.p_partkey)
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            "n_name",
            qround(F.col("unit_cost"), 2).alias("unit_cost"),
        )
    )


@_q(
    "q_report_waiting_suppliers",
    """
    WITH late AS (
      SELECT l_orderkey, l_suppkey,
             CAST(l_shipdate > o_orderdate + INTERVAL 60 DAY AS INT) AS is_late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'
    ),
    per_order AS (
      SELECT l_orderkey,
             count(DISTINCT l_suppkey) AS n_supp,
             count(DISTINCT CASE WHEN is_late = 1 THEN l_suppkey END) AS n_late_supp,
             max(CASE WHEN is_late = 1 THEN l_suppkey END) AS late_supp
      FROM late GROUP BY l_orderkey
    )
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM per_order JOIN supplier ON late_supp = s_suppkey
    WHERE n_supp >= 2 AND n_late_supp = 1
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 10
    """,
)
def q_report_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (adapted: 'late' = shipped >60 days after order
    date): suppliers who were the SOLE late supplier on a multi-supplier
    finished order — the classic EXISTS + NOT-EXISTS pair.

    Scale shape: instead of two correlated self-joins over the fact (the
    literal SQL reading), ONE per-order aggregate computes (distinct
    suppliers, distinct late suppliers, the late supplier id) — the
    n_late_supp = 1 condition makes max() over late suppliers exact, so
    the whole EXISTS/NOT-EXISTS logic collapses into a single orderkey
    shuffle + an AQE-sized supplier join (unhinted: supplier grows with
    SF). The DuckDB oracle states the same aggregate form."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            "l_orderkey",
            "l_suppkey",
            (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
            .cast("int")
            .alias("is_late"),
        )
    )
    per_order = late.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("is_late") == 1, F.col("l_suppkey"))
        ).alias("n_late_supp"),
        F.max(F.when(F.col("is_late") == 1, F.col("l_suppkey"))).alias("late_supp"),
    )
    s = load_table(spark, sf_dir, "supplier")
    return (
        per_order.filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
        .join(s, F.col("late_supp") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(10)
    )


@_q(
    "q_report_idle_customers",
    """
    SELECT c_nationkey,
           CAST(count(*) AS BIGINT) AS numcust,
           floor((sum(c_acctbal)) * 100.0 + 0.5) / 100.0 AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT floor(avg(c_acctbal) * 100.0 + 0.5) / 100.0
                       FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '1999-06-01 00:00:00')
    GROUP BY c_nationkey
    """,
)
def q_report_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (adapted: grouping by nation instead of phone
    prefix, and 'idle' = no order in the trailing window rather than never
    — every synthetic customer has lifetime orders): wealthy customers —
    above the positive-balance average — with no recent order.
    Scalar-subquery threshold + anti-join.

    Scale shape: the threshold is a 1-row aggregate broadcast into the
    customer scan filter; the NOT EXISTS is a left-anti join on the
    custkey shuffle (orders pruned by the pushed date filter and projected
    to its join key only); the final aggregate is |nations| rows."""
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-06-01").cast("timestamp"))
        .select("o_custkey")
    )
    # rounded-scalar compare (same discipline as q_report_top_supplier):
    # the raw cross-engine avg differs by summation-order ulps, and a
    # customer inside that gap would flip the row set
    thresh = c.filter(F.col("c_acctbal") > 0.0).agg(
        qround(F.avg("c_acctbal"), 2).alias("avg_bal")
    )
    return (
        c.join(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").cast("bigint").alias("numcust"),
            qround(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@_q(
    "q_report_important_stock",
    """
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             sum(l_extendedprice * l_quantity) AS value
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE n_name IN ('NATION_3', 'NATION_7', 'NATION_11')
      GROUP BY l_partkey, l_suppkey
    )
    , pv AS (
      SELECT l_partkey, sum(value) AS part_value FROM ps GROUP BY l_partkey
    )
    SELECT l_partkey AS p_partkey,
           floor(part_value * 100.0 + 0.5) / 100.0 AS part_value
    FROM pv
    WHERE part_value > (SELECT 3.0 * avg(part_value) FROM pv)
    """,
)
def q_report_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: the parts holding an outsized share of a nation
    group's inventory value (partsupp synthesized from lineitem like
    Q2/Q16; value = price x quantity). The grouped aggregate is compared
    against a SCALAR multiple of the average part value — the
    HAVING-vs-scalar-subquery pattern. (TPC-H's literal 'fraction of the
    grand total' threshold is scale-VARIANT: a fixed 0.1% returns the
    whole table at small part counts and zero rows at large ones — 3x
    average is the same plan shape with a scale-invariant answer.)

    Portability note: the HAVING compares RAW sums on both sides of the
    inequality (not rounded) — safe here because the cross-engine ulp
    noise is relative ~1e-15 while the gap between any part's value and
    the 3x-average threshold is many orders larger; the OUTPUT value is qround'd as
    usual. (The same argument as q_having's integer counts, extended to
    a ratio test.)

    Scale shape: the ps synthesis is one map-side-combinable aggregate
    with broadcast dims; the grand total is a 1-row reuse of ps (Spark
    plans ReusedExchange); output is the surviving parts only."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_7", "NATION_11")
    )
    ps = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("value"))
    )
    pv = ps.groupBy("l_partkey").agg(F.sum("value").alias("raw_value"))
    thresh = pv.agg((F.lit(3.0) * F.avg("raw_value")).alias("thresh"))
    return (
        pv.join(F.broadcast(thresh))
        .filter(F.col("raw_value") > F.col("thresh"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            qround(F.col("raw_value"), 2).alias("part_value"),
        )
    )


@_q(
    "q_report_excess_supply",
    """
    WITH shipped AS (
      SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_partkey, l_suppkey
    ),
    part_tot AS (
      SELECT l_partkey AS pk, sum(qty) AS part_qty FROM shipped GROUP BY pk
    ),
    dominant AS (
      SELECT DISTINCT l_suppkey FROM shipped
      JOIN part_tot ON l_partkey = pk
      JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE '%red%' AND qty > 0.5 * part_qty
    )
    SELECT s_name, n_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (SELECT l_suppkey FROM dominant)
    """,
)
def q_report_excess_supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who dominate the supply of some red part
    (>50% of its shipped quantity this year) — the nested-IN-subqueries
    query (suppliers IN (partsupp-derived set) with a correlated quantity
    threshold), stated as the aggregate-join chain Catalyst decorrelates
    it into.

    The 0.5 * part_qty comparison is raw-sum vs raw-sum on the SAME
    engine's aggregates; l_quantity values are small integers stored as
    doubles, so the sums are EXACT in both engines (integer-valued
    doubles far below 2^53) and the > test cannot flip cross-engine.

    Scale shape: the shipped aggregate shares its l_partkey shuffle with
    the per-part total; part's LIKE filter is pushed to its scan and AQE
    sizes that join; the final IN is a left-semi join onto supplier."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("qty")
    )
    part_tot = shipped.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum("qty").alias("part_qty")
    )
    dominant = (
        shipped.join(part_tot, shipped.l_partkey == part_tot.pk)
        .join(p, shipped.l_partkey == p.p_partkey)
        .filter(F.col("qty") > 0.5 * F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        s.join(dominant, s.s_suppkey == dominant.l_suppkey, "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_name", "n_name")
    )


@_q(
    "q_funnel_time",
    """
    WITH v AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'purchase' AND e.ts > v.t1
      GROUP BY e.user_id
    ),
    lat AS (
      SELECT CAST(date_diff('second', v.t1, p.t3) AS DOUBLE) AS sec
      FROM v JOIN p ON v.user_id = p.user_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_converted,
           floor(quantile_cont(sec, 0.5) * 100.0 + 0.5) / 100.0 AS p50_sec,
           floor(quantile_cont(sec, 0.9) * 100.0 + 0.5) / 100.0 AS p90_sec,
           floor(avg(sec) * 100.0 + 0.5) / 100.0 AS mean_sec
    FROM lat
    """,
)
def q_funnel_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert: latency from first view to first subsequent
    purchase per user, summarized as p50/p90/mean seconds — the question
    that follows q_funnel's "how many convert?" with "how fast?".

    Latencies are exact integers on both engines: DuckDB's
    date_diff('second') counts second-boundary crossings, which equals
    Spark's floor(unix_timestamp) subtraction — so the exact percentile
    interpolation is arithmetic on identical integers, portable.

    Scale shape: two per-user MIN frontiers (map-side combinable), a
    user-keyed join, then exact percentiles over one row per converted
    user (the 100 TB swap-in is percentile_approx, q_percentile_approx's
    documented contract)."""
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    lat = v.join(p, "user_id").select(
        (
            F.unix_timestamp(F.col("t3").cast("timestamp"))
            - F.unix_timestamp(F.col("t1").cast("timestamp"))
        )
        .cast("double")
        .alias("sec")
    )
    return lat.agg(
        F.count("*").cast("bigint").alias("n_converted"),
        qround(F.percentile("sec", F.lit(0.5)), 2).alias("p50_sec"),
        qround(F.percentile("sec", F.lit(0.9)), 2).alias("p90_sec"),
        qround(F.avg("sec"), 2).alias("mean_sec"),
    )


@_q(
    "q_ship_latency",
    """
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_lineitems,
           floor(quantile_cont(CAST(date_diff('day', o_orderdate, l_shipdate)
                                    AS DOUBLE), 0.5) * 100.0 + 0.5) / 100.0
               AS p50_days,
           floor(quantile_cont(CAST(date_diff('day', o_orderdate, l_shipdate)
                                    AS DOUBLE), 0.9) * 100.0 + 0.5) / 100.0
               AS p90_days,
           floor(avg(CAST(date_diff('day', o_orderdate, l_shipdate) AS DOUBLE))
                 * 100.0 + 0.5) / 100.0 AS mean_days
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def q_ship_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency distribution per order priority (does URGENT
    actually ship faster?) — the operational-SLA readout; q_funnel_time's
    TPC-H-side sibling. Day differences are exact integers on both
    engines (date_diff('day') ≡ datediff of day-truncated timestamps),
    so the percentile interpolation is integer arithmetic.

    Scale shape: one orderkey equi-shuffle, then exact percentiles per
    priority group (|priorities| groups; percentile_approx is the
    documented 100 TB swap-in)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    days = F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).cast("double")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("bigint").alias("n_lineitems"),
            qround(F.percentile(days, F.lit(0.5)), 2).alias("p50_days"),
            qround(F.percentile(days, F.lit(0.9)), 2).alias("p90_days"),
            qround(F.avg(days), 2).alias("mean_days"),
        )
    )


@_q(
    "q_cohort_ltv",
    """
    WITH f AS (
      SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cw
      FROM events GROUP BY user_id
    ),
    spend AS (
      SELECT e.user_id, CAST(date_trunc('week', e.ts) AS DATE) AS aw,
             sum(e.value) AS wk_value
      FROM events e
      WHERE e.event_type = 'purchase'
      GROUP BY e.user_id, aw
    )
    SELECT f.cw AS cohort_week,
           CAST(date_diff('day', f.cw, spend.aw) / 7 AS INT) AS week_offset,
           CAST(count(DISTINCT spend.user_id) AS BIGINT) AS n_buyers,
           floor((sum(wk_value)) * 10000.0 + 0.5) / 10000.0 AS cohort_revenue
    FROM spend JOIN f ON spend.user_id = f.user_id
    GROUP BY cohort_week, week_offset
    """,
)
def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime value: purchase revenue per (acquisition week,
    weeks-since-acquisition) — q_retention's presence matrix upgraded to
    the money view (the LTV curve marketing actually plots).

    Scale shape: identical to q_retention — per-user/per-week aggregates
    BEFORE the join, so shuffles carry O(users x active weeks) rows,
    never raw events; integer week offsets from day-differences of
    week-truncated dates."""
    ev = load_table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cw")
    )
    spend = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(
            "user_id", F.date_trunc("week", "ts").cast("date").alias("aw")
        )
        .agg(F.sum("value").alias("wk_value"))
    )
    return (
        spend.join(first, "user_id")
        .groupBy(
            F.col("cw").alias("cohort_week"),
            (F.datediff("aw", "cw") / 7).cast("int").alias("week_offset"),
        )
        .agg(
            F.countDistinct("user_id").cast("bigint").alias("n_buyers"),
            qround(F.sum("wk_value"), 4).alias("cohort_revenue"),
        )
    )


@_q(
    "q_top_movers",
    """
    WITH monthly AS (
      SELECT n_name, CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
             sum(o_totalprice) AS rev
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      GROUP BY n_name, m
    ),
    delta AS (
      SELECT n_name, m, rev,
             lag(rev) OVER (PARTITION BY n_name ORDER BY m) AS prev_rev
      FROM monthly
    )
    SELECT n_name, m,
           floor(rev * 100.0 + 0.5) / 100.0 AS revenue,
           floor((rev - prev_rev) * 100.0 + 0.5) / 100.0 AS delta,
           floor(abs(rev - prev_rev) * 100.0 + 0.5) / 100.0 AS abs_delta
    FROM delta
    WHERE prev_rev IS NOT NULL
    ORDER BY floor(abs(rev - prev_rev) * 100.0 + 0.5) / 100.0 DESC,
             n_name, m
    LIMIT 10
    """,
)
def q_top_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month top movers: the ten biggest absolute revenue
    swings across (nation, month) — the anomaly-surfacing report every
    revenue dashboard leads with. Consecutive-month deltas come from a
    lag window over the AGGREGATED (nation, month) table.

    The ordered limit ranks by the ROUNDED absolute delta with a unique
    (n_name, m) tiebreak, so cross-engine sum ulps can't reorder the
    boundary (the q_cusum argmax contract applied to a top-k).

    Scale shape: one fact aggregate to |nations| x |months| rows; the
    window and TakeOrdered run on that bounded table."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    monthly = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            "n_name", F.date_trunc("month", "o_orderdate").cast("date").alias("m")
        )
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("n_name").orderBy("m")
    delta = monthly.withColumn("prev_rev", F.lag("rev").over(w)).filter(
        F.col("prev_rev").isNotNull()
    )
    abs_delta = qround(F.abs(F.col("rev") - F.col("prev_rev")), 2)
    return (
        delta.select(
            "n_name",
            "m",
            qround(F.col("rev"), 2).alias("revenue"),
            qround(F.col("rev") - F.col("prev_rev"), 2).alias("delta"),
            abs_delta.alias("abs_delta"),
        )
        .orderBy(F.col("abs_delta").desc(), "n_name", "m")
        .limit(10)
    )


@_q(
    "q_price_index",
    """
    WITH b AS (
      SELECT floor((min(epoch_us(l_shipdate))
                    + max(epoch_us(l_shipdate))) / 2.0) AS mid
      FROM lineitem
    ),
    p0 AS (
      SELECT l_partkey,
             sum(l_extendedprice) / sum(l_quantity) AS p,
             sum(l_quantity) AS q
      FROM lineitem, b WHERE epoch_us(l_shipdate) < b.mid
      GROUP BY l_partkey
    ),
    p1 AS (
      SELECT l_partkey,
             sum(l_extendedprice) / sum(l_quantity) AS p
      FROM lineitem, b WHERE epoch_us(l_shipdate) >= b.mid
      GROUP BY l_partkey
    )
    SELECT CAST(count(*) AS BIGINT) AS n_parts,
           floor(sum(p1.p * p0.q) / sum(p0.p * p0.q) * 1000000.0 + 0.5)
               / 1000000.0 AS laspeyres_index
    FROM p0 JOIN p1 USING (l_partkey)
    """,
)
def q_price_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laspeyres fixed-basket price index between the first and second
    half of the shipping timeline: Σp₁q₀ / Σp₀q₀ over parts traded in
    BOTH periods, with the base period's quantities as the basket — the
    inflation-measurement shape (CPI) applied to the order book; >1 means
    unit prices rose holding the mix constant (a plain revenue ratio
    confounds price with volume).

    The split point is exact integer-microsecond arithmetic (the
    q_drift_psi midpoint); unit prices are quantity-weighted averages
    per part-period. One quantized ratio at the end.

    Scale shape: two part-keyed map-side-combined aggregates and one
    part-keyed join — no window, no driver state; the basket join is
    AQE-sized."""
    li = load_table(spark, sf_dir, "lineitem")
    mid = li.agg(
        F.floor(
            (
                F.min(F.unix_micros(F.col("l_shipdate").cast("timestamp")))
                + F.max(F.unix_micros(F.col("l_shipdate").cast("timestamp")))
            )
            / 2.0
        ).alias("mid")
    )
    us = F.unix_micros(F.col("l_shipdate").cast("timestamp"))
    w = li.crossJoin(F.broadcast(mid)).withColumn("us", us)
    p0 = (
        w.filter(F.col("us") < F.col("mid"))
        .groupBy("l_partkey")
        .agg(
            (F.sum("l_extendedprice") / F.sum("l_quantity")).alias("p0"),
            F.sum("l_quantity").alias("q0"),
        )
    )
    p1 = (
        w.filter(F.col("us") >= F.col("mid"))
        .groupBy("l_partkey")
        .agg((F.sum("l_extendedprice") / F.sum("l_quantity")).alias("p1"))
    )
    return p0.join(p1, "l_partkey").agg(
        F.count("*").cast("bigint").alias("n_parts"),
        qround(
            F.sum(F.col("p1") * F.col("q0")) / F.sum(F.col("p0") * F.col("q0")),
            6,
        ).alias("laspeyres_index"),
    )


@_q(
    "q_catalog_coverage",
    """
    WITH sold AS (
      SELECT l_partkey, count(*) AS n_lines FROM lineitem GROUP BY l_partkey
    ),
    j AS (
      SELECT p.p_partkey, COALESCE(s.n_lines, 0) AS n_lines
      FROM part p LEFT JOIN sold s ON p.p_partkey = s.l_partkey
    )
    SELECT CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(CASE WHEN n_lines = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_never_sold,
           floor(sum(CASE WHEN n_lines = 0 THEN 1.0 ELSE 0.0 END)
                 * 1000000.0 / count(*) + 0.5) / 1000000.0 AS dead_stock_frac,
           CAST(max(n_lines) AS BIGINT) AS max_lines,
           floor(avg(n_lines) * 10000.0 + 0.5) / 10000.0 AS mean_lines
    FROM j
    """,
)
def q_catalog_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog-coverage readout: how much of the part catalog the order
    book actually touches — never-sold count and fraction (dead stock),
    plus the demand ceiling and mean — the assortment health check whose
    training-data twin is vocabulary coverage (q_oov_rate): both ask
    "does the observed stream exercise the full universe?". The LEFT
    join from the dimension keeps zero-demand parts in the denominator —
    an inner join silently overstates coverage (the q_km_survival
    censoring lesson applied to catalogs).

    One fact-side count, one dimension left join (AQE-sized), one global
    aggregate; integer counts with two quantized summaries."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    sold = li.groupBy("l_partkey").agg(F.count("*").alias("n_lines"))
    j = p.join(sold, p.p_partkey == sold.l_partkey, "left").select(
        F.coalesce(F.col("n_lines"), F.lit(0)).alias("n_lines")
    )
    return j.agg(
        F.count("*").cast("bigint").alias("n_parts"),
        F.sum((F.col("n_lines") == 0).cast("int")).cast("bigint").alias(
            "n_never_sold"
        ),
        (
            F.floor(
                F.sum((F.col("n_lines") == 0).cast("double"))
                * 1000000.0
                / F.count("*")
                + F.lit(0.5)
            )
            / 1000000.0
        ).alias("dead_stock_frac"),
        F.max("n_lines").cast("bigint").alias("max_lines"),
        qround(F.avg("n_lines"), 4).alias("mean_lines"),
    )


@_q(
    "q_abc_classification",
    """
    WITH rev AS (
      SELECT l_partkey,
             floor(sum(l_extendedprice) * 100.0 + 0.5) / 100.0 AS rev
      FROM lineitem GROUP BY l_partkey
    ),
    c AS (
      SELECT rev,
             sum(rev) OVER (ORDER BY rev DESC, l_partkey
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum,
             sum(rev) OVER () AS tot
      FROM rev
    ),
    cls AS (
      SELECT rev,
             CASE WHEN cum <= 0.80 * tot THEN 'A'
                  WHEN cum <= 0.95 * tot THEN 'B'
                  ELSE 'C' END AS abc
      FROM c
    )
    SELECT abc, CAST(count(*) AS BIGINT) AS n_parts,
           floor(sum(rev) * 100.0 + 0.5) / 100.0 AS revenue,
           floor(sum(rev) / max(t.tot) * 1000000.0 + 0.5) / 1000000.0
               AS revenue_share
    FROM cls CROSS JOIN (SELECT sum(rev) AS tot FROM rev) t
    GROUP BY abc
    """,
)
def q_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC classification of the part catalog by revenue: parts sorted by
    descending (cents-quantized) revenue, class A while the running share
    stays ≤80%, B to 95%, C after — the operational cut that q_pareto_8020
    summarizes as a head-count and q_gini as an index; this one assigns
    every part its service tier.

    Quantize-then-rank on exact sums; the cumulative window runs over the
    part-level table (catalog-bounded — and the q_shard_plan two-pass
    block cumsum is the swap if a catalog ever outgrew a task). 3-row
    output with exact counts and quantized shares."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        qround(F.sum("l_extendedprice"), 2).alias("rev")
    )
    wc = Window.orderBy(F.col("rev").desc(), "l_partkey").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy()
    c = rev.select(
        "rev",
        F.sum("rev").over(wc).alias("cum"),
        F.sum("rev").over(wall).alias("tot"),
    )
    abc = (
        F.when(F.col("cum") <= 0.80 * F.col("tot"), F.lit("A"))
        .when(F.col("cum") <= 0.95 * F.col("tot"), F.lit("B"))
        .otherwise(F.lit("C"))
    )
    return c.select("rev", "tot", abc.alias("abc")).groupBy("abc").agg(
        F.count("*").cast("bigint").alias("n_parts"),
        qround(F.sum("rev"), 2).alias("revenue"),
        (
            F.floor(F.sum("rev") / F.max("tot") * 1000000.0 + F.lit(0.5))
            / 1000000.0
        ).alias("revenue_share"),
    )


FUNNEL_WINDOW_HOURS = 2


@_q(
    "q_window_funnel",
    f"""
    WITH v AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t1
        AND e.ts <= v.t1 + INTERVAL {FUNNEL_WINDOW_HOURS} HOUR
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e
      JOIN c ON e.user_id = c.user_id
      JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t2
        AND e.ts <= v.t1 + INTERVAL {FUNNEL_WINDOW_HOURS} HOUR
      GROUP BY e.user_id
    )
    SELECT v.user_id,
           CAST(1 + (CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END)
                  + (CASE WHEN p.user_id IS NULL THEN 0 ELSE 1 END) AS INT)
               AS funnel_level
    FROM v LEFT JOIN c ON v.user_id = c.user_id
           LEFT JOIN p ON v.user_id = p.user_id
    """,
)
def q_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-boxed event funnel — the windowFunnel aggregate ClickHouse
    users run for conversion analysis (the reference's target engine;
    public semantics: the longest ordered prefix of view → click →
    purchase completed inside a sliding window). This is the
    deterministic anchored variant: the window opens at the user's FIRST
    view (t1 = min view ts) and every later stage must land in
    (prev_stage_ts, t1 + {FUNNEL_WINDOW_HOURS}h] — unlike q_funnel, a
    click next week no longer counts, which is the difference between
    measuring a conversion FUNNEL and measuring eventual conversion.
    Anchoring at the first view keeps the op a chain of per-user MIN
    aggregates (exactly oracle-expressible); ClickHouse's restartable
    scan can assign a higher level when a later view opens a better
    window — documented, not replicated, because it needs a per-user
    sequential pass.

    Scale shape identical to q_funnel: each stage is a type-pruned event
    scan joined to the previous stage's one-row-per-user frontier, so
    shuffles carry user-frontier rows, never raw event lists; no window
    function, no per-user sort. Timestamp arithmetic is exact integer
    microseconds on both engines."""
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    deadline = F.col("t1") + F.expr(f"INTERVAL {FUNNEL_WINDOW_HOURS} HOURS")
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter((F.col("ts") > F.col("t1")) & (F.col("ts") <= deadline))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"), F.min("t1").alias("t1c"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("ts") > F.col("t2"))
            & (
                F.col("ts")
                <= F.col("t1c") + F.expr(f"INTERVAL {FUNNEL_WINDOW_HOURS} HOURS")
            )
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        v.select("user_id")
        .join(c.select("user_id", F.lit(1).alias("hc")), "user_id", "left")
        .join(p.select("user_id", F.lit(1).alias("hp")), "user_id", "left")
        .select(
            "user_id",
            (1 + F.coalesce("hc", F.lit(0)) + F.coalesce("hp", F.lit(0)))
            .cast("int")
            .alias("funnel_level"),
        )
    )


@_q(
    "q_dataset_card",
    """
    WITH base AS (
      SELECT source, lang, n_chars, md5(text) AS dg FROM documents
    ),
    lc AS (SELECT source, lang, count(*) AS c FROM base GROUP BY 1, 2),
    top AS (
      SELECT source, lang AS top_lang FROM (
        SELECT source, lang,
               row_number() OVER (PARTITION BY source
                                  ORDER BY c DESC, lang) AS rn
        FROM lc
      ) WHERE rn = 1
    )
    SELECT base.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           max(top.top_lang) AS top_lang,
           floor((1.0 - count(DISTINCT dg) * 1.0 / count(*))
                 * 1000000.0 + 0.5) / 1000000.0 AS dup_rate,
           floor(avg(n_chars) * 1000000.0 + 0.5) / 1000000.0 AS mean_chars
    FROM base JOIN top ON base.source = top.source
    GROUP BY base.source
    """,
)
def q_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dataset card: the one-row-per-source summary a data
    curator reads before mixing sources into a training run — volume
    (docs, chars), language spread (count + dominant language with a
    deterministic (count desc, lang) tiebreak), exact-duplicate rate
    (md5 digests, the q_dedup_exact key) and mean document length. The
    composite exists because no single upstream query answers "which
    source do I cap" — this is the join of those answers, emitted as one
    auditable artifact (datasheets-for-datasets, Gebru 2018).

    Scale shape: one fact scan feeding map-side-combined aggregates; the
    dominant-language pick windows the source×lang count table
    (vocabulary-bounded); digests, never text, flow into the distinct."""
    d = load_table(spark, sf_dir, "documents")
    base = d.select(
        "source", "lang", "n_chars", F.md5(F.col("text").cast("binary")).alias("dg")
    )
    lc = base.groupBy("source", "lang").agg(F.count("*").alias("c"))
    wtop = Window.partitionBy("source").orderBy(F.col("c").desc(), "lang")
    top = (
        lc.withColumn("rn", F.row_number().over(wtop))
        .filter(F.col("rn") == 1)
        .select("source", F.col("lang").alias("top_lang"))
    )
    return (
        base.join(F.broadcast(top), "source")
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.countDistinct("lang").cast("bigint").alias("n_langs"),
            F.max("top_lang").alias("top_lang"),
            (
                F.floor(
                    (1.0 - F.countDistinct("dg") * 1.0 / F.count("*"))
                    * 1000000.0
                    + F.lit(0.5)
                )
                / 1000000.0
            ).alias("dup_rate"),
            qround(F.avg("n_chars"), 6).alias("mean_chars"),
        )
    )
