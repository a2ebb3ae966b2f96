"""Scans, filters and the join family.

Every query is declarative DataFrame API — Catalyst handles predicate
pushdown, column pruning and join-strategy selection; AQE re-plans at
runtime. Scale annotations per query explain why the plan survives 100 TB.

DuckDB oracle twins live in ORACLES (same column names, same aliases —
the driver's compare hashes values under sorted column names).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parquet_to_clickhouse_schema_spark._registry import new_registry
from parquet_to_clickhouse_schema_spark.functions.compat import qround
from parquet_to_clickhouse_schema_spark.sources.io import load_table

QUERIES, ORACLES, _q = new_registry()


# ---------------------------------------------------------------- scans ----


@_q(
    "q_scan_project",
    """
    SELECT l_orderkey, l_linenumber, l_partkey, l_extendedprice
    FROM lineitem
    """,
)
def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-pruning scan: ReadSchema must contain exactly these 4 columns
    (verify with .explain('formatted')) — at 100 TB reading 4 of 11 columns
    is a ~2.5x I/O saving before any compute."""
    return load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_extendedprice"
    )


@_q(
    "q_filter_pred",
    """
    SELECT * FROM part
    WHERE p_size BETWEEN 10 AND 30
      AND p_type IN ('ECONOMY', 'SMALL')
      AND (p_name LIKE '%re%' OR p_retailprice > 1050.0)
      AND p_brand IS NOT NULL
    """,
)
def q_filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive/disjunctive predicates + BETWEEN + IN + LIKE + IS NOT NULL.
    All of these are pushed to the Parquet scan (PushedFilters) except the
    OR-of-LIKE, which Spark evaluates post-scan inside codegen."""
    p = load_table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_size").between(10, 30)
        & F.col("p_type").isin("ECONOMY", "SMALL")
        & (F.col("p_name").like("%re%") | (F.col("p_retailprice") > 1050.0))
        & F.col("p_brand").isNotNull()
    )


# ---------------------------------------------------------------- joins ----


@_q(
    "q_join_broadcast",
    """
    SELECT l_orderkey, l_linenumber, p_brand, p_type,
           floor((l_extendedprice * (1 - l_discount)) * 100.0 + 0.5) / 100.0 AS net_price
    FROM lineitem JOIN part ON l_partkey = p_partkey
    """,
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast hash equi-join: `part` is a dimension table (0.003% of
    lineitem at scale) — broadcasting it removes the shuffle of the 100 TB
    fact side entirely. The explicit broadcast() hint makes the plan
    independent of autoBroadcastJoinThreshold."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    return li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        "l_orderkey",
        "l_linenumber",
        "p_brand",
        "p_type",
        qround(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias("net_price"),
    )


@_q(
    "q_join_sortmerge",
    """
    SELECT l_orderkey, l_linenumber, o_custkey, o_orderstatus, l_quantity
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    """,
)
def q_join_sortmerge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact equi-join: at 100 TB neither side broadcasts, so the right
    plan is a shuffle on the join key + sort-merge. The merge hint pins
    that strategy (at test SF the optimizer would otherwise broadcast)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").hint("merge")
    return li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_linenumber", "o_custkey", "o_orderstatus", "l_quantity"
    )


@_q(
    "q_join_multiway",
    """
    SELECT r_name, n_name,
           CAST(count(*) AS BIGINT) AS n_items,
           floor((sum(l_extendedprice * (1 - l_discount))) * 100.0 + 0.5) / 100.0 AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def q_join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-way star join. nation/region are fixed-cardinality (25/5 rows at
    every scale factor) so their broadcast hints are always safe. customer
    grows linearly with SF — at 100 TB it's billions of rows, so no forced
    hint: AQE broadcasts it when its runtime size is under the threshold and
    falls back to shuffle/sort-merge gracefully when it isn't. Catalyst's
    join reordering keeps the fact table on the streaming side throughout."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_items"),
            qround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
        )
    )


@_q(
    "q_join_left",
    """
    SELECT c_custkey,
           CAST(count(o_orderkey) AS BIGINT) AS n_orders,
           floor((coalesce(sum(o_totalprice), 0)) * 100.0 + 0.5) / 100.0 AS total_spent
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join with null extension — customers with zero orders
    survive with n_orders=0. count(col) skips nulls on both engines."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            qround(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spent"),
        )
    )


@_q(
    "q_join_full",
    """
    WITH a AS (
      SELECT o_custkey, sum(o_totalprice) AS s
      FROM orders WHERE year(o_orderdate) = 1997 GROUP BY o_custkey
    ),
    b AS (
      SELECT o_custkey, sum(o_totalprice) AS s
      FROM orders WHERE year(o_orderdate) = 1998 GROUP BY o_custkey
    )
    SELECT coalesce(a.o_custkey, b.o_custkey) AS custkey,
           floor((coalesce(a.s, 0)) * 100.0 + 0.5) / 100.0 AS spend_1997,
           floor((coalesce(b.s, 0)) * 100.0 + 0.5) / 100.0 AS spend_1998,
           CASE WHEN a.o_custkey IS NULL THEN 'new'
                WHEN b.o_custkey IS NULL THEN 'churned'
                ELSE 'retained' END AS cohort
    FROM a FULL OUTER JOIN b ON a.o_custkey = b.o_custkey
    """,
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join with null extension on BOTH sides: year-over-year
    spend with new/churned/retained cohorts — customers active in only one
    period survive from either side. Full outer cannot broadcast (both
    sides must see all unmatched keys), so it always plans as a shuffle
    join on the key; both inputs here are already aggregated, so the
    shuffled rows are O(customers), not O(orders)."""
    o = load_table(spark, sf_dir, "orders")

    def spend(year: int) -> DataFrame:
        return (
            o.filter(F.year("o_orderdate") == year)
            .groupBy("o_custkey")
            .agg(F.sum("o_totalprice").alias("s"))
        )

    a = spend(1997).select(F.col("o_custkey").alias("ck_a"), F.col("s").alias("s_a"))
    b = spend(1998).select(F.col("o_custkey").alias("ck_b"), F.col("s").alias("s_b"))
    return a.join(b, a.ck_a == b.ck_b, "full_outer").select(
        F.coalesce("ck_a", "ck_b").alias("custkey"),
        qround(F.coalesce(F.col("s_a"), F.lit(0.0)), 2).alias("spend_1997"),
        qround(F.coalesce(F.col("s_b"), F.lit(0.0)), 2).alias("spend_1998"),
        F.when(F.col("ck_a").isNull(), "new")
        .when(F.col("ck_b").isNull(), "churned")
        .otherwise("retained")
        .alias("cohort"),
    )


@_q(
    "q_join_semi",
    """
    SELECT * FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o.o_orderkey AND l_quantity > 45)
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Existence test as left-semi join: no duplication of the left side,
    and the right side is reduced to its join key before shuffling."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")


@_q(
    "q_join_anti",
    """
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o.o_orderkey AND l_quantity > 45)
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negated existence as left-anti join (NOT EXISTS, not NOT IN — keys
    here are non-null so the semantics coincide, but anti-join is the
    null-safe primitive): orders with no high-quantity line item."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return o.join(li, o.o_orderkey == li.l_orderkey, "left_anti").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


@_q(
    "q_join_range",
    """
    SELECT p_partkey, band
    FROM part
    JOIN (VALUES ('low', 900.0, 1000.0),
                 ('mid', 1000.0, 1060.0),
                 ('high', 1060.0, 1200.0)) AS b(band, lo, hi)
      ON p_retailprice >= lo AND p_retailprice < hi
    """,
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/range join (price-band lookup). The band table is tiny, so the
    right plan is BroadcastNestedLoopJoin — O(n * bands) with no shuffle of
    the big side. For a large range table the scale path is bucketizing the
    range key and equi-joining on bucket id (same trick as q_join_asof)."""
    p = load_table(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [("low", 900.0, 1000.0), ("mid", 1000.0, 1060.0), ("high", 1060.0, 1200.0)],
        "band string, lo double, hi double",
    )
    return p.join(
        F.broadcast(bands),
        (p.p_retailprice >= bands.lo) & (p.p_retailprice < bands.hi),
    ).select("p_partkey", "band")


@_q(
    "q_join_asof",
    """
    SELECT event_id, user_id, ts, asof_click_ts, asof_click_id
    FROM (
      SELECT p.event_id, p.user_id, p.ts,
             c.ts AS asof_click_ts, c.event_id AS asof_click_id,
             row_number() OVER (PARTITION BY p.event_id
                                ORDER BY c.ts DESC NULLS LAST,
                                         c.event_id DESC NULLS LAST) AS rn
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        ON c.user_id = p.user_id AND c.ts <= p.ts
    ) WHERE rn = 1
    """,
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for every purchase, the latest preceding click of the
    same user (ties broken by highest event_id).

    Spark has no native ASOF JOIN; the scalable implementation is the
    union-and-carry-forward pattern: union both streams, sort within user
    partitions by time, and carry the last click forward with
    last(..., ignorenulls) over an unbounded-preceding frame. This is a
    single shuffle on user_id + one sort — O(n log n), no join explosion —
    exactly the plan a dedicated time-series engine would run, and it
    scales to 100 TB because state per partition is one row.
    (The DuckDB oracle uses the equivalent join+row_number formulation.)
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    is_purchase = (F.col("event_type") == "purchase").cast("int")
    tagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        is_purchase.alias("is_p"),
        F.when(F.col("event_type") == "click", F.col("ts")).alias("click_ts"),
        F.when(F.col("event_type") == "click", F.col("event_id")).alias("click_id"),
    )
    # clicks sort before purchases at equal ts (is_p asc) so an equal-ts
    # click is visible to the purchase, matching the oracle's c.ts <= p.ts.
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("is_p").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.withColumn("asof_click_ts", F.last("click_ts", ignorenulls=True).over(w))
        .withColumn("asof_click_id", F.last("click_id", ignorenulls=True).over(w))
        .filter(F.col("is_p") == 1)
        .select("event_id", "user_id", "ts", "asof_click_ts", "asof_click_id")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    direction: str = "backward",
    tolerance: float | None = None,
    right_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """General as-of join (pandas merge_asof semantics, distributed): for
    every left row, the nearest right row of the same `by` key at or
    before (`backward`) / at or after (`forward`) the left row's `on`
    value, optionally rejected when further than `tolerance` away.

    Generalizes q_join_asof's union-and-carry-forward plan: union both
    sides, ONE shuffle on `by`, one in-partition sort on (`on`, side),
    and a single last(ignorenulls) carrying a struct of the right row's
    payload — never a join explosion, state per partition is one struct.
    `forward` runs the same plan on a descending sort. `tolerance` is in
    the column's native units (epoch seconds for timestamps — both sides
    are cast to double for the distance test only, which is
    value-preserving in a UTC session).

    At 100 TB this is the time-series enrichment primitive (trades⋈quotes,
    purchases⋈clicks, sensor⋈calibration): the alternative range-join
    explodes on dense right sides; this plan's cost is one sort-shuffle
    regardless of match density.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    reserved = {"__is_left", "__p", "__m", "__on"}
    clash = reserved & (set(left.columns) | set(right.columns))
    if clash:
        raise ValueError(f"asof_join reserves column names {sorted(clash)}")
    right_cols = right_cols or [c for c in right.columns if c not in (on, by)]
    payload = F.struct(
        F.col(on).alias("__on"), *[F.col(c) for c in right_cols]
    )
    l_tagged = left.withColumn("__is_left", F.lit(1)).withColumn(
        "__p", F.lit(None).cast(right.select(payload).schema[0].dataType)
    )
    r_tagged = (
        right.select(by, on, payload.alias("__p"))
        .withColumn("__is_left", F.lit(0))
    )
    cols = [by, on, "__is_left", "__p"]
    extra = [c for c in left.columns if c not in (by, on)]
    unioned = l_tagged.select(*cols, *extra).unionByName(
        r_tagged.select(*cols).withColumns(
            {c: F.lit(None).cast(left.schema[c].dataType) for c in extra}
        )
    )
    order = F.col(on).asc() if direction == "backward" else F.col(on).desc()
    # right rows sort before left rows at equal `on` -> inclusive match
    w = (
        Window.partitionBy(by)
        .orderBy(order, F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "__m", F.last("__p", ignorenulls=True).over(w)
    ).filter(F.col("__is_left") == 1)
    if tolerance is not None:
        dist = F.abs(
            F.col(on).cast("double") - F.col("__m.__on").cast("double")
        )
        carried = carried.withColumn(
            "__m", F.when(dist <= F.lit(float(tolerance)), F.col("__m"))
        )
    out_cols = [by, on, *extra]
    matched = [F.col("__m.__on").alias(f"{on}{suffix}")] + [
        F.col(f"__m.{c}").alias(c if c not in left.columns else f"{c}{suffix}")
        for c in right_cols
    ]
    return carried.select(*out_cols, *matched)


@_q(
    "q_join_pit",
    """
    WITH hist AS (
      SELECT o_custkey, o_orderkey, o_orderpriority,
             o_orderdate AS valid_from,
             lead(o_orderdate) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey)
               AS valid_to
      FROM orders
    ),
    probe AS (
      SELECT l.l_shipdate AS p_ts, o.o_custkey AS custkey
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT h.o_orderpriority AS priority_at_ship,
           CAST(count(*) AS BIGINT) AS n_shipments
    FROM probe p
    JOIN hist h
      ON h.o_custkey = p.custkey
     AND h.valid_from <= p.p_ts
     AND (h.valid_to IS NULL OR p.p_ts < h.valid_to)
    GROUP BY 1
    """,
)
def q_join_pit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (validity-interval) dimension join — the temporal
    lookup q_join_asof's nearest-key form can't express: each customer's
    order stream becomes an SCD2-style version history (valid_from =
    orderdate, valid_to = next orderdate via lead; same-date versions get
    empty intervals and correctly never match), and every shipment probes
    the version CURRENT at its ship date. Reported as shipments per
    at-ship-time order priority — "what did the dimension say when the
    fact happened", the question every ML feature-backfill and financial
    restatement asks (training-set leakage prevention: never join
    tomorrow's dimension onto today's fact).

    Scale shape: the interval join is an EQUI-join on custkey with the
    range as a residual filter — each probe row meets only its own
    customer's versions (bounded per-key history), never a BNLJ; the
    version build is one per-customer lead window (millions of small
    partitions). Exact date arithmetic; counts only — nothing to
    quantize."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    hist = o.select(
        "o_custkey",
        "o_orderpriority",
        F.col("o_orderdate").alias("valid_from"),
        F.lead("o_orderdate").over(w).alias("valid_to"),
    )
    probe = li.join(o.select("o_orderkey", "o_custkey"), li.l_orderkey == o.o_orderkey).select(
        F.col("l_shipdate").alias("p_ts"), F.col("o_custkey").alias("custkey")
    )
    j = probe.join(
        hist,
        (hist.o_custkey == probe.custkey)
        & (hist.valid_from <= probe.p_ts)
        & (hist.valid_to.isNull() | (probe.p_ts < hist.valid_to)),
    )
    return j.groupBy(
        F.col("o_orderpriority").alias("priority_at_ship")
    ).agg(F.count("*").cast("bigint").alias("n_shipments"))


# ------------------------------------------------------- bloom pruning ----

BLOOM_BITS_PER_KEY = 6  # m = 6 * |dim keys| (scale-invariant FPR ~0.08)
BLOOM_K = 2  # hash functions; pass = all K slot positions set


@_q(
    "q_bloom_prune",
    f"""
    WITH dim AS (
      SELECT DISTINCT s_suppkey FROM supplier WHERE s_nationkey % 5 = 2
    ),
    dm AS (
      SELECT CAST(count(*) AS BIGINT) AS n_dim,
             CAST(count(*) * {BLOOM_BITS_PER_KEY} AS BIGINT) AS m
      FROM dim
    ),
    slots AS (SELECT unnest(range(0, {BLOOM_K})) AS slot),
    pos AS (
      SELECT DISTINCT
             CAST('0x' || substr(md5(CAST(slot AS VARCHAR) || ':'
                                     || CAST(s_suppkey AS VARCHAR)),
                                 1, 15) AS BIGINT) % m AS p
      FROM dim CROSS JOIN slots CROSS JOIN dm
    ),
    factk AS (
      SELECT l_suppkey, CAST(count(*) AS BIGINT) AS nrows
      FROM lineitem GROUP BY l_suppkey
    ),
    fk AS (
      SELECT f.l_suppkey, f.nrows,
             CAST('0x' || substr(md5(CAST(s.slot AS VARCHAR) || ':'
                                     || CAST(f.l_suppkey AS VARCHAR)),
                                 1, 15) AS BIGINT) % dm.m AS p
      FROM factk f CROSS JOIN slots s CROSS JOIN dm
    ),
    hit AS (
      SELECT fk.l_suppkey, max(fk.nrows) AS nrows,
             sum(CASE WHEN pos.p IS NOT NULL THEN 1 ELSE 0 END) AS nh
      FROM fk LEFT JOIN pos ON fk.p = pos.p
      GROUP BY fk.l_suppkey
    ),
    lab AS (
      SELECT h.l_suppkey, h.nrows, h.nh,
             CASE WHEN d.s_suppkey IS NOT NULL THEN 1 ELSE 0 END AS member
      FROM hit h LEFT JOIN dim d ON d.s_suppkey = h.l_suppkey
    )
    SELECT dm.n_dim AS n_dim_keys, dm.m AS m_bits,
           (SELECT CAST(count(*) AS BIGINT) FROM pos) AS n_bits_set,
           CAST(count(*) AS BIGINT) AS n_fact_keys,
           CAST(sum(member) AS BIGINT) AS n_member_keys,
           CAST(sum(CASE WHEN nh = {BLOOM_K} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_pass_keys,
           CAST(sum(CASE WHEN member = 1 AND nh < {BLOOM_K} THEN 1 ELSE 0
                    END) AS BIGINT) AS n_false_neg_keys,
           CAST(sum(CASE WHEN member = 0 AND nh = {BLOOM_K} THEN 1 ELSE 0
                    END) AS BIGINT) AS n_false_pos_keys,
           floor(sum(CASE WHEN member = 0 AND nh = {BLOOM_K} THEN 1 ELSE 0
                     END) * 1.0
                 / greatest(sum(1 - member), 1) * 1000000.0 + 0.5)
               / 1000000.0 AS fpr,
           CAST(sum(CASE WHEN nh = {BLOOM_K} THEN nrows ELSE 0 END)
                AS BIGINT) AS rows_kept,
           CAST(sum(CASE WHEN nh < {BLOOM_K} THEN nrows ELSE 0 END)
                AS BIGINT) AS rows_pruned
    FROM lab CROSS JOIN dm
    GROUP BY dm.n_dim, dm.m
    """,
)
def q_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-pruned join, hash-gated end-to-end (r15): the runtime-filter
    mechanism (Spark's spark.sql.optimizer.runtime.bloomFilter /
    ClickHouse's bloom_filter index) made EXPLICIT with md5-derived hash
    slots so DuckDB rebuilds the identical bit set — the
    q_ann_verified_topk gate move applied to join pruning, and the
    mechanism companion to q_bloom_fpr_plan's sizing table.

    A dim-side key set (suppliers of a nation slice) populates an
    m = {BLOOM_BITS_PER_KEY}·n bit Bloom filter via {BLOOM_K} md5 slot
    hashes; every fact key (lineitem.l_suppkey) passes iff ALL {BLOOM_K}
    of its positions are set. On the single output row: the filter's
    actual geometry (m, bits set), the pass/member partition of the fact
    keys, the NO-FALSE-NEGATIVE proof (n_false_neg_keys, pinned 0 by the
    oracle hash AND the smoke test — a member failing the filter would
    mean the pruned join lost rows), the measured false-positive rate
    (~(1-e^(-K/bits_per_key))^K ≈ 0.08, scale-invariant because m grows
    with n), and the fact-row I/O split (rows_kept/rows_pruned) the
    filter would save before the shuffle.

    100 TB shape: the bit set is broadcast-sized (≤ m entries ~ 6 bits/
    dim key regardless of fact size) and the fact side is filtered
    BEFORE the join shuffle — the whole point: rows_pruned rows never
    enter the exchange; the per-key work is one groupBy on the join key
    (already the join's shuffle key) plus a {BLOOM_K}-row explode of the
    DISTINCT keys only, never of fact rows."""
    sup = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    dim = (
        sup.filter((F.col("s_nationkey") % 5) == 2)
        .select("s_suppkey")
        .distinct()
    )
    dm = dim.agg(
        F.count("*").cast("bigint").alias("n_dim"),
        (F.count("*") * BLOOM_BITS_PER_KEY).cast("bigint").alias("m"),
    )
    slots = spark.range(BLOOM_K).select(F.col("id").alias("slot"))

    def slot_pos(key_col):
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("slot").cast("string"),
                            F.lit(":"),
                            key_col.cast("string"),
                        ).cast("binary")
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("bigint")
            % F.col("m")
        )

    pos = (
        dim.crossJoin(F.broadcast(slots))
        .crossJoin(F.broadcast(dm))
        .select(slot_pos(F.col("s_suppkey")).alias("p"))
        .distinct()
    )
    factk = li.groupBy("l_suppkey").agg(
        F.count("*").cast("bigint").alias("nrows")
    )
    fk = (
        factk.crossJoin(F.broadcast(slots))
        .crossJoin(F.broadcast(dm))
        .select("l_suppkey", "nrows", slot_pos(F.col("l_suppkey")).alias("p"))
    )
    hit = (
        fk.join(F.broadcast(pos.withColumn("hitp", F.lit(1))), "p", "left")
        .groupBy("l_suppkey")
        .agg(
            F.max("nrows").alias("nrows"),
            F.sum(F.when(F.col("hitp").isNotNull(), 1).otherwise(0)).alias(
                "nh"
            ),
        )
    )
    lab = hit.join(
        F.broadcast(dim.withColumn("ismem", F.lit(1))),
        hit.l_suppkey == dim.s_suppkey,
        "left",
    ).select(
        "l_suppkey",
        "nrows",
        "nh",
        F.when(F.col("ismem").isNotNull(), 1).otherwise(0).alias("member"),
    )
    n_bits = pos.agg(F.count("*").cast("bigint").alias("n_bits_set"))
    passed = F.col("nh") == BLOOM_K
    return (
        lab.crossJoin(F.broadcast(dm))
        .groupBy("n_dim", "m")
        .agg(
            F.count("*").cast("bigint").alias("n_fact_keys"),
            F.sum("member").cast("bigint").alias("n_member_keys"),
            F.sum(F.when(passed, 1).otherwise(0))
            .cast("bigint")
            .alias("n_pass_keys"),
            F.sum(F.when((F.col("member") == 1) & ~passed, 1).otherwise(0))
            .cast("bigint")
            .alias("n_false_neg_keys"),
            F.sum(F.when((F.col("member") == 0) & passed, 1).otherwise(0))
            .cast("bigint")
            .alias("n_false_pos_keys"),
            qround(
                F.sum(F.when((F.col("member") == 0) & passed, 1).otherwise(0))
                * 1.0
                / F.greatest(F.sum(1 - F.col("member")), F.lit(1)),
                6,
            ).alias("fpr"),
            F.sum(F.when(passed, F.col("nrows")).otherwise(0))
            .cast("bigint")
            .alias("rows_kept"),
            F.sum(F.when(~passed, F.col("nrows")).otherwise(0))
            .cast("bigint")
            .alias("rows_pruned"),
        )
        .crossJoin(F.broadcast(n_bits))
        .select(
            F.col("n_dim").alias("n_dim_keys"),
            F.col("m").alias("m_bits"),
            "n_bits_set",
            "n_fact_keys",
            "n_member_keys",
            "n_pass_keys",
            "n_false_neg_keys",
            "n_false_pos_keys",
            "fpr",
            "rows_kept",
            "rows_pruned",
        )
    )
