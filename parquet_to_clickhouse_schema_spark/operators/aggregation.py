"""Aggregation family: hash agg, distinct, approximate, rollup/cube/grouping
sets, filtered aggregation.

All are single-shuffle hash aggregations with map-side partial aggregation
(HashAggregate -> Exchange -> HashAggregate in the physical plan) — the shape
that scales linearly: the shuffle carries only (group key, partial state),
never raw rows. Float sums are rounded in BOTH engines to absorb
summation-order differences (SURVEY.md §7 risk list).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parquet_to_clickhouse_schema_spark._registry import new_registry
from parquet_to_clickhouse_schema_spark.functions.compat import qround
from parquet_to_clickhouse_schema_spark.sources.io import fanout_scan, load_table

QUERIES, ORACLES, _q = new_registry()


@_q(
    "q_agg_hash",
    """
    SELECT l_returnflag, l_linestatus,
           floor((sum(l_quantity)) * 100.0 + 0.5) / 100.0 AS sum_qty,
           floor((sum(l_extendedprice)) * 100.0 + 0.5) / 100.0 AS sum_base_price,
           floor((sum(l_extendedprice * (1 - l_discount))) * 100.0 + 0.5) / 100.0 AS sum_disc_price,
           floor((sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))) * 100.0 + 0.5) / 100.0 AS sum_charge,
           floor((avg(l_quantity)) * 1000000.0 + 0.5) / 1000000.0 AS avg_qty,
           floor((avg(l_extendedprice)) * 1000000.0 + 0.5) / 1000000.0 AS avg_price,
           floor((avg(l_discount)) * 1000000.0 + 0.5) / 1000000.0 AS avg_disc,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the canonical whole-stage-codegen hash aggregation.
    Partial aggregation reduces 100 TB of rows to (4 groups x partitions)
    partial states before the shuffle — the shuffle is O(groups), not O(rows)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        qround(F.sum("l_quantity"), 2).alias("sum_qty"),
        qround(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        qround(F.sum(disc_price), 2).alias("sum_disc_price"),
        qround(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
        qround(F.avg("l_quantity"), 6).alias("avg_qty"),
        qround(F.avg("l_extendedprice"), 6).alias("avg_price"),
        qround(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@_q(
    "q_agg_distinct",
    """
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
           floor((sum(DISTINCT l_quantity)) * 100.0 + 0.5) / 100.0 AS sum_dist_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-distinct aggregation: Spark expands this to a two-phase
    aggregate (Expand + partial distinct per key) so each distinct column
    still benefits from map-side dedup before the shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        qround(F.sum_distinct(F.col("l_quantity")), 2).alias("sum_dist_qty"),
    )


@_q("q_agg_approx_distinct")  # rows-only: approximate by design
def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate count-distinct: constant memory per group
    regardless of cardinality — the 100 TB answer to count(distinct) when a
    1-2% error is acceptable. Checked rows-only (approximate); the in-engine
    test asserts tolerance vs the exact count."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.01).alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )


@_q("q_hll_sketch")  # rows-only: sketch estimates are approximate by design
def q_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HyperLogLog sketches (Apache DataSketches, Spark 4
    hll_sketch_agg / hll_union_agg): the 100-TB distinct-count architecture.

    Unlike approx_count_distinct — which answers one question once — the
    sketch is a REUSABLE artifact: per-group sketches (here: distinct
    customers per order priority) can be persisted and later UNIONED to
    answer any coarser rollup without rescanning the fact table. The 'ALL'
    row is computed by merging the five per-priority sketches
    (hll_union_agg), not by re-aggregating orders: on a 100 TB fact that
    turns a second full scan into a 5-row reduce. lgConfigK=14 bounds the
    estimate error to ~1.6% (1.04/sqrt(2^14)); the binary sketch column
    itself stays internal (scalar-only output per the driver guard).
    Checked rows-only (approximate); tests assert each estimate within 5%
    of the exact distinct count."""
    o = load_table(spark, sf_dir, "orders")
    per_grp = o.groupBy("o_orderpriority").agg(
        F.hll_sketch_agg("o_custkey", 14).alias("sk")
    )
    est = per_grp.select(
        F.col("o_orderpriority").alias("grp"),
        F.hll_sketch_estimate("sk").alias("approx_customers"),
    )
    merged = per_grp.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_customers")
    ).select(F.lit("ALL").alias("grp"), "approx_customers")
    return est.unionByName(merged)


# --- q_hll_verified: deterministic HyperLogLog, oracle-gated -----------------
# p=8 -> m=256 registers (standard error 1.04/sqrt(256) ~ 6.5%); 32-bit
# stream -> rho in 1..33, so each register's 2^(33-rho) term fits a bigint
# and the register SUM is exact integer arithmetic (order-independent,
# hash-gateable — the float harmonic mean happens once, on identical
# operands, in both engines).
HLLV_M = 256
_HLLV_ALPHA = 0.7213 / (1.0 + 1.079 / HLLV_M)  # standard alpha_m for m>=128
HLLV_CONST = _HLLV_ALPHA * HLLV_M * HLLV_M * 2.0**33  # alpha*m^2 / 2^-33
HLLV_LC = 2.5 * HLLV_M  # linear-counting threshold
HLLV_2P32 = 2.0**32  # large-range correction bound (32-bit stream)


@_q(
    "q_hll_verified",
    f"""
    WITH h AS (
      SELECT o_orderpriority AS grp, o_custkey,
             md5(CAST(o_custkey AS VARCHAR)) AS hx
      FROM orders
    ),
    b AS (
      SELECT grp, o_custkey,
             CAST(('0x' || substr(hx, 1, 2)) AS BIGINT) AS bucket,
             substr(hx, 3, 8) AS s8,
             length(regexp_extract(substr(hx, 3, 8), '^(0*)', 1)) AS z
      FROM h
    ),
    r AS (
      SELECT grp, bucket,
             CASE WHEN z = 8 THEN 33
                  ELSE 4 * z + 1 +
                       CASE WHEN CAST(('0x' || substr(s8 || 'f', z + 1, 1)) AS BIGINT)
                                 >= 8 THEN 0
                            WHEN CAST(('0x' || substr(s8 || 'f', z + 1, 1)) AS BIGINT)
                                 >= 4 THEN 1
                            WHEN CAST(('0x' || substr(s8 || 'f', z + 1, 1)) AS BIGINT)
                                 >= 2 THEN 2
                            ELSE 3 END
             END AS rho
      FROM b
    ),
    regs AS (SELECT grp, bucket, max(rho) AS m_j FROM r GROUP BY 1, 2),
    regs2 AS (
      SELECT grp, m_j FROM regs
      UNION ALL
      SELECT 'ALL' AS grp, max(m_j) AS m_j FROM regs GROUP BY bucket
    ),
    per AS (
      SELECT grp, CAST(count(*) AS BIGINT) AS registers_used,
             sum(CAST(power(2, 33 - m_j) AS BIGINT)) AS s_present
      FROM regs2 GROUP BY 1
    ),
    ex AS (
      SELECT o_orderpriority AS grp,
             CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_distinct
      FROM orders GROUP BY 1
      UNION ALL
      SELECT 'ALL' AS grp, CAST(count(DISTINCT o_custkey) AS BIGINT)
      FROM orders
    ),
    est AS (
      SELECT grp, registers_used,
             floor((CASE
               WHEN {HLLV_CONST!r} / (s_present + ({HLLV_M} - registers_used) * 8589934592)
                      <= {HLLV_LC!r}
                    AND {HLLV_M} - registers_used > 0
                 THEN {float(HLLV_M)!r}
                      * ln({float(HLLV_M)!r} / ({HLLV_M} - registers_used))
               WHEN {HLLV_CONST!r} / (s_present + ({HLLV_M} - registers_used) * 8589934592)
                      > {HLLV_2P32 / 30.0!r}
                 THEN -{HLLV_2P32!r}
                      * ln(1.0 - {HLLV_CONST!r}
                                 / (s_present + ({HLLV_M} - registers_used) * 8589934592)
                                 / {HLLV_2P32!r})
               ELSE {HLLV_CONST!r} / (s_present + ({HLLV_M} - registers_used) * 8589934592)
             END) * 10000.0 + 0.5) / 10000.0 AS est_hll
      FROM per
    )
    SELECT e.grp, e.est_hll, x.exact_distinct,
           floor(abs(e.est_hll - x.exact_distinct) / x.exact_distinct
                 * 1000000.0 + 0.5) / 1000000.0 AS rel_err,
           e.registers_used
    FROM est e JOIN ex x ON x.grp = e.grp
    """,
)
def q_hll_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-gated deterministic HyperLogLog (q_hll_sketch /
    q_agg_approx_distinct's hash-gated mechanism twin — the
    q_percentile_verified / q_minhash_union move applied to the last
    ungated sketch family).

    Mechanism (Flajolet et al. 2007, original 32-bit-stream HLL): md5 each
    key; first 2 hex nibbles -> one of m={HLLV_M} registers (p=8); next 8
    nibbles are the 32-bit stream whose leading-zero-count+1 is rho (1..33,
    computed by exact string/CASE nibble arithmetic — no float log2
    anywhere); register j keeps max(rho). The harmonic-mean estimate
    alpha_m*m^2 / sum(2^-M_j) is evaluated as one double division of the
    literal constant by the EXACT bigint sum(2^(33-M_j)) (+1 per empty
    register), so summation order cannot perturb it; the standard small-
    range (linear counting m*ln(m/V), fires at sf0.001 group sizes) and
    large-range corrections are closed-form CASE branches. Every step is
    integer/string/single-float-op deterministic, so DuckDB rebuilds the
    registers AND the estimate bit-for-bit: the SKETCH is oracle-gated,
    not just its output rows. Mergeability is gated too: the 'ALL' row
    unions the five per-priority register sets via max-per-bucket — the
    5-row reduce that replaces a second 100 TB scan. Measured relative
    error vs the exact distinct count rides on the row (bound ~1.04/16).

    100 TB shape: one narrow map pass (md5 + nibble math), then
    groupBy(grp, bucket).max — map-side combinable, the shuffle carries at
    most groups x {HLLV_M} register rows regardless of input size. Only the
    TRUTH column (exact countDistinct) rescans keys — drop it in
    production; it exists here to measure."""
    o = load_table(spark, sf_dir, "orders")
    hx = F.md5(F.col("o_custkey").cast("string").cast("binary"))
    b = o.select(
        F.col("o_orderpriority").alias("grp"),
        "o_custkey",
        F.conv(F.substring(hx, 1, 2), 16, 10).cast("bigint").alias("bucket"),
        F.substring(hx, 3, 8).alias("s8"),
    ).withColumn(
        "z", F.length(F.regexp_extract("s8", "^(0*)", 1)).cast("int")
    )
    fv = F.conv(
        F.substr(F.col("s8"), F.col("z") + 1, F.lit(1)), 16, 10
    ).cast("bigint")
    rho = F.when(F.col("z") == 8, F.lit(33)).otherwise(
        4 * F.col("z")
        + 1
        + F.when(fv >= 8, 0).when(fv >= 4, 1).when(fv >= 2, 2).otherwise(3)
    )
    regs = (
        b.select("grp", "bucket", rho.alias("rho"))
        .groupBy("grp", "bucket")
        .agg(F.max("rho").alias("m_j"))
    )
    regs2 = regs.select("grp", "m_j").unionByName(
        regs.groupBy("bucket")
        .agg(F.max("m_j").alias("m_j"))
        .select(F.lit("ALL").alias("grp"), "m_j")
    )
    per = regs2.groupBy("grp").agg(
        F.count("*").cast("bigint").alias("registers_used"),
        F.sum(F.pow(F.lit(2.0), 33 - F.col("m_j")).cast("bigint")).alias(
            "s_present"
        ),
    )
    s_all = F.col("s_present") + (
        F.lit(HLLV_M) - F.col("registers_used")
    ) * F.lit(2**33)
    raw = F.lit(HLLV_CONST) / s_all
    v_empty = F.lit(HLLV_M) - F.col("registers_used")
    est = (
        F.when(
            (raw <= F.lit(HLLV_LC)) & (v_empty > 0),
            F.lit(float(HLLV_M)) * F.log(F.lit(float(HLLV_M)) / v_empty),
        )
        .when(
            raw > F.lit(HLLV_2P32 / 30.0),
            F.lit(-HLLV_2P32) * F.log(F.lit(1.0) - raw / F.lit(HLLV_2P32)),
        )
        .otherwise(raw)
    )
    ests = per.select("grp", qround(est, 4).alias("est_hll"), "registers_used")
    ex = (
        o.groupBy(F.col("o_orderpriority").alias("grp"))
        .agg(F.countDistinct("o_custkey").alias("exact_distinct"))
        .unionByName(
            o.agg(
                F.countDistinct("o_custkey").alias("exact_distinct")
            ).select(F.lit("ALL").alias("grp"), "exact_distinct")
        )
    )
    return ests.join(ex, "grp").select(
        "grp",
        "est_hll",
        "exact_distinct",
        qround(
            F.abs(F.col("est_hll") - F.col("exact_distinct"))
            / F.col("exact_distinct"),
            6,
        ).alias("rel_err"),
        "registers_used",
    )


_ROLLUP_ORACLE = """
    SELECT l_returnflag, l_linestatus,
           floor((sum(l_quantity)) * 100.0 + 0.5) / 100.0 AS sum_qty,
           CAST(count(*) AS BIGINT) AS n,
           CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
           CAST(GROUPING(l_linestatus) AS INT) AS g_ls
    FROM lineitem
    GROUP BY {clause} (l_returnflag, l_linestatus)
"""


def _grouped_agg(df: DataFrame, grouped) -> DataFrame:
    return grouped.agg(
        qround(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count("*").alias("n"),
        F.grouping("l_returnflag").cast("int").alias("g_rf"),
        F.grouping("l_linestatus").cast("int").alias("g_ls"),
    )


@_q("q_rollup", _ROLLUP_ORACLE.format(clause="ROLLUP"))
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals: Spark plans rollup as a single Expand +
    aggregate — one pass over the data for all grouping levels."""
    li = load_table(spark, sf_dir, "lineitem")
    return _grouped_agg(li, li.rollup("l_returnflag", "l_linestatus"))


@_q("q_cube", _ROLLUP_ORACLE.format(clause="CUBE"))
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full cross-tabulation of subtotals; same single-pass Expand plan."""
    li = load_table(spark, sf_dir, "lineitem")
    return _grouped_agg(li, li.cube("l_returnflag", "l_linestatus"))


@_q(
    "q_grouping_sets",
    """
    SELECT l_returnflag, l_linestatus,
           floor((sum(l_quantity)) * 100.0 + 0.5) / 100.0 AS sum_qty,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping sets via Spark SQL (same Expand-based plan).

    Literals are `100.0D`/`0.5D`: Spark SQL parses bare `100.0` as DECIMAL,
    which makes sum_qty decimal(27,6) and diverges from the oracle's double
    (r1 hash_match=false was exactly this)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               floor((sum(l_quantity)) * 100.0D + 0.5D) / 100.0D AS sum_qty,
               count(*) AS n
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@_q(
    "q_agg_filtered",
    """
    SELECT l_linestatus,
           floor((coalesce(sum(l_extendedprice * (1 - l_discount)) FILTER (WHERE l_returnflag = 'A'), 0)) * 100.0 + 0.5) / 100.0 AS rev_returned,
           CAST(count(*) FILTER (WHERE l_quantity > 30) AS BIGINT) AS n_heavy,
           floor((avg(l_extendedprice) FILTER (WHERE l_tax < 0.04)) * 1000000.0 + 0.5) / 1000000.0 AS avg_low_tax_price
    FROM lineitem
    GROUP BY l_linestatus
    """,
)
def q_agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation: sum(CASE WHEN ...) ≡ FILTER (WHERE ...) —
    one pass, no self-joins, the idiomatic pivot-free conditional rollup."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_linestatus").agg(
        qround(
            F.coalesce(F.sum(F.when(F.col("l_returnflag") == "A", disc_price)), F.lit(0.0)), 2
        ).alias("rev_returned"),
        F.count(F.when(F.col("l_quantity") > 30, F.lit(1))).alias("n_heavy"),
        qround(F.avg(F.when(F.col("l_tax") < 0.04, F.col("l_extendedprice"))), 6).alias(
            "avg_low_tax_price"
        ),
    )


@_q(
    "q_agg_collect",
    """
    SELECT l_returnflag,
           array_to_string(list_sort(list_distinct(list(l_linestatus))), ',') AS statuses,
           CAST(len(list_distinct(list(l_suppkey))) AS INT) AS n_supps
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collection aggregates: collect_set gathers per-group values into an
    array — ALWAYS sort the array before emitting (collection order is
    partition-dependent; the sorted form is the only deterministic one).

    The gated output serializes the array with concat_ws: the driver's
    pandas row canonicalizer can't hash array cells (r1 crash on
    numpy.ndarray), so gated columns must be scalar-typed."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.concat_ws(",", F.sort_array(F.collect_set("l_linestatus"))).alias("statuses"),
        F.size(F.collect_set("l_suppkey")).cast("int").alias("n_supps"),
    )


@_q(
    "q_agg_distinct_twophase",
    """
    SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    GROUP BY event_type
    """,
)
def q_agg_distinct_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact count-distinct written as an explicit two-phase aggregate:
    dedup on (group, value) first, then count per group. Equivalent to
    COUNT(DISTINCT user_id) — the oracle states it that way — but the
    rewritten plan shuffles on the COMPOSITE (event_type, user_id) key, so
    a skewed group (one event_type dominating a 100-TB log) spreads its
    distinct-set construction across the whole cluster instead of funneling
    every row of the hot group through one task. The trade: two exchanges
    instead of one, both with map-side partial aggregation — the second is
    O(groups x distinct values), already deduped. This is the manual form
    of what spark.sql.optimizer.distinctAggregation rewrites do for
    skewed distincts."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select("event_type", "user_id")
        .distinct()
        .groupBy("event_type")
        .agg(F.count("*").alias("n_users"))
    )


@_q(
    "q_anomaly_zscore",
    """
    WITH s AS (
      SELECT event_type, avg(value) AS m, stddev_samp(value) AS sd
      FROM events GROUP BY event_type
    )
    SELECT event_id, e.event_type,
           floor(((value - m) / sd) * 10000.0 + 0.5) / 10000.0 AS z,
           (abs((value - m) / sd) > 3.0) AS is_anomaly
    FROM events e JOIN s ON e.event_type = s.event_type
    """,
)
def q_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score anomaly flagging — the metrics-monitoring pass of a
    pipeline (spot broken extractors / value drift before training ingests
    them).

    Scale shape: stats are a tiny groupBy aggregate (|event_type| rows)
    broadcast back onto the fact scan — the naive window-function form
    (avg(value) OVER (PARTITION BY event_type)) would funnel each type's
    full history through one task, the same 3-value-partition-key
    scale-killer q_window_rank documents. This form is one map-side-combined
    shuffle plus a broadcast join: scan-bound at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("m"), F.stddev_samp("value").alias("sd")
    )
    z = (F.col("value") - F.col("m")) / F.col("sd")
    return ev.join(F.broadcast(stats), "event_type").select(
        "event_id",
        "event_type",
        qround(z, 4).alias("z"),
        (F.abs(z) > 3.0).alias("is_anomaly"),
    )


@_q(
    "q_mode_agg",
    """
    SELECT event_type, k_mode, CAST(n AS BIGINT) AS n
    FROM (
      SELECT event_type, k AS k_mode, count(*) AS n,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY count(*) DESC, k) AS rn
      FROM (SELECT event_type,
                   CAST(json_extract_string(props, '$.k') AS INT) AS k
            FROM events)
      GROUP BY event_type, k
    )
    WHERE rn = 1
    """,
)
def q_mode_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group mode (most frequent value, smallest-value
    tiebreak) of the JSON `k` field per event type.

    Built-in `mode()` is tie-nondeterministic in BOTH engines, so the
    oracle could never hash-match it; the deterministic form is a
    (group, value) count plus an argmax — expressed as max(struct(cnt,
    -k)) so the whole selection is ONE map-side-combinable aggregate
    after the count shuffle, never a window over the counts. Shuffles
    carry (|groups| x |distinct values|) partial counts — at 100 TB the
    value domain, not the row count, bounds the state."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    counts = ev.select("event_type", k.alias("k")).groupBy(
        "event_type", "k"
    ).agg(F.count("*").alias("n"))
    best = counts.groupBy("event_type").agg(
        F.max(F.struct(F.col("n"), (-F.col("k")).alias("neg_k"))).alias("b")
    )
    return best.select(
        "event_type",
        (-F.col("b.neg_k")).alias("k_mode"),
        F.col("b.n").cast("bigint").alias("n"),
    )


@_q(
    "q_mad_robust",
    """
    WITH med AS (
      SELECT event_type, median(value) AS med_val FROM events GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_type, med_val, abs(value - med_val) AS ad
      FROM events e JOIN med ON e.event_type = med.event_type
    )
    SELECT event_type,
           floor(any_value(med_val) * 1000000.0 + 0.5) / 1000000.0 AS med_val,
           floor(median(ad) * 1000000.0 + 0.5) / 1000000.0 AS mad,
           floor(median(ad) * 1.4826 * 1000000.0 + 0.5) / 1000000.0
               AS sigma_robust
    FROM dev GROUP BY event_type
    """,
)
def q_mad_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust scale statistics per event type: median, median absolute
    deviation, and the 1.4826-scaled robust sigma — the outlier-resistant
    counterpart to q_anomaly_zscore's mean/stddev (one wild value can move
    a mean arbitrarily; it moves a median by at most one rank).

    Two exact-median passes: per-type median (tiny |types|-row result,
    broadcast back onto the fact scan), then the median of absolute
    deviations. Exact medians are rank-based — at 100 TB swap
    percentile_approx into the same shape for constant memory (the
    tolerance-tested q_percentile_approx path); the oracle gates the exact
    form."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(F.median("value").alias("med_val"))
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "med_val", F.abs(F.col("value") - F.col("med_val")).alias("ad")
    )
    return dev.groupBy("event_type").agg(
        qround(F.any_value(F.col("med_val")), 6).alias("med_val"),
        qround(F.median("ad"), 6).alias("mad"),
        qround(F.median("ad") * 1.4826, 6).alias("sigma_robust"),
    )


# equal-frequency binning: number of buckets
QBUCKETS = 10


@_q(
    "q_quantile_bucketize",
    f"""
    WITH v AS (
      SELECT floor(l_extendedprice * 100.0 + 0.5) / 100.0 AS val FROM lineitem
    ),
    b AS (
      SELECT quantile_cont(val, [x / {QBUCKETS}.0
                                 for x in range(1, {QBUCKETS})]) AS bnds
      FROM v
    )
    SELECT CAST(len(list_filter(bnds, x -> val > x)) AS INT) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           floor(min(val) * 100.0 + 0.5) / 100.0 AS lo,
           floor(max(val) * 100.0 + 0.5) / 100.0 AS hi
    FROM v CROSS JOIN b
    GROUP BY 1
    """,
)
def q_quantile_bucketize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency feature binning: assign every lineitem price to one
    of {QBUCKETS} quantile buckets — the discretization pass behind
    monotone features, calibration curves, and stratified anything. Exact
    quantile boundaries (linear interpolation — the same formula in both
    engines) are computed once, then assignment is a row-local
    count-of-boundaries-below fold over the broadcast 1-row boundary
    array: no sort of the fact table, no window.

    At 100 TB swap the exact percentile for percentile_approx in the SAME
    plan shape (tolerance-tested in q_percentile_approx); assignment cost
    is unchanged. Values are pre-rounded to cents so the boundary
    comparison is engine-stable."""
    li = load_table(spark, sf_dir, "lineitem")
    v = li.select(qround(F.col("l_extendedprice"), 2).alias("val"))
    fracs = [i / QBUCKETS for i in range(1, QBUCKETS)]
    bnds = v.agg(F.percentile("val", F.lit(fracs)).alias("bnds"))
    bucket = F.size(F.filter("bnds", lambda x: F.col("val") > x))
    return (
        v.crossJoin(F.broadcast(bnds))
        .groupBy(bucket.cast("int").alias("bucket"))
        .agg(
            F.count("*").cast("bigint").alias("n"),
            qround(F.min("val"), 2).alias("lo"),
            qround(F.max("val"), 2).alias("hi"),
        )
    )


@_q(
    "q_moving_median",
    """
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(count(*) AS DOUBLE) AS cnt
      FROM events GROUP BY event_type, d
    )
    SELECT event_type, d, CAST(cnt AS BIGINT) AS n_events,
           floor((median(cnt) OVER (PARTITION BY event_type ORDER BY d
                                    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
                 * 100.0 + 0.5) / 100.0 AS med7
    FROM daily
    """,
)
def q_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day moving MEDIAN of daily event counts per type — the
    robust companion to a moving average (one traffic spike day drags a
    mean for a week; the median shrugs it off). Spark evaluates the exact
    percentile aggregate over the moving rows frame; DuckDB's windowed
    median is the same exact statistic, and integer counts make the
    midpoint interpolation exact on both sides.

    Scale shape: the fact collapses to |types| x |days| rows FIRST
    (map-side combinable count), so the O(frame log frame) per-row median
    cost applies to a calendar-bounded table, never raw events — same
    aggregate-first discipline as q_cusum."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(F.count("*").cast("double").alias("cnt"))
    daily.createOrReplaceTempView("daily_mm")
    return spark.sql(
        """
        SELECT event_type, d, CAST(cnt AS BIGINT) AS n_events,
               floor((percentile(cnt, 0.5D) OVER (
                          PARTITION BY event_type ORDER BY d
                          ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
                     * 100.0D + 0.5D) / 100.0D AS med7
        FROM daily_mm
        """
    )


@_q(
    "q_benford",
    """
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                  AS INT) AS first_digit
      FROM orders WHERE o_totalprice >= 1.0
    ),
    obs AS (
      SELECT first_digit, CAST(count(*) AS BIGINT) AS n,
             count(*) / CAST(sum(count(*)) OVER () AS DOUBLE) AS p_obs
      FROM digits GROUP BY first_digit
    )
    SELECT first_digit, n,
           floor(p_obs * 1000000.0 + 0.5) / 1000000.0 AS p_observed,
           floor(log10(1.0 + 1.0 / first_digit) * 1000000.0 + 0.5) / 1000000.0
               AS p_benford,
           floor(abs(p_obs - log10(1.0 + 1.0 / first_digit)) * 1000000.0 + 0.5)
               / 1000000.0 AS abs_dev
    FROM obs
    """,
)
def q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit over order totals: observed
    leading-digit distribution vs the log10(1 + 1/d) expectation, with
    absolute deviation per digit — the classic fabricated-numbers screen,
    here as a standing DQ fingerprint (synthetic uniform prices will
    deviate hard; organic invoice data should not).

    First digit is taken from the INTEGER part's decimal rendering —
    exact on both engines (no float formatting involved).

    Scale shape: collapses to <= 9 groups map-side; the share
    normalization is a window over 9 rows."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1.0)
    digits = o.select(
        F.substring(
            F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
        )
        .cast("int")
        .alias("first_digit")
    )
    obs = digits.groupBy("first_digit").agg(F.count("*").cast("bigint").alias("n"))
    from pyspark.sql import Window as W

    p_obs = F.col("n") / F.sum("n").over(W.partitionBy())
    benford = F.log10(1.0 + 1.0 / F.col("first_digit"))
    return obs.select(
        "first_digit",
        "n",
        qround(p_obs, 6).alias("p_observed"),
        qround(benford, 6).alias("p_benford"),
        qround(F.abs(p_obs - benford), 6).alias("abs_dev"),
    )


BOOTSTRAP_B = 32  # bootstrap replicas
# Poisson(1) CDF thresholds: u < cdf[k] => weight k (k = 7 tail cap)
_POIS_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
    0.9999167588507119,
)
_HEX15 = float(16**15)


def _pois_case_sql(u: str) -> str:
    branches = " ".join(
        f"WHEN {u} < {c!r} THEN {k}" for k, c in enumerate(_POIS_CDF)
    )
    return f"CASE {branches} ELSE 7 END"


@_q(
    "q_bootstrap_ci",
    f"""
    WITH reps AS (
      SELECT o_orderkey, o_totalprice, b
      FROM orders, unnest(range(0, {BOOTSTRAP_B})) AS t(b)
    ),
    weighted AS (
      SELECT b, o_totalprice,
             {_pois_case_sql(
                 "CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || '#bs'"
                 " || CAST(b AS VARCHAR)), 1, 15) AS BIGINT) / " + repr(_HEX15)
             )} AS w
      FROM reps
    ),
    means AS (
      SELECT b,
             floor((sum(w * o_totalprice) / sum(w)) * 10000.0 + 0.5) / 10000.0
                 AS rep_mean
      FROM weighted GROUP BY b HAVING sum(w) > 0
    )
    SELECT floor((SELECT avg(o_totalprice) FROM orders) * 100.0 + 0.5) / 100.0
               AS point_mean,
           floor(quantile_cont(rep_mean, 0.025) * 100.0 + 0.5) / 100.0 AS ci_lo,
           floor(quantile_cont(rep_mean, 0.975) * 100.0 + 0.5) / 100.0 AS ci_hi,
           CAST(count(*) AS BIGINT) AS n_replicas
    FROM means
    """,
)
def q_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap 95% confidence interval for the mean order value via the
    DETERMINISTIC Poisson bootstrap — the resampling scheme that works on
    distributed data (Chamandy et al.): instead of drawing n rows with
    replacement (impossible without a global pass), each row enters
    replica b with weight ~ Poisson(1), here inverted from the md5
    uniform of (orderkey, replica) so every re-run and both engines draw
    the IDENTICAL resamples — rand() would hash-mismatch and defeat
    retry idempotency.

    Replica means are quantized before the quantile so the CI
    interpolation runs on identical doubles cross-engine.

    Scale shape: the replica dimension fans each row B=32 times inside
    one pass (broadcast dim, no re-scan), weights are row-local
    arithmetic, and each replica mean is a map-side-combinable weighted
    aggregate — B bounded rows reach the final quantile. Two measured
    plan requirements (10s -> 0.7s at sf0.1): the source is
    repartitioned to the session parallelism BEFORE the fan-out (a
    single-split scan would otherwise put the whole B x n hash work in
    ONE task), and the uniform u is materialized once per row in a
    projection (codegen does NOT common-subexpression the 8-branch
    Poisson CASE — inlining u re-hashes per branch, ~2x)."""
    o = load_table(spark, sf_dir, "orders").repartition(
        spark.sparkContext.defaultParallelism
    )
    reps = spark.createDataFrame([(b,) for b in range(BOOTSTRAP_B)], "b INT")
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("o_orderkey").cast("string"),
                        F.lit("#bs"),
                        F.col("b").cast("string"),
                    ).cast("binary")
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        / F.lit(_HEX15)
    )
    w = F.lit(7)
    for k in range(len(_POIS_CDF) - 1, -1, -1):
        w = F.when(F.col("u") < F.lit(_POIS_CDF[k]), F.lit(k)).otherwise(w)
    weighted = (
        o.crossJoin(F.broadcast(reps))
        .select("b", "o_totalprice", u.alias("u"))
        .select("b", "o_totalprice", w.alias("w"))
    )
    means = (
        weighted.groupBy("b")
        .agg(
            F.sum(F.col("w") * F.col("o_totalprice")).alias("swx"),
            F.sum("w").alias("sw"),
        )
        .filter(F.col("sw") > 0)
        .select(qround(F.col("swx") / F.col("sw"), 4).alias("rep_mean"))
    )
    point = o.agg(qround(F.avg("o_totalprice"), 2).alias("point_mean"))
    ci = means.agg(
        qround(F.percentile("rep_mean", F.lit(0.025)), 2).alias("ci_lo"),
        qround(F.percentile("rep_mean", F.lit(0.975)), 2).alias("ci_hi"),
        F.count("*").cast("bigint").alias("n_replicas"),
    )
    return point.crossJoin(F.broadcast(ci))


_CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def _corr_oracle() -> str:
    cols = _CORR_COLS
    means = ", ".join(f"avg({c}) AS m{i}" for i, c in enumerate(cols))
    cents = []
    pairs = []
    for i, a in enumerate(cols):
        for j, b in enumerate(cols):
            if i <= j:
                cents.append(f"sum(({a} - m{i}) * ({b} - m{j})) AS s{i}{j}")
            if i < j:
                pairs.append(
                    f"SELECT '{a}' AS col_x, '{b}' AS col_y, n, "
                    f"s{i}{j} / sqrt(s{i}{i} * s{j}{j}) AS r FROM s"
                )
    return f"""
    WITH m AS (SELECT {means} FROM lineitem),
    s AS (
      SELECT count(*) AS n, {", ".join(cents)}
      FROM lineitem, m
    )
    SELECT col_x, col_y, CAST(n AS BIGINT) AS n,
           floor(r * 1000000.0 + 0.5) / 1000000.0 AS pearson_r
    FROM ({" UNION ALL ".join(pairs)})
    """


@_q("q_corr_matrix", _corr_oracle())
def q_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix over the lineitem measures — the
    feature-screening pass before any modeling step (drop near-collinear
    features, sanity-check synthetic data generators).

    Numerics discipline: computed TWO-PASS (means first, then centered
    co-moments) rather than the one-pass n·Σxy − Σx·Σy identity — at 100 TB
    the raw-moment subtraction cancels catastrophically (two ~1e17 terms
    whose difference carries the signal), while centered products keep full
    precision and make the cross-engine difference pure summation order
    (~1e-15 relative, 9 orders under the 1e-6 gate). Centered sums are also
    second-order insensitive to the engines' ~1-ulp mean disagreement.

    Scale shape: two scans, each one map-side-combined global aggregate
    (k² co-moments in ONE agg row, not k² scans); the means row is a 1-row
    broadcast crossJoin. The final 6-row matrix is a projection of that
    single aggregate row — nothing driver-side."""
    li = load_table(spark, sf_dir, "lineitem")
    cols = _CORR_COLS
    m = li.agg(*[F.avg(c).alias(f"m{i}") for i, c in enumerate(cols)])
    cent = li.crossJoin(F.broadcast(m))
    aggs = [F.count("*").alias("n")]
    for i, a in enumerate(cols):
        for j, b in enumerate(cols):
            if i <= j:
                aggs.append(
                    F.sum(
                        (F.col(a) - F.col(f"m{i}")) * (F.col(b) - F.col(f"m{j}"))
                    ).alias(f"s{i}{j}")
                )
    s = cent.agg(*aggs)
    rows = []
    for i, a in enumerate(cols):
        for j, b in enumerate(cols):
            if i < j:
                rows.append(
                    F.struct(
                        F.lit(a).alias("col_x"),
                        F.lit(b).alias("col_y"),
                        F.col("n").cast("bigint").alias("n"),
                        qround(
                            F.col(f"s{i}{j}")
                            / F.sqrt(F.col(f"s{i}{i}") * F.col(f"s{j}{j}")),
                            6,
                        ).alias("pearson_r"),
                    )
                )
    return s.select(F.explode(F.array(*rows)).alias("x")).select("x.*")


@_q(
    "q_regression_ols",
    """
    WITH m AS (
      SELECT l_returnflag, count(*) AS n,
             avg(l_quantity) AS mx, avg(l_extendedprice) AS my
      FROM lineitem GROUP BY l_returnflag
    ),
    s AS (
      SELECT l.l_returnflag, m.n, m.mx, m.my,
             sum((l_quantity - mx) * (l_extendedprice - my)) AS sxy,
             sum((l_quantity - mx) * (l_quantity - mx)) AS sxx,
             sum((l_extendedprice - my) * (l_extendedprice - my)) AS syy
      FROM lineitem l JOIN m USING (l_returnflag)
      GROUP BY 1, 2, 3, 4
    )
    SELECT l_returnflag, CAST(n AS BIGINT) AS n,
           floor(sxy / sxx * 1000000.0 + 0.5) / 1000000.0 AS slope,
           floor((my - sxy / sxx * mx) * 10000.0 + 0.5) / 10000.0 AS intercept,
           floor(sxy * sxy / (sxx * syy) * 1000000.0 + 0.5) / 1000000.0 AS r2
    FROM s
    """,
)
def q_regression_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group closed-form OLS (price ~ quantity within each return flag):
    slope, intercept and R² from two-pass centered moments — the in-engine
    replacement for collecting samples into a driver-side regression.

    Same numerics discipline as q_corr_matrix (centered co-moments, never
    the raw-moment identity); per-group means join back as an AQE broadcast
    (7 return flags). Two scans, two map-side-combined aggregations, zero
    driver state — at 100 TB this is exactly two shuffle-free passes plus
    a 7-row exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    m = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.avg("l_quantity").alias("mx"),
        F.avg("l_extendedprice").alias("my"),
    )
    s = (
        li.join(F.broadcast(m), "l_returnflag")
        .groupBy("l_returnflag", "n", "mx", "my")
        .agg(
            F.sum(
                (F.col("l_quantity") - F.col("mx"))
                * (F.col("l_extendedprice") - F.col("my"))
            ).alias("sxy"),
            F.sum(
                (F.col("l_quantity") - F.col("mx"))
                * (F.col("l_quantity") - F.col("mx"))
            ).alias("sxx"),
            F.sum(
                (F.col("l_extendedprice") - F.col("my"))
                * (F.col("l_extendedprice") - F.col("my"))
            ).alias("syy"),
        )
    )
    slope = F.col("sxy") / F.col("sxx")
    return s.select(
        "l_returnflag",
        F.col("n").cast("bigint").alias("n"),
        qround(slope, 6).alias("slope"),
        qround(F.col("my") - slope * F.col("mx"), 4).alias("intercept"),
        qround(
            F.col("sxy") * F.col("sxy") / (F.col("sxx") * F.col("syy")), 6
        ).alias("r2"),
    )


@_q(
    "q_gini",
    """
    WITH rev AS (
      SELECT o_custkey,
             floor(sum(o_totalprice) * 100.0 + 0.5) / 100.0 AS rev
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT n.n_name, r.rev,
             row_number() OVER (PARTITION BY n.n_name
                                ORDER BY r.rev, r.o_custkey) AS i
      FROM rev r
      JOIN customer c ON r.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
    )
    SELECT n_name, CAST(count(*) AS BIGINT) AS n_customers,
           floor((2.0 * sum(i * rev) - (count(*) + 1.0) * sum(rev))
                 / (count(*) * sum(rev)) * 1000000.0 + 0.5) / 1000000.0
               AS gini
    FROM ranked GROUP BY n_name
    """,
)
def q_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration Gini coefficient per nation (0 = perfectly
    equal customer revenue, →1 = one whale) via the rank formula
    G = (2·Σ i·xᵢ − (n+1)·Σ xᵢ) / (n·Σ xᵢ) over ascending-sorted revenue —
    the inequality audit behind mix-balancing decisions (same family as
    q_source_entropy for corpora).

    Determinism: per-customer revenue is quantized to cents BEFORE ranking
    (quantize-then-rank — sums of 2-dp prices sit mid-interval, never on a
    floor boundary) with custkey tiebreak, so ranks are bit-stable. Scale
    shape: one groupBy(custkey), two broadcast dimension joins, and a
    per-nation window whose partitions are customer-count bounded; the
    rank could swap to the two-pass bucketed form (q_window_rank_scalable)
    if one nation ever outgrew a task."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    rev = o.groupBy("o_custkey").agg(
        qround(F.sum("o_totalprice"), 2).alias("rev")
    )
    w = Window.partitionBy("n_name").orderBy("rev", "o_custkey")
    ranked = (
        rev.join(c, rev.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("n_name", "rev", "o_custkey")
        .withColumn("i", F.row_number().over(w))
    )
    cnt = F.count("*")
    return ranked.groupBy("n_name").agg(
        cnt.cast("bigint").alias("n_customers"),
        qround(
            (
                2.0 * F.sum(F.col("i") * F.col("rev"))
                - (cnt + 1.0) * F.sum("rev")
            )
            / (cnt * F.sum("rev")),
            6,
        ).alias("gini"),
    )


WINSOR_LO = 0.01
WINSOR_HI = 0.99


@_q(
    "q_winsorize",
    f"""
    WITH b AS (
      SELECT l_returnflag,
             quantile_cont(l_extendedprice, {WINSOR_LO}) AS p_lo,
             quantile_cont(l_extendedprice, {WINSOR_HI}) AS p_hi
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_returnflag, CAST(count(*) AS BIGINT) AS n,
           floor(b.p_lo * 10000.0 + 0.5) / 10000.0 AS p_lo,
           floor(b.p_hi * 10000.0 + 0.5) / 10000.0 AS p_hi,
           floor(avg(l.l_extendedprice) * 10000.0 + 0.5) / 10000.0 AS mean_raw,
           floor(avg(least(greatest(l.l_extendedprice, b.p_lo), b.p_hi))
                 * 10000.0 + 0.5) / 10000.0 AS mean_winsorized
    FROM lineitem l JOIN b USING (l_returnflag)
    GROUP BY 1, 3, 4
    """,
)
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized robust mean per return flag: clip each price into its
    group's [p01, p99] band, then compare the clipped mean to the raw one —
    the standard outlier-robust aggregation when deletion (q_mad_robust's
    filter) would bias the total.

    Cross-engine: Spark exact `percentile` and DuckDB `quantile_cont` share
    the same (n−1)·q linear interpolation (the q_dq_checks-proven pair);
    the 3-row bounds table joins back as a broadcast. Two scans of the
    fact, both map-side-combined — the winsorized mean never materializes
    the clipped column."""
    li = load_table(spark, sf_dir, "lineitem")
    b = li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", F.lit(WINSOR_LO)).alias("p_lo"),
        F.percentile("l_extendedprice", F.lit(WINSOR_HI)).alias("p_hi"),
    )
    clipped = F.least(
        F.greatest(F.col("l_extendedprice"), F.col("p_lo")), F.col("p_hi")
    )
    return (
        li.join(F.broadcast(b), "l_returnflag")
        .groupBy("l_returnflag", "p_lo", "p_hi")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            qround(F.avg("l_extendedprice"), 4).alias("mean_raw"),
            qround(F.avg(clipped), 4).alias("mean_winsorized"),
        )
        .select(
            "l_returnflag",
            "n",
            qround(F.col("p_lo"), 4).alias("p_lo"),
            qround(F.col("p_hi"), 4).alias("p_hi"),
            "mean_raw",
            "mean_winsorized",
        )
    )


HILL_K = 100  # tail order statistics


@_q(
    "q_hill_tail_index",
    f"""
    WITH top AS (
      SELECT o_totalprice AS x FROM orders
      ORDER BY o_totalprice DESC LIMIT {HILL_K} + 1
    ),
    s AS (
      SELECT count(*) AS n, sum(ln(x)) AS slnx, min(x) AS xmin FROM top
    )
    SELECT CAST({HILL_K} AS BIGINT) AS k,
           floor(xmin * 100.0 + 0.5) / 100.0 AS threshold,
           floor((slnx - n * ln(xmin)) / {HILL_K}.0 * 1000000.0 + 0.5)
               / 1000000.0 AS hill_h,
           floor({HILL_K}.0 / (slnx - n * ln(xmin)) * 1000000.0 + 0.5)
               / 1000000.0 AS tail_alpha
    FROM s
    """,
)
def q_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the heavy-tail exponent over the top-{HILL_K}
    order totals: H = (1/k)·Σ ln(x_i/x_(k+1)), α = 1/H — the
    quantitative companion to q_benford/q_zipf_slope (is the revenue tail
    Pareto, and how fat?). Everything above the threshold order statistic
    is captured by Σln and min over the top-(k+1) set, so ties at the
    boundary cannot change the answer (only VALUES enter, never ranks).

    Scale shape: a TakeOrdered top-(k+1) (per-partition heaps + driver
    merge of k+1 rows — never a global sort) followed by a 1-row
    aggregate. At 100 TB this is one scan; k scales the estimator's
    variance, not the data touched."""
    o = load_table(spark, sf_dir, "orders")
    top = o.select(F.col("o_totalprice").alias("x")).orderBy(
        F.col("x").desc()
    ).limit(HILL_K + 1)
    s = top.agg(
        F.count("*").alias("n"),
        F.sum(F.log("x")).alias("slnx"),
        F.min("x").alias("xmin"),
    )
    h = (F.col("slnx") - F.col("n") * F.log("xmin")) / float(HILL_K)
    return s.select(
        F.lit(HILL_K).cast("bigint").alias("k"),
        qround(F.col("xmin"), 2).alias("threshold"),
        qround(h, 6).alias("hill_h"),
        qround(1.0 / h, 6).alias("tail_alpha"),
    )


ZORDER_BITS = 4  # 16x16 grid -> 256 z-cells


@_q(
    "q_zorder_preview",
    f"""
    WITH bnd AS (
      SELECT quantile_cont(l_partkey, [x / {2**ZORDER_BITS}.0
                                       for x in range(1, {2**ZORDER_BITS})])
               AS ba,
             quantile_cont(l_suppkey, [x / {2**ZORDER_BITS}.0
                                       for x in range(1, {2**ZORDER_BITS})])
               AS bb
      FROM lineitem
    ),
    r AS (
      SELECT l_partkey AS a, l_suppkey AS b,
             len(list_filter(ba, x -> l_partkey > x)) AS ra,
             len(list_filter(bb, x -> l_suppkey > x)) AS rb
      FROM lineitem CROSS JOIN bnd
    ),
    z AS (
      SELECT a, b,
             {" + ".join(f"(((ra >> {j}) & 1) * {2 * 4**j} + ((rb >> {j}) & 1) * {4**j})" for j in range(ZORDER_BITS))}
               AS z_cell
      FROM r
    )
    SELECT CAST(z_cell AS INT) AS z_cell,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(a) AS BIGINT) AS a_min, CAST(max(a) AS BIGINT) AS a_max,
           CAST(min(b) AS BIGINT) AS b_min, CAST(max(b) AS BIGINT) AS b_max
    FROM z GROUP BY z_cell
    """,
)
def q_zorder_preview(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton curve) layout preview for a 2-key clustering of
    lineitem on (partkey, suppkey): quantile-BOUNDARY-bucket each key to
    {ZORDER_BITS} bits (count-of-boundaries-below against a broadcast
    1-row boundary array — the q_quantile_bucketize discipline), interleave
    the bits into a z-cell, and report each cell's row count and
    per-dimension min/max envelope — the table a layout decision reads
    BEFORE rewriting 100 TB: tight envelopes on BOTH dims mean range
    predicates on EITHER key prune most cells (the multi-dimensional win
    single-key sorting can't give; cf. q_layout_pruning).

    Plan: two exact 1-row percentile aggregates, a broadcast cross join,
    row-local shift/mask bit interleave, one ≤{4**ZORDER_BITS}-group
    map-side-combined aggregate — NO window anywhere. The first cut of
    this op ranked via global ntile and measured 10.9x time at 10x data
    (the single-task window serialization, docs/SCALE.md); this
    boundary-bucket form is the fix, and the same swap (exact percentile →
    percentile_approx) carries it to 100 TB. Exact-integer envelopes;
    identical interpolated boundaries on both engines
    (the q_dq_checks-proven percentile/quantile_cont pair)."""
    # r18: the per-row boundary-bucket HOFs (2 × 255 interpreted compares
    # per row) and the exact-percentile partial aggregation both ran
    # inside the single-task single-row-group scan stage; fanout_scan
    # spreads them across cores (no-op on a real multi-file table).
    li = fanout_scan(
        load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey"),
        spark,
    )
    fracs = [i / 2**ZORDER_BITS for i in range(1, 2**ZORDER_BITS)]
    bnd = li.agg(
        F.percentile("l_partkey", F.lit(fracs)).alias("ba"),
        F.percentile("l_suppkey", F.lit(fracs)).alias("bb"),
    )
    ra = F.size(F.filter("ba", lambda x: F.col("a") > x))
    rb = F.size(F.filter("bb", lambda x: F.col("b") > x))
    r = (
        li.select(F.col("l_partkey").alias("a"), F.col("l_suppkey").alias("b"))
        .crossJoin(F.broadcast(bnd))
        .select("a", "b", ra.alias("ra"), rb.alias("rb"))
    )
    z_cell = None
    for j in range(ZORDER_BITS):
        term = F.shiftright(F.col("ra"), j).bitwiseAND(F.lit(1)) * (
            2 * 4**j
        ) + F.shiftright(F.col("rb"), j).bitwiseAND(F.lit(1)) * (4**j)
        z_cell = term if z_cell is None else z_cell + term
    return r.groupBy(z_cell.cast("int").alias("z_cell")).agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.min("a").cast("bigint").alias("a_min"),
        F.max("a").cast("bigint").alias("a_max"),
        F.min("b").cast("bigint").alias("b_min"),
        F.max("b").cast("bigint").alias("b_max"),
    )


PARETO_SHARE = 0.8


@_q(
    "q_pareto_8020",
    f"""
    WITH rev AS (
      SELECT n.n_name, r.o_custkey,
             floor(r.rev * 100.0 + 0.5) / 100.0 AS rev
      FROM (SELECT o_custkey, sum(o_totalprice) AS rev
            FROM orders GROUP BY o_custkey) r
      JOIN customer c ON r.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
    ),
    ranked AS (
      SELECT n_name, rev,
             row_number() OVER (PARTITION BY n_name
                                ORDER BY rev DESC, o_custkey) AS i,
             sum(rev) OVER (PARTITION BY n_name
                            ORDER BY rev DESC, o_custkey
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum,
             sum(rev) OVER (PARTITION BY n_name) AS tot,
             count(*) OVER (PARTITION BY n_name) AS n
      FROM rev
    )
    SELECT n_name,
           CAST(min(n) AS BIGINT) AS n_customers,
           CAST(min(CASE WHEN cum >= {PARETO_SHARE} * tot THEN i END)
                AS BIGINT) AS n_top_customers,
           floor(min(CASE WHEN cum >= {PARETO_SHARE} * tot THEN i END)
                 * 1000000.0 / min(n) + 0.5) / 1000000.0
               AS top_customer_share
    FROM ranked GROUP BY n_name
    """,
)
def q_pareto_8020(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration report: per nation, the smallest number of
    customers whose (descending) revenue covers {PARETO_SHARE:.0%} of the
    nation's total — the "how top-heavy is this market" readout that
    complements q_gini's single-number inequality index with an
    actionable head-count.

    Determinism: revenue pre-quantized to cents BEFORE the descending
    rank/cumsum (quantize-then-rank with custkey tiebreak); the
    crossing-point test compares sums of identical quantized doubles.
    Scale shape: one groupBy(custkey), broadcast dims, per-nation windows
    (customer-count bounded partitions, same class as q_gini), and a
    |nations|-row aggregate."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    rev = (
        o.groupBy("o_custkey")
        .agg(qround(F.sum("o_totalprice"), 2).alias("rev"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("n_name", "o_custkey", "rev")
    )
    wo = Window.partitionBy("n_name").orderBy(F.col("rev").desc(), "o_custkey")
    wall = Window.partitionBy("n_name")
    ranked = rev.select(
        "n_name",
        F.row_number().over(wo).alias("i"),
        F.sum("rev").over(wo.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.sum("rev").over(wall).alias("tot"),
        F.count("*").over(wall).alias("n"),
    )
    crossing = F.min(
        F.when(F.col("cum") >= PARETO_SHARE * F.col("tot"), F.col("i"))
    )
    return ranked.groupBy("n_name").agg(
        F.min("n").cast("bigint").alias("n_customers"),
        crossing.cast("bigint").alias("n_top_customers"),
        (
            F.floor(crossing * 1000000.0 / F.min("n") + F.lit(0.5)) / 1000000.0
        ).alias("top_customer_share"),
    )


@_q(
    "q_bitmap_distinct",
    """
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY event_type
    """,
)
def q_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counting through Spark 4's BITMAP aggregate family:
    user ids are split into (bucket, bit-position) pairs,
    bitmap_construct_agg ORs each bucket's bitmap, and bitmap_count sums
    the set bits — the roaring-bitmap-style distinct-count architecture
    whose per-bucket bitmaps are MERGEABLE artifacts (persist them per
    partition/day, OR them later for any rollup without rescanning — the
    exact-count sibling of q_hll_sketch's approximate sketches). The
    DuckDB oracle computes plain COUNT(DISTINCT): a hash match proves the
    bitmap path is exactly lossless, not approximately.

    Scale shape: the shuffle carries (type, bucket) bitmaps — fixed 4 KiB
    per bucket regardless of how many ids set bits in it — instead of raw
    ids; the Expand-free two-level reduce is the whole point at 100 TB
    (count-distinct without a distinct shuffle)."""
    ev = load_table(spark, sf_dir, "events")
    per_bucket = (
        ev.selectExpr(
            "event_type",
            "bitmap_bucket_number(user_id) AS bk",
            "bitmap_bit_position(user_id) AS bp",
        )
        .groupBy("event_type", "bk")
        .agg(F.expr("bitmap_construct_agg(bp)").alias("bm"))
    )
    return per_bucket.groupBy("event_type").agg(
        F.expr("sum(bitmap_count(bm))").cast("bigint").alias("n_users")
    )


WQ_QUANTILES = (0.25, 0.5, 0.75, 0.9, 0.99)
WQ_BUCKETS = 256


@_q(
    "q_weighted_quantile",
    f"""
    WITH pp AS (
      SELECT l_returnflag, l_extendedprice AS price,
             sum(l_quantity) AS w
      FROM lineitem GROUP BY 1, 2
    ),
    tot AS (SELECT l_returnflag, sum(w) AS tw FROM pp GROUP BY 1),
    cum AS (
      SELECT l_returnflag, price,
             sum(w) OVER (PARTITION BY l_returnflag ORDER BY price) AS cw
      FROM pp
    ),
    qs AS (SELECT unnest(CAST([{", ".join(str(q) for q in WQ_QUANTILES)}]
                          AS DOUBLE[])) AS quantile)
    SELECT cum.l_returnflag, qs.quantile, min(price) AS wq_price
    FROM cum
    JOIN tot ON cum.l_returnflag = tot.l_returnflag
    CROSS JOIN qs
    WHERE cw >= qs.quantile * tw
    GROUP BY 1, 2
    """,
)
def q_weighted_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted quantiles (quantity-weighted price percentiles per
    return flag): the smallest price whose cumulative weight reaches
    q x total — the selection statistic behind revenue-weighted medians,
    fair-price baselines and weighted-sampling thresholds, which plain
    percentile_approx cannot express (it weights rows, not quantities).

    Scale shape — the window never sees a whole group: (1) weights
    collapse onto distinct (flag, price) points by a map-side-combined
    aggregate; (2) points land in {WQ_BUCKETS} fixed price buckets whose
    per-bucket totals form a flags x {WQ_BUCKETS} table, cumulated with a
    tiny window and broadcast back as per-bucket offsets; (3) the
    in-bucket cumsum windows over ONE bucket's points at a time, so the
    largest sort partition is bounded by the bucket width dial, the
    q_shard_plan / q_window_rank_scalable two-pass discipline. All
    comparisons are exact: weights are integral doubles (sums exact below
    2^53 in any order) and q x total multiplies the same two doubles on
    both engines.
    """
    li = load_table(spark, sf_dir, "lineitem")
    pp = (
        li.groupBy("l_returnflag", F.col("l_extendedprice").alias("price"))
        .agg(F.sum("l_quantity").alias("w"))
    )
    rng = pp.groupBy("l_returnflag").agg(
        F.min("price").alias("lo"), F.max("price").alias("hi"),
        F.sum("w").alias("tw"),
    )
    b = pp.join(F.broadcast(rng), "l_returnflag").withColumn(
        "bk",
        F.least(
            F.lit(WQ_BUCKETS - 1),
            # degenerate group (one distinct price -> zero width) maps to
            # bucket 0 instead of a NaN division that would null the
            # bucket key and silently drop the group at the offset join
            F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(
                F.floor(
                    (F.col("price") - F.col("lo"))
                    / ((F.col("hi") - F.col("lo")) / WQ_BUCKETS)
                )
            ),
        ).cast("int"),
    )
    per_bucket = b.groupBy("l_returnflag", "bk").agg(F.sum("w").alias("bw"))
    w_off = (
        Window.partitionBy("l_returnflag")
        .orderBy("bk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = per_bucket.select(
        "l_returnflag",
        "bk",
        F.coalesce(F.sum("bw").over(w_off), F.lit(0.0)).alias("off"),
    )
    w_in = (
        Window.partitionBy("l_returnflag", "bk")
        .orderBy("price")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = (
        b.join(F.broadcast(off), ["l_returnflag", "bk"])
        .withColumn("cw", F.col("off") + F.sum("w").over(w_in))
    )
    qs = spark.createDataFrame(
        [(q,) for q in WQ_QUANTILES], "quantile double"
    )
    return (
        cum.join(F.broadcast(qs), F.col("cw") >= F.col("quantile") * F.col("tw"))
        .groupBy("l_returnflag", "quantile")
        .agg(F.min("price").alias("wq_price"))
    )


CTR_PRIOR_MIN = 1e-6


@_q(
    "q_ctr_smoothing",
    f"""
    WITH uc AS (
      SELECT user_id,
             count(*) AS n_trials,
             sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS n_clicks
      FROM events
      WHERE event_type IN ('view', 'click')
      GROUP BY user_id
    ),
    r AS (
      SELECT user_id, n_trials, n_clicks,
             n_clicks * 1.0 / n_trials AS raw
      FROM uc
    ),
    mom AS (SELECT avg(raw) AS m, var_pop(raw) AS v FROM r),
    pri AS (
      -- clamp both ends: v=0 (all rates identical) would send c to
      -- infinity and the posterior to NaN
      SELECT m, least(greatest(m * (1 - m) / v - 1, {CTR_PRIOR_MIN}),
                      1000000.0) AS c
      FROM mom
    )
    SELECT user_id,
           CAST(n_trials AS BIGINT) AS n_trials,
           CAST(n_clicks AS BIGINT) AS n_clicks,
           floor(raw * 1000000.0 + 0.5) / 1000000.0 AS raw_ctr,
           floor((n_clicks + m * c) / (n_trials + c) * 1000000.0 + 0.5)
             / 1000000.0 AS smoothed_ctr
    FROM r CROSS JOIN pri
    """,
)
def q_ctr_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes click-through-rate shrinkage: each user's
    clicks-per-impression rate (trials = view+click events, success =
    click, so k <= n by construction) smoothed toward the population rate
    with a beta-binomial prior fit by method of moments (concentration
    c = m(1-m)/Var - 1, clamped positive; posterior mean
    (k + m*c)/(n + c)) — the standard fix for high-cardinality rate
    features where low-traffic keys otherwise swing between 0 and 1 and
    poison a training set (label/target encoding uses the same identity).

    Scale shape: one map-side-combined groupBy(user_id) builds the count
    table; the two prior scalars come from a 1-row aggregate broadcast
    back (the 1-row crossJoin scalar-attach pattern) — no second fact
    scan, no window. Float caveat: avg/var_pop accumulate in engine-
    specific order (~1e-15 relative noise) so both output rates are
    1e-6-quantized, the q_bootstrap_ci discipline."""
    ev = load_table(spark, sf_dir, "events")
    uc = (
        ev.filter(F.col("event_type").isin("view", "click"))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_trials"),
            F.sum(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            ).alias("n_clicks"),
        )
    )
    r = uc.withColumn("raw", F.col("n_clicks") * 1.0 / F.col("n_trials"))
    pri = r.agg(F.avg("raw").alias("m"), F.var_pop("raw").alias("v")).select(
        "m",
        F.least(
            F.greatest(
                F.col("m") * (1 - F.col("m")) / F.col("v") - 1,
                F.lit(CTR_PRIOR_MIN),
            ),
            F.lit(1000000.0),
        ).alias("c"),
    )
    return r.crossJoin(F.broadcast(pri)).select(
        "user_id",
        F.col("n_trials").cast("bigint").alias("n_trials"),
        F.col("n_clicks").cast("bigint").alias("n_clicks"),
        qround(F.col("raw"), 6).alias("raw_ctr"),
        qround(
            (F.col("n_clicks") + F.col("m") * F.col("c"))
            / (F.col("n_trials") + F.col("c")),
            6,
        ).alias("smoothed_ctr"),
    )
