"""Data-quality audit: declarative constraint checks over the warehouse.

At 100 TB you cannot eyeball the data; quality regressions (a loader that
starts emitting NULL keys, an upstream that re-sends a partition, an FK that
silently orphans) are caught by a standing audit query that runs after every
load. This module provides the check primitives and one audit query that
unions them into a (constraint, table_name, violations) summary — the shape
a monitoring system ingests directly.

Scale shape of every check:
- not-null / range / enum-domain: a conditional `sum(case when ...)` —
  scan-bound, map-side combinable, zero shuffle beyond the 1-row final agg.
- uniqueness: `count(*) - count(distinct key)` — two-phase distinct agg on
  the key, the same shuffle discipline as q_agg_distinct.
- referential integrity: a LEFT ANTI join child→parent counted — an equi
  shuffle (or broadcast when the parent is a dim) whose output is one long.
- reconciliation (order total vs sum of its lines): one groupBy on the FK
  then a 1:1 join — the heaviest check, still a single shuffle.

Every check emits exactly one row even when clean (violations = 0), so the
summary's row-set is stable and a disappearing check is itself a signal.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_to_clickhouse_schema_spark._registry import new_registry
from parquet_to_clickhouse_schema_spark.functions.compat import qround
from parquet_to_clickhouse_schema_spark.sources.io import load_table

QUERIES, ORACLES, _q = new_registry()


def check_not_null(df: DataFrame, table: str, col: str) -> DataFrame:
    """Violations = rows where `col` IS NULL. Scan-bound conditional sum."""
    return df.agg(
        F.lit(f"not_null:{col}").alias("constraint"),
        F.lit(table).alias("table_name"),
        F.coalesce(
            F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)), F.lit(0)
        )
        .cast("long")
        .alias("violations"),
    )


def check_unique(df: DataFrame, table: str, col: str) -> DataFrame:
    """Violations = count(*) - count(distinct col): 0 iff `col` is a key.

    NULLs are excluded from count(distinct) by SQL semantics, so a NULL key
    counts as a violation here — pair with check_not_null to tell the two
    failure modes apart.
    """
    return df.agg(
        F.lit(f"unique:{col}").alias("constraint"),
        F.lit(table).alias("table_name"),
        (F.count(F.lit(1)) - F.countDistinct(F.col(col)))
        .cast("long")
        .alias("violations"),
    )


def check_fk(
    child: DataFrame,
    child_table: str,
    child_key: str,
    parent: DataFrame,
    parent_key: str,
) -> DataFrame:
    """Violations = child rows whose key has no parent row (orphans).

    LEFT ANTI join — Spark plans broadcast-anti when the parent is small,
    shuffled-anti otherwise; either way the output is one count.
    """
    orphans = child.join(
        parent.select(F.col(parent_key).alias("__pk")).distinct(),
        child[child_key] == F.col("__pk"),
        "left_anti",
    )
    return orphans.agg(
        F.lit(f"fk:{child_key}->{parent_key}").alias("constraint"),
        F.lit(child_table).alias("table_name"),
        F.count(F.lit(1)).cast("long").alias("violations"),
    )


def check_predicate(
    df: DataFrame, table: str, name: str, violated_when: Column
) -> DataFrame:
    """Violations = rows where `violated_when` is TRUE (NULL counts as
    not-violated; add an explicit isNull clause when NULL is bad)."""
    return df.agg(
        F.lit(name).alias("constraint"),
        F.lit(table).alias("table_name"),
        F.coalesce(F.sum(F.when(violated_when, 1).otherwise(0)), F.lit(0))
        .cast("long")
        .alias("violations"),
    )


def check_reconcile(
    detail: DataFrame,
    detail_key: str,
    detail_amount: Column,
    summary: DataFrame,
    summary_key: str,
    summary_amount: str,
    name: str,
    rel_tol: float = 1e-9,
) -> DataFrame:
    """Cross-table reconciliation: violations = summary rows whose stored
    amount differs from the re-aggregated detail amount by more than
    `rel_tol` relative (order totals vs their lines, ledger vs journal,
    daily rollup vs raw events).

    Kept OFF the oracle hash gate deliberately: float re-aggregation order
    differs across engines, so the tolerance comparison is the semantics —
    an exact-hash twin would gate on summation order, not correctness.
    One groupBy on the detail FK then a 1:1 join with the summary — the
    heaviest check in the family, still a single shuffle each side (and
    shuffle-free on the summary side when it is bucketed on the key)."""
    agg = detail.groupBy(F.col(detail_key).alias("__k")).agg(
        F.sum(detail_amount).alias("__computed")
    )
    joined = summary.join(agg, summary[summary_key] == F.col("__k"), "left")
    bad = F.abs(F.col(summary_amount) - F.coalesce(F.col("__computed"), F.lit(0.0))) > (
        rel_tol * F.greatest(F.abs(F.col(summary_amount)), F.lit(1.0))
    )
    return joined.agg(
        F.lit(name).alias("constraint"),
        F.lit("reconcile").alias("table_name"),
        F.coalesce(F.sum(F.when(bad, 1).otherwise(0)), F.lit(0))
        .cast("long")
        .alias("violations"),
    )


def run_checks(checks: list[DataFrame]) -> DataFrame:
    """Union the 1-row check frames into the audit summary."""
    if not checks:
        raise ValueError("run_checks needs at least one check")
    return reduce(DataFrame.unionByName, checks)


@_q(
    "q_dq_checks",
    """
    SELECT 'not_null:c_name' AS constraint, 'customer' AS table_name,
           CAST(count(*) FILTER (WHERE c_name IS NULL) AS BIGINT) AS violations
    FROM customer
    UNION ALL
    SELECT 'unique:o_orderkey', 'orders',
           CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'fk:l_orderkey->o_orderkey', 'lineitem', CAST(count(*) AS BIGINT)
    FROM lineitem l ANTI JOIN orders o ON l.l_orderkey = o.o_orderkey
    UNION ALL
    SELECT 'fk:o_custkey->c_custkey', 'orders', CAST(count(*) AS BIGINT)
    FROM orders o ANTI JOIN customer c ON o.o_custkey = c.c_custkey
    UNION ALL
    SELECT 'range:l_quantity>0', 'lineitem',
           CAST(count(*) FILTER (WHERE NOT (l_quantity > 0)) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'range:0<=l_discount<=1', 'lineitem',
           CAST(count(*) FILTER (
               WHERE NOT (l_discount BETWEEN 0 AND 1)) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'enum:l_returnflag', 'lineitem',
           CAST(count(*) FILTER (
               WHERE l_returnflag NOT IN ('A', 'N', 'R')) AS BIGINT)
    FROM lineitem
    """,
)
def q_dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standing data-quality audit over the star schema: NULL keys, PK
    uniqueness, two FK orphan checks, numeric ranges, and an enum domain —
    one (constraint, table_name, violations) row per check, clean or not.

    Each check is independently scan-bound or single-shuffle (module
    docstring); the union is evaluated as independent stages so a cluster
    runs them concurrently. At 100 TB the audit costs roughly one read of
    each fact table — which is why the checks are unioned into ONE summary
    instead of N separate jobs re-reading the same scans.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    return run_checks(
        [
            check_not_null(customer, "customer", "c_name"),
            check_unique(orders, "orders", "o_orderkey"),
            check_fk(lineitem, "lineitem", "l_orderkey", orders, "o_orderkey"),
            check_fk(orders, "orders", "o_custkey", customer, "c_custkey"),
            check_predicate(
                lineitem,
                "lineitem",
                "range:l_quantity>0",
                ~(F.col("l_quantity") > 0),
            ),
            check_predicate(
                lineitem,
                "lineitem",
                "range:0<=l_discount<=1",
                ~F.col("l_discount").between(0, 1),
            ),
            check_predicate(
                lineitem,
                "lineitem",
                "enum:l_returnflag",
                ~F.col("l_returnflag").isin("A", "N", "R"),
            ),
        ]
    )


@_q(
    "q_profile_table",
    """
    SELECT 'l_quantity' AS column_name,
           CAST(count(*) - count(l_quantity) AS BIGINT) AS n_nulls,
           CAST(count(DISTINCT l_quantity) AS BIGINT) AS n_distinct,
           printf('%.2f', min(l_quantity)) AS min_val,
           printf('%.2f', max(l_quantity)) AS max_val
    FROM lineitem
    UNION ALL
    SELECT 'l_discount', CAST(count(*) - count(l_discount) AS BIGINT),
           CAST(count(DISTINCT l_discount) AS BIGINT),
           printf('%.2f', min(l_discount)), printf('%.2f', max(l_discount))
    FROM lineitem
    UNION ALL
    SELECT 'l_returnflag', CAST(count(*) - count(l_returnflag) AS BIGINT),
           CAST(count(DISTINCT l_returnflag) AS BIGINT),
           min(l_returnflag), max(l_returnflag)
    FROM lineitem
    UNION ALL
    SELECT 'l_shipdate', CAST(count(*) - count(l_shipdate) AS BIGINT),
           CAST(count(DISTINCT l_shipdate) AS BIGINT),
           strftime(min(l_shipdate), '%Y-%m-%d'),
           strftime(max(l_shipdate), '%Y-%m-%d')
    FROM lineitem
    """,
)
def q_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of the fact table (null count, distinct count,
    min/max rendered to stable strings) — the Deequ/pandas-profiling pass
    that runs before anyone writes a query against unfamiliar data, and
    the input to the dq-check thresholds.

    ONE scan produces all profiles: per-column aggregates are computed in
    a single wide agg (count/min/max map-side combine; the exact
    distincts expand via Spark's multi-distinct rewrite), then unpivoted
    to the (column, stats...) report shape driver-side-free. Numeric
    min/max are printf-rendered at fixed precision so the cross-engine
    comparison is on canonical strings, not float formatting."""
    li = load_table(spark, sf_dir, "lineitem")
    n = F.count(F.lit(1))

    def prof(col, mn, mx):
        return F.struct(
            (n - F.count(col)).cast("long").alias("n_nulls"),
            F.countDistinct(col).cast("long").alias("n_distinct"),
            mn.alias("min_val"),
            mx.alias("max_val"),
        ).alias(col)

    agg = li.agg(
        prof(
            "l_quantity",
            F.format_string("%.2f", F.min("l_quantity")),
            F.format_string("%.2f", F.max("l_quantity")),
        ),
        prof(
            "l_discount",
            F.format_string("%.2f", F.min("l_discount")),
            F.format_string("%.2f", F.max("l_discount")),
        ),
        prof("l_returnflag", F.min("l_returnflag"), F.max("l_returnflag")),
        prof(
            "l_shipdate",
            F.date_format(F.min("l_shipdate"), "yyyy-MM-dd"),
            F.date_format(F.max("l_shipdate"), "yyyy-MM-dd"),
        ),
    )
    stacked = agg.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column_name"),
                        F.col(f"{c}.n_nulls").alias("n_nulls"),
                        F.col(f"{c}.n_distinct").alias("n_distinct"),
                        F.col(f"{c}.min_val").alias("min_val"),
                        F.col(f"{c}.max_val").alias("max_val"),
                    )
                    for c in [
                        "l_quantity",
                        "l_discount",
                        "l_returnflag",
                        "l_shipdate",
                    ]
                ]
            )
        ).alias("p")
    )
    return stacked.select("p.*")


@_q(
    "q_table_checksum",
    """
    WITH canon AS (
      SELECT concat_ws('|',
               CAST(o_orderkey AS VARCHAR),
               CAST(o_custkey AS VARCHAR),
               o_orderstatus,
               o_orderpriority,
               strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'),
               printf('%.2f', o_totalprice)) AS row_str
      FROM orders
    )
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST('0x' || substr(md5(row_str), 1, 12) AS BIGINT))
                AS VARCHAR) AS checksum
    FROM canon
    """,
)
def q_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive table content checksum: every row renders to a
    canonical string (ints as decimal, timestamps at second precision,
    money printf'd at 2 decimals — the same fixed-precision trick as
    q_profile_table), hashes to a 48-bit md5 prefix, and the SUM of those
    hashes is the table fingerprint. Two replicas (or two engines, or two
    migration generations) agree iff content matches — the
    cross-environment reconciliation primitive behind "did the backfill
    produce exactly the same table?".

    Sum-of-hashes (vs hash-of-sorted-rows) is what makes it distributed:
    commutative, map-side combinable, no global sort. The sum accumulates
    in exact wide integers — Spark DECIMAL(38,0), DuckDB HUGEINT — because
    48-bit terms overflow int64 after only ~2^15 rows; both render to the
    same decimal string. (bit_xor would dodge overflow but cancels
    duplicate row PAIRS — a checksum that misses double-loads is useless.)

    Scale shape: one scan, one 1-row reduce; nothing else."""
    o = load_table(spark, sf_dir, "orders")
    row_str = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        F.col("o_orderpriority"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"),
        F.format_string("%.2f", F.col("o_totalprice")),
    )
    h48 = F.conv(F.substring(F.md5(row_str.cast("binary")), 1, 12), 16, 10).cast(
        "bigint"
    )
    return o.select(h48.cast("decimal(38,0)").alias("h")).agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum("h").cast("string").alias("checksum"),
    )


@_q(
    "q_impute_median",
    """
    WITH holes AS (
      SELECT c_custkey, c_nationkey,
             CASE WHEN substr(md5(CAST(c_custkey AS VARCHAR) || '#null'), 1, 1)
                       IN ('0', '1') THEN NULL
                  ELSE c_acctbal END AS bal
      FROM customer
    ),
    med AS (
      SELECT c_nationkey, quantile_cont(bal, 0.5) AS med_bal
      FROM holes WHERE bal IS NOT NULL GROUP BY c_nationkey
    )
    SELECT h.c_custkey,
           floor(coalesce(h.bal, m.med_bal) * 100.0 + 0.5) / 100.0
               AS bal_imputed,
           CAST(h.bal IS NULL AS BOOLEAN) AS was_imputed
    FROM holes h JOIN med m ON h.c_nationkey = m.c_nationkey
    """,
)
def q_impute_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-median imputation — the standard numeric-repair step of a
    feature pipeline: null balances (synthesized deterministically by the
    md5 coin, ~12.5% of rows, so the repair path is genuinely exercised)
    are filled with their nation's median of the OBSERVED values, and
    every repair is flagged (silent imputation is an audit bug).

    Scale shape: the per-group median is an aggregate over the non-null
    subset (|nations| rows out) broadcast back onto the scan — no window
    over the fact; the exact median's 100 TB swap-in is
    percentile_approx, as everywhere in this family."""
    c = load_table(spark, sf_dir, "customer")
    coin = F.substring(
        F.md5(F.concat(F.col("c_custkey").cast("string"), F.lit("#null")).cast("binary")),
        1,
        1,
    )
    holes = c.select(
        "c_custkey",
        "c_nationkey",
        F.when(coin.isin("0", "1"), F.lit(None).cast("double")).otherwise(
            F.col("c_acctbal")
        ).alias("bal"),
    )
    med = (
        holes.filter(F.col("bal").isNotNull())
        .groupBy(F.col("c_nationkey").alias("m_key"))
        .agg(F.percentile("bal", F.lit(0.5)).alias("med_bal"))
    )
    return (
        holes.join(F.broadcast(med), holes.c_nationkey == med.m_key)
        .select(
            "c_custkey",
            qround(F.coalesce("bal", "med_bal"), 2).alias("bal_imputed"),
            F.col("bal").isNull().alias("was_imputed"),
        )
    )


DP_EPS = 1.0  # Laplace scale b = sensitivity/eps = 1/eps for counting
DP_SEED = "#dp1"


@_q(
    "q_dp_histogram",
    f"""
    WITH c AS (
      SELECT lang, count(*) AS n FROM documents GROUP BY lang
    ),
    u AS (
      SELECT lang, n,
             CAST('0x' || substr(md5(lang || '{DP_SEED}'), 1, 15) AS BIGINT)
               / {16.0**15} AS u
      FROM c
    )
    SELECT lang, CAST(n AS BIGINT) AS true_count,
           floor((n - (1.0 / {DP_EPS})
                  * (CASE WHEN u >= 0.5 THEN 1.0 ELSE -1.0 END)
                  * ln(1.0 - 2.0 * abs(u - 0.5)))
                 * 10000.0 + 0.5) / 10000.0 AS dp_count
    FROM u
    """,
)
def q_dp_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differential-privacy release SHAPE for a histogram: per-language
    counts plus inverse-CDF Laplace noise at scale 1/ε (sensitivity 1 for
    a count) — the ε-DP counting-query mechanism as a plan. The noise
    draw here is an md5 uniform so the release is REPRODUCIBLE and
    oracle-gated (a deterministic draw is NOT private — a production
    release swaps in one secret RNG draw per group, same plan, same
    noise distribution; this key certifies the mechanism's arithmetic,
    not its secrecy).

    Scale shape: one map-side-combined count into |langs| groups, then
    row-local noise arithmetic — the mechanism costs nothing beyond the
    aggregate at any scale. True counts are emitted alongside so the
    noise magnitude is auditable (drop that column in a real release)."""
    d = load_table(spark, sf_dir, "documents")
    c = d.groupBy("lang").agg(F.count("*").alias("n"))
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("lang"), F.lit(DP_SEED)).cast("binary")),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        / F.lit(16.0**15)
    )
    sign = F.when(u >= 0.5, F.lit(1.0)).otherwise(F.lit(-1.0))
    noise = (1.0 / DP_EPS) * sign * F.log(1.0 - 2.0 * F.abs(u - 0.5))
    return c.select(
        "lang",
        F.col("n").cast("bigint").alias("true_count"),
        qround(F.col("n") - noise, 4).alias("dp_count"),
    )


KANON_K = 5  # minimum safe quasi-identifier group size


@_q(
    "q_kanon_audit",
    f"""
    WITH g AS (
      SELECT lang, source, CAST(n_chars // 100 AS BIGINT) AS len_bucket,
             count(*) AS n
      FROM documents GROUP BY 1, 2, 3
    )
    SELECT lang, source, len_bucket, CAST(n AS BIGINT) AS group_size
    FROM g WHERE n < {KANON_K}
    ORDER BY lang, source, len_bucket
    """,
)
def q_kanon_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier tuple
    (lang, source, 100-char length bucket): every combination shared by
    fewer than {KANON_K} documents is a re-identification risk — the
    release-gating check that runs BESIDE q_pii_scrub (PII removal
    doesn't help if the metadata fingerprint is unique). Emits the
    violating groups; an empty result certifies the release.

    Exact integer bucketing (floor division — DuckDB `//` matches Spark's
    floor()) and counting; one map-side-combined aggregate, group count
    bounded by the quasi-identifier domain, scan-bound at any scale."""
    d = load_table(spark, sf_dir, "documents")
    g = d.groupBy(
        "lang",
        "source",
        F.floor(F.col("n_chars") / 100).cast("bigint").alias("len_bucket"),
    ).agg(F.count("*").alias("n"))
    return g.filter(F.col("n") < KANON_K).select(
        "lang", "source", "len_bucket", F.col("n").cast("bigint").alias("group_size")
    )


DEL_N = 32  # forget-request batch size
DEL_SEED = "del:"


@_q(
    "q_delete_propagation",
    f"""
    WITH subj AS (
      SELECT c_custkey FROM customer
      ORDER BY md5('{DEL_SEED}' || CAST(c_custkey AS VARCHAR)), c_custkey
      LIMIT {DEL_N}
    ),
    o AS (
      SELECT o_orderkey, o_custkey FROM orders
      JOIN subj ON o_custkey = c_custkey
    ),
    l AS (
      SELECT l.l_orderkey FROM lineitem l JOIN o ON l.l_orderkey = o.o_orderkey
    )
    SELECT 'customer' AS table_name,
           CAST((SELECT count(*) FROM subj) AS BIGINT) AS n_rows,
           CAST((SELECT count(*) FROM subj) AS BIGINT) AS n_subjects
    UNION ALL
    SELECT 'orders',
           CAST((SELECT count(*) FROM o) AS BIGINT),
           CAST((SELECT count(DISTINCT o_custkey) FROM o) AS BIGINT)
    UNION ALL
    SELECT 'lineitem',
           CAST((SELECT count(*) FROM l) AS BIGINT),
           CAST((SELECT count(DISTINCT o.o_custkey) FROM l
                 JOIN o ON l.l_orderkey = o.o_orderkey) AS BIGINT)
    """,
)
def q_delete_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten impact plan: given a {DEL_N}-subject deletion
    batch (md5-ordered sample standing in for the request queue), walk the
    foreign-key graph (customer → orders → lineitem) and report rows and
    distinct subjects affected per table — the plan a GDPR deletion job
    reviews BEFORE rewriting 100 TB of immutable parquet (it prices the
    rewrite and proves the cascade is closed). Completes the privacy trio
    with q_pii_scrub (content) and q_kanon_audit (metadata).

    Scale shape: the subject batch is a TakeOrdered broadcast; each hop is
    a broadcast semi-join down the FK chain (orders keys then feed the
    lineitem join — at 100 TB the order-key set may outgrow a broadcast
    and becomes a shuffle semi-join, same topology). Counts only."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    subj = (
        c.select("c_custkey")
        .orderBy(
            F.md5(
                F.concat(F.lit(DEL_SEED), F.col("c_custkey").cast("string")).cast(
                    "binary"
                )
            ),
            "c_custkey",
        )
        .limit(DEL_N)
    )
    oo = o.join(F.broadcast(subj), o.o_custkey == subj.c_custkey).select(
        "o_orderkey", "o_custkey"
    )
    ll = li.join(oo, li.l_orderkey == oo.o_orderkey).select(
        "l_orderkey", "o_custkey"
    )
    rc = subj.agg(
        F.lit("customer").alias("table_name"),
        F.count("*").cast("bigint").alias("n_rows"),
        F.count("*").cast("bigint").alias("n_subjects"),
    )
    ro = oo.agg(
        F.lit("orders").alias("table_name"),
        F.count("*").cast("bigint").alias("n_rows"),
        F.countDistinct("o_custkey").cast("bigint").alias("n_subjects"),
    )
    rl = ll.agg(
        F.lit("lineitem").alias("table_name"),
        F.count("*").cast("bigint").alias("n_rows"),
        F.countDistinct("o_custkey").cast("bigint").alias("n_subjects"),
    )
    return rc.unionAll(ro).unionAll(rl)


SRM_CRIT = 3.841  # chi-square 95th percentile, 1 dof


@_q(
    "q_ab_srm_check",
    f"""
    WITH assign AS (
      SELECT DISTINCT user_id,
             CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
                       IN ('0','1','2','3','4','5','6','7')
                  THEN 'A' ELSE 'B' END AS grp
      FROM events
    ),
    counts AS (
      SELECT sum(CASE WHEN grp = 'A' THEN 1 ELSE 0 END) AS n_a,
             sum(CASE WHEN grp = 'B' THEN 1 ELSE 0 END) AS n_b
      FROM assign
    )
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           floor((n_a - (n_a + n_b) / 2.0) * (n_a - (n_a + n_b) / 2.0)
                 / ((n_a + n_b) / 2.0) * 2.0 * 1000000.0 + 0.5) / 1000000.0
               AS srm_chi2,
           CAST((n_a - (n_a + n_b) / 2.0) * (n_a - (n_a + n_b) / 2.0)
                / ((n_a + n_b) / 2.0) * 2.0 > {SRM_CRIT} AS INT) AS srm_flag
    FROM counts
    """,
)
def q_ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample Ratio Mismatch guardrail — the first check every
    experimentation platform runs before reading any metric: under the
    md5-nibble 50/50 hash assignment, the realized group sizes get a
    1-dof chi-square against the nominal split (symmetric cells make it
    2·(n_a − E)²/E), flagged at the 95th percentile {SRM_CRIT}. A
    triggered SRM means the assignment or logging pipeline is biased and
    q_abtest_lift / q_cuped readouts on it are garbage — the guardrail
    belongs beside them. Exact integer counts; the statistic is the same
    rational expression of those integers on both engines.

    Scale shape: one distinct-user reduce and a 2-cell aggregate —
    scan-bound at any event volume."""
    ev = load_table(spark, sf_dir, "events")
    nib = F.substring(F.md5(F.col("user_id").cast("string").cast("binary")), 1, 1)
    assign = ev.select(
        "user_id", F.when(nib.isin(*"01234567"), "A").otherwise("B").alias("grp")
    ).distinct()
    counts = assign.agg(
        F.sum(F.when(F.col("grp") == "A", 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("grp") == "B", 1).otherwise(0)).alias("n_b"),
    )
    e = (F.col("n_a") + F.col("n_b")) / 2.0
    chi2 = (F.col("n_a") - e) * (F.col("n_a") - e) / e * 2.0
    return counts.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        qround(chi2, 6).alias("srm_chi2"),
        (chi2 > SRM_CRIT).cast("int").alias("srm_flag"),
    )


BLOOM_BITS = 1 << 27  # 16 MiB filter budget per key
LN2 = 0.6931471805599453  # literal so both engines use the identical double


@_q(
    "q_bloom_fpr_plan",
    f"""
    WITH keys AS (
      SELECT 'lineitem' AS tbl, 'l_orderkey' AS key_col,
             count(DISTINCT l_orderkey) AS n FROM lineitem
      UNION ALL
      SELECT 'lineitem', 'l_partkey', count(DISTINCT l_partkey) FROM lineitem
      UNION ALL
      SELECT 'lineitem', 'l_suppkey', count(DISTINCT l_suppkey) FROM lineitem
      UNION ALL
      SELECT 'orders', 'o_custkey', count(DISTINCT o_custkey) FROM orders
    )
    SELECT tbl, key_col, CAST(n AS BIGINT) AS n_distinct,
           CAST({BLOOM_BITS} AS BIGINT) AS m_bits,
           CAST(greatest(floor({BLOOM_BITS} * 1.0 / n * {LN2} + 0.5), 1)
                AS INT) AS k_opt,
           floor(pow(1.0 - exp(-greatest(floor({BLOOM_BITS} * 1.0 / n * {LN2}
                                               + 0.5), 1)
                               * n * 1.0 / {BLOOM_BITS}),
                     greatest(floor({BLOOM_BITS} * 1.0 / n * {LN2} + 0.5), 1))
                 * 100000000.0 + 0.5) / 100000000.0 AS fpr
    FROM keys
    """,
)
def q_bloom_fpr_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter sizing plan for the fact-join keys: given a
    {BLOOM_BITS}-bit (16 MiB) budget per key, the optimal hash count
    k = round(m/n·ln2) and the resulting false-positive rate
    (1 − e^(−kn/m))^k — the arithmetic a 100 TB join-pruning design reads
    BEFORE building runtime filters (Spark's own runtime-filter feature
    and ClickHouse's bloom_filter index face the same m/n/k trade).
    A key whose planned FPR is above ~1% needs a bigger budget or no
    filter at all; the count-distincts are the only data-dependent input.

    ln2 is a shared literal so both engines round the identical double;
    exp/pow operate on identical inputs (libm agreement to the quantized
    1e-8). Scale shape: one column-pruned scan PER KEY, unioned — each
    branch's parquet read touches exactly its one key column, so the
    union does the same total I/O as a single 3-column scan; the
    alternative (one multi-countDistinct aggregate + stack unpivot) was
    measured 2.6x SLOWER at sf0.1 (0.63 s -> 1.67 s) because Spark plans
    multi-distinct as a 3x Expand row blowup through one pipeline while
    the union branches run concurrently. Everything downstream is
    constant arithmetic on 4 rows."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    rows = (
        li.agg(F.countDistinct("l_orderkey").alias("n")).select(
            F.lit("lineitem").alias("tbl"),
            F.lit("l_orderkey").alias("key_col"),
            "n",
        )
        .unionAll(
            li.agg(F.countDistinct("l_partkey").alias("n")).select(
                F.lit("lineitem").alias("tbl"),
                F.lit("l_partkey").alias("key_col"),
                "n",
            )
        )
        .unionAll(
            li.agg(F.countDistinct("l_suppkey").alias("n")).select(
                F.lit("lineitem").alias("tbl"),
                F.lit("l_suppkey").alias("key_col"),
                "n",
            )
        )
        .unionAll(
            o.agg(F.countDistinct("o_custkey").alias("n")).select(
                F.lit("orders").alias("tbl"),
                F.lit("o_custkey").alias("key_col"),
                "n",
            )
        )
    )
    k_opt = F.greatest(
        F.floor(F.lit(BLOOM_BITS) * 1.0 / F.col("n") * LN2 + F.lit(0.5)),
        F.lit(1),
    )
    fpr = F.pow(
        1.0 - F.exp(-k_opt * F.col("n") * 1.0 / BLOOM_BITS), k_opt
    )
    return rows.select(
        "tbl",
        "key_col",
        F.col("n").cast("bigint").alias("n_distinct"),
        F.lit(BLOOM_BITS).cast("bigint").alias("m_bits"),
        k_opt.cast("int").alias("k_opt"),
        (F.floor(fpr * 100000000.0 + F.lit(0.5)) / 100000000.0).alias("fpr"),
    )


POWER_Z_ALPHA = 1.959963984540054  # two-sided alpha = 0.05
POWER_Z_BETA = 0.8416212335729143  # power = 0.80
POWER_MDE = (0.01, 0.02, 0.05)  # absolute detectable lifts


@_q(
    "q_power_analysis",
    f"""
    WITH base AS (
      SELECT avg(conv) AS p, count(*) AS n_users FROM (
        SELECT user_id,
               max(CASE WHEN event_type = 'purchase' AND value > 90
                        THEN 1 ELSE 0 END) AS conv
        FROM events GROUP BY user_id
      )
    ),
    mde AS (SELECT unnest(CAST([{", ".join(str(d) for d in POWER_MDE)}]
                           AS DOUBLE[])) AS mde)
    SELECT mde.mde,
           floor(base.p * 1000000.0 + 0.5) / 1000000.0 AS baseline_rate,
           CAST(ceil(2.0 * ({POWER_Z_ALPHA} + {POWER_Z_BETA})
                     * ({POWER_Z_ALPHA} + {POWER_Z_BETA})
                     * base.p * (1.0 - base.p) / (mde.mde * mde.mde))
                AS BIGINT) AS n_per_arm,
           CAST(ceil(2.0 * ({POWER_Z_ALPHA} + {POWER_Z_BETA})
                     * ({POWER_Z_ALPHA} + {POWER_Z_BETA})
                     * base.p * (1.0 - base.p) / (mde.mde * mde.mde))
                * 2 <= base.n_users AS INT) AS feasible_now
    FROM base CROSS JOIN mde
    """,
)
def q_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B sample-size planner: for each candidate minimum detectable
    effect (absolute lift {POWER_MDE}), the per-arm sample size
    n = 2(z_α/2 + z_β)²·p(1−p)/δ² at α=0.05 two-sided and 80% power,
    seeded by the corpus's own baseline conversion rate (the
    q_abtest_lift conversion definition) — plus whether the CURRENT user
    population could already run that test. The pre-experiment companion
    to q_ab_srm_check (validity) / q_abtest_lift (readout) /
    q_cuped (variance reduction buys a smaller n).

    The z quantiles are shared literals so both engines compute one
    identical double expression; the only data-dependent inputs are one
    user-grain conversion aggregate. Scale: one map-side-combined reduce
    to a 1-row baseline, crossed with a 3-row MDE spine."""
    ev = load_table(spark, sf_dir, "events")
    conv = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 90), 1
            ).otherwise(0)
        ).alias("conv")
    )
    base = conv.agg(
        F.avg("conv").alias("p"), F.count("*").alias("n_users")
    )
    mde = spark.createDataFrame([(d,) for d in POWER_MDE], "mde double")
    z2 = (POWER_Z_ALPHA + POWER_Z_BETA) ** 2
    n_arm = F.ceil(
        2.0 * z2 * F.col("p") * (1.0 - F.col("p")) / (F.col("mde") * F.col("mde"))
    )
    return base.crossJoin(F.broadcast(mde)).select(
        "mde",
        qround(F.col("p"), 6).alias("baseline_rate"),
        n_arm.cast("bigint").alias("n_per_arm"),
        (n_arm * 2 <= F.col("n_users")).cast("int").alias("feasible_now"),
    )
