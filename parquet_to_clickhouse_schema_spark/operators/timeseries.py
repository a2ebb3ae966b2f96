"""Time-series diagnostics over the events stream: autocorrelation and
CUSUM changepoint statistics.

Both follow the aggregate-first discipline the windows/anomaly family
established: the raw fact collapses to a (time-bucket, measure) series via a
map-side-combinable aggregate BEFORE any window or self-join touches it, so
the expensive part is one fact scan and everything after operates on a table
whose size is bounded by the time span, not the event volume — at 100 TB the
hourly series for a month is still 720 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parquet_to_clickhouse_schema_spark._registry import new_registry
from parquet_to_clickhouse_schema_spark.functions.compat import qround
from parquet_to_clickhouse_schema_spark.sources.io import load_table

QUERIES, ORACLES, _q = new_registry()

ACF_LAGS = (1, 2, 3, 6, 12, 24)


@_q(
    "q_acf",
    """
    WITH series AS (
      SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hsec,
             CAST(count(*) AS DOUBLE) AS cnt
      FROM events GROUP BY hsec
    ),
    lags(lag_hours) AS (VALUES (1), (2), (3), (6), (12), (24))
    SELECT lag_hours,
           floor(corr(a.cnt, b.cnt) * 1000000.0 + 0.5) / 1000000.0 AS acf,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM lags
    JOIN series a ON true
    JOIN series b ON b.hsec = a.hsec - lag_hours * 3600
    GROUP BY lag_hours
    """,
)
def q_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the hourly event-count series at lags
    1/2/3/6/12/24 h — the seasonality detector behind q_hourly_profile
    (a strong lag-24 ACF is what tells you a diurnal profile is real).

    Pairs are formed by an equi-join of the series to itself on shifted
    epoch-hour keys (exact integer arithmetic — no interval math to
    disagree on), once per lag via a tiny lag dimension.

    Scale shape: the fact collapses to |hours| rows first; the self-join
    and corr() run on that bounded series (broadcast-sized at any event
    volume), so lag count multiplies a tiny table, never the fact."""
    ev = load_table(spark, sf_dir, "events")
    series = (
        ev.groupBy(
            (F.unix_timestamp(F.date_trunc("hour", F.col("ts")))).alias("hsec")
        )
        .agg(F.count("*").cast("double").alias("cnt"))
    )
    lags = spark.createDataFrame([(lag,) for lag in ACF_LAGS], "lag_hours INT")
    a = series.select(F.col("hsec").alias("a_hsec"), F.col("cnt").alias("a_cnt"))
    b = series.select(F.col("hsec").alias("b_hsec"), F.col("cnt").alias("b_cnt"))
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(
            F.broadcast(b),
            F.col("b_hsec") == F.col("a_hsec") - F.col("lag_hours") * 3600,
        )
    )
    return pairs.groupBy("lag_hours").agg(
        qround(F.corr("a_cnt", "b_cnt"), 6).alias("acf"),
        F.count("*").cast("bigint").alias("n_pairs"),
    )


@_q(
    "q_cusum",
    """
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(count(*) AS DOUBLE) AS cnt
      FROM events GROUP BY event_type, d
    ),
    stats AS (
      SELECT event_type, avg(cnt) AS mu, stddev_samp(cnt) AS sigma
      FROM daily GROUP BY event_type
    ),
    cusum AS (
      SELECT daily.event_type, d,
             sum((cnt - mu) / sigma)
                 OVER (PARTITION BY daily.event_type ORDER BY d) AS s
      FROM daily JOIN stats ON daily.event_type = stats.event_type
    ),
    r AS (
      SELECT event_type, d,
             floor(abs(s) * 1000000.0 + 0.5) / 1000000.0 AS abs_s
      FROM cusum
    ),
    mx AS (
      SELECT event_type, max(abs_s) AS peak_cusum,
             CAST(count(*) AS BIGINT) AS n_days
      FROM r GROUP BY event_type
    )
    SELECT r.event_type, CAST(min(d) AS DATE) AS peak_day,
           any_value(peak_cusum) AS peak_cusum, any_value(n_days) AS n_days
    FROM r JOIN mx ON r.event_type = mx.event_type AND r.abs_s = mx.peak_cusum
    GROUP BY r.event_type
    """,
)
def q_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint statistic per event type: the running sum of
    standardized daily counts; its peak |S| marks the most likely
    level-shift point (Page's cumulative-sum detector over the daily
    series). Output: where each type's drift peaks and how hard.

    Determinism: the peak day is argmax over the ROUNDED |S| with
    earliest-day tiebreak, so cross-engine ulp noise in mean/stddev can't
    flip the winner except exactly at a rounding boundary (same contract
    as the report-tier qround sums).

    Scale shape: the fact collapses to |types| x |days| rows before the
    window; the per-type cumsum sorts those tiny partitions, not events —
    the same aggregate-first discipline as q_anomaly_zscore, so the
    5-value partition key is windowing a ~150-row table, not the fact."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(F.count("*").cast("double").alias("cnt"))
    stats = daily.groupBy(F.col("event_type").alias("st_type")).agg(
        F.avg("cnt").alias("mu"), F.stddev_samp("cnt").alias("sigma")
    )
    w = Window.partitionBy("event_type").orderBy("d")
    cusum = (
        daily.join(F.broadcast(stats), daily.event_type == stats.st_type)
        .withColumn("s", F.sum((F.col("cnt") - F.col("mu")) / F.col("sigma")).over(w))
    )
    rounded = cusum.select(
        "event_type", "d", qround(F.abs("s"), 6).alias("abs_s")
    )
    mx = rounded.groupBy(F.col("event_type").alias("mx_type")).agg(
        F.max("abs_s").alias("peak_cusum"),
        F.count("*").cast("bigint").alias("n_days"),
    )
    return (
        rounded.join(
            F.broadcast(mx),
            (rounded.event_type == mx.mx_type) & (rounded.abs_s == mx.peak_cusum),
        )
        .groupBy("event_type")
        .agg(
            F.min("d").alias("peak_day"),
            F.any_value("peak_cusum").alias("peak_cusum"),
            F.any_value("n_days").alias("n_days"),
        )
    )


@_q(
    "q_chi_square",
    """
    WITH obs AS (
      SELECT event_type, CAST(dayofweek(ts) AS INT) AS dow,
             CAST(count(*) AS DOUBLE) AS o
      FROM events GROUP BY event_type, dow
    ),
    margins AS (
      SELECT event_type, dow, o,
             sum(o) OVER (PARTITION BY event_type) AS row_tot,
             sum(o) OVER (PARTITION BY dow) AS col_tot,
             sum(o) OVER () AS grand
      FROM obs
    )
    SELECT floor(sum((o - row_tot * col_tot / grand)
                     * (o - row_tot * col_tot / grand)
                     / (row_tot * col_tot / grand)) * 10000.0 + 0.5) / 10000.0
               AS chi2,
           CAST((count(DISTINCT event_type) - 1)
                * (count(DISTINCT dow) - 1) AS BIGINT) AS dof,
           CAST(count(*) AS BIGINT) AS n_cells
    FROM margins
    """,
)
def q_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between event type and day-of-week:
    expected counts from the marginals, X² = Σ (O-E)²/E, with degrees of
    freedom — the categorical companion to q_abtest_lift's two-proportion
    z (is WHAT users do independent of WHEN in the week they do it?).

    Spark computes the margins with grouped aggregates + broadcast joins
    (not windows — the contingency table is tiny but the discipline is
    the same); the oracle states the window form over the same cells.

    Scale shape: the fact collapses to |types| x 7 cells map-side;
    everything after is arithmetic on ~35 rows."""
    ev = load_table(spark, sf_dir, "events")
    obs = ev.groupBy(
        "event_type", F.dayofweek("ts").cast("int").alias("dow")
    ).agg(F.count("*").cast("double").alias("o"))
    row_t = obs.groupBy(F.col("event_type").alias("rt_type")).agg(
        F.sum("o").alias("row_tot")
    )
    col_t = obs.groupBy(F.col("dow").alias("ct_dow")).agg(
        F.sum("o").alias("col_tot")
    )
    grand = obs.agg(F.sum("o").alias("grand"))
    cells = (
        obs.join(F.broadcast(row_t), obs.event_type == row_t.rt_type)
        .join(F.broadcast(col_t), obs.dow == col_t.ct_dow)
        .join(F.broadcast(grand))
    )
    e = F.col("row_tot") * F.col("col_tot") / F.col("grand")
    return cells.agg(
        qround(F.sum((F.col("o") - e) * (F.col("o") - e) / e), 4).alias("chi2"),
        (
            (F.countDistinct("event_type") - 1) * (F.countDistinct("dow") - 1)
        ).cast("bigint").alias("dof"),
        F.count("*").cast("bigint").alias("n_cells"),
    )


@_q(
    "q_seasonal_decompose",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(count(*) AS DOUBLE) AS y
      FROM events GROUP BY d
    ),
    trended AS (
      SELECT d, y,
             avg(y) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
                 AS trend,
             CAST(count(*) OVER (ORDER BY d
                                 ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
                  AS BIGINT) AS wnd
      FROM daily
    ),
    seasonal AS (
      SELECT *,
             avg(y - trend) OVER (PARTITION BY dayofweek(d)) AS seas
      FROM trended
    )
    SELECT d, CAST(y AS BIGINT) AS n_events,
           floor(trend * 10000.0 + 0.5) / 10000.0 AS trend,
           floor(seas * 10000.0 + 0.5) / 10000.0 AS seasonal,
           floor((y - trend - seas) * 10000.0 + 0.5) / 10000.0 AS residual,
           wnd AS trend_window
    FROM seasonal
    """,
)
def q_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition of the daily event-count series:
    trend = centered 7-day moving average, seasonal = mean detrended
    value per day-of-week, residual = the rest — the STL-flavored
    pre-step behind every 'is this drop a trend break or just Sunday?'
    question (q_cusum finds WHERE the level shifts; this explains what
    the level IS).

    Cross-engine: trend averages integer counts over the identical
    centered frame (edges use the truncated frame on both engines —
    trend_window exposes the effective width); the per-dow seasonal mean
    averages the same ~4 detrended doubles.

    Scale shape: the fact collapses to |days| rows first; every window
    runs over that calendar-bounded table (the one global ORDER BY frame
    is over ~30 rows — at a 10-year span still only ~3 650)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").cast("date").alias("d")).agg(
        F.count("*").cast("double").alias("y")
    )
    w7 = Window.orderBy("d").rowsBetween(-3, 3)
    trended = daily.select(
        "d",
        "y",
        F.avg("y").over(w7).alias("trend"),
        F.count("*").over(w7).cast("bigint").alias("wnd"),
    )
    wdow = Window.partitionBy(F.dayofweek("d"))
    seasonal = trended.withColumn(
        "seas", F.avg(F.col("y") - F.col("trend")).over(wdow)
    )
    return seasonal.select(
        "d",
        F.col("y").cast("bigint").alias("n_events"),
        qround(F.col("trend"), 4).alias("trend"),
        qround(F.col("seas"), 4).alias("seasonal"),
        qround(F.col("y") - F.col("trend") - F.col("seas"), 4).alias("residual"),
        F.col("wnd").alias("trend_window"),
    )


@_q(
    "q_rolling_corr",
    """
    WITH hourly AS (
      SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 AS h,
             CAST(count(*) FILTER (WHERE event_type = 'click') AS DOUBLE)
                 AS clicks,
             CAST(count(*) FILTER (WHERE event_type = 'purchase') AS DOUBLE)
                 AS purchases
      FROM events GROUP BY h
    )
    SELECT CAST(h * 3600 AS BIGINT) AS hsec,
           CAST(clicks AS BIGINT) AS clicks,
           CAST(purchases AS BIGINT) AS purchases,
           floor(corr(clicks, purchases)
                     OVER (ORDER BY h ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
                 * 1000000.0 + 0.5) / 1000000.0 AS corr_24h,
           CAST(count(*) OVER (ORDER BY h ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
                AS BIGINT) AS wnd
    FROM hourly
    """,
)
def q_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 24-hour correlation between the click and purchase hourly
    series — the co-movement monitor (a correlation collapse between
    traffic and conversions is an incident signal a static corr hides).

    The hour key is integer epoch-hours (exact arithmetic) and the
    conditional counts ride ONE grouped pass. The correlation itself is
    the closed-form two-pass formula over window SUMS (n, Σx, Σy, Σxy,
    Σx², Σy²) — all exact integer-valued doubles, so no cancellation —
    with an explicit zero-variance guard returning NULL: Spark's corr
    aggregate THROWS DIVIDE_BY_ZERO under ANSI mode when a frame's
    series is constant (sparse corpora hit this; DuckDB's corr returns
    NULL), so the guard is a correctness requirement, not a nicety.
    qround(1e-6) absorbs the ulp gap vs DuckDB's recurrence-based corr.
    Missing hours would shrink the frame identically on both engines
    (wnd exposes the effective width).

    Scale shape: the fact collapses to |hours| rows first; the windowed
    corr runs over the calendar-bounded series — the aggregate-first
    discipline of this whole module."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        (F.unix_timestamp(F.date_trunc("hour", F.col("ts"))) / 3600)
        .cast("bigint")
        .alias("h")
    ).agg(
        F.count(F.when(F.col("event_type") == "click", 1)).cast("double").alias("clicks"),
        F.count(F.when(F.col("event_type") == "purchase", 1))
        .cast("double")
        .alias("purchases"),
    )
    w = Window.orderBy("h").rowsBetween(-23, Window.currentRow)
    x, y = F.col("clicks"), F.col("purchases")
    n = F.count("*").over(w).cast("double")
    sx = F.sum(x).over(w)
    sy = F.sum(y).over(w)
    sxy = F.sum(x * y).over(w)
    sxx = F.sum(x * x).over(w)
    syy = F.sum(y * y).over(w)
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    r = F.when(
        (vx > 0) & (vy > 0), (n * sxy - sx * sy) / F.sqrt(vx * vy)
    ).otherwise(F.lit(None).cast("double"))
    return hourly.select(
        (F.col("h") * 3600).alias("hsec"),
        F.col("clicks").cast("bigint").alias("clicks"),
        F.col("purchases").cast("bigint").alias("purchases"),
        qround(r, 6).alias("corr_24h"),
        n.cast("bigint").alias("wnd"),
    )


PSI_BUCKETS = 10  # reference-decile buckets


@_q(
    "q_drift_psi",
    f"""
    WITH v AS (
      SELECT epoch_us(ts) AS us,
             floor(value * 10000.0 + 0.5) / 10000.0 AS val
      FROM events
    ),
    mid AS (SELECT floor((min(us) + max(us)) / 2.0) AS m FROM v),
    ref AS (SELECT val FROM v, mid WHERE us <= m),
    cur AS (SELECT val FROM v, mid WHERE us > m),
    b AS (
      SELECT quantile_cont(val, [x / {PSI_BUCKETS}.0
                                 for x in range(1, {PSI_BUCKETS})]) AS bnds
      FROM ref
    ),
    rc AS (
      SELECT CAST(len(list_filter(bnds, x -> val > x)) AS INT) AS bucket,
             count(*) AS n
      FROM ref CROSS JOIN b GROUP BY 1
    ),
    cc AS (
      SELECT CAST(len(list_filter(bnds, x -> val > x)) AS INT) AS bucket,
             count(*) AS n
      FROM cur CROSS JOIN b GROUP BY 1
    ),
    nt AS (
      SELECT (SELECT count(*) FROM ref) AS nr, (SELECT count(*) FROM cur) AS nc
    ),
    spine AS (SELECT CAST(unnest(range(0, {PSI_BUCKETS})) AS INT) AS bucket)
    SELECT s.bucket,
           CAST(COALESCE(rc.n, 0) AS BIGINT) AS n_ref,
           CAST(COALESCE(cc.n, 0) AS BIGINT) AS n_cur,
           floor(((COALESCE(cc.n, 0) + 0.5) / (nt.nc + {PSI_BUCKETS} * 0.5)
                  - (COALESCE(rc.n, 0) + 0.5) / (nt.nr + {PSI_BUCKETS} * 0.5))
                 * ln(((COALESCE(cc.n, 0) + 0.5) / (nt.nc + {PSI_BUCKETS} * 0.5))
                      / ((COALESCE(rc.n, 0) + 0.5) / (nt.nr + {PSI_BUCKETS} * 0.5)))
                 * 1000000.0 + 0.5) / 1000000.0 AS psi_contrib
    FROM spine s
    LEFT JOIN rc ON rc.bucket = s.bucket
    LEFT JOIN cc ON cc.bucket = s.bucket
    CROSS JOIN nt
    """,
)
def q_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the first and second half of the
    event stream's time range — THE standard distribution-drift monitor
    for a long-running ingestion pipeline (PSI < 0.1 stable, > 0.25 act).
    Buckets are the REFERENCE period's deciles (q_quantile_bucketize's
    exact-interpolation boundary discipline over 1e-4-pre-rounded values),
    counts are Laplace-smoothed (+0.5) so an empty bucket yields a finite
    contribution instead of ln(0), and a {PSI_BUCKETS}-row spine guarantees
    every bucket reports even when empty in both halves.

    Determinism: the split point is integer-microsecond arithmetic
    (floor((min+max)/2) — exact doubles below 2^53); boundary comparisons
    run on pre-rounded values (engine-stable); only the final contribution
    is 1e-6-quantized.

    Scale shape: two scans (boundaries over ref, then bucket-assign all
    rows against the broadcast 1-row boundary array) and a {PSI_BUCKETS}-row
    join spine — no sort, no window, no driver state. At 100 TB swap exact
    percentile for percentile_approx in the same plan (the documented
    q_quantile_bucketize swap)."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        qround(F.col("value"), 4).alias("val"),
    )
    mid = v.agg(
        F.floor((F.min("us") + F.max("us")) / 2.0).alias("m")
    )
    # r18: ONE bucket-count pass for both halves instead of four separate
    # corpus scans (rc, cc, and the two nt counts): tag each row is_ref,
    # group by (is_ref, bucket), and derive rc/cc/nt from the resulting
    # <= 2x{PSI_BUCKETS}+2-row table (lazily checkpointed so the three
    # consumers read the materialized counts, not three re-scans). Three
    # corpus passes total — min/max, ref percentile, bucket counts — which
    # is the floor for exact reference-decile PSI. Row-identical: every
    # ref/cur row lands in exactly one bucket (a NULL val filters to
    # bucket 0 in both engines), nr/nc are the same sums regrouped, and
    # the empty-input coalesce keeps the degenerate-corpus output finite
    # exactly as the old count(*) form was.
    half = v.crossJoin(F.broadcast(mid)).select(
        "val", (F.col("us") <= F.col("m")).alias("is_ref")
    )
    fracs = [i / PSI_BUCKETS for i in range(1, PSI_BUCKETS)]
    bnds = half.filter(F.col("is_ref")).agg(
        F.percentile("val", F.lit(fracs)).alias("bnds")
    )
    bucket = F.size(F.filter("bnds", lambda x: F.col("val") > x)).cast("int")
    cnt = (
        half.crossJoin(F.broadcast(bnds))
        .groupBy("is_ref", bucket.alias("bucket"))
        .agg(F.count("*").alias("n"))
        .localCheckpoint(eager=False)
    )
    rc = cnt.filter(F.col("is_ref")).select("bucket", F.col("n").alias("n_r"))
    cc = cnt.filter(~F.col("is_ref")).select("bucket", F.col("n").alias("n_c"))
    nt = cnt.agg(
        F.coalesce(
            F.sum(F.when(F.col("is_ref"), F.col("n"))), F.lit(0).cast("bigint")
        ).alias("nr"),
        F.coalesce(
            F.sum(F.when(~F.col("is_ref"), F.col("n"))), F.lit(0).cast("bigint")
        ).alias("nc"),
    )
    spine = spark.range(PSI_BUCKETS).select(F.col("id").cast("int").alias("bucket"))
    sm = float(PSI_BUCKETS) * 0.5
    p_ref = (F.coalesce(F.col("n_r"), F.lit(0)) + 0.5) / (F.col("nr") + sm)
    p_cur = (F.coalesce(F.col("n_c"), F.lit(0)) + 0.5) / (F.col("nc") + sm)
    return (
        spine.join(rc, "bucket", "left")
        .join(cc, "bucket", "left")
        .crossJoin(F.broadcast(nt))
        .select(
            "bucket",
            F.coalesce(F.col("n_r"), F.lit(0)).cast("bigint").alias("n_ref"),
            F.coalesce(F.col("n_c"), F.lit(0)).cast("bigint").alias("n_cur"),
            qround((p_cur - p_ref) * F.log(p_cur / p_ref), 6).alias(
                "psi_contrib"
            ),
        )
    )


KS_A, KS_B = "click", "purchase"
KS_CRIT = 1.358  # alpha = 0.05 two-sample coefficient


@_q(
    "q_ks_test",
    f"""
    WITH v AS (
      SELECT event_type AS g,
             floor(value * 10000.0 + 0.5) / 10000.0 AS val
      FROM events WHERE event_type IN ('{KS_A}', '{KS_B}')
    ),
    n AS (
      SELECT sum(CASE WHEN g = '{KS_A}' THEN 1 ELSE 0 END) AS n1,
             sum(CASE WHEN g = '{KS_B}' THEN 1 ELSE 0 END) AS n2
      FROM v
    ),
    pts AS (
      SELECT val,
             sum(CASE WHEN g = '{KS_A}' THEN 1 ELSE 0 END) AS c1,
             sum(CASE WHEN g = '{KS_B}' THEN 1 ELSE 0 END) AS c2
      FROM v GROUP BY val
    ),
    cum AS (
      SELECT val,
             sum(c1) OVER (ORDER BY val) AS k1,
             sum(c2) OVER (ORDER BY val) AS k2
      FROM pts
    ),
    d AS (
      SELECT max(abs(k1 * 1.0 / n.n1 - k2 * 1.0 / n.n2)) AS d_raw
      FROM cum CROSS JOIN n
    )
    SELECT CAST(n.n1 AS BIGINT) AS n1, CAST(n.n2 AS BIGINT) AS n2,
           floor(d.d_raw * 1000000.0 + 0.5) / 1000000.0 AS d_stat,
           floor({KS_CRIT} * sqrt((n.n1 + n.n2) * 1.0 / (n.n1 * n.n2))
                 * 1000000.0 + 0.5) / 1000000.0 AS d_crit_05,
           floor(d.d_raw * 1000000.0 + 0.5)
             > floor({KS_CRIT} * sqrt((n.n1 + n.n2) * 1.0 / (n.n1 * n.n2))
                     * 1000000.0 + 0.5) AS reject_05
    FROM d CROSS JOIN n
    """,
)
def q_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test between the '{KS_A}' and
    '{KS_B}' value distributions: D = max |ECDF₁ − ECDF₂| evaluated at
    every distinct value, against the α=0.05 critical value
    {KS_CRIT}·√((n₁+n₂)/(n₁n₂)) — the binless companion to q_drift_psi
    (PSI needs bucket choices; KS does not) and to q_chi_square
    (categorical vs continuous).

    Determinism: values pre-quantized to 1e-4 before grouping, ECDFs are
    exact integer-count ratios, the reject flag compares the two QUANTIZED
    statistics (identical integers both engines — no raw-float boundary).

    Scale shape: the fact collapses to per-distinct-value counts first
    (map-side combinable, cardinality-bounded); the cumulative window then
    runs over distinct values only. That window is a single global sort —
    the q_window_rank-class serialization; at 100 TB swap in the two-pass
    contiguous-block cumsum (the q_shard_plan pattern) over value-range
    blocks, oracle-identical."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type").isin(KS_A, KS_B)).select(
        F.col("event_type").alias("g"), qround(F.col("value"), 4).alias("val")
    )
    n = v.agg(
        F.sum((F.col("g") == KS_A).cast("int")).alias("n1"),
        F.sum((F.col("g") == KS_B).cast("int")).alias("n2"),
    )
    pts = v.groupBy("val").agg(
        F.sum((F.col("g") == KS_A).cast("int")).alias("c1"),
        F.sum((F.col("g") == KS_B).cast("int")).alias("c2"),
    )
    w = Window.orderBy("val").rowsBetween(Window.unboundedPreceding, 0)
    cum = pts.select(
        F.sum("c1").over(w).alias("k1"), F.sum("c2").over(w).alias("k2")
    )
    d = cum.crossJoin(F.broadcast(n)).agg(
        F.max(
            F.abs(F.col("k1") * 1.0 / F.col("n1") - F.col("k2") * 1.0 / F.col("n2"))
        ).alias("d_raw")
    )
    crit = F.lit(KS_CRIT) * F.sqrt(
        (F.col("n1") + F.col("n2")) * 1.0 / (F.col("n1") * F.col("n2"))
    )
    dq = F.floor(F.col("d_raw") * 1000000.0 + F.lit(0.5))
    cq = F.floor(crit * 1000000.0 + F.lit(0.5))
    return d.crossJoin(F.broadcast(n)).select(
        F.col("n1").cast("bigint").alias("n1"),
        F.col("n2").cast("bigint").alias("n2"),
        (dq / 1000000.0).alias("d_stat"),
        (cq / 1000000.0).alias("d_crit_05"),
        (dq > cq).alias("reject_05"),
    )


@_q(
    "q_mann_whitney",
    f"""
    WITH v AS (
      SELECT event_type AS g,
             floor(value * 10000.0 + 0.5) / 10000.0 AS val
      FROM events WHERE event_type IN ('{KS_A}', '{KS_B}')
    ),
    n AS (
      SELECT sum(CASE WHEN g = '{KS_A}' THEN 1 ELSE 0 END) AS n1,
             sum(CASE WHEN g = '{KS_B}' THEN 1 ELSE 0 END) AS n2
      FROM v
    ),
    pts AS (
      SELECT val,
             sum(CASE WHEN g = '{KS_A}' THEN 1 ELSE 0 END) AS c1,
             count(*) AS ct
      FROM v GROUP BY val
    ),
    ar AS (
      SELECT val, c1, ct,
             COALESCE(sum(ct) OVER (ORDER BY val
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING), 0)
               + (ct + 1.0) / 2.0 AS avg_rank
      FROM pts
    ),
    r AS (SELECT sum(c1 * avg_rank) AS r1 FROM ar)
    SELECT CAST(n.n1 AS BIGINT) AS n1, CAST(n.n2 AS BIGINT) AS n2,
           floor((r.r1 - n.n1 * (n.n1 + 1.0) / 2.0) * 100.0 + 0.5) / 100.0
               AS u1,
           floor(((r.r1 - n.n1 * (n.n1 + 1.0) / 2.0) - n.n1 * n.n2 / 2.0)
                 / sqrt(n.n1 * n.n2 * (n.n1 + n.n2 + 1.0) / 12.0)
                 * 1000000.0 + 0.5) / 1000000.0 AS z_score
    FROM r CROSS JOIN n
    """,
)
def q_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) test between the '{KS_A}' and
    '{KS_B}' value distributions: U₁ from tie-averaged ranks, normal
    z-approximation (untied variance — the tie correction shifts z < 0.1%
    at these tie rates and is a documented refinement, not an accuracy
    bug). The rank-based companion to q_ks_test: KS asks "same shape?",
    U asks "is one stochastically larger?".

    Tie-averaged ranks come from per-distinct-value counts: every tied
    observation gets (rows before the tie group) + (group size + 1)/2 —
    exact rational arithmetic on integer counts; z is one quantized
    division at the end.

    Scale shape: identical to q_ks_test (per-value counts, one
    distinct-value cumulative window, two 1-row joins) and the same
    two-pass block-cumsum swap applies at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type").isin(KS_A, KS_B)).select(
        F.col("event_type").alias("g"), qround(F.col("value"), 4).alias("val")
    )
    n = v.agg(
        F.sum((F.col("g") == KS_A).cast("int")).alias("n1"),
        F.sum((F.col("g") == KS_B).cast("int")).alias("n2"),
    )
    pts = v.groupBy("val").agg(
        F.sum((F.col("g") == KS_A).cast("int")).alias("c1"),
        F.count("*").alias("ct"),
    )
    wprev = Window.orderBy("val").rowsBetween(Window.unboundedPreceding, -1)
    ar = pts.select(
        "c1",
        (
            F.coalesce(F.sum("ct").over(wprev), F.lit(0))
            + (F.col("ct") + 1.0) / 2.0
        ).alias("avg_rank"),
    )
    r = ar.agg(F.sum(F.col("c1") * F.col("avg_rank")).alias("r1"))
    u1 = F.col("r1") - F.col("n1") * (F.col("n1") + 1.0) / 2.0
    z = (u1 - F.col("n1") * F.col("n2") / 2.0) / F.sqrt(
        F.col("n1") * F.col("n2") * (F.col("n1") + F.col("n2") + 1.0) / 12.0
    )
    return r.crossJoin(F.broadcast(n)).select(
        F.col("n1").cast("bigint").alias("n1"),
        F.col("n2").cast("bigint").alias("n2"),
        qround(u1, 2).alias("u1"),
        qround(z, 6).alias("z_score"),
    )


FC_SEASON = 24  # hours


@_q(
    "q_forecast_baseline",
    f"""
    WITH series AS (
      SELECT event_type,
             CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 AS h,
             CAST(count(*) AS DOUBLE) AS y
      FROM events GROUP BY 1, 2
    ),
    j AS (
      SELECT a.event_type, a.y,
             b.y AS y_seasonal,
             c.y AS y_naive
      FROM series a
      JOIN series b ON b.event_type = a.event_type
                   AND b.h = a.h - {FC_SEASON}
      JOIN series c ON c.event_type = a.event_type AND c.h = a.h - 1
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_hours,
           floor(avg(abs(y - y_seasonal)) * 10000.0 + 0.5) / 10000.0
               AS mae_seasonal,
           floor(avg(abs(y - y_naive)) * 10000.0 + 0.5) / 10000.0 AS mae_naive,
           CASE WHEN avg(abs(y - y_naive)) = 0 THEN NULL
                ELSE floor(avg(abs(y - y_seasonal)) / avg(abs(y - y_naive))
                           * 1000000.0 + 0.5) / 1000000.0 END AS mase
    FROM j GROUP BY event_type
    """,
)
def q_forecast_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecasting-baseline scorecard per event type: MAE of the
    seasonal-naive forecast (ŷ_h = y_{{h−{FC_SEASON}}}) against the naive
    forecast (ŷ_h = y_{{h−1}}), and their ratio (MASE-style) — the sanity
    bar every fancy forecaster must beat, and a seasonality detector in
    its own right (MASE < 1 ⇒ last-day structure beats last-hour, i.e.
    the diurnal cycle q_hourly_profile/q_acf suggest is real enough to
    forecast with).

    Exact-integer hour keys (epoch//3600) make the lag joins equi-joins
    with no interval arithmetic; only hours with BOTH lags present score
    (the honest eval window). Scale shape: the fact collapses to
    |types|×|hours| rows first; everything after runs on the bounded
    series — the q_acf aggregate-first discipline."""
    ev = load_table(spark, sf_dir, "events")
    series = ev.groupBy(
        "event_type",
        F.floor(
            F.unix_timestamp(F.date_trunc("hour", F.col("ts"))) / 3600
        ).alias("h"),
    ).agg(F.count("*").cast("double").alias("y"))
    a = series.alias("a")
    b = series.select(
        F.col("event_type").alias("bt"), F.col("h").alias("bh"), F.col("y").alias("y_seasonal")
    )
    c = series.select(
        F.col("event_type").alias("ct"), F.col("h").alias("ch"), F.col("y").alias("y_naive")
    )
    j = (
        a.join(
            F.broadcast(b),
            (F.col("bt") == F.col("a.event_type"))
            & (F.col("bh") == F.col("a.h") - FC_SEASON),
        )
        .join(
            F.broadcast(c),
            (F.col("ct") == F.col("a.event_type"))
            & (F.col("ch") == F.col("a.h") - 1),
        )
        .select("a.event_type", "a.y", "y_seasonal", "y_naive")
    )
    mae_s = F.avg(F.abs(F.col("y") - F.col("y_seasonal")))
    mae_n = F.avg(F.abs(F.col("y") - F.col("y_naive")))
    return j.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_hours"),
        qround(mae_s, 4).alias("mae_seasonal"),
        qround(mae_n, 4).alias("mae_naive"),
        F.when(mae_n == 0, F.lit(None).cast("double"))
        .otherwise(qround(mae_s / mae_n, 6))
        .alias("mase"),
    )


@_q(
    "q_twap",
    """
    WITH v AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             epoch_us(ts) AS us, value, event_id
      FROM events
    ),
    w AS (
      SELECT event_type, day, value,
             lead(us) OVER (PARTITION BY event_type, day
                            ORDER BY us, event_id) - us AS dur
      FROM v
    )
    SELECT event_type, day,
           CAST(count(*) AS BIGINT) AS n_samples,
           floor(sum(value * dur) / sum(dur) * 1000000.0 + 0.5) / 1000000.0
               AS twap,
           floor(avg(value) * 1000000.0 + 0.5) / 1000000.0 AS plain_avg
    FROM w WHERE dur IS NOT NULL AND dur > 0
    GROUP BY event_type, day
    """,
)
def q_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (TWAP) of the event value per type and day:
    each sample is weighted by how long it REMAINED the latest observation
    (lead-timestamp gap) — the correct mean for irregularly-sampled
    metrics, where the plain average over-weights bursts (both are
    emitted so the bias is visible). The financial-market TWAP and the
    metrics-system rollup are this same operator.

    Exact integer microsecond durations; zero-duration ties drop (they
    carried the value for no time); the last observation of each day has
    no duration and is excluded (the honest open-interval convention).

    Scale shape: one lead window per (type, day) partition — calendar ×
    type bounded, never a one-task global sort — then a
    map-side-combined aggregate to |types|×|days| rows."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type",
        F.date_trunc("day", "ts").cast("date").alias("day"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "value",
        "event_id",
    )
    w = Window.partitionBy("event_type", "day").orderBy("us", "event_id")
    d = v.withColumn("dur", F.lead("us").over(w) - F.col("us")).filter(
        F.col("dur").isNotNull() & (F.col("dur") > 0)
    )
    return d.groupBy("event_type", "day").agg(
        F.count("*").cast("bigint").alias("n_samples"),
        qround(F.sum(F.col("value") * F.col("dur")) / F.sum("dur"), 6).alias(
            "twap"
        ),
        qround(F.avg("value"), 6).alias("plain_avg"),
    )


KM_HORIZONS = (7, 30, 90)  # days


@_q(
    "q_km_survival",
    f"""
    WITH mx AS (SELECT max(o_orderdate) AS mend FROM orders),
    firsts AS (
      SELECT o_custkey, min(o_orderdate) AS t1 FROM orders GROUP BY 1
    ),
    seconds AS (
      SELECT o.o_custkey, min(o.o_orderdate) AS t2
      FROM orders o JOIN firsts f
        ON o.o_custkey = f.o_custkey AND o.o_orderdate > f.t1
      GROUP BY 1
    ),
    obs AS (
      SELECT f.o_custkey,
             CASE WHEN s.t2 IS NOT NULL
                  THEN date_diff('day', CAST(f.t1 AS DATE), CAST(s.t2 AS DATE))
                  ELSE date_diff('day', CAST(f.t1 AS DATE),
                                 CAST(mx.mend AS DATE)) END AS t,
             CASE WHEN s.t2 IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM firsts f LEFT JOIN seconds s USING (o_custkey) CROSS JOIN mx
    ),
    n AS (SELECT count(*) AS n0 FROM obs),
    times AS (SELECT t, sum(ev) AS d, count(*) AS c FROM obs GROUP BY t),
    risk AS (
      SELECT t, d,
             n.n0 - COALESCE(sum(c) OVER (ORDER BY t
                                          ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND 1 PRECEDING), 0) AS at_risk
      FROM times CROSS JOIN n
    ),
    evs AS (
      SELECT t, ln(greatest(1e-300, 1.0 - d * 1.0 / at_risk)) AS lf
      FROM risk WHERE d > 0
    )
    SELECT CAST(h.h AS INT) AS horizon_days,
           floor(exp(COALESCE(sum(CASE WHEN evs.t <= h.h THEN evs.lf END),
                              0.0)) * 1000000.0 + 0.5) / 1000000.0
               AS km_survival
    FROM (SELECT unnest({list(KM_HORIZONS)}) AS h) h
    LEFT JOIN evs ON evs.t <= h.h
    GROUP BY h.h
    """,
)
def q_km_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival of "time to second order" per customer, with
    RIGHT-CENSORING done properly: one-order customers are censored at the
    corpus end date instead of dropped (dropping them is the classic
    retention-overestimate bug), and S(h) = Π over event days ≤ h of
    (1 − d_t/n_t) is evaluated at {KM_HORIZONS}-day horizons — the
    churn/repeat-purchase curve behind every retention decision.

    The product is computed as exp(Σ ln factors) — the cumulative-product
    trick with one quantize at the end (a terminal day where everyone
    still at risk converts gives factor 0; it is clamped to 1e-300 so
    both engines produce an exact quantized 0 instead of a ln(0) error); at-risk counts come from a
    prefix sum over the (distinct-day, counts) table, so the serial
    window touches only distinct durations, never customers.

    Scale shape: two per-customer MIN frontiers, one duration-bounded
    cumsum, a 3-row horizon join. Exact integer day arithmetic."""
    o = load_table(spark, sf_dir, "orders")
    mend = o.agg(F.max("o_orderdate").alias("mend"))
    firsts = o.groupBy("o_custkey").agg(F.min("o_orderdate").alias("t1"))
    seconds = (
        o.join(firsts, "o_custkey")
        .filter(F.col("o_orderdate") > F.col("t1"))
        .groupBy("o_custkey")
        .agg(F.min("o_orderdate").alias("t2"))
    )
    obs = (
        firsts.join(seconds, "o_custkey", "left")
        .crossJoin(F.broadcast(mend))
        .select(
            F.when(
                F.col("t2").isNotNull(),
                F.datediff(F.col("t2").cast("date"), F.col("t1").cast("date")),
            )
            .otherwise(
                F.datediff(F.col("mend").cast("date"), F.col("t1").cast("date"))
            )
            .alias("t"),
            F.when(F.col("t2").isNotNull(), F.lit(1)).otherwise(F.lit(0)).alias(
                "ev"
            ),
        )
    )
    n = obs.agg(F.count("*").alias("n0"))
    times = obs.groupBy("t").agg(F.sum("ev").alias("d"), F.count("*").alias("c"))
    wprev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    risk = times.crossJoin(F.broadcast(n)).select(
        "t",
        "d",
        (
            F.col("n0") - F.coalesce(F.sum("c").over(wprev), F.lit(0))
        ).alias("at_risk"),
    )
    evs = risk.filter(F.col("d") > 0).select(
        "t",
        F.log(
            F.greatest(F.lit(1e-300), 1.0 - F.col("d") * 1.0 / F.col("at_risk"))
        ).alias("lf"),
    )
    horizons = spark.createDataFrame([(h,) for h in KM_HORIZONS], "h INT")
    return (
        horizons.join(evs, evs.t <= horizons.h, "left")
        .groupBy(F.col("h").cast("int").alias("horizon_days"))
        .agg(
            (
                F.floor(
                    F.exp(
                        F.coalesce(
                            F.sum(F.when(F.col("t") <= F.col("h"), F.col("lf"))),
                            F.lit(0.0),
                        )
                    )
                    * 1000000.0
                    + F.lit(0.5)
                )
                / 1000000.0
            ).alias("km_survival")
        )
    )


@_q(
    "q_max_concurrency",
    """
    WITH iv AS (
      SELECT * FROM (
        SELECT o.o_orderpriority AS prio, o.o_orderdate AS t_open,
               max(l.l_shipdate) AS t_close
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate
      ) WHERE t_close > t_open
    ),
    b AS (
      SELECT prio, t_open AS ts, 1 AS delta FROM iv
      UNION ALL
      SELECT prio, t_close AS ts, -1 AS delta FROM iv
    ),
    net AS (SELECT prio, ts, sum(delta) AS net FROM b GROUP BY prio, ts),
    cum AS (
      SELECT prio, ts,
             sum(net) OVER (PARTITION BY prio ORDER BY ts) AS open_now
      FROM net
    ),
    pk AS (SELECT prio, max(open_now) AS peak FROM cum GROUP BY prio)
    SELECT cum.prio AS o_orderpriority,
           CAST(pk.peak AS BIGINT) AS peak_open_orders,
           min(cum.ts) AS peak_ts
    FROM cum JOIN pk ON cum.prio = pk.prio AND cum.open_now = pk.peak
    GROUP BY cum.prio, pk.peak
    """,
)
def q_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak interval concurrency per priority class — the maxIntersections
    aggregate ClickHouse ships (the reference's target engine), answered
    here by the classic sweep line: each order is an in-flight interval
    [orderdate, last item shipdate), boundaries become +1/−1 deltas,
    same-timestamp deltas NET inside one aggregate (so boundary tie order
    can never matter), and the running sum's maximum is the peak load,
    with the earliest timestamp attaining it. This is the capacity
    question behind connection pools, warehouse staffing and stream-join
    state sizing. Inverted spans (last shipment at or before the open
    date — dirty data the synthetic corpus really contains) are dropped
    in BOTH engines: a sweep line requires open <= close, and a
    non-positive span covers no instant anyway.

    Scale shape, two distinct regimes (measured r13): the SWEEP is
    calendar-bounded — its input `net` is DISTINCT (priority, timestamp)
    keys, measured at exactly 12,500 rows at BOTH sf0.1 and 20× (the
    q_shard_plan two-pass block cumsum is the swap if a use case ever
    keyed boundaries by microsecond) — but the INTERVAL COLLAPSE is
    input-bound and dominates wall at scale (r13 breakdown: 3.4 s of the
    3.8 s 20× wall). It therefore aggregates FIRST: lineitem collapses to
    max(l_shipdate) per l_orderkey (map-side combine on 2 narrow columns)
    BEFORE joining orders, instead of shuffling every fat joined row into
    a post-join groupBy — measured 2.1× faster at sf0.1 and 1.55× at 20×,
    identical output. Exact integer counting end to end, half-open
    intervals ([t,t) nets to 0)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    li_close = li.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("t_close"))
    iv = (
        o.join(li_close, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.col("o_orderpriority").alias("prio"),
            F.col("o_orderdate").alias("t_open"),
            "t_close",
        )
        .filter(F.col("t_close") > F.col("t_open"))
    )
    b = iv.select("prio", F.col("t_open").alias("ts"), F.lit(1).alias("delta")).unionAll(
        iv.select("prio", F.col("t_close").alias("ts"), F.lit(-1).alias("delta"))
    )
    net = b.groupBy("prio", "ts").agg(F.sum("delta").alias("net"))
    w = Window.partitionBy("prio").orderBy("ts").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = net.withColumn("open_now", F.sum("net").over(w))
    pk = cum.groupBy("prio").agg(F.max("open_now").alias("peak")).select(
        F.col("prio").alias("pk_prio"), "peak"
    )
    return (
        cum.join(
            F.broadcast(pk),
            (F.col("prio") == F.col("pk_prio"))
            & (F.col("open_now") == F.col("peak")),
        )
        .groupBy(F.col("prio").alias("o_orderpriority"), F.col("peak"))
        .agg(F.min("ts").alias("peak_ts"))
        .select(
            "o_orderpriority",
            F.col("peak").cast("bigint").alias("peak_open_orders"),
            "peak_ts",
        )
    )
