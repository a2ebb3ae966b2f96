"""Scalar function families (string / date / math / conditional / array /
explode / map / json).

Everything here is built-in pyspark.sql.functions — JVM-side, inside
whole-stage codegen, no Python in the hot path. Outputs that involve
transcendental math (ln, pow) are rounded in both engines: libm
implementations may differ in the last ulp.

Type alignment with the DuckDB oracle: Spark length()/size()/year() return
INT while DuckDB returns BIGINT — both sides cast explicitly so the driver's
schema comparison sees identical types.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_to_clickhouse_schema_spark._registry import new_registry
from parquet_to_clickhouse_schema_spark.functions.compat import qround
from parquet_to_clickhouse_schema_spark.sources.io import load_table

QUERIES, ORACLES, _q = new_registry()


@_q(
    "q_string_funcs",
    """
    SELECT p_partkey,
           lower(p_name) AS lname,
           upper(p_brand) AS ubrand,
           substring(p_type, 1, 4) AS type4,
           concat(p_brand, '_', p_name) AS cname,
           CAST(length(p_name) AS INT) AS name_len,
           replace(p_name, ' ', '_') AS name_us,
           CAST(len(string_split(p_name, ' ')) AS INT) AS n_words,
           trim(concat(' ', p_name, ' ')) AS trimmed
    FROM part
    """,
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function family (concat/substr/upper/trim/lpad/regexp/split and friends) exercised in one row-local projection — whole-stage-codegen JVM expressions, no UDFs."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("lname"),
        F.upper("p_brand").alias("ubrand"),
        F.substring("p_type", 1, 4).alias("type4"),
        F.concat(F.col("p_brand"), F.lit("_"), F.col("p_name")).alias("cname"),
        F.length("p_name").cast("int").alias("name_len"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_us"),
        F.size(F.split("p_name", " ")).cast("int").alias("n_words"),
        F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias("trimmed"),
    )


@_q(
    "q_date_funcs",
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mo,
           CAST(day(o_orderdate) AS INT) AS dy,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT)
               AS days_since_95,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE) AS plus_two_months
    FROM orders
    """,
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function family (trunc, extract, date math, formatting) as one row-local projection with exact cross-engine semantics."""
    o = load_table(spark, sf_dir, "orders")
    od = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(od).cast("int").alias("yr"),
        F.month(od).cast("int").alias("mo"),
        F.dayofmonth(od).cast("int").alias("dy"),
        F.date_trunc("month", od).alias("month_start"),
        F.datediff(od.cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("int")
        .alias("days_since_95"),
        F.add_months(od.cast("date"), 2).alias("plus_two_months"),
    )


@_q(
    "q_math_funcs",
    """
    SELECT l_orderkey, l_linenumber,
           floor((l_extendedprice) * 10.0 + 0.5) / 10.0 AS price_r1,
           CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           floor((abs(l_tax - l_discount)) * 1000000.0 + 0.5) / 1000000.0 AS tax_disc_gap,
           floor((ln(l_extendedprice)) * 1000000.0 + 0.5) / 1000000.0 AS log_price,
           floor((pow(1 + l_discount, 2)) * 1000000.0 + 0.5) / 1000000.0 AS disc_sq,
           floor((sqrt(l_quantity)) * 1000000.0 + 0.5) / 1000000.0 AS qty_sqrt,
           greatest(l_tax, l_discount) AS rate_max,
           least(l_tax, l_discount) AS rate_min
    FROM lineitem
    """,
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function family (abs/ceil/floor/round/exp/ln/pow/sqrt/sign) row-locally, quantized where engines' libm can differ."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        qround(F.col("l_extendedprice"), 1).alias("price_r1"),
        F.ceil("l_extendedprice").cast("bigint").alias("price_ceil"),
        F.floor("l_extendedprice").cast("bigint").alias("price_floor"),
        qround(F.abs(F.col("l_tax") - F.col("l_discount")), 6).alias("tax_disc_gap"),
        qround(F.log(F.col("l_extendedprice")), 6).alias("log_price"),
        qround(F.pow(1 + F.col("l_discount"), 2), 6).alias("disc_sq"),
        qround(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        F.greatest("l_tax", "l_discount").alias("rate_max"),
        F.least("l_tax", "l_discount").alias("rate_min"),
    )


@_q(
    "q_cond_funcs",
    """
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 250000 THEN 'high'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'low' END AS tier,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_label,
           CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS is_urgent
    FROM orders
    """,
)
def q_cond_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional family (CASE/coalesce/nullif/least/greatest/if) — the branching expressions every report composes, row-local."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 250000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("tier"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
            "status_label"
        ),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("is_urgent"),
    )


@_q(
    "q_try_funcs",
    """
    SELECT o_orderkey,
           TRY_CAST(o_orderpriority AS INTEGER) AS prio_as_int,
           TRY_CAST(substring(o_orderpriority, 1, 1) AS INTEGER) AS prio_digit,
           floor((o_totalprice / NULLIF(o_orderkey % 4, 0)) * 100.0 + 0.5) / 100.0
               AS safe_ratio
    FROM orders
    """,
)
def q_try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Safe expressions for dirty data: try_cast yields NULL instead of the
    ANSI runtime error ('1-URGENT' is not an int; its leading digit is),
    and try_divide absorbs the zero divisor. Under Spark 4's default ANSI
    mode these are the difference between a 100 TB job DYING on one
    malformed row and recording a NULL to filter later — the ingest-side
    companion to the quality/PII filters. DuckDB twins: TRY_CAST and
    x / NULLIF(d, 0)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.expr("try_cast(o_orderpriority AS INT)").alias("prio_as_int"),
        F.expr("try_cast(substring(o_orderpriority, 1, 1) AS INT)").alias(
            "prio_digit"
        ),
        qround(
            F.try_divide(F.col("o_totalprice"), F.pmod("o_orderkey", F.lit(4))), 2
        ).alias("safe_ratio"),
    )


@_q(
    "q_array_funcs",
    """
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           floor((CAST(embedding[1] AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS first_val,
           floor((CAST(list_max(embedding) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS max_val,
           floor((CAST(list_min(embedding) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS min_val,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_positive
    FROM embeddings
    """,
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array ops on the 64-d embedding column: size, indexing, min/max, and a
    higher-order filter+count — all JVM-side (F.filter/F.size), no UDF."""
    e = load_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    return e.select(
        "vec_id",
        F.size(emb).cast("int").alias("dim"),
        qround(F.element_at(emb, 1).cast("double"), 6).alias("first_val"),
        qround(F.array_max(emb).cast("double"), 6).alias("max_val"),
        qround(F.array_min(emb).cast("double"), 6).alias("min_val"),
        F.size(F.filter(emb, lambda x: x > 0)).cast("int").alias("n_positive"),
    )


@_q(
    "q_explode",
    """
    SELECT vec_id, floor((CAST(unnest(embedding) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS val
    FROM embeddings
    """,
)
def q_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array → rows (lateral view explode ≡ UNNEST)."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select("vec_id", F.explode("embedding").alias("v0")).select(
        "vec_id", qround(F.col("v0").cast("double"), 6).alias("val")
    )


@_q(
    "q_map_funcs",
    """
    WITH m AS (
      SELECT doc_id, MAP(['lang', 'source'], [lang, source]) AS mp
      FROM documents
    )
    SELECT doc_id,
           map_extract(mp, 'lang')[1] AS lang_val,
           map_extract(mp, 'source')[1] AS source_val,
           CAST(cardinality(mp) AS INT) AS map_size,
           array_to_string(map_keys(mp), ',') AS keys,
           array_to_string(map_values(mp), ',') AS vals
    FROM m
    """,
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + lookup: build a map column from document fields,
    read it back with element_at, report its cardinality. Keys/values are
    serialized with concat_ws — the driver's pandas canonicalizer cannot
    hash array-typed cells, so NO registered query may emit a top-level
    array/map column (guarded in tests/test_contract_guards.py)."""
    d = load_table(spark, sf_dir, "documents")
    m = F.create_map(
        F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
    )
    return d.select(
        "doc_id",
        F.element_at(m, "lang").alias("lang_val"),
        F.element_at(m, "source").alias("source_val"),
        F.size(m).cast("int").alias("map_size"),
        F.concat_ws(",", F.map_keys(m)).alias("keys"),
        F.concat_ws(",", F.map_values(m)).alias("vals"),
    )


@_q(
    "q_json_funcs",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
           CASE WHEN CAST(json_extract_string(props, '$.k') AS INT) >= 50
                THEN 'hi' ELSE 'lo' END AS k_bucket
    FROM events
    """,
)
def q_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from the events.props payload column."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return ev.select(
        "event_id",
        k.alias("k_val"),
        F.when(k >= 50, "hi").otherwise("lo").alias("k_bucket"),
    )


@_q(
    "q_explode_pos",
    """
    SELECT vec_id,
           CAST(unnest(range(0, len(embedding))) AS INT) AS pos,
           floor((CAST(unnest(embedding) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS val
    FROM embeddings
    WHERE vec_id < 100
    """,
)
def q_explode_pos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode (posexplode ≡ UNNEST WITH ORDINALITY; the DuckDB
    twin zips two lockstep unnests). Position matters whenever array index
    is meaningful — embedding dimensions, tokenized positions."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    return e.select("vec_id", F.posexplode("embedding").alias("pos", "v0")).select(
        "vec_id",
        F.col("pos").cast("int").alias("pos"),
        qround(F.col("v0").cast("double"), 6).alias("val"),
    )


@_q(
    "q_variant_json",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
           CAST(json_extract_string(props, '$.k') AS VARCHAR) AS k_str,
           json_extract_string(props, '$.missing') AS missing_field
    FROM events
    """,
)
def q_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through Spark 4's VARIANT type: parse_json
    once into a binary variant, then typed variant_get extractions — the
    modern path for schema-on-read JSON at 100 TB. Unlike per-access
    get_json_object (q_json_funcs), the parse cost is paid ONCE per row
    regardless of how many fields are pulled, and the variant's internal
    dictionary-encoded binary layout keeps repeated-key payloads compact
    through shuffles and parquet (variant shredding).

    try_variant_get returns NULL (not an error) for absent paths and
    failed casts — the dirty-data contract. Row-local, scan-bound,
    whole-stage codegen; the oracle reads the same fields with DuckDB's
    JSON path functions."""
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    return ev.select(
        "event_id",
        F.try_variant_get(v, "$.k", "int").alias("k_int"),
        F.try_variant_get(v, "$.k", "string").alias("k_str"),
        F.try_variant_get(v, "$.missing", "string").alias("missing_field"),
    )
