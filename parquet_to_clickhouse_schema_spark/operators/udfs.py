"""UDF surface: row-at-a-time Python UDF, vectorized pandas UDF, grouped-map
UDAF via applyInPandas.

The hierarchy matters at scale: built-in functions >> pandas UDF (Arrow
batches, one serde per batch) >> Python UDF (pickle per row). The Python UDF
here exists to demonstrate the API; its pandas twin shows the 10-100x-cheaper
form of the same computation.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from parquet_to_clickhouse_schema_spark._registry import new_registry
from parquet_to_clickhouse_schema_spark.functions.compat import qround
from parquet_to_clickhouse_schema_spark.sources.io import load_table

QUERIES, ORACLES, _q = new_registry()


@_q(
    "q_udf_python",
    """
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 250000 THEN 'high'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'low' END AS tier
    FROM orders
    """,
)
def q_udf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (the slow path, kept off fact tables in real
    pipelines; oracle expresses the identical logic in SQL)."""

    @F.udf(T.StringType())
    def tier(total: float) -> str:
        if total > 250000:
            return "high"
        if total > 100000:
            return "mid"
        return "low"

    o = load_table(spark, sf_dir, "orders")
    return o.select("o_orderkey", tier("o_totalprice").alias("tier"))


@_q(
    "q_udf_pandas",
    """
    SELECT l_orderkey, l_linenumber,
           floor((l_extendedprice * (1 - l_discount)) * 100.0 + 0.5) / 100.0 AS net_price
    FROM lineitem
    """,
)
def q_udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas UDF over Arrow batches — numpy does the
    arithmetic on whole columns; rounding happens JVM-side afterwards so
    both engines round the identical double."""

    @F.pandas_udf(T.DoubleType())
    def net(price: pd.Series, discount: pd.Series) -> pd.Series:
        return price * (1.0 - discount)

    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        qround(net("l_extendedprice", "l_discount"), 2).alias("net_price"),
    )


@_q(
    "q_udtf_ngrams",
    """
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks
      FROM documents WHERE doc_id < 100
    )
    SELECT doc_id,
           CAST(unnest(range(0, len(toks) - 1)) AS INT) AS pos,
           unnest(list_transform(range(1, len(toks)),
                                 i -> toks[i] || ' ' || toks[i + 1])) AS bigram
    FROM t
    """,
)
def q_udtf_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function) registered into the SQL surface and
    invoked via LATERAL — PySpark 4's native way to EXTEND the engine's SQL
    vocabulary from Python (the JVM-side SparkSessionExtensions rule-
    injection route needs Scala; UDTF + Python DataSource are the
    Python-first equivalents, see sources/synthetic.py for the latter).

    Emits word bigrams with positions per document. Row-at-a-time like any
    UDTF — kept off the full corpus (doc_id < 100) by a predicate that
    Catalyst pushes into the scan; at 100 TB the set-based form
    (posexplode over a transform'd array, cf. q_explode_pos) is the fast
    path and the DuckDB oracle states it relationally."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, bigram string")
    class Bigrams:
        def eval(self, text: str):  # noqa: ANN001 — UDTF protocol signature
            toks = (text or "").split(" ")
            for i in range(len(toks) - 1):
                yield i, toks[i] + " " + toks[i + 1]

    spark.udtf.register("bigrams", Bigrams)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, b.pos, b.bigram
        FROM _udtf_docs d, LATERAL bigrams(d.text) b
        WHERE d.doc_id < 100
        """
    )


@_q(
    "q_udaf_grouped",
    """
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_items,
           floor((sum(l_extendedprice * l_quantity) / sum(l_quantity)) * 1000000.0 + 0.5) / 1000000.0 AS wavg_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map UDAF (applyInPandas): whole group arrives as one pandas
    DataFrame. At 100 TB a single group must fit in executor memory — fine
    for low-cardinality keys like returnflag; for high-cardinality weighted
    averages the built-in sum/sum form (the oracle SQL) is the right plan."""

    def wavg(pdf: pd.DataFrame) -> pd.DataFrame:
        qty = pdf["l_quantity"]
        price = pdf["l_extendedprice"]
        return pd.DataFrame(
            {
                "l_returnflag": [pdf["l_returnflag"].iloc[0]],
                "n_items": [len(pdf)],
                "wavg_price": [math.floor(float((price * qty).sum() / qty.sum()) * 1e6 + 0.5) / 1e6],
            }
        )

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").applyInPandas(
        wavg, schema="l_returnflag string, n_items bigint, wavg_price double"
    )


@_q(
    "q_udf_arrow",
    """
    SELECT p_partkey,
           lower(replace(p_type, ' ', '_')) || '/' || CAST(p_size AS VARCHAR)
               AS type_slug
    FROM part
    """,
)
def q_udf_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized Python UDF (Spark 4's useArrow=True): the same
    def-with-python-body API as q_udf_python, but inputs arrive as Arrow
    batches instead of per-row pickles — the drop-in migration path that
    removes most of the row-UDF serde tax without rewriting to the
    pandas_udf signature. Completes the UDF matrix: row-pickle (the
    documented slow path), Arrow-batched scalar (this), pandas-vectorized,
    grouped applyInPandas, and the LATERAL UDTF.

    The logic (slugify a type label) is pure string work, expressed
    identically in the SQL oracle."""

    @F.udf(T.StringType(), useArrow=True)
    def slug(ptype: str, size: int) -> str:
        return ptype.lower().replace(" ", "_") + "/" + str(size)

    p = load_table(spark, sf_dir, "part")
    return p.select("p_partkey", slug("p_type", "p_size").alias("type_slug"))
