"""Custom Python DataSource: deterministic synthetic documents generator."""

from pyspark.sql import functions as F

from parquet_to_clickhouse_schema_spark.sources.synthetic import register


def test_synthetic_source_reads_with_partitions(spark):
    register(spark)
    df = (
        spark.read.format("synthetic_docs")
        .option("n_rows", 2000)
        .option("n_partitions", 8)
        .load()
    )
    assert df.count() == 2000
    assert df.rdd.getNumPartitions() == 8
    assert set(df.columns) == {"doc_id", "text", "lang", "source", "n_chars"}
    # ids complete and unique
    assert df.select("doc_id").distinct().count() == 2000


def test_synthetic_source_deterministic_and_composable(spark):
    register(spark)
    df = spark.read.format("synthetic_docs").option("n_rows", 500).load()
    a = df.agg(F.sum("n_chars")).first()[0]
    b = (
        spark.read.format("synthetic_docs")
        .option("n_rows", 500)
        .load()
        .agg(F.sum("n_chars"))
        .first()[0]
    )
    assert a == b
    # composes with the engine's operators like any other source
    stats = (
        df.groupBy("lang")
        .agg(F.count("*").alias("n"), F.avg("n_chars").alias("avg_chars"))
        .collect()
    )
    assert sum(r.n for r in stats) == 500
