"""Custom Python DataSource (Spark 4 DataSource API): a deterministic
synthetic documents generator.

Demonstrates the engine's source extensibility the idiomatic way — a
`spark.read.format("synthetic_docs")` source with real partition planning:
the generator is split into N partitions, each produced independently on an
executor from a deterministic per-row hash (no driver-side data, no
randomness), so a 100 TB synthetic corpus materializes with full cluster
parallelism and zero input I/O.

The DataSource class is pickled BY REFERENCE to Python workers, so the
package must be importable on executors: run from the repo root or install
it (pip install .) — same requirement as any packaged UDF module.

Usage:
    from parquet_to_clickhouse_schema_spark.sources.synthetic import register
    register(spark)
    df = (spark.read.format("synthetic_docs")
          .option("n_rows", 10_000).option("n_partitions", 8).load())
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

_VOCAB = [
    "data", "table", "spark", "scan", "join", "filter", "window", "batch",
    "column", "row", "hash", "value", "query", "agg", "part", "order",
]

_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"
_LANGS = ["en", "de", "es", "fr", "zh"]


def _splitmix64(z: int) -> int:
    z = (z + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return z ^ (z >> 31)


def _make_row(i: int):
    h = _splitmix64(i)
    n_tokens = 20 + h % 60
    toks = [
        _VOCAB[_splitmix64(i * 1000 + j) % len(_VOCAB)] for j in range(n_tokens)
    ]
    text = " ".join(toks)
    return (i, text, _LANGS[h % len(_LANGS)], f"src{h % 20}", len(text))


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_partitions = int(options.get("n_partitions", 8))

    def partitions(self):
        step = max(1, self.n_rows // self.n_partitions)
        parts = []
        start = 0
        while start < self.n_rows:
            parts.append(_Range(start, min(start + step, self.n_rows)))
            start += step
        # Spark requires >= 1 partition: an empty source still needs one
        # (empty) range, else the reader is invoked with partition=None
        return parts or [_Range(0, 0)]

    def read(self, partition: _Range):
        for i in range(partition.start, partition.end):
            yield _make_row(i)


class SyntheticDocsSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return SyntheticDocsReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SyntheticDocsSource)
