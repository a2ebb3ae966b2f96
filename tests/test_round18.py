"""Round-18 tests: the three ADVICE r17 fixes.

1. q_context_length_sweep returns 0 rows on an empty corpus (both engines;
   before r18 the global agg's single row stacked into 4 NULL-fraction
   rows while the oracle's CROSS JOIN + GROUP BY yielded 0).
2. The perceptual dedup keys fail LOUDLY (naming the doc_id) instead of
   silently diverging from their oracles when (a) a doc's first 96 chars
   contain a non-single-byte character — F.substring counts characters,
   the oracle's ascii() reads code points — or (b) a payload fails to
   decode (the generic batch iterators mark ok=False for tolerant
   consumers; the dedup oracles hash every length>=96 doc, so a dropped
   row would be an unattributed row-count mismatch).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parquet_to_clickhouse_schema_spark import registry

Q = registry.all_queries()

_DOC_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def test_context_length_sweep_empty_corpus(spark, tmp_path):
    sf = str(tmp_path)
    spark.createDataFrame([], _DOC_SCHEMA).write.parquet(
        f"{sf}/documents.parquet"
    )
    assert Q["q_context_length_sweep"](spark, sf).count() == 0


@pytest.mark.parametrize(
    "key", ["q_image_dhash_dedup", "q_audio_fingerprint_dedup"]
)
def test_perceptual_dedup_nonascii_fails_loud(spark, tmp_path, key):
    """A doc whose 96-char prefix UTF-8-encodes to >96 bytes must fail the
    job with its doc_id, not ship a payload the oracle can't mirror."""
    sf = str(tmp_path)
    good = "a" * 96
    bad = "é" + "a" * 95  # 96 chars, 97 UTF-8 bytes
    spark.createDataFrame(
        [(1, good, "en", "s", 96), (2, bad, "fr", "s", 96)], _DOC_SCHEMA
    ).write.parquet(f"{sf}/documents.parquet")
    with pytest.raises(Exception, match="non-single-byte.*doc_id=2"):
        Q[key](spark, sf).collect()


def test_perceptual_dedup_decode_failure_fails_loud(spark):
    """The _loud_hash guard converts an ok=False row into a job failure
    naming the doc_id (before r18 the row was silently filtered)."""
    from parquet_to_clickhouse_schema_spark.operators.llm import _loud_hash

    df = spark.createDataFrame(
        [(7, 123, True), (8, 0, False)],
        "doc_id long, dhash long, dhash_ok boolean",
    )
    ok = df.filter("doc_id = 7").select(
        "doc_id", _loud_hash("dhash_ok", "dhash", "image")
    )
    assert ok.collect()[0].dhash == 123
    with pytest.raises(Exception, match="image decode failed for doc_id=8"):
        df.select("doc_id", _loud_hash("dhash_ok", "dhash", "image")).collect()


def test_perceptual_dedup_all_rows_kept(spark, tmp_path):
    """Row parity with the oracle's WHERE length(text) >= 96: every
    qualifying doc appears exactly once in the dedup output."""
    sf = str(tmp_path)
    rows = [(i, chr(97 + i % 26) * 100, "en", "s", 100) for i in range(12)]
    rows.append((99, "short", "en", "s", 5))  # below the 96-char floor
    spark.createDataFrame(rows, _DOC_SCHEMA).write.parquet(
        f"{sf}/documents.parquet"
    )
    for key in ("q_image_dhash_dedup", "q_audio_fingerprint_dedup"):
        out = Q[key](spark, sf)
        assert out.count() == 12
        assert out.select("doc_id").distinct().count() == 12


# ---- q_column_sizes (new key, r18) --------------------------------------


def _q6(x: float) -> float:
    import math

    return math.floor(x * 1e6 + 0.5) / 1e6


def test_column_sizes_matches_pure_python(spark):
    """Value-for-value against a plain-Python traversal of the same
    footers (dict aggregation + one divide each, no Spark, no DuckDB)."""
    import pyarrow.parquet as pq

    from parquet_to_clickhouse_schema_spark.operators.training import TABLES
    from tests.conftest import SF_SMOKE

    expect: dict[tuple, list] = {}
    for t in TABLES:
        md = pq.ParquetFile(f"{SF_SMOKE}/{t}.parquet").metadata
        for i in range(md.num_row_groups):
            rg = md.row_group(i)
            for j in range(rg.num_columns):
                c = rg.column(j)
                e = expect.setdefault((t, c.path_in_schema), [0, 0, 0])
                e[0] += 1
                e[1] += c.total_compressed_size
                e[2] += c.total_uncompressed_size
    totals: dict[str, int] = {}
    for (t, _), (_, comp, _) in expect.items():
        totals[t] = totals.get(t, 0) + comp

    got = {
        (r.table_name, r.column_path): r
        for r in Q["q_column_sizes"](spark, SF_SMOKE).collect()
    }
    assert set(got) == set(expect)
    for key, (n, comp, unc) in expect.items():
        r = got[key]
        assert (r.n_chunks, r.compressed_bytes, r.uncompressed_bytes) == (
            n,
            comp,
            unc,
        ), key
        assert r.compression_ratio == _q6(unc / comp), key
        assert r.table_share == _q6(comp / totals[key[0]]), key


def test_column_sizes_consistent_with_parquet_meta(spark):
    """Cross-key invariant: per table, chunk rows sum to
    num_row_groups x num_columns, and table shares sum to ~1."""
    from tests.conftest import SF_SMOKE

    meta = {
        r.table_name: r for r in Q["q_parquet_meta"](spark, SF_SMOKE).collect()
    }
    rows = Q["q_column_sizes"](spark, SF_SMOKE).collect()
    by_table: dict[str, list] = {}
    for r in rows:
        by_table.setdefault(r.table_name, []).append(r)
    assert set(by_table) == set(meta)
    for t, cols in by_table.items():
        assert sum(c.n_chunks for c in cols) == (
            meta[t].num_row_groups * meta[t].num_columns
        ), t
        share = sum(c.table_share for c in cols)
        assert abs(share - 1.0) <= 1e-6 * len(cols) + 1e-9, (t, share)


def test_column_sizes_handles_directory_datasets(spark, tmp_path, monkeypatch):
    """Multi-file tables (the probe corpus / any real lake layout): every
    fragment's footer contributes, and the aggregate equals the sum of
    per-file footers."""
    import pyarrow.parquet as pq

    from parquet_to_clickhouse_schema_spark.operators import training
    from parquet_to_clickhouse_schema_spark.sources.io import load_table
    from tests.conftest import SF_SMOKE

    sf = str(tmp_path)
    d = load_table(spark, SF_SMOKE, "documents")
    d.repartition(3).write.parquet(f"{sf}/documents.parquet")
    monkeypatch.setattr(training, "TABLES", ["documents"])

    got = {
        r.column_path: r for r in Q["q_column_sizes"](spark, sf).collect()
    }
    files = pq.ParquetDataset(f"{sf}/documents.parquet").files
    assert len(files) == 3
    comp: dict[str, int] = {}
    chunks: dict[str, int] = {}
    for fpath in files:
        md = pq.ParquetFile(fpath).metadata
        for i in range(md.num_row_groups):
            rg = md.row_group(i)
            for j in range(rg.num_columns):
                c = rg.column(j)
                comp[c.path_in_schema] = (
                    comp.get(c.path_in_schema, 0) + c.total_compressed_size
                )
                chunks[c.path_in_schema] = chunks.get(c.path_in_schema, 0) + 1
    assert {p: r.compressed_bytes for p, r in got.items()} == comp
    assert {p: r.n_chunks for p, r in got.items()} == chunks
