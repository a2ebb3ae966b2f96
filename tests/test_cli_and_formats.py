"""CLI parity with the reference schemagen + format source/sink round-trips."""

import subprocess
import sys

from pyspark.sql import types as T

from parquet_to_clickhouse_schema_spark.sources.formats import (
    lakehouse_available,
    overwrite_partitions_dynamic,
    read_csv,
    read_json,
    read_orc,
    write_compacted,
    write_partitioned,
)
from parquet_to_clickhouse_schema_spark.sources.io import load_table
from tests.conftest import SF_SMOKE


def test_cli_matches_reference_flags(tmp_path):
    out = tmp_path / "schema.sql"
    res = subprocess.run(
        [
            sys.executable,
            "-m",
            "parquet_to_clickhouse_schema_spark.cli",
            "--parquet-path",
            f"{SF_SMOKE}/lineitem.parquet",
            "--clickhouse-schema-path",
            str(out),
            "--table-name",
            "lineitem",
            "--primary-key",
            "l_orderkey",
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=120,
    )
    assert res.returncode == 0, res.stderr
    ddl = out.read_text()
    assert ddl.startswith("drop table if exists lineitem;\n")
    assert "    l_orderkey Int64\n" in ddl
    assert res.stdout == ddl  # CLI echoes the DDL like a unix filter


def test_cli_missing_flag_errors(tmp_path):
    res = subprocess.run(
        [sys.executable, "-m", "parquet_to_clickhouse_schema_spark.cli", "--table-name", "x"],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=60,
    )
    assert res.returncode == 2
    assert "--parquet-path" in res.stderr


def test_csv_json_orc_roundtrip(spark, tmp_path):
    src = load_table(spark, SF_SMOKE, "nation")
    schema = T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    )
    for fmt, reader in [("csv", read_csv), ("json", read_json)]:
        p = str(tmp_path / fmt)
        getattr(src.write.mode("overwrite").option("header", "true"), fmt)(p)
        back = reader(spark, p, schema)
        assert sorted(tuple(r) for r in back.collect()) == sorted(
            tuple(r) for r in src.collect()
        )
    p = str(tmp_path / "orc")
    src.write.mode("overwrite").orc(p)
    assert read_orc(spark, p).count() == src.count()


def test_partitioned_write_enables_pruning(spark, tmp_path):
    from parquet_to_clickhouse_schema_spark.plans.inspect import executed_plan

    ev = load_table(spark, SF_SMOKE, "events")
    p = str(tmp_path / "by_type")
    write_partitioned(ev, p, ["event_type"])
    back = spark.read.parquet(p).filter("event_type = 'purchase'")
    n_purchase = back.count()
    assert 0 < n_purchase < ev.count()
    # partition pruning: only the purchase partition is listed
    assert "purchase" in executed_plan(back)


def test_compacted_write_controls_file_count(spark, tmp_path):
    import glob

    li = load_table(spark, SF_SMOKE, "lineitem")
    p = str(tmp_path / "compact")
    write_compacted(li, p, 2)
    files = glob.glob(f"{p}/*.parquet")
    assert len(files) == 2


def test_text_and_binary_file_sources(spark, tmp_path):
    from parquet_to_clickhouse_schema_spark.sources.formats import (
        read_binary_files,
        read_text,
    )

    (tmp_path / "a.txt").write_text("line one\nline two\n")
    (tmp_path / "b.bin").write_bytes(b"\x00\x01\x02payload")
    lines = read_text(spark, str(tmp_path / "a.txt"))
    assert {r.value for r in lines.collect()} == {"line one", "line two"}
    whole = read_text(spark, str(tmp_path / "a.txt"), whole=True)
    assert whole.count() == 1

    bins = read_binary_files(spark, str(tmp_path), glob="*.bin")
    rows = bins.collect()
    assert len(rows) == 1
    assert bytes(rows[0].content) == b"\x00\x01\x02payload"
    assert rows[0].length == 10


def test_xml_source_and_datasource_probe(spark, tmp_path):
    from parquet_to_clickhouse_schema_spark.sources.formats import (
        datasource_available,
        read_xml,
    )

    (tmp_path / "t.xml").write_text(
        "<rows><row><a>1</a><b>x</b></row><row><a>2</a><b>y</b></row></rows>"
    )
    df = read_xml(spark, str(tmp_path / "t.xml"), row_tag="row")
    assert {(r.a, r.b) for r in df.collect()} == {(1, "x"), (2, "y")}
    assert datasource_available(spark, "xml")
    assert datasource_available(spark, "parquet")
    # avro is built-in-but-external; its jar is not shipped in this image
    assert not datasource_available(spark, "avro")
    # a format that does not exist at all must probe unavailable too
    # (regression: Spark 4's DATA_SOURCE_NOT_FOUND error class was not
    # matched, so unknown formats reported available)
    assert not datasource_available(spark, "no_such_format_xyz")


def test_dynamic_partition_overwrite_replaces_only_touched(spark, tmp_path):
    """Backfilling one partition rewrites that partition and leaves the
    rest byte-identical (static mode would truncate them all)."""
    from pyspark.sql import functions as F

    o = load_table(spark, SF_SMOKE, "orders")
    p = str(tmp_path / "by_prio")
    write_partitioned(o, p, ["o_orderpriority"])
    before_other = (
        spark.read.parquet(p).filter("o_orderpriority <> '1-URGENT'").count()
    )
    fix = (
        o.filter("o_orderpriority = '1-URGENT'")
        .withColumn("o_totalprice", F.lit(0.0))
    )
    overwrite_partitions_dynamic(fix, p, ["o_orderpriority"])
    back = spark.read.parquet(p)
    urgent = back.filter("o_orderpriority = '1-URGENT'")
    assert urgent.count() == fix.count()
    assert urgent.filter("o_totalprice <> 0.0").count() == 0
    assert back.filter("o_orderpriority <> '1-URGENT'").count() == before_other
    # conf restored to the safer default after the write
    assert spark.conf.get("spark.sql.sources.partitionOverwriteMode").upper() == "STATIC"


def test_lakehouse_probe_runs():
    avail = lakehouse_available()
    assert set(avail) == {"delta", "pyiceberg"}


def test_write_sorted_produces_prunable_row_groups(tmp_path, spark):
    """write_sorted's files must cover narrow, mostly-disjoint sort-key
    ranges (the zone-map property parquet min/max stats give a reader),
    while a plain hash-distributed write leaves every file spanning
    ~the full key range — the layout that defeats row-group skipping."""
    import glob as globmod

    import pyarrow.parquet as pq

    from parquet_to_clickhouse_schema_spark.sources.formats import write_sorted
    from parquet_to_clickhouse_schema_spark.sources.io import load_table

    li = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity")

    sorted_path = str(tmp_path / "sorted")
    plain_path = str(tmp_path / "plain")
    write_sorted(li, sorted_path, ["l_orderkey"], n_files=8)
    li.repartition(8).write.parquet(plain_path)

    def file_ranges(root):
        spans = []
        for f in sorted(globmod.glob(f"{root}/*.parquet")):
            md = pq.ParquetFile(f).metadata
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(0).statistics
                mins.append(st.min)
                maxs.append(st.max)
            if mins:
                spans.append((min(mins), max(maxs)))
        return spans

    key_span = max(m for _, m in file_ranges(plain_path)) + 1
    sorted_spans = file_ranges(sorted_path)
    plain_spans = file_ranges(plain_path)
    # sorted layout: each file covers a small slice of the key space
    assert all((hi - lo) < key_span / 3 for lo, hi in sorted_spans), sorted_spans
    # plain layout: files span ~everything (sanity that the test can fail)
    assert all((hi - lo) > key_span * 0.9 for lo, hi in plain_spans), plain_spans
    # and a selective reader would touch few sorted files: count overlaps
    probe_lo, probe_hi = 0, key_span // 20
    touched = sum(1 for lo, hi in sorted_spans if hi >= probe_lo and lo <= probe_hi)
    assert touched <= 2, sorted_spans


def test_write_partitioned_one_file_per_value_and_prunes(tmp_path, spark):
    """write_partitioned (r15, the third layout recipe): the pre-
    partitionBy repartition must hash-cluster rows so each partition
    value lands in exactly ONE data file (the naive write produces up to
    |values| x |tasks| tiny files), and a predicate on the partition
    column must reach the scan's PartitionFilters so Spark lists only
    qualifying directories."""
    import glob as globmod

    from pyspark.sql import functions as F

    from parquet_to_clickhouse_schema_spark.plans.inspect import executed_plan
    from parquet_to_clickhouse_schema_spark.sources.formats import (
        write_partitioned,
    )
    from parquet_to_clickhouse_schema_spark.sources.io import load_table

    ev = load_table(spark, SF_SMOKE, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    n_days = ev.select("event_date").distinct().count()
    p = str(tmp_path / "by_day")
    write_partitioned(ev, p, ["event_date"])

    dirs = globmod.glob(f"{p}/event_date=*")
    assert len(dirs) == n_days
    for d in dirs:
        assert len(globmod.glob(f"{d}/*.parquet")) == 1, d

    back = spark.read.parquet(p).filter(F.col("event_date") == "2024-01-05")
    plan = executed_plan(back)
    pf = [ln for ln in plan.splitlines() if "PartitionFilters:" in ln]
    assert pf and "2024-01-05" in pf[0], plan[:400]
    # round-trip: the partitioned copy holds every row
    assert back.count() == ev.filter(F.col("event_date") == "2024-01-05").count()

    # files_per_value=k: the salt splits each value into >1 but <=k files
    # (the 300-GB-day escape hatch) and the round-trip still holds
    p3 = str(tmp_path / "by_day_salted")
    # n_tasks pins the task count: AQE would otherwise re-merge the tiny
    # test-sized salt groups (its small-files guard — right at scale,
    # defeats the mechanism check here)
    write_partitioned(
        ev, p3, ["event_date"], files_per_value=3, n_tasks=n_days * 3
    )
    per_dir = [
        len(globmod.glob(f"{d}/*.parquet"))
        for d in globmod.glob(f"{p3}/event_date=*")
    ]
    assert max(per_dir) <= 3 and max(per_dir) > 1, per_dir
    assert spark.read.parquet(p3).count() == ev.count()


def test_zorder_layout_prunes_on_both_dimensions(tmp_path, spark):
    """Z-ordered files must be prunable for selective predicates on EITHER
    interleaved dimension, where a single-column sort only prunes its own
    sort key. Checked from real parquet footer min/max stats: for a narrow
    probe on each dimension, the fraction of files whose [min,max] overlaps
    the probe must be well under 1 under z-order; the single-sort layout
    overlaps ~all files on the non-sorted dimension."""
    import glob as globmod

    import pyarrow.parquet as pq

    from parquet_to_clickhouse_schema_spark.sources.formats import (
        write_sorted,
        write_zordered,
    )
    from parquet_to_clickhouse_schema_spark.sources.io import load_table

    li = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_suppkey")
    zpath, spath = str(tmp_path / "z"), str(tmp_path / "s")
    write_zordered(li, zpath, ["l_orderkey", "l_suppkey"], n_files=16)
    write_sorted(li, spath, ["l_orderkey"], n_files=16)

    def overlap_frac(root, col_idx, lo, hi):
        files = sorted(globmod.glob(f"{root}/*.parquet"))
        n_hit = 0
        for f in files:
            md = pq.ParquetFile(f).metadata
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(col_idx).statistics
                mins.append(st.min)
                maxs.append(st.max)
            if mins and max(maxs) >= lo and min(mins) <= hi:
                n_hit += 1
        return n_hit / len(files)

    okey_hi = 300  # ~20% slice of l_orderkey (0..1499)
    skey_hi = 3  # ~40% slice of l_suppkey (0..9 at this SF)
    # z-order prunes on BOTH dimensions (the 40% suppkey probe can at best
    # overlap ~40-50% of files; measured 0.56/0.50 — range boundaries are
    # count-based so files straddle z-quadrants, costing a little pruning)
    assert overlap_frac(zpath, 0, 0, okey_hi) <= 0.7
    assert overlap_frac(zpath, 1, 0, skey_hi) <= 0.6
    # single-column sort prunes its key but is blind on the other dimension
    assert overlap_frac(spath, 0, 0, okey_hi) <= 0.3
    assert overlap_frac(spath, 1, 0, skey_hi) >= 0.9


def test_zorder_null_column_fails_fast(tmp_path, spark):
    """ADVICE r5: an all-NULL z-order column used to surface as an opaque
    int(None) TypeError — it must raise a clear ValueError naming the
    column."""
    import pytest

    from parquet_to_clickhouse_schema_spark.sources.formats import write_zordered

    df = spark.createDataFrame([(1, None), (2, None)], "a long, b long")
    with pytest.raises(ValueError, match="'b'.*non-NULL|non-NULL.*'b'"):
        write_zordered(df, str(tmp_path / "z"), ["a", "b"], n_files=2)


def test_zorder_wide_span_exact_integer_buckets(spark):
    """ADVICE r5: bucket scaling for key spans wider than ~2^40 used to go
    through double division — a value just under a bucket boundary rounded
    up across it. The integer `div` helper must match exact Python integer
    math, including at values chosen to break double rounding."""
    from pyspark.sql import functions as F

    from parquet_to_clickhouse_schema_spark.sources.formats import (
        _zorder_bucket_expr,
    )

    bits = 12
    span = 2**50
    # values one below / at bucket boundaries near the top of the range —
    # exactly where float division rounds across the boundary
    vals = [0, 1, 2**38 - 1, 2**38, 1000 * 2**38 - 1, span - 2**38, span - 1]
    want = [min(2**bits - 1, v * 2**bits // span) for v in vals]
    df = spark.createDataFrame([(v,) for v in vals], "k long")
    got = [
        r["bkt"]
        for r in df.select(
            "k", _zorder_bucket_expr("k", 0, span, bits).alias("bkt")
        )
        .orderBy("k")
        .collect()
    ]
    assert got == want


def test_zorder_beyond_multiply_safe_span(spark):
    """Spans too wide for (span-1)*2^bits to fit a long take the
    divide-first path — still exact, no overflow."""
    from parquet_to_clickhouse_schema_spark.sources.formats import (
        _zorder_bucket_expr,
    )

    bits = 12
    span = 2**55  # > 2^(62-12)
    width = -(-span // 2**bits)
    vals = [0, width - 1, width, span - 1]
    want = [min(2**bits - 1, v // width) for v in vals]
    df = spark.createDataFrame([(v,) for v in vals], "k long")
    got = [
        r["bkt"]
        for r in df.select(
            "k", _zorder_bucket_expr("k", 0, span, bits).alias("bkt")
        )
        .orderBy("k")
        .collect()
    ]
    assert got == want


def test_read_avro_raises_actionable_error_when_jar_absent(spark):
    """VERDICT r5 #8: this runtime has no spark-avro jar, so read_avro must
    fail with a clear message naming the missing package, not a cryptic
    DATA_SOURCE_NOT_FOUND from inside Spark."""
    import pytest

    from parquet_to_clickhouse_schema_spark.sources.formats import read_avro

    with pytest.raises(RuntimeError, match="spark-avro"):
        read_avro(spark, "/tmp/nonexistent.avro")


def test_compact_small_files_reduces_count_preserves_rows(tmp_path, spark):
    from parquet_to_clickhouse_schema_spark.sources.formats import (
        compact_small_files,
        file_stats,
    )

    src = str(tmp_path / "frag")
    dst = str(tmp_path / "compact")
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    # fragment into many tiny files (the streaming-sink failure mode)
    li.repartition(64).write.parquet(src)
    assert file_stats(src)["n_files"] == 64
    report = compact_small_files(spark, src, dst, target_mb=128)
    assert report["before"]["n_files"] == 64
    # whole table is far under one 128 MB target file
    assert report["n_files_target"] == 1
    assert report["after"]["n_files"] == 1
    assert spark.read.parquet(dst).count() == li.count()


def test_compact_small_files_with_sort_restores_clustering(tmp_path, spark):
    import pyarrow.parquet as pq

    from parquet_to_clickhouse_schema_spark.sources.formats import (
        compact_small_files,
    )

    src = str(tmp_path / "frag")
    dst = str(tmp_path / "clustered")
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    li.repartition(32).write.parquet(src)
    compact_small_files(spark, src, dst, target_mb=0.05, sort_cols=["l_orderkey"])
    # every output file must cover a narrow l_orderkey range (zone-map
    # friendly); with random fragmentation each file would span ~the full key
    import glob
    import os

    lo_hi = []
    for f in sorted(glob.glob(os.path.join(dst, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        col_idx = [md.schema.column(i).name for i in range(md.num_columns)].index(
            "l_orderkey"
        )
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col_idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        lo_hi.append((min(mins), max(maxs)))
    assert len(lo_hi) >= 2
    # disjoint (or nearly) ranges: sorted by lo, each file's hi stays below
    # the next file's hi, and overlaps are boundary-only
    lo_hi.sort()
    for (lo1, hi1), (lo2, hi2) in zip(lo_hi, lo_hi[1:]):
        assert hi1 <= hi2
        assert lo2 >= lo1


def test_compact_small_files_empty_dir_raises(tmp_path, spark):
    import pytest

    from parquet_to_clickhouse_schema_spark.sources.formats import (
        compact_small_files,
    )

    (tmp_path / "empty").mkdir()
    with pytest.raises(ValueError):
        compact_small_files(spark, str(tmp_path / "empty"), str(tmp_path / "o"))


def test_export_for_clickhouse_roundtrip(spark, tmp_path):
    """The ClickHouse handoff: DDL file + TabSeparated gz data readable
    back with the escaping/NULL/timestamp conventions intact."""
    import gzip
    import pathlib

    from pyspark.sql import functions as F

    from parquet_to_clickhouse_schema_spark.sources.formats import (
        export_for_clickhouse,
    )

    df = spark.createDataFrame(
        [
            (1, "plain", 1.5, None),
            (2, "tab\there", 2.0, "2024-01-02 03:04:05.123456"),
            (3, None, None, "2024-06-30 23:59:59"),
            (4, "back\\slash and\nnewline\rcr", -0.25, None),
        ],
        "id long, name string, score double, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp")).withColumn(
        "blob", F.when(F.col("id") == 1, F.encode(F.lit("hi\tthere"), "utf-8"))
    )
    out = str(tmp_path / "export")
    ddl = export_for_clickhouse(df, out, "t_export", "id", n_files=1)
    assert ddl.startswith("drop table if exists t_export;")
    assert "id Int64" in ddl and "primary key (id)" in ddl
    assert (tmp_path / "export" / "schema.sql").read_text() == ddl
    gz = sorted(pathlib.Path(out, "data").glob("*.txt.gz"))
    assert len(gz) == 1
    lines = gzip.decompress(gz[0].read_bytes()).decode().splitlines()
    assert len(lines) == 4
    rows = {ln.split("\t")[0]: ln.split("\t") for ln in lines}
    import base64

    assert rows["1"][:4] == ["1", "plain", "1.5", r"\N"]
    # binary exports as base64 TEXT (documented representation change):
    # the raw bytes would need TSV escaping; base64 is unambiguous
    assert base64.b64decode(rows["1"][4]) == b"hi\tthere"
    assert rows["2"][4] == r"\N"
    assert rows["2"][1] == r"tab\there"
    assert rows["2"][3] == "2024-01-02 03:04:05.123456"  # DateTime64(6) precision kept
    assert rows["3"][1] == r"\N" and rows["3"][2] == r"\N"
    # complex columns are rejected up front, not silently mis-rendered
    import pytest as _pytest

    bad = df.withColumn("arr", F.array(F.lit("x")))
    with _pytest.raises(ValueError, match="complex columns"):
        export_for_clickhouse(bad, str(tmp_path / "bad"), "t_bad", "id")
    assert rows["4"][1] == r"back\\slash and\nnewline\rcr"


def test_layout_pruning_gate_footer_equals_data(spark):
    """q_layout_pruning's footer-only answer must equal the data answer:
    bucket counts sum to the table count, buckets tile the key range
    disjointly, and the compacted bucket-0 row matches the partitioned
    bucket-0 row (rewrite lost nothing)."""
    from parquet_to_clickhouse_schema_spark.operators.core import q_layout_pruning
    from parquet_to_clickhouse_schema_spark.sources.io import load_table
    from tests.conftest import SF_SMOKE

    rows = {(r.stage, r.bucket): r for r in q_layout_pruning(spark, SF_SMOKE).collect()}
    li = load_table(spark, SF_SMOKE, "lineitem")
    total = li.count()
    part = [rows[k] for k in rows if k[0] == "partitioned"]
    assert sum(r.n_rows for r in part) == total
    # value-range buckets are ordered and disjoint
    part.sort(key=lambda r: r.bucket)
    for a, b in zip(part, part[1:]):
        assert a.max_key < b.min_key
    comp = rows[("compacted", 0)]
    p0 = rows[("partitioned", 0)]
    assert (comp.n_rows, comp.min_key, comp.max_key) == (p0.n_rows, p0.min_key, p0.max_key)


def test_cli_list_queries_catalog():
    """--list-queries prints every registered key with its gate status and
    supports substring filtering; the catalog agrees with the registry."""
    import contextlib
    import io

    from parquet_to_clickhouse_schema_spark import registry
    from parquet_to_clickhouse_schema_spark.catalog import describe_queries
    from parquet_to_clickhouse_schema_spark.cli import main

    rows = describe_queries()
    assert {r["key"] for r in rows} == set(registry.all_queries())
    gated = {r["key"] for r in rows if r["oracle"]}
    assert gated == set(registry.all_oracles())
    assert all(r["description"] for r in rows)  # every operator documented

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["--list-queries"])
    assert rc == 0
    out = buf.getvalue()
    assert "q_agg_hash" in out and str(len(rows)) in out

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        main(["--list-queries", "minhash"])
    filtered = buf.getvalue()
    assert "q_near_dedup_minhash" in filtered and "q_agg_hash" not in filtered


def test_catalog_descriptions_fully_resolved():
    """ADVICE r11 regression: every registered description must have its
    {CONSTANT} / {CONSTANT:.0%} / {EXPR + 1} docstring placeholders resolved
    — an expression token used to KeyError the whole-string str.format and
    leave ALL tokens raw for that query. Math notation like y_{t-1}
    (lowercase) is allowed; constant-style tokens are not."""
    import re

    from parquet_to_clickhouse_schema_spark.catalog import describe_queries

    unresolved = [
        (r["key"], r["description"])
        for r in describe_queries()
        if re.search(r"\{[A-Z_]{2,}", r["description"])
    ]
    assert unresolved == []


def test_cli_list_queries_prefix_is_not_catalog_mode(tmp_path):
    """ADVICE r11 regression: only the exact --list-queries flag (or
    --list-queries=FILTER) enters catalog mode, and a typoed extra flag in
    catalog mode errors instead of being silently swallowed."""
    import contextlib
    import io

    import pytest

    from parquet_to_clickhouse_schema_spark.cli import main

    # a future flag sharing the prefix must NOT be swallowed into catalog
    # mode — argparse should reject it as unknown (SystemExit != 0)
    with pytest.raises(SystemExit) as exc, contextlib.redirect_stderr(io.StringIO()):
        main(["--list-queries-format", "json"])
    assert exc.value.code != 0

    # a typoed companion flag alongside --list-queries errors loudly too
    with pytest.raises(SystemExit) as exc, contextlib.redirect_stderr(io.StringIO()):
        main(["--list-queries", "--parquet-pth", "/tmp/x.parquet"])
    assert exc.value.code != 0

    # the = form still works
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["--list-queries=minhash"])
    assert rc == 0 and "q_near_dedup_minhash" in buf.getvalue()


def test_catalog_placeholder_sandbox_and_escapes():
    """ADVICE r12: placeholder resolution is a constant-expression AST
    whitelist, not eval — attribute access, calls and subscripts on module
    globals stay verbatim; bare constants and arithmetic resolve; and a
    {{TOKEN}} escape renders as the literal {TOKEN} even when TOKEN would
    resolve (str.format parity)."""
    import sys
    import types

    from parquet_to_clickhouse_schema_spark.catalog import (
        _const_eval,
        _first_sentence,
    )

    mod = types.ModuleType("catalog_sandbox_probe")
    mod.N = 7
    mod.RATE = 0.25
    mod.os = __import__("os")
    sys.modules["catalog_sandbox_probe"] = mod
    try:
        resolve = lambda s: _first_sentence(s, "catalog_sandbox_probe")
        # bare constant, arithmetic, format spec all resolve
        assert resolve("uses {N} grams.") == "uses 7 grams."
        assert resolve("mask {N + 1} wide.") == "mask 8 wide."
        assert resolve("rate {RATE:.0%} cut.") == "rate 25% cut."
        assert resolve("shift {1 << N} buckets.") == "shift 128 buckets."
        # attribute access / calls / subscripts are NOT reachable
        assert "{os.getcwd()}" in resolve("path {os.getcwd()} here.")
        assert "{N.__class__}" in resolve("cls {N.__class__} here.")
        assert "{os.environ['HOME']}" in resolve("env {os.environ['HOME']} x.")
        # {{TOKEN}} renders the literal {TOKEN}, never the value
        assert resolve("keep {{N}} literal.") == "keep {N} literal."
        # math notation round-trips untouched
        assert resolve("lag y_{t-1} term.") == "lag y_{t-1} term."
        # _const_eval itself refuses comprehension-style smuggling
        import pytest

        with pytest.raises(Exception):
            _const_eval("[x for x in (1,)]", vars(mod))
        # ADVICE r13: exponent/shift magnitude is bounded — a pasted
        # {2**10**8} must stay verbatim, not hang or memory-spike
        with pytest.raises(ValueError):
            _const_eval("2**10**8", vars(mod))
        with pytest.raises(ValueError):
            _const_eval("1 << (1 << 62)", vars(mod))
        assert "{2**10**8}" in resolve("bomb {2**10**8} stays.")
        # legit bit-width constants still resolve
        assert _const_eval("2**31", vars(mod)) == 2**31
        assert _const_eval("1 << 32", vars(mod)) == 1 << 32
    finally:
        del sys.modules["catalog_sandbox_probe"]


def test_export_dataset_for_clickhouse_hive_partitioned(spark, tmp_path):
    """r14 (VERDICT r13 task #7): exporting a hive-partitioned tree must
    carry the directory-derived partition columns in BOTH the DDL
    (bare keys inside `partition by (...)`) and the TSV data rows —
    before this, a footer-built export silently dropped them."""
    import gzip
    import pathlib

    from pyspark.sql import functions as F

    from parquet_to_clickhouse_schema_spark.sources.formats import (
        export_dataset_for_clickhouse,
    )

    src = spark.createDataFrame(
        [(1, "a", 2024), (2, "b", 2024), (3, "c", 2025)],
        "id long, name string, year int",
    )
    d = str(tmp_path / "t.parquet")
    src.write.partitionBy("year").parquet(d)

    out = str(tmp_path / "export")
    ddl = export_dataset_for_clickhouse(spark, d, out, "t_hive", "id", n_files=1)
    # partition key present, bare, and in the clause
    assert "year Int32\n" in ddl
    assert "Nullable(Int32)" not in ddl.split(", year ")[-1].split("\n")[0]
    assert "partition by (year)" in ddl
    assert "primary key (id)" in ddl
    # data rows include the directory-derived values
    gz = sorted(pathlib.Path(out, "data").glob("*.txt.gz"))
    lines = gzip.decompress(gz[0].read_bytes()).decode().splitlines()
    assert len(lines) == 3
    got = {tuple(ln.split("\t")) for ln in lines}
    assert got == {("1", "a", "2024"), ("2", "b", "2024"), ("3", "c", "2025")}
    # flat datasets keep the clause-free layout
    flat_dir = str(tmp_path / "flat.parquet")
    src.write.parquet(flat_dir)
    flat_ddl = export_dataset_for_clickhouse(
        spark, flat_dir, str(tmp_path / "export_flat"), "t_flat", "id"
    )
    assert "partition by" not in flat_ddl
    # a bogus explicit partition column is rejected up front
    import pytest as _pytest

    from parquet_to_clickhouse_schema_spark.sources.formats import (
        export_for_clickhouse,
    )

    with _pytest.raises(ValueError, match="not in the DataFrame"):
        export_for_clickhouse(
            src, str(tmp_path / "bad2"), "t_bad2", "id", partition_by=["nope"]
        )


def test_partition_prune_gate_and_values(spark):
    """r14: q_partition_prune is self-gating — the date bounds must land
    in the scan's PartitionFilters (the directory-pruning mechanism) or
    the operator raises — and its aggregate must equal the same filter
    computed on the raw events table."""
    from pyspark.sql import functions as F

    from parquet_to_clickhouse_schema_spark.operators.core import (
        _PRUNE_HI,
        _PRUNE_LO,
        q_partition_prune,
    )
    from parquet_to_clickhouse_schema_spark.sources.io import load_table

    got = {r.event_type: r for r in q_partition_prune(spark, SF_SMOKE).collect()}
    ev = load_table(spark, SF_SMOKE, "events")
    exp = {
        r.event_type: r
        for r in (
            ev.filter(
                (F.to_date("ts") >= F.lit(_PRUNE_LO).cast("date"))
                & (F.to_date("ts") < F.lit(_PRUNE_HI).cast("date"))
            )
            .groupBy("event_type")
            .agg(F.count("*").alias("n"))
            .collect()
        )
    }
    assert set(got) == set(exp) and got
    for k in exp:
        assert got[k].n == exp[k].n
