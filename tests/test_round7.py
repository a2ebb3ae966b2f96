"""Round-7 operator tests: properties the DuckDB oracle gate can't state
(rows-only sketch exactness, semantic equivalence to the literal SQL
reading, boundary semantics of the time-range frame, recursion limits).
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from parquet_to_clickhouse_schema_spark import registry
from parquet_to_clickhouse_schema_spark.sources.io import load_table
from tests.conftest import SF_SMOKE

Q = registry.all_queries()


def test_freq_topk_sketch_exact_at_test_sf(spark):
    """With maxItemsTracked >= |vocab|, approx_top_k is EXACT — verify the
    sketch ranks/counts against the brute-force (source, token) counts."""
    got = Q["q_freq_topk_sketch"](spark, SF_SMOKE).collect()
    d = load_table(spark, SF_SMOKE, "documents")
    exact = (
        d.select("source", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count("*").alias("cnt"))
        .collect()
    )
    by_source: dict[str, dict[str, int]] = {}
    for r in exact:
        by_source.setdefault(r.source, {})[r.tok] = r.cnt
    assert len(got) > 0
    for row in got:
        counts = by_source[row.source]
        # the sketch count must equal the true count for its token
        assert counts[row.token] == row.est_count
        # and the reported top-k must dominate every unreported token
        kth = min(r.est_count for r in got if r.source == row.source)
        from parquet_to_clickhouse_schema_spark.functions.text import FREQ_SKETCH_K

        n_better = sum(1 for c in counts.values() if c > kth)
        assert n_better <= FREQ_SKETCH_K


def test_waiting_suppliers_matches_literal_exists_form(spark):
    """The single-aggregate Q21 form must equal the literal
    EXISTS + NOT EXISTS double-self-join reading."""
    got = {
        (r.s_name, r.numwait)
        for r in Q["q_report_waiting_suppliers"](spark, SF_SMOKE).collect()
    }
    li = load_table(spark, SF_SMOKE, "lineitem")
    o = load_table(spark, SF_SMOKE, "orders").filter(F.col("o_orderstatus") == "F")
    s = load_table(spark, SF_SMOKE, "supplier")
    l1 = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    other = li.select("l_orderkey", F.col("l_suppkey").alias("o_supp")).distinct()
    has_other = l1.join(
        other,
        (l1.l_orderkey == other.l_orderkey) & (l1.l_suppkey != other.o_supp),
        "left_semi",
    )
    other_late = l1.select("l_orderkey", F.col("l_suppkey").alias("o_supp"))
    sole_late = has_other.join(
        other_late,
        (has_other.l_orderkey == other_late.l_orderkey)
        & (has_other.l_suppkey != other_late.o_supp),
        "left_anti",
    )
    expected_df = (
        sole_late.join(s, sole_late.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(10)
    )
    expected = {(r.s_name, r.numwait) for r in expected_df.collect()}
    assert got == expected


def test_distinct_on_matches_window_form(spark):
    """The argmax-struct DISTINCT ON must equal row_number()=1."""
    from pyspark.sql import Window

    got = {
        (r.o_custkey, r.last_orderkey)
        for r in Q["q_distinct_on"](spark, SF_SMOKE).collect()
    }
    o = load_table(spark, SF_SMOKE, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    expected = {
        (r.o_custkey, r.o_orderkey)
        for r in o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    }
    assert got == expected


def test_time_range_frame_boundary_inclusive(spark):
    """An event exactly 3600 s earlier IS in the trailing-1h frame; one
    microsecond beyond is not — pin the bound the oracle agrees on."""
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, 7, t0 - datetime.timedelta(seconds=3600, microseconds=1), "view", 1.0, "{}"),
        (2, 7, t0 - datetime.timedelta(seconds=3600), "view", 2.0, "{}"),
        (3, 7, t0, "view", 4.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double, props string"
    )
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        for name in ("events",):
            df.write.mode("overwrite").parquet(f"{tmp}/{name}.parquet")
        out = {r.event_id: r for r in Q["q_window_time_range"](spark, tmp).collect()}
    assert out[3].n_trailing_1h == 2  # events 2 (exactly -3600 s) and 3
    assert out[3].value_trailing_1h == pytest.approx(6.0)
    assert out[2].n_trailing_1h == 2  # events 1 and 2 are within an hour


def test_recursive_cte_spine_and_totals(spark):
    """80 monthly spine rows; order counts reconcile with the table."""
    rows = Q["q_recursive_cte"](spark, SF_SMOKE).collect()
    assert len(rows) == 80
    months = [r.month_start for r in rows]
    assert min(months) == datetime.date(1995, 1, 1)
    assert max(months) == datetime.date(2001, 8, 1)
    total = sum(r.n_orders for r in rows)
    assert total == load_table(spark, SF_SMOKE, "orders").count()


def test_incremental_dedup_invariants(spark):
    """No history digest leaks through; output digests are unique; every
    output doc is the min doc_id of its digest within the batch."""
    out = Q["q_incremental_dedup"](spark, SF_SMOKE).collect()
    assert len(out) > 0
    digests = [r.digest for r in out]
    assert len(digests) == len(set(digests))
    d = load_table(spark, SF_SMOKE, "documents")
    hist = {
        r.digest
        for r in d.filter(
            F.col("source").isin([f"src{i}" for i in range(10)])
        )
        .select(F.md5(F.col("text").cast("binary")).alias("digest"))
        .distinct()
        .collect()
    }
    assert not (set(digests) & hist)


def test_curriculum_order_is_a_permutation_sorted_by_bucket(spark):
    out = Q["q_curriculum_order"](spark, SF_SMOKE).collect()
    n = load_table(spark, SF_SMOKE, "documents").count()
    assert sorted(r.pos for r in out) == list(range(1, n + 1))
    by_pos = sorted(out, key=lambda r: r.pos)
    buckets = [r.difficulty_bucket for r in by_pos]
    assert buckets == sorted(buckets)  # easy (short) tiers first


def test_acf_and_cusum_sanity(spark):
    acf = Q["q_acf"](spark, SF_SMOKE).collect()
    assert {r.lag_hours for r in acf} == {1, 2, 3, 6, 12, 24}
    for r in acf:
        assert -1.0 <= r.acf <= 1.0
        assert r.n_pairs > 0
    cs = Q["q_cusum"](spark, SF_SMOKE).collect()
    assert len(cs) == 5  # one row per event type
    for r in cs:
        assert r.peak_cusum >= 0.0
        assert r.n_days > 0


def test_skyline_matches_brute_force_on_random_points(spark):
    """Property: the two-phase distributed skyline equals the O(n²)
    dominance definition on adversarial inputs — anti-correlated points
    (big frontier), duplicated coordinates, and a dominated cluster."""
    import itertools
    import random
    import tempfile

    rng = random.Random(7)
    pts = [(round(rng.uniform(0, 100), 2), rng.randint(1, 50)) for _ in range(300)]
    pts += [(round(100 - s * 1.9, 2), s) for s in range(1, 50)]  # anti-correlated
    pts += pts[:25]  # exact duplicates
    rows = [(i, f"part{i}", "B", "T", size, price) for i, (price, size) in enumerate(pts)]
    df = spark.createDataFrame(
        rows,
        "p_partkey long, p_name string, p_brand string, p_type string, p_size int, p_retailprice double",
    )
    with tempfile.TemporaryDirectory() as tmp:
        df.write.parquet(f"{tmp}/part.parquet")
        got = {(r.price, r.size) for r in Q["q_skyline"](spark, tmp).collect()}
    distinct = set(pts)
    expected = {
        (p, s)
        for (p, s) in distinct
        if not any(
            (q <= p and t <= s and (q < p or t < s)) for (q, t) in distinct
        )
    }
    assert got == expected


def test_table_checksum_invariant_under_row_order(spark):
    """The checksum must be a pure content function: reshuffling rows and
    repartitioning cannot change it; flipping one cent in one row must."""
    import tempfile

    base = load_table(spark, SF_SMOKE, "orders")
    with tempfile.TemporaryDirectory() as tmp:
        # same content, different physical order + partitioning
        base.orderBy(F.rand(7)).repartition(13).write.parquet(
            f"{tmp}/orders.parquet"
        )
        shuffled = Q["q_table_checksum"](spark, tmp).first()
    orig = Q["q_table_checksum"](spark, SF_SMOKE).first()
    assert (orig.n_rows, orig.checksum) == (shuffled.n_rows, shuffled.checksum)

    with tempfile.TemporaryDirectory() as tmp:
        tampered = base.withColumn(
            "o_totalprice",
            F.when(F.col("o_orderkey") == 1, F.col("o_totalprice") + 0.01).otherwise(
                F.col("o_totalprice")
            ),
        )
        tampered.write.parquet(f"{tmp}/orders.parquet")
        bad = Q["q_table_checksum"](spark, tmp).first()
    assert bad.checksum != orig.checksum
    assert bad.n_rows == orig.n_rows


def test_curriculum_packed_key_orders_like_tuple():
    """Property: bucket * 2^52 + hash52 orders exactly like the
    (bucket, hash) tuple — the packing must never let a high hash in a low
    bucket overtake a higher bucket."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    pair = st.tuples(
        st.integers(min_value=0, max_value=40),  # log2 length buckets
        st.integers(min_value=0, max_value=2**52 - 1),
    )

    @settings(max_examples=300, deadline=None)
    @given(pair, pair)
    def check(a, b):
        pack = lambda t: t[0] * 2**52 + t[1]  # noqa: E731
        assert (pack(a) < pack(b)) == (a < b)
        assert pack(a) <= 2**63 - 1  # stays inside BIGINT

    check()


def test_bpe_train_matches_pure_python_reference(spark):
    """The distributed trainer's merges == a pure-Python BPE trainer run
    on the collected word-frequency table (count desc, (a,b) asc ties)."""
    from collections import Counter

    got = [
        (r.left, r.right, r.pair_count)
        for r in sorted(
            Q["q_bpe_train"](spark, SF_SMOKE).collect(), key=lambda r: r.merge_rank
        )
    ]
    d = load_table(spark, SF_SMOKE, "documents")
    words = (
        d.select(F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.length("tok") >= 2)
        .groupBy("tok")
        .agg(F.count("*").alias("wfreq"))
        .collect()
    )
    cur = {}
    for r in words:
        cur[tuple(r.tok)] = cur.get(tuple(r.tok), 0) + r.wfreq
    ref = []
    for _ in range(6):
        pc = Counter()
        for symtuple, f in cur.items():
            for x, y in zip(symtuple, symtuple[1:]):
                pc[(x, y)] += f
        if not pc:
            break
        mx = max(pc.values())
        a, b = min(p for p, c in pc.items() if c == mx)
        ref.append((a, b, mx))
        new = {}
        for symtuple, f in cur.items():
            out, i = [], 0
            while i < len(symtuple):
                if i + 1 < len(symtuple) and symtuple[i] == a and symtuple[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(symtuple[i])
                    i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + f
        cur = new
    assert got == ref


def test_bpe_train_verified_equals_production_trainer(spark):
    """q_bpe_train_verified (r16, oracle-gated): the unrolled declarative
    twin's BPEV_ROUNDS merges must equal the production trainer's first
    BPEV_ROUNDS merges exactly — closing the loop driver gate -> verified
    twin == production path (same move as q_kmeans_verified)."""
    from parquet_to_clickhouse_schema_spark.functions.text import BPEV_ROUNDS

    twin = [
        (r.left, r.right, r.pair_count)
        for r in sorted(
            Q["q_bpe_train_verified"](spark, SF_SMOKE).collect(),
            key=lambda r: r.merge_rank,
        )
    ]
    prod = [
        (r.left, r.right, r.pair_count)
        for r in sorted(
            Q["q_bpe_train"](spark, SF_SMOKE).collect(), key=lambda r: r.merge_rank
        )
    ]
    assert len(twin) == BPEV_ROUNDS
    assert twin == prod[:BPEV_ROUNDS]


def test_bpe_train_verified_merge_encoding_edge_cases(spark):
    """The string-replace merge rule must implement left-to-right
    non-overlapping BPE semantics on the known traps: runs of the merged
    pair ('aaaa' + (a,a) -> [aa, aa], NOT [aa, a, a]) and symbol-prefix
    collisions ((a,b) must not fire inside a word whose symbol is 'bx')."""
    from pyspark.sql import functions as F  # noqa: F811

    enc = F.expr(
        "concat_ws('', transform(split(tok, ''), c -> concat(' ', c, ' ')))"
    )
    df = spark.createDataFrame([("aaaa",), ("aab",)], "tok string").select(
        "tok", enc.alias("w")
    )
    merged = df.select(
        "tok",
        F.split(
            F.trim(F.replace("w", F.lit(" a  a "), F.lit(" aa "))), "  "
        ).alias("s"),
    )
    got = {r.tok: r.s for r in merged.collect()}
    assert got["aaaa"] == ["aa", "aa"]
    assert got["aab"] == ["aa", "b"]
    # prefix collision: merge (a, b) applied to symbols [a, bx] must not fire
    df2 = spark.createDataFrame([([" a  bx "],)], "arr array<string>").select(
        F.replace(
            F.col("arr")[0], F.lit(" a  b "), F.lit(" ab ")
        ).alias("w")
    )
    assert df2.collect()[0].w == " a  bx "


def test_bpe_train_survives_word_collapse_under_ansi(spark):
    """Regression (ANSI mode): once a 2-char word fully merges into one
    symbol, later iterations must not index its 1-element array —
    sequence(1, 0) under spark.sql.ansi.enabled=true threw
    INVALID_ARRAY_INDEX before the size gate."""
    from parquet_to_clickhouse_schema_spark.functions.text import bpe_train

    words = spark.createDataFrame(
        [("ab", 100), ("abc", 10), ("cd", 5)], "tok string, wfreq long"
    )
    merges = bpe_train(spark, words, n_merges=4)
    # first merge collapses 'ab' (the dominant word) into one symbol
    assert merges[0] == ("a", "b", 110)
    assert len(merges) >= 2  # training continued past the collapse


def test_dedup_pipeline_total_and_consistent(spark):
    """q_dedup_pipeline must be a TOTAL map (one row per document), every
    keeper must keep itself ('self'), and exact-reason docs must share the
    keeper's normalized text."""
    rows = Q["q_dedup_pipeline"](spark, SF_SMOKE).collect()
    d = load_table(spark, SF_SMOKE, "documents")
    assert len(rows) == d.count()
    by_id = {r.doc_id: r for r in rows}
    norm = {r.doc_id: r.text.strip().lower() for r in d.select("doc_id", "text").collect()}
    for r in rows:
        k = by_id[r.keeper_id]
        assert k.reason == "self" and k.keeper_id == k.doc_id
        if r.reason == "exact":
            assert norm[r.doc_id] == norm[r.keeper_id]
        elif r.reason == "self":
            assert r.doc_id == r.keeper_id
        else:
            assert norm[r.doc_id] != norm[r.keeper_id]


def test_freq_topk_exact_agrees_with_sketch(spark):
    """q_freq_topk_exact (r10, oracle-gated) and the sketch variant answer
    the same question; at test SF the sketch is exact, so the two must
    report the same per-source count sequence (token identity may differ
    only where counts tie at the k-th boundary — the engines' tie-break
    orders are their own)."""
    from collections import defaultdict

    exact, sketch = defaultdict(list), defaultdict(list)
    for r in Q["q_freq_topk_exact"](spark, SF_SMOKE).collect():
        exact[r.source].append((r.rank, r.n_count, r.token))
    for r in Q["q_freq_topk_sketch"](spark, SF_SMOKE).collect():
        sketch[r.source].append((r.rank, r.est_count, r.token))
    assert set(exact) == set(sketch) and len(exact) > 0
    for src in exact:
        e, s = sorted(exact[src]), sorted(sketch[src])
        assert [x[:2] for x in e] == [x[:2] for x in s]
        # where the count is strictly above the k-th, tokens must agree too
        kth = e[-1][1]
        assert {x[2] for x in e if x[1] > kth} == {x[2] for x in s if x[1] > kth}
