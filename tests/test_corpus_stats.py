"""Unigram-NLL, bigram-PMI and linear-interpolation semantics on small
hand-checkable inputs (the oracle sweep proves engine parity; these prove
the math)."""

import math

from pyspark.sql import functions as F

from parquet_to_clickhouse_schema_spark.functions import text as tx
from parquet_to_clickhouse_schema_spark.streaming import batch_twins as bt

from .conftest import SF_SMOKE


def test_unigram_nll_math(spark, tmp_path):
    # corpus: "a a b" + "a c" → counts a=3,b=1,c=1, N=5
    docs = spark.createDataFrame(
        [(1, "a a b", "en", "s", 5), (2, "a c", "en", "s", 3)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {
        r["doc_id"]: r["nll"]
        for r in tx.q_unigram_nll(spark, str(tmp_path)).collect()
    }
    pa, pb, pc = 3 / 5, 1 / 5, 1 / 5
    exp1 = -(math.log(pa) + math.log(pa) + math.log(pb)) / 3
    exp2 = -(math.log(pa) + math.log(pc)) / 2
    assert abs(out[1] - exp1) < 1e-6
    assert abs(out[2] - exp2) < 1e-6
    # rarer-token doc scores HIGHER (more surprising) — the quality signal
    assert out[2] > out[1]


def test_bigram_pmi_favors_exclusive_pairs(spark, tmp_path):
    # "x y" always adjacent and exclusive; "a"/"b" frequent but independent
    rows = [(i, "x y a b a b a b", "en", "s", 10) for i in range(10)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = tx.q_bigram_pmi(spark, str(tmp_path)).collect()
    assert out, "expected pairs above min support"
    best = out[0]
    assert (best["a"], best["b"]) == ("x", "y")
    # PMI of the exclusive pair must beat the independent filler pair
    filler = [r for r in out if (r["a"], r["b"]) == ("a", "b")]
    assert filler and best["pmi"] > filler[0]["pmi"]


def test_bigram_pmi_runs_on_testdata(spark):
    rows = tx.q_bigram_pmi(spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= tx.PMI_TOP
    # deterministic ordering contract: (pmi desc, a, b)
    keys = [(-r["pmi"], r["a"], r["b"]) for r in rows]
    assert keys == sorted(keys)


def test_interp_linear_fills_interior_gap(spark, tmp_path):
    # one type, hourly obs at 00:00 (v=10) and 03:00 (v=40); 01/02 are gaps
    rows = [
        (1, "2024-01-01 00:30:00", 7, "m", 10.0, "{}"),
        (2, "2024-01-01 03:30:00", 7, "m", 40.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    ev.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {
        (r["hr"].hour, r["event_type"]): (r["v_interp"], r["was_gap"])
        for r in bt.q_interp_linear(spark, str(tmp_path)).collect()
    }
    assert out[(0, "m")] == (10.0, False)
    assert out[(1, "m")] == (20.0, True)
    assert out[(2, "m")] == (30.0, True)
    assert out[(3, "m")] == (40.0, False)


def test_interp_linear_edge_gaps_one_sided(spark, tmp_path):
    # obs only at 01:00 for type A while type B spans 00..02 → A's edge
    # hours take the nearest observed value, not NULL
    rows = [
        (1, "2024-01-01 01:10:00", 7, "A", 5.0, "{}"),
        (2, "2024-01-01 00:10:00", 8, "B", 1.0, "{}"),
        (3, "2024-01-01 02:10:00", 8, "B", 3.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    ev.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {
        (r["hr"].hour, r["event_type"]): r["v_interp"]
        for r in bt.q_interp_linear(spark, str(tmp_path)).collect()
    }
    assert out[(0, "A")] == 5.0  # bfill at left edge
    assert out[(2, "A")] == 5.0  # ffill at right edge
    assert out[(1, "B")] == 2.0  # interior linear blend for B


def test_substring_dup_winnowing_guarantee(spark, tmp_path):
    """Any verbatim run of >= K+W-1 chars MUST produce a pair (lossless
    blocking); unrelated docs must not."""
    from parquet_to_clickhouse_schema_spark.operators import llm

    shared = "x" .join(f"seg{i:04d}" for i in range(8))  # 63 chars, unique-ish
    assert len(shared) >= llm.SUBDUP_K + llm.SUBDUP_W - 1
    rows = [
        (1, "aaaa " + shared + " bbbb", "en", "s", 100),
        (2, "cccc " + shared + " dddd", "en", "s", 100),
        # doc 3 shares nothing 32 chars long with 1/2
        (3, "totally different content with no overlap at all " + "z" * 40,
         "en", "s", 100),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in llm.q_substring_dup(spark, str(tmp_path)).collect()
    }
    assert (1, 2) in pairs
    assert not any(3 in p for p in pairs)


def test_substring_dup_boilerplate_ceiling_bounds_hot_buckets(spark, tmp_path):
    """When > SUBDUP_BOILERPLATE docs share one verbatim run, the dominant
    anchor (selected in every doc) is dropped, so the pair count stays far
    below all-pairs: the quadratic hot-bucket explosion is bounded. The
    surviving pairs come from SECONDARY anchors elected by boundary
    windows in subsets of docs — true positives (those docs really do
    share a >= K+W-1 run), each bucket bounded by the ceiling."""
    import hashlib

    from parquet_to_clickhouse_schema_spark.operators import llm

    boiler = "this is the standard license header all files carry verbatim"
    n = llm.SUBDUP_BOILERPLATE + 15
    rows = [
        (i, hashlib.md5(str(i).encode()).hexdigest() * 2 + " " + boiler,
         "en", "s", 100)
        for i in range(n)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = llm.q_substring_dup(spark, str(tmp_path)).collect()
    all_pairs = n * (n - 1) // 2
    # the dominant anchor alone would have produced ALL pairs
    assert len(out) < all_pairs / 2
    # and no surviving anchor bucket exceeds the ceiling's quadratic bound
    cap = llm.SUBDUP_BOILERPLATE * (llm.SUBDUP_BOILERPLATE - 1) // 2
    assert len(out) <= cap


def _asof_brute(left, right, direction, tolerance):
    """Reference semantics: nearest right row per (by, on) by linear scan."""
    out = []
    for key, lo, lv in left:
        cands = [
            (ro, rv)
            for rk, ro, rv in right
            if rk == key
            and (ro <= lo if direction == "backward" else ro >= lo)
            and (tolerance is None or abs(lo - ro) <= tolerance)
        ]
        if cands:
            best = min(cands, key=lambda c: abs(lo - c[0]))
            out.append((key, lo, lv, best[0], best[1]))
        else:
            out.append((key, lo, lv, None, None))
    return sorted(out)


def test_asof_join_all_directions_and_tolerance(spark):
    from parquet_to_clickhouse_schema_spark.operators.relational import asof_join

    left_rows = [(1, 10.0, "a"), (1, 20.0, "b"), (2, 5.0, "c"), (3, 7.0, "d")]
    right_rows = [(1, 9.0, 100), (1, 19.0, 200), (1, 21.0, 300), (2, 50.0, 400)]
    left = spark.createDataFrame(left_rows, "k int, t double, lab string")
    right = spark.createDataFrame(right_rows, "k int, t double, val int")
    for direction in ("backward", "forward"):
        for tol in (None, 2.0):
            got = sorted(
                (r["k"], r["t"], r["lab"], r["t_right"], r["val"])
                for r in asof_join(
                    left, right, on="t", by="k",
                    direction=direction, tolerance=tol,
                ).collect()
            )
            want = _asof_brute(left_rows, right_rows, direction, tol)
            assert got == want, (direction, tol, got, want)


def test_asof_join_equal_timestamp_inclusive(spark):
    from parquet_to_clickhouse_schema_spark.operators.relational import asof_join

    left = spark.createDataFrame([(1, 10.0, "x")], "k int, t double, lab string")
    right = spark.createDataFrame([(1, 10.0, 7)], "k int, t double, val int")
    for direction in ("backward", "forward"):
        row = asof_join(left, right, "t", "k", direction=direction).collect()[0]
        assert row["val"] == 7, direction


def test_asof_join_single_shuffle_no_join(spark):
    """The plan claim: union + one window, never a join operator."""
    from parquet_to_clickhouse_schema_spark.operators.relational import asof_join
    from parquet_to_clickhouse_schema_spark.plans.inspect import (
        executed_plan,
        shuffle_count,
    )

    left = spark.createDataFrame([(1, 1.0, "x")], "k int, t double, lab string")
    right = spark.createDataFrame([(1, 1.0, 2)], "k int, t double, val int")
    df = asof_join(left, right, "t", "k")
    plan = executed_plan(df)
    assert "Join" not in plan  # no SortMergeJoin/BroadcastHashJoin/NestedLoop
    assert shuffle_count(df) <= 2


def test_embed_quantize_mse_bound_and_saturation(spark):
    """int8 absmax quantization invariants: max|code| = 127 for non-zero
    vectors, per-dim error <= scale/2 (so mse <= (scale/2)^2), and the
    codes reconstruct within that bound."""
    from parquet_to_clickhouse_schema_spark.operators.llm import (
        embed_quantize_mse,
        q_embed_quantize,
    )

    gated = q_embed_quantize(spark, SF_SMOKE).collect()
    assert gated
    for r in gated:
        assert r["max_code"] == 127 or r["scale"] == 0.0
        assert 0 < r["n_saturated"] <= 64
    for r in embed_quantize_mse(spark, SF_SMOKE).collect():
        # rounding error per dim is at most scale/2 (+ float slack)
        assert r["mse"] <= (r["scale"] / 2) ** 2 * 1.000001 + 1e-18


def test_dedup_containment_is_directional(spark, tmp_path):
    """A short doc quoted inside a long one: containment fires A-in-B but
    not B-in-A, and Jaccard-style symmetric overlap would be tiny."""
    from parquet_to_clickhouse_schema_spark.operators import llm

    quote = " ".join(f"q{i}" for i in range(10))  # 10 tokens -> 8 shingles
    long_doc = " ".join(f"w{i}" for i in range(200)) + " " + quote
    rows = [
        (1, quote, "en", "s", len(quote)),
        (2, long_doc, "en", "s", len(long_doc)),
        (3, " ".join(f"z{i}" for i in range(50)), "en", "s", 100),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in llm.q_dedup_containment(spark, str(tmp_path)).collect()
    }
    assert (1, 2) in out and out[(1, 2)] == 1.0  # quote fully contained
    assert (2, 1) not in out  # the long doc is NOT contained in the quote
    assert not any(3 in k for k in out)


def test_mix_balanced_equalizes_sources(spark, tmp_path):
    """Each source's kept count lands near the rarest source's size, and
    the sample is deterministic across runs (md5 coin, no RNG)."""
    from parquet_to_clickhouse_schema_spark.operators import training

    rows = []
    doc = 0
    for src, n in (("web", 400), ("code", 100), ("wiki", 50)):
        for _ in range(n):
            rows.append((doc, f"text {doc}", "en", src, 10))
            doc += 1
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out1 = training.q_mix_balanced(spark, str(tmp_path)).collect()
    out2 = training.q_mix_balanced(spark, str(tmp_path)).collect()
    assert sorted(r["doc_id"] for r in out1) == sorted(r["doc_id"] for r in out2)
    from collections import Counter

    kept = Counter(r["source"] for r in out1)
    # rarest source keeps everything (keep_p = 1), others ~50 in expectation;
    # 3-sigma bounds for binomial(400, .125) and binomial(100, .5)
    assert kept["wiki"] == 50
    assert 30 <= kept["web"] <= 70
    assert 35 <= kept["code"] <= 65
