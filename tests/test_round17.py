"""Round-17 operator tests: pure-Python third implementations of the three
new keys (q_source_jaccard_matrix, q_context_length_sweep,
q_tokenizer_fertility) — the same discipline as the BPE trainer's
reference test: collect the small smoke-SF inputs, recompute the whole
answer in plain Python, compare value-for-value. The DuckDB oracle gate
proves Spark == DuckDB; these prove both == the definition.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from parquet_to_clickhouse_schema_spark import registry
from parquet_to_clickhouse_schema_spark.sources.io import load_table
from tests.conftest import SF_SMOKE

Q = registry.all_queries()


def _q6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def test_source_jaccard_matrix_matches_pure_python(spark):
    """Dense pair matrix == Python set-Jaccard of the same 3-word shingle
    sets (clamped short-doc semantics included)."""
    from parquet_to_clickhouse_schema_spark.operators.llm import SHINGLE_K

    docs = load_table(spark, SF_SMOKE, "documents").select(
        "source", "text"
    ).collect()
    sets: dict[str, set] = defaultdict(set)
    for r in docs:
        t = r.text.split(" ")
        n_sh = max(len(t) - (SHINGLE_K - 1), 1)
        for i in range(n_sh):
            sets[r.source].add(" ".join(t[i : i + SHINGLE_K]))
    srcs = sorted(sets)
    ref = {}
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            inter = len(sets[a] & sets[b])
            ref[(a, b)] = (
                inter,
                _q6(inter / (len(sets[a]) + len(sets[b]) - inter)),
            )
    got = {
        (r.source_a, r.source_b): (r.n_inter, r.jaccard)
        for r in Q["q_source_jaccard_matrix"](spark, SF_SMOKE).collect()
    }
    assert got == ref
    # the matrix is informative at smoke SF: some pair must overlap
    assert any(v[0] > 0 for v in ref.values())


def test_context_length_sweep_matches_pure_python(spark):
    """Per-budget truncation/padding economics == the arithmetic applied
    to the collected token counts."""
    from parquet_to_clickhouse_schema_spark.operators.training import (
        CTX_SWEEP,
    )

    ns = [
        r.n
        for r in load_table(spark, SF_SMOKE, "documents")
        .select(F.size(F.split("text", " ")).alias("n"))
        .collect()
    ]
    tot = sum(ns)
    ref = {}
    for L in CTX_SWEEP:
        kept = sum(min(n, L) for n in ns)
        bins = math.ceil(kept / L)
        ref[L] = (
            len(ns),
            sum(1 for n in ns if n > L),
            _q6((tot - kept) / tot),
            bins,
            _q6((bins * L - kept) / (bins * L)),
        )
    rows = Q["q_context_length_sweep"](spark, SF_SMOKE).collect()
    assert len(rows) == len(CTX_SWEEP)
    for r in rows:
        assert (
            r.n_docs,
            r.n_trunc_docs,
            r.trunc_token_frac,
            r.n_bins,
            r.pad_frac,
        ) == ref[r.ctx_len], r.ctx_len
    # monotonicity sanity: larger budgets truncate less and pad more bins
    by_l = {r.ctx_len: r for r in rows}
    ls = sorted(by_l)
    assert all(
        by_l[a].trunc_token_frac >= by_l[b].trunc_token_frac
        for a, b in zip(ls, ls[1:])
    )


def test_source_js_divergence_matches_pure_python(spark):
    """Per-source JSD == the textbook formula computed over Python
    Counters (dense over the union vocab — independently exercising the
    sparse-support + closed-form-absent-mass algebra both engines use)."""
    docs = load_table(spark, SF_SMOKE, "documents").select(
        "source", "text"
    ).collect()
    per: dict[str, Counter] = defaultdict(Counter)
    marg: Counter = Counter()
    for r in docs:
        for tok in r.text.split(" "):
            per[r.source][tok] += 1
            marg[tok] += 1
    n_all = sum(marg.values())
    got = {
        r.source: (r.n_types, r.jsd_nats)
        for r in Q["q_source_js_divergence"](spark, SF_SMOKE).collect()
    }
    assert set(got) == set(per)
    for src, cnt in per.items():
        n = sum(cnt.values())
        jsd = 0.0
        for tok, mc in marg.items():  # DENSE union-vocab loop
            p = cnt.get(tok, 0) / n
            q = mc / n_all
            m = (p + q) / 2
            if p:
                jsd += 0.5 * p * math.log(p / m)
            if q:
                jsd += 0.5 * q * math.log(q / m)
        assert got[src][0] == len(cnt)
        # dense-loop float accumulation differs in order from both
        # engines' sparse sums; compare to the shared 1e-6 grid with a
        # one-ulp-of-grid tolerance instead of exact equality
        assert abs(got[src][1] - jsd) < 2e-6, (src, got[src][1], jsd)
        assert 0.0 <= got[src][1] <= math.log(2) + 1e-9


def test_image_dhash_dedup_matches_pure_python(spark):
    """Per-doc dHash == hashing the first-96-byte pixel grid directly in
    Python (no numpy, no decoder) — and exact-duplicate texts must land
    in a shared bucket."""
    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "text"
    ).collect()
    ref = {}
    for r in docs:
        if len(r.text) < 96:
            continue
        codes = [ord(c) for c in r.text[:96]]
        gray = [
            [sum(codes[(row * 8 + col) * 3 : (row * 8 + col) * 3 + 3])
             for col in range(8)]
            for row in range(4)
        ]
        h = 0
        for row in range(4):
            for col in range(7):
                if gray[row][col] < gray[row][col + 1]:
                    h |= 1 << (row * 7 + col)
        ref[r.doc_id] = h
    rows = Q["q_image_dhash_dedup"](spark, SF_SMOKE).collect()
    got = {r.doc_id: r.dhash for r in rows}
    assert got == ref
    # bucket sizes are consistent with the hashes
    sizes = Counter(got.values())
    for r in rows:
        assert r.bucket_size == sizes[r.dhash]
        assert r.is_dup == (sizes[r.dhash] > 1)


def test_dhash_brightness_invariance_property():
    """THE property that makes dHash a perceptual (not cryptographic)
    signature: a uniform brightness shift adds the same constant to every
    gray sum, preserving all adjacent-pair orderings — the hash is
    unchanged. Exercised over hypothesis-generated 8x4 P6 payloads (no
    Spark needed; dhash_image is the exact kernel the operator ships)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from parquet_to_clickhouse_schema_spark.operators.multimodal import (
        dhash_image,
    )

    header = b"P6\n8 4\n255\n"

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(st.integers(0, 155), min_size=96, max_size=96),
        st.integers(1, 100),
    )
    def check(pixels, shift):
        base = header + bytes(pixels)
        shifted = header + bytes(p + shift for p in pixels)  # never clips
        assert dhash_image(base) == dhash_image(shifted)
        assert 0 <= dhash_image(base) < (1 << 28)

    check()


def test_source_divergence_degenerate_cases(spark, tmp_path):
    """Single-source corpus: the source IS the marginal, so JSD must be
    exactly 0 and the shingle self-matrix is empty (no pairs). Two
    identical sources: Jaccard must be exactly 1."""
    sf = str(tmp_path)
    rows = [(i, f"tok{i % 7} tok{(i + 1) % 7} tok{(i + 2) % 7}", "en", "only", 10) for i in range(20)]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(f"{sf}/documents.parquet")
    jsd = Q["q_source_js_divergence"](spark, sf).collect()
    assert len(jsd) == 1 and jsd[0].jsd_nats == 0.0
    assert Q["q_source_jaccard_matrix"](spark, sf).count() == 0

    # two sources carrying the identical text set -> Jaccard exactly 1
    twin = [(i, f"w{i % 5} w{(i + 2) % 5} w{(i + 4) % 5}", "en", s, 10)
            for s in ("a", "b") for i in range(10)]
    spark.createDataFrame(
        twin, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    m = Q["q_source_jaccard_matrix"](spark, sf).collect()
    assert len(m) == 1 and m[0].jaccard == 1.0


def test_audio_fingerprint_matches_pure_python(spark):
    """Per-doc audio fingerprint == hashing the first-96-byte amplitude
    stream directly in Python (no numpy, no wave parser)."""
    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "text"
    ).collect()
    ref = {}
    for r in docs:
        if len(r.text) < 96:
            continue
        amps = [ord(c) - 128 for c in r.text[:96]]
        e = [sum(a * a for a in amps[f * 4 : f * 4 + 4]) for f in range(24)]
        h = 0
        for f in range(23):
            if e[f] < e[f + 1]:
                h |= 1 << f
        ref[r.doc_id] = h
    rows = Q["q_audio_fingerprint_dedup"](spark, SF_SMOKE).collect()
    got = {r.doc_id: r.afp for r in rows}
    assert got == ref
    sizes = Counter(got.values())
    for r in rows:
        assert r.bucket_size == sizes[r.afp]
        assert r.is_dup == (sizes[r.afp] > 1)


def test_audio_fingerprint_gain_invariance_property():
    """THE property that makes the fingerprint perceptual: uniform gain
    scales every frame energy by the same factor, preserving all
    orderings — the fingerprint is unchanged (hypothesis-generated
    amplitude streams, integer gain, no clipping by construction)."""
    import struct

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from parquet_to_clickhouse_schema_spark.operators.multimodal import (
        audio_fingerprint,
    )

    def wav(amps):
        hdr = (
            b"RIFF"
            + struct.pack("<I", 36 + len(amps))
            + b"WAVE"
            + b"fmt "
            + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 8000, 1, 8)
            + b"data"
            + struct.pack("<I", len(amps))
        )
        return hdr + bytes(a + 128 for a in amps)

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.integers(-42, 42), min_size=96, max_size=96),
           st.integers(2, 3))
    def check(amps, gain):
        scaled = [a * gain for a in amps]  # |a*3| <= 126: never clips
        assert audio_fingerprint(wav(amps)) == audio_fingerprint(wav(scaled))
        assert 0 <= audio_fingerprint(wav(amps)) < (1 << 23)

    check()


def test_tokenizer_fertility_matches_pure_python(spark):
    """Per-lang fertility == a pure-Python replay of the gated encoder:
    learn the top merges from the len>=2 word-pair counts, apply each as
    BPE_ENC_PASSES literal space-joined replaces (str.replace is the same
    single left-to-right non-overlapping pass as both engines' replace),
    then frequency-weight symbol counts per language."""
    from parquet_to_clickhouse_schema_spark.functions.text import (
        BPE_ENC_MERGES,
        BPE_ENC_PASSES,
    )

    docs = load_table(spark, SF_SMOKE, "documents").select(
        "lang", "text"
    ).collect()
    wfreq: Counter = Counter()
    lw: Counter = Counter()
    for r in docs:
        for tok in r.text.split(" "):
            wfreq[tok] += 1
            lw[(r.lang, tok)] += 1
    pc: Counter = Counter()
    for tok, f in wfreq.items():
        if len(tok) < 2:
            continue
        for x, y in zip(tok, tok[1:]):
            pc[(x, y)] += f
    merges = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[
        :BPE_ENC_MERGES
    ]
    n_syms = {}
    for tok in wfreq:
        s = " " + " ".join(tok) + " "
        for (a, b), _ in merges:
            for _ in range(BPE_ENC_PASSES):
                s = s.replace(f" {a} {b} ", f" {a}{b} ")
        n_syms[tok] = len(s.strip().split(" "))
    agg: dict[str, list] = defaultdict(lambda: [0, 0, 0, 0])
    for (lang, tok), f in lw.items():
        a = agg[lang]
        a[0] += f
        a[1] += 1
        a[2] += f * n_syms[tok]
        a[3] += f * len(tok)
    got = {
        r.lang: (r.n_tokens, r.n_types, r.fertility, r.chars_per_symbol)
        for r in Q["q_tokenizer_fertility"](spark, SF_SMOKE).collect()
    }
    ref = {
        lang: (a[0], a[1], _q6(a[2] / a[0]), _q6(a[3] / a[2]))
        for lang, a in agg.items()
    }
    assert got == ref
    # fertility >= 1 by construction (a word is at least one symbol)
    assert all(v[2] >= 1.0 for v in got.values())
