"""Round-11 operator tests: properties the DuckDB oracle gate can't state
(dominance relations between funnel variants, shrinkage direction of the
EB posterior, weighted-median equivalence to the brute-force definition,
group atomicity of the source split).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from parquet_to_clickhouse_schema_spark import registry
from parquet_to_clickhouse_schema_spark.sources.io import load_table
from tests.conftest import SF_SMOKE

Q = registry.all_queries()


def test_window_funnel_dominated_by_unboxed_funnel(spark):
    """The time-boxed funnel can only LOSE conversions relative to
    q_funnel (same stages, no deadline): per user, funnel_level <=
    funnel_stage, both start at 1, and at least one user must differ at
    smoke SF (otherwise the window constraint is vacuous and the op
    degenerates into q_funnel)."""
    boxed = {r.user_id: r.funnel_level for r in Q["q_window_funnel"](spark, SF_SMOKE).collect()}
    free = {r.user_id: r.funnel_stage for r in Q["q_funnel"](spark, SF_SMOKE).collect()}
    assert set(boxed) == set(free)
    assert all(1 <= boxed[u] <= free[u] <= 3 for u in boxed)
    assert any(boxed[u] < free[u] for u in boxed)


def test_weighted_quantile_matches_bruteforce_definition(spark):
    """Each (flag, q) row must equal the textbook definition computed
    driver-side: the smallest price whose cumulative quantity reaches
    q x total quantity; quantiles must be monotone within a flag."""
    from collections import defaultdict

    from parquet_to_clickhouse_schema_spark.operators.aggregation import (
        WQ_QUANTILES,
    )

    rows = Q["q_weighted_quantile"](spark, SF_SMOKE).collect()
    li = (
        load_table(spark, SF_SMOKE, "lineitem")
        .groupBy("l_returnflag", "l_extendedprice")
        .agg(F.sum("l_quantity").alias("w"))
        .collect()
    )
    by_flag = defaultdict(list)
    for r in li:
        by_flag[r.l_returnflag].append((r.l_extendedprice, r.w))
    want = {}
    for flag, pts in by_flag.items():
        pts.sort()
        tot = sum(w for _, w in pts)
        for q in WQ_QUANTILES:
            cum = 0.0
            for price, w in pts:
                cum += w
                if cum >= q * tot:
                    want[(flag, q)] = price
                    break
    got = {(r.l_returnflag, r.quantile): r.wq_price for r in rows}
    assert got == want
    for flag in by_flag:
        seq = [got[(flag, q)] for q in sorted(WQ_QUANTILES)]
        assert seq == sorted(seq)


def test_ctr_smoothing_shrinks_toward_prior_mean(spark):
    """The posterior mean (k + mc)/(n + c) is a convex combination of the
    raw rate and the prior mean m, so every smoothed rate must lie between
    its raw rate and m (inclusive up to the 1e-6 quantization), and users
    with more views must move less."""
    rows = Q["q_ctr_smoothing"](spark, SF_SMOKE).collect()
    assert len(rows) > 0
    assert all(0 <= r.n_clicks <= r.n_trials for r in rows)
    m = sum(r.raw_ctr for r in rows) / len(rows)  # ~prior mean (quantized)
    eps = 2e-6
    for r in rows:
        lo, hi = sorted((r.raw_ctr, m))
        assert lo - eps <= r.smoothed_ctr <= hi + eps
        assert 0.0 <= r.smoothed_ctr <= 1.0
    # shrinkage magnitude decreases with evidence: compare the mean
    # absolute move of low-traffic vs high-traffic halves
    moves = sorted((r.n_trials, abs(r.smoothed_ctr - r.raw_ctr)) for r in rows)
    half = len(moves) // 2
    low = sum(mv for _, mv in moves[:half]) / half
    high = sum(mv for _, mv in moves[half:]) / (len(moves) - half)
    assert high <= low + eps


def test_group_split_is_atomic_and_total(spark):
    """Every source appears in exactly one split, splits cover the corpus
    (doc counts sum to the table count), and the assignment agrees with
    the md5-nibble rule."""
    import hashlib

    rows = Q["q_group_split"](spark, SF_SMOKE).collect()
    d = load_table(spark, SF_SMOKE, "documents")
    assert sum(r.n_docs for r in rows) == d.count()
    seen = {}
    for r in rows:
        assert r.source not in seen  # one row (== one split) per source
        seen[r.source] = r.split
        nib = hashlib.md5(r.source.encode()).hexdigest()[0]
        want = "train" if nib in "0123456789ab" else ("val" if nib in "cd" else "test")
        assert r.split == want
    assert set(seen) == {r.source for r in d.select("source").distinct().collect()}


def test_max_concurrency_matches_bruteforce_sweep(spark):
    """Per priority: peak must equal the brute-force maximum computed
    driver-side by counting intervals covering each boundary instant
    (half-open [open, close)), and peak_ts must be the earliest instant
    attaining it."""
    from collections import defaultdict

    rows = Q["q_max_concurrency"](spark, SF_SMOKE).collect()
    o = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    li = load_table(spark, SF_SMOKE, "lineitem").groupBy("l_orderkey").agg(
        F.max("l_shipdate").alias("t_close")
    )
    iv = defaultdict(list)
    for r in o.join(li, o.o_orderkey == li.l_orderkey).collect():
        if r.t_close > r.o_orderdate:  # sweep line requires open < close
            iv[r.o_orderpriority].append((r.o_orderdate, r.t_close))
    want = {}
    for prio, spans in iv.items():
        instants = sorted({t for s in spans for t in s})
        best, best_ts = -1, None
        for t in instants:
            n = sum(1 for a, b in spans if a <= t < b)
            if n > best:
                best, best_ts = n, t
        want[prio] = (best, best_ts)
    got = {r.o_orderpriority: (r.peak_open_orders, r.peak_ts) for r in rows}
    assert got == want


def test_boilerplate_vs_novelty_are_complementary_lenses(spark):
    """Shared shingle universe with q_ngram_novelty (same docs, same
    n_shingles), fractions in [0,1], and the corpus-wide identity: a
    shingle counted boilerplate must appear in >= BOILER_DF docs, so
    total boilerplate hits >= BOILER_DF * (number of boilerplate
    shingles observed anywhere)."""
    from parquet_to_clickhouse_schema_spark.functions.text import BOILER_DF

    b = {r.doc_id: r for r in Q["q_boilerplate_ngrams"](spark, SF_SMOKE).collect()}
    n = {r.doc_id: r for r in Q["q_ngram_novelty"](spark, SF_SMOKE).collect()}
    assert set(b) == set(n)
    for doc_id, rb in b.items():
        assert rb.n_shingles == n[doc_id].n_shingles
        assert 0 <= rb.n_boiler <= rb.n_shingles
        assert 0.0 <= rb.boiler_frac <= 1.0
    # each boilerplate shingle contributes >= BOILER_DF doc-hits
    total_boiler_hits = sum(r.n_boiler for r in b.values())
    assert total_boiler_hits == 0 or total_boiler_hits >= BOILER_DF


def test_coverage_curve_is_monotone_and_total(spark):
    """Levels nest: n_docs and n_unique are nondecreasing in level, the
    100% level covers the whole corpus, and n_unique matches the exact
    distinct-text count."""
    rows = {r.level_pct: r for r in Q["q_coverage_curve"](spark, SF_SMOKE).collect()}
    d = load_table(spark, SF_SMOKE, "documents")
    assert rows[100].n_docs == d.count()
    assert rows[100].n_unique == d.select("text").distinct().count()
    levels = sorted(rows)
    for lo, hi in zip(levels, levels[1:]):
        assert rows[lo].n_docs <= rows[hi].n_docs
        assert rows[lo].n_unique <= rows[hi].n_unique
    assert all(0.0 <= r.dup_rate < 1.0 for r in rows.values())


def test_sequence_count_matches_greedy_simulation(spark):
    """Per user, n_chains must equal the literal greedy matcher run
    driver-side over the (ts, event_id)-ordered stream: a purchase closes
    a chain iff an unmatched earlier view exists."""
    from collections import defaultdict

    rows = {r.user_id: r.n_chains for r in Q["q_sequence_count"](spark, SF_SMOKE).collect()}
    ev = (
        load_table(spark, SF_SMOKE, "events")
        .filter(F.col("event_type").isin("view", "purchase"))
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    streams = defaultdict(list)
    for r in ev:
        streams[r.user_id].append((r.ts, r.event_id, r.event_type))
    want = {}
    for u, es in streams.items():
        es.sort()
        avail = chains = 0
        for _, _, t in es:
            if t == "view":
                avail += 1
            elif avail > 0:
                avail -= 1
                chains += 1
        want[u] = chains
    assert rows == want
    assert any(c > 1 for c in rows.values())  # multi-episode users exist


def test_snapshot_diff_is_total_and_consistent(spark):
    """Every current user is classified exactly once; 'added' users have no
    pre-cut event; 'unchanged' users' latest event is at or before the cut
    OR their state coincides."""
    from parquet_to_clickhouse_schema_spark.operators.merge import SNAP_T1

    rows = {r.user_id: r for r in Q["q_snapshot_diff"](spark, SF_SMOKE).collect()}
    ev = load_table(spark, SF_SMOKE, "events")
    assert len(rows) == ev.select("user_id").distinct().count()
    cut = SNAP_T1
    pre_users = {
        r.user_id
        for r in ev.filter(F.col("ts") <= F.lit(cut).cast("timestamp"))
        .select("user_id")
        .distinct()
        .collect()
    }
    for u, r in rows.items():
        if r.change == "added":
            assert u not in pre_users and r.old_type is None
        else:
            assert u in pre_users and r.old_type is not None
        if r.change == "unchanged":
            assert r.old_type == r.new_type
    # at smoke SF every user stays active past the cut, so 'changed'
    # dominates; 'unchanged'/'added' appear at larger SFs
    assert "changed" in {r.change for r in rows.values()}


def test_dataset_card_matches_per_source_ground_truth(spark):
    """Volume and language columns must match independent per-source
    aggregates, and top_lang must be the modal language with the
    (count desc, lang) tiebreak."""
    from collections import Counter, defaultdict

    rows = {r.source: r for r in Q["q_dataset_card"](spark, SF_SMOKE).collect()}
    docs = load_table(spark, SF_SMOKE, "documents").collect()
    by_src = defaultdict(list)
    for d in docs:
        by_src[d.source].append(d)
    assert set(rows) == set(by_src)
    for src, ds in by_src.items():
        r = rows[src]
        assert r.n_docs == len(ds)
        assert r.total_chars == sum(d.n_chars for d in ds)
        assert r.n_langs == len({d.lang for d in ds})
        cnt = Counter(d.lang for d in ds)
        assert r.top_lang == sorted(cnt, key=lambda l: (-cnt[l], l))[0]
        uniq = len({d.text for d in ds})
        assert abs(r.dup_rate - (1 - uniq / len(ds))) < 2e-6


def test_map_eval_matches_bruteforce_ap(spark):
    """AP@k per query must equal the textbook computation done driver-side
    from the exact cosine ranking (same (cos desc, nbr_id) order)."""
    import math

    from parquet_to_clickhouse_schema_spark.operators.llm import RQ_K

    rows = {r.vec_id: r for r in Q["q_map_eval"](spark, SF_SMOKE).collect()}
    emb = load_table(spark, SF_SMOKE, "embeddings").collect()
    vecs = {r.vec_id: (r.embedding, r.label) for r in emb}
    from collections import Counter

    label_counts = Counter(l for _, l in vecs.values())
    for qid, r in rows.items():
        qv, ql = vecs[qid]
        scored = []
        qn = math.sqrt(sum(x * x for x in qv))
        for nid, (nv, nl) in vecs.items():
            if nid == qid:
                continue
            dot = sum(float(a) * float(b) for a, b in zip(qv, nv))
            nn = math.sqrt(sum(float(x) * float(x) for x in nv))
            scored.append((-(dot / (qn * nn)), nid, nl))
        scored.sort()
        top = scored[:RQ_K]
        hits = cum = 0
        ap = 0.0
        for pos, (_, _, nl) in enumerate(top, start=1):
            if nl == ql:
                cum += 1
                ap += cum / pos
        denom = min(label_counts[ql] - 1, RQ_K)
        ap = ap / denom if denom > 0 else 0.0
        assert r.n_rel_topk == cum
        assert abs(r.ap - ap) < 2e-6


def test_churn_features_respect_the_temporal_wall(spark):
    """No feature may reflect post-cutoff activity and the label must be
    exactly 'no post-cutoff event'; recency is nonnegative whole days."""
    from parquet_to_clickhouse_schema_spark.operators.training import (
        CHURN_CUTOFF,
    )

    rows = {r.user_id: r for r in Q["q_churn_features"](spark, SF_SMOKE).collect()}
    ev = load_table(spark, SF_SMOKE, "events").collect()
    import datetime

    cut = datetime.datetime.fromisoformat(CHURN_CUTOFF)
    pre = {}
    post_users = set()
    for e in ev:
        if e.ts <= cut:
            st = pre.setdefault(e.user_id, [0, 0])
            st[0] += 1
            st[1] += 1 if e.event_type == "purchase" else 0
        else:
            post_users.add(e.user_id)
    assert set(rows) == set(pre)
    for u, r in rows.items():
        assert (r.n_events, r.n_purchases) == tuple(pre[u])
        assert r.churned == (0 if u in post_users else 1)
        assert r.recency_days >= 0


def test_negative_sampling_flattens_the_unigram(spark):
    """p_neg must be subproportional to count: between any two rows of one
    language, the probability ratio must be MILDER than the count ratio
    (the 3/4-power flattening), and per-language rows are the top-15 by
    count with probabilities summing to < 1 (head of the full vocab)."""
    from collections import defaultdict

    rows = Q["q_negative_sampling_freq"](spark, SF_SMOKE).collect()
    by_lang = defaultdict(list)
    for r in rows:
        by_lang[r.lang].append(r)
    for lang, rs in by_lang.items():
        assert len(rs) == 15
        assert sum(r.p_neg for r in rs) < 1.0
        rs.sort(key=lambda r: -r.cnt)
        hi, lo = rs[0], rs[-1]
        if hi.cnt > lo.cnt:
            assert hi.p_neg / lo.p_neg < hi.cnt / lo.cnt


def test_srm_check_counts_users_once_and_flags_consistently(spark):
    """Group sizes partition the distinct-user universe, the chi-square is
    the literal 2(n_a-E)^2/E, and the flag agrees with the statistic."""
    from parquet_to_clickhouse_schema_spark.operators.dq import SRM_CRIT

    [r] = Q["q_ab_srm_check"](spark, SF_SMOKE).collect()
    n_users = (
        load_table(spark, SF_SMOKE, "events").select("user_id").distinct().count()
    )
    assert r.n_a + r.n_b == n_users
    e = (r.n_a + r.n_b) / 2.0
    assert abs(r.srm_chi2 - 2 * (r.n_a - e) ** 2 / e) < 2e-6
    assert r.srm_flag == int(2 * (r.n_a - e) ** 2 / e > SRM_CRIT)


def test_bloom_plan_matches_textbook_formulas(spark):
    """k and FPR must equal the textbook bloom formulas for the exact
    distinct counts, and FPR must decrease as n decreases at fixed m."""
    import math

    from parquet_to_clickhouse_schema_spark.operators.dq import BLOOM_BITS

    rows = {(r.tbl, r.key_col): r for r in Q["q_bloom_fpr_plan"](spark, SF_SMOKE).collect()}
    li = load_table(spark, SF_SMOKE, "lineitem")
    n_ok = li.select("l_orderkey").distinct().count()
    r = rows[("lineitem", "l_orderkey")]
    assert r.n_distinct == n_ok
    k = max(int(BLOOM_BITS / n_ok * math.log(2) + 0.5), 1)
    assert r.k_opt == k
    fpr = (1 - math.exp(-k * n_ok / BLOOM_BITS)) ** k
    assert abs(r.fpr - fpr) < 2e-8
    assert len(rows) == 4 and all(x.fpr >= 0 for x in rows.values())


def test_session_metrics_cover_all_events_and_respect_the_gap(spark):
    """Session event counts sum to the event total, durations are
    nonnegative, and no session's span can be built from gaps that each
    exceed the cut (spot-consistency with q_sessionize's session count
    per user)."""
    rows = Q["q_session_metrics"](spark, SF_SMOKE).collect()
    ev = load_table(spark, SF_SMOKE, "events")
    assert sum(r.n_events for r in rows) == ev.count()
    assert all(r.duration_sec >= 0 and r.n_events >= 1 for r in rows)
    sess = Q["q_sessionize"](spark, SF_SMOKE).collect()
    per_user_sessions = {}
    for r in sess:
        per_user_sessions.setdefault(r.user_id, set()).add(r.session_idx)
    from collections import Counter

    got = Counter(r.user_id for r in rows)
    assert all(got[u] == len(s) for u, s in per_user_sessions.items())


def test_power_analysis_is_monotone_in_mde(spark):
    """Smaller detectable effects need more samples (n ∝ 1/δ²), the
    baseline matches the corpus conversion rate, and feasibility is
    consistent with the user count."""
    rows = sorted(Q["q_power_analysis"](spark, SF_SMOKE).collect(), key=lambda r: r.mde)
    ns = [r.n_per_arm for r in rows]
    assert ns == sorted(ns, reverse=True)
    ev = load_table(spark, SF_SMOKE, "events")
    n_users = ev.select("user_id").distinct().count()
    for r in rows:
        assert 0.0 <= r.baseline_rate <= 1.0
        assert r.feasible_now == int(2 * r.n_per_arm <= n_users)


def test_cross_source_dups_symmetric_ground_truth(spark):
    """Pair counts must match a driver-side set intersection of per-source
    distinct-text sets, each unordered pair exactly once — DENSE (r12):
    every source pair appears, zero-shared pairs explicitly at 0."""
    from collections import defaultdict

    rows = {(r.source_a, r.source_b): r.n_shared for r in Q["q_cross_source_dups"](spark, SF_SMOKE).collect()}
    docs = load_table(spark, SF_SMOKE, "documents").select("source", "text").collect()
    sets = defaultdict(set)
    for d in docs:
        sets[d.source].add(d.text)
    want = {}
    srcs = sorted(sets)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            want[(a, b)] = len(sets[a] & sets[b])
    assert rows == want
    assert len(rows) == len(srcs) * (len(srcs) - 1) // 2
    assert all(a < b for a, b in rows)


def test_class_weights_rebalance_exactly(spark):
    """Counts sum to the corpus, and the weighted example mass per class is
    uniform: w_c * n_c = N / k for every class (the 'balanced' identity)."""
    rows = Q["q_class_weights"](spark, SF_SMOKE).collect()
    emb = load_table(spark, SF_SMOKE, "embeddings")
    n = emb.count()
    k = len(rows)
    assert sum(r.n_examples for r in rows) == n
    for r in rows:
        assert abs(r.class_weight * r.n_examples - n / k) < n * 2e-6
        assert abs(r.freq - r.n_examples / n) < 2e-6


def test_weighted_quantile_degenerate_single_price_group(spark, tmp_path):
    """A group with ONE distinct price has zero bucket width: the guard
    must map it to bucket 0 (a NaN division would null the key and drop
    the group at the offset join), and every quantile returns that price."""
    df = spark.createDataFrame(
        [("X", 5.0, 2.0)] * 3 + [("Y", 1.0, 1.0), ("Y", 2.0, 1.0)],
        "l_returnflag string, l_extendedprice double, l_quantity double",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    rows = Q["q_weighted_quantile"](spark, str(tmp_path)).collect()
    x = [r for r in rows if r.l_returnflag == "X"]
    assert len(x) == 5 and all(r.wq_price == 5.0 for r in x)
    y = {r.quantile: r.wq_price for r in rows if r.l_returnflag == "Y"}
    assert y[0.25] == 1.0 and y[0.99] == 2.0


def test_vocab_coverage_matches_bruteforce_prefix(spark):
    """n_vocab_90 must equal the literal frequency-ranked prefix length
    computed driver-side, and the Zipf shape must hold (prefix share well
    under 1)."""
    from collections import Counter, defaultdict

    from parquet_to_clickhouse_schema_spark.functions.text import (
        VOCAB_COVER_TARGET,
    )

    rows = {r.lang: r for r in Q["q_vocab_coverage"](spark, SF_SMOKE).collect()}
    docs = load_table(spark, SF_SMOKE, "documents").collect()
    cnt = defaultdict(Counter)
    for d in docs:
        cnt[d.lang].update(d.text.split(" "))
    for lang, c in cnt.items():
        r = rows[lang]
        assert r.n_vocab == len(c)
        tot = sum(c.values())
        assert r.n_tokens == tot
        ordered = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
        cum = 0
        n90 = 0
        for _, v in ordered:
            if cum < VOCAB_COVER_TARGET * tot:
                n90 += 1
            cum += v
        assert r.n_vocab_90 == n90
        assert 0 < r.vocab_share_90 < 1.0


def test_dup_cluster_sizes_account_for_the_corpus(spark):
    """Cluster doc mass sums to the corpus, removable = docs − clusters,
    and totals agree with q_coverage_curve's 100% level."""
    rows = Q["q_dup_cluster_sizes"](spark, SF_SMOKE).collect()
    d = load_table(spark, SF_SMOKE, "documents")
    n = d.count()
    uniq = d.select("text").distinct().count()
    assert sum(r.n_docs for r in rows) == n
    assert sum(r.n_clusters for r in rows) == uniq
    assert sum(r.n_removable for r in rows) == n - uniq
    for r in rows:
        assert r.n_removable == r.n_docs - r.n_clusters


def test_source_mix_kl_matches_bruteforce_and_is_nonnegative(spark):
    """KL per source must match the driver-side computation over exact
    counts and be nonnegative (Gibbs' inequality)."""
    import math
    from collections import Counter, defaultdict

    rows = {r.source: r for r in Q["q_source_mix_kl"](spark, SF_SMOKE).collect()}
    docs = load_table(spark, SF_SMOKE, "documents").collect()
    per_src = defaultdict(Counter)
    marg = Counter()
    for d in docs:
        per_src[d.source][d.lang] += 1
        marg[d.lang] += 1
    n_all = sum(marg.values())
    for src, cnt in per_src.items():
        n = sum(cnt.values())
        kl = sum(
            (c / n) * math.log((c / n) / (marg[l] / n_all)) for l, c in cnt.items()
        )
        r = rows[src]
        assert r.n_langs == len(cnt)
        assert abs(r.kl_nats - kl) < 2e-6
        assert r.kl_nats >= -1e-9


def test_neyman_allocation_beats_proportional_on_variance_weighting(spark):
    """Allocations follow N_h*S_h shares (brute-force check), never exceed
    the stratum size, and a stratum with higher length variance gets MORE
    than its proportional share whenever sizes are comparable."""
    import statistics
    from collections import defaultdict

    from parquet_to_clickhouse_schema_spark.operators.training import (
        NEYMAN_BUDGET,
    )

    rows = {r.lang: r for r in Q["q_neyman_allocation"](spark, SF_SMOKE).collect()}
    docs = load_table(spark, SF_SMOKE, "documents").collect()
    chars = defaultdict(list)
    for d in docs:
        chars[d.lang].append(d.n_chars)
    z = sum(len(v) * statistics.pstdev(v) for v in chars.values())
    for lang, v in chars.items():
        r = rows[lang]
        share = len(v) * statistics.pstdev(v) / z
        assert abs(r.alloc_share - share) < 2e-6
        want = min(int(NEYMAN_BUDGET * share + 0.5), len(v))
        assert r.n_alloc == want
        assert r.n_alloc <= r.n_docs
    assert sum(r.alloc_share for r in rows.values()) > 0.999


def test_shingle_ops_survive_sub_n_token_documents(spark, tmp_path):
    """Regression (r11 review): Spark's sequence(1, 0) is DESCENDING, so an
    unguarded shingle transform hands slice() a zero start and crashes on
    any document shorter than NOVELTY_N tokens. Both shingle ops must skip
    such docs (the oracle's WHERE len(toks) >= N) instead of throwing."""
    df = spark.createDataFrame(
        [
            (1, "a b", "en", "s0", 3),
            (2, "one two three four five", "en", "s0", 23),
            (3, "one two three four five", "en", "s1", 23),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    b = Q["q_boilerplate_ngrams"](spark, str(tmp_path)).collect()
    n = Q["q_ngram_novelty"](spark, str(tmp_path)).collect()
    assert {r.doc_id for r in b} == {2, 3}  # the 2-token doc emits no row
    assert {r.doc_id for r in n} == {2, 3}
