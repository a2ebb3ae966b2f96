"""Property tests for q_percentile_verified's MRL selection/merge rule.

The Spark operator and its DuckDB oracle both implement this arithmetic
with window functions (operators/sqlfeatures.py); here the SAME integer
arithmetic runs in pure Python under hypothesis, so the sketch's
analytic guarantees are checked against adversarial inputs the TPC-H
fixture never produces — massive ties, heavy skew, shards of size 1,
empty shards. No SparkSession involved.

Guarantee shape (one-level MRL merge of per-shard m-sample summaries,
S shards, N total rows; derivation in the operator's docstring):
  - count(rows < est)  <=  q*N + N/m + S   (each shard hides at most
    ceil(n_s/m)-1 < n_s/m + 1 uncounted rows below the pick)
  - count(rows <= est) >=  ceil(q*N)       (cumw only counts rows <= est)
Note the <=-side error is NOT bounded by 1/m under ties (a value block
covering the target rank absorbs its whole tie mass) — which is why the
bound here is stated on the strict/weak rank pair, and why the Spark
smoke test's tighter 1/m assertion is a statement about the (tie-light)
l_extendedprice column, not the operator's general contract.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

M = 16  # samples per shard (smaller than the operator's 64 → looser
# bound, more violations per example if the rule were wrong)
QS = ((1, 4), (1, 2), (3, 4))


def mrl_estimate(shards: list[list[int]], m: int, qs) -> list[int]:
    """Pure-Python replica of the operator's arithmetic: per-shard sorted
    rank sampling at p_i = ceil(i*n/m) (kept iff (rn*m)//n bumps), exact
    integer rank-coverage weights, merge ordered by (val, shard, rn),
    pick the first sample whose cumulative weight reaches ceil(q*N)
    via the integer threshold cumw*den >= num*N."""
    samples = []
    for si, vals in enumerate(shards):
        s = sorted(vals)
        n = len(s)
        prev = 0
        for rn in range(1, n + 1):
            if (rn * m) // n > ((rn - 1) * m) // n:
                samples.append((s[rn - 1], si, rn, rn - prev))
                prev = rn
        assert prev == n  # weights in a shard sum to its row count
    total = sum(len(s) for s in shards)
    samples.sort(key=lambda t: (t[0], t[1], t[2]))
    out = []
    for num, den in qs:
        cum = 0
        for val, _si, _rn, w in samples:
            cum += w
            if cum * den >= num * total:
                out.append(val)
                break
    return out


@settings(max_examples=300, deadline=None)
@given(
    shards=st.lists(
        st.lists(st.integers(min_value=-50, max_value=50), max_size=60),
        min_size=1,
        max_size=8,
    ).filter(lambda sh: any(sh))
)
def test_mrl_rank_guarantees(shards):
    rows = sorted(v for s in shards for v in s)
    n_total = len(rows)
    n_shards = sum(1 for s in shards if s)
    ests = mrl_estimate(shards, M, QS)
    assert len(ests) == len(QS)
    # monotone across quantiles
    assert ests == sorted(ests)
    for (num, den), est in zip(QS, ests):
        target = -(-num * n_total // den)  # ceil(q*N)
        n_le = sum(1 for v in rows if v <= est)
        n_lt = sum(1 for v in rows if v < est)
        assert n_le >= target, (est, n_le, target)
        assert n_lt * den <= num * n_total + den * (n_total // M + n_shards), (
            est,
            n_lt,
        )


@settings(max_examples=200, deadline=None)
@given(
    vals=st.lists(
        st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=400
    )
)
def test_mrl_single_shard_sketch_size_and_exactness_when_small(vals):
    """One shard: the summary keeps min(n, M)-ish samples (<= M always),
    and when n <= M the sketch is lossless — every estimate equals the
    exact ceil-rank order statistic."""
    ests = mrl_estimate([vals], M, QS)
    s = sorted(vals)
    n = len(s)
    # sketch row bound: kept positions are a subset of 1..n capped by M
    kept = sum(
        1 for rn in range(1, n + 1) if (rn * M) // n > ((rn - 1) * M) // n
    )
    assert kept <= min(n, M)
    if n <= M:
        for (num, den), est in zip(QS, ests):
            exact = s[-(-num * n // den) - 1]  # value at rank ceil(q*n)
            assert est == exact, (n, num, den, est, exact)
