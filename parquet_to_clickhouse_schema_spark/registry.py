"""Central query registry: merges every operator module's QUERIES/ORACLES.

`queries()` / `oracle_sql()` in __spark_entry__.py are thin wrappers over
this module. Every key here is a row of SURVEY.md §2.2; a key appears in
ORACLES only when its DuckDB twin hash-matches (rows-only otherwise).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from parquet_to_clickhouse_schema_spark.functions import scalar, text
from parquet_to_clickhouse_schema_spark.operators import (
    aggregation,
    core,
    llm,
    merge,
    relational,
    reports,
    skew,
    sortset,
    sqlfeatures,
    training,
    udfs,
    windows,
)
from parquet_to_clickhouse_schema_spark.streaming import batch_twins

_MODULES = [
    core,
    relational,
    reports,
    aggregation,
    windows,
    sortset,
    sqlfeatures,
    scalar,
    text,
    batch_twins,
    llm,
    training,
    udfs,
    skew,
    merge,
]

# SURVEY.md §2.2's declared engine contract, in SURVEY order. These keys are
# emitted FIRST from all_queries(): the round driver sweeps queries() in dict
# order under a budget (the r1 sweep stopped after 50 entries, leaving the
# LLM/streaming/UDF contract families unchecked), so contract keys must
# register ahead of the beyond-contract extras.
CONTRACT_KEYS = (
    "q_schema_infer",
    "q_ddl_clickhouse",
    "q_ddl_sparksql",
    "q_scan_project",
    "q_filter_pred",
    "q_join_broadcast",
    "q_join_sortmerge",
    "q_join_multiway",
    "q_join_left",
    "q_join_semi",
    "q_join_anti",
    "q_join_range",
    "q_join_asof",
    "q_agg_hash",
    "q_agg_distinct",
    "q_agg_approx_distinct",
    "q_rollup",
    "q_cube",
    "q_grouping_sets",
    "q_agg_filtered",
    "q_window_rank",
    "q_window_lag",
    "q_window_frame",
    "q_window_range_frame",
    "q_topk",
    "q_topk_per_group",
    "q_union",
    "q_intersect",
    "q_except",
    "q_string_funcs",
    "q_date_funcs",
    "q_math_funcs",
    "q_cond_funcs",
    "q_array_funcs",
    "q_explode",
    "q_map_funcs",
    "q_json_funcs",
    "q_tumbling_window",
    "q_sliding_window",
    "q_session_window",
    "q_stream_dedup",
    "q_dedup_exact",
    "q_near_dedup_minhash",
    "q_cosine_topk",
    "q_text_stats",
    "q_multimodal_cols",
    "q_udf_python",
    "q_udf_pandas",
    "q_udaf_grouped",
)

# Round-5 sweep priority: the driver's correctness sweep checks the FIRST
# ~50 queries() keys each round. After r3/r4 verified the r3-changed and
# r3-new keys, the 61 keys whose latest green row dates to r1/r2 are now
# 2-3 rounds stale (VERDICT r4 "Next round" #3). This round leads with the
# keys whose implementations changed in round 5 (digest-key dedup, de-skewed
# pack_sequences, rank, PQ validation), then every r1/r2-stale key in
# registration order — so after this round ~50 of the 61 have a fresh row.
#
# ROUND 6: a ~50-key sweep covers this tuple only through
# q_near_dedup_minhash, so these keys still carry r1/r2 rows and must lead
# round 6's priority (plus anything round 6 changes): q_text_stats,
# q_udf_pandas, q_udf_python,
# q_udaf_grouped, q_report_top_orders, q_report_revenue_delta,
# q_report_returned_customers, q_report_late_orders, q_window_dist,
# q_intersect_all, q_except_set, q_pivot, q_unpivot, q_subquery_scalar,
# q_subquery_in, q_subquery_corr, q_having, q_percentile, q_stats_agg,
# q_window_value.
SWEEP_PRIORITY = (
    # implementations changed (or new) in round 5 — need fresh green rows
    "q_dedup_exact",
    "q_pack_sequences",
    "q_window_rank",
    "q_window_rank_scalable",
    "q_bm25_score",
    "q_epoch_shuffle",
    "q_sample_weighted",
    "q_source_cap",
    "q_ewma",
    "q_multimodal_cols",  # oracle newly attached in r5 — must sweep fresh
    "q_kmeans_clusters",  # new in r5 (rows-only: iterative)
    "q_fuzzy_pairs",  # new in r5
    "q_sessionize",  # new in r5
    "q_dedup_keep_best",  # new in r5
    "q_rolling_distinct",  # new in r5
    "q_pq_topk",
    "q_ivfpq_topk",
    # last green row r1/r2 — stale, re-verify (registration order)
    "q_ddl_sparksql",
    "q_scan_project",
    "q_filter_pred",
    "q_join_broadcast",
    "q_join_sortmerge",
    "q_join_multiway",
    "q_join_left",
    "q_join_semi",
    "q_join_anti",
    "q_join_range",
    "q_join_asof",
    "q_agg_hash",
    "q_agg_distinct",
    "q_agg_approx_distinct",
    "q_rollup",
    "q_cube",
    "q_grouping_sets",
    "q_agg_filtered",
    "q_window_lag",
    "q_window_frame",
    "q_window_range_frame",
    "q_topk",
    "q_topk_per_group",
    "q_union",
    "q_intersect",
    "q_except",
    "q_string_funcs",
    "q_date_funcs",
    "q_math_funcs",
    "q_cond_funcs",
    "q_array_funcs",
    "q_explode",
    "q_json_funcs",
    "q_tumbling_window",
    "q_sliding_window",
    "q_session_window",
    "q_stream_dedup",
    "q_near_dedup_minhash",
    "q_text_stats",
    "q_udf_python",
    "q_udf_pandas",
    "q_udaf_grouped",
    "q_report_top_orders",
    "q_report_revenue_delta",
    "q_report_returned_customers",
    "q_report_late_orders",
    "q_window_dist",
    "q_intersect_all",
    "q_except_set",
    "q_pivot",
    "q_unpivot",
    "q_subquery_scalar",
    "q_subquery_in",
    "q_subquery_corr",
    "q_having",
    "q_percentile",
    "q_stats_agg",
    "q_window_value",
)

QueryFn = Callable[[SparkSession, str], DataFrame]


def _merged_queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {}
    for m in _MODULES:
        overlap = set(out) & set(m.QUERIES)
        if overlap:
            raise ValueError(f"duplicate query keys: {overlap}")
        out.update(m.QUERIES)
    return out


def _emission_order(merged_keys) -> list[str]:
    """Sweep-priority keys first, then remaining contract keys, then extras."""
    out = [k for k in SWEEP_PRIORITY if k in merged_keys]
    out.extend(k for k in CONTRACT_KEYS if k in merged_keys and k not in out)
    out.extend(k for k in merged_keys if k not in set(out))
    return out


def all_queries() -> dict[str, QueryFn]:
    merged = _merged_queries()
    missing = [k for k in CONTRACT_KEYS if k not in merged]
    if missing:
        raise ValueError(f"contract keys not registered: {missing}")
    missing_prio = [k for k in SWEEP_PRIORITY if k not in merged]
    if missing_prio:
        raise ValueError(f"sweep-priority keys not registered: {missing_prio}")
    return {k: merged[k] for k in _emission_order(merged)}


def all_oracles() -> dict[str, str]:
    merged: dict[str, str] = {}
    for m in _MODULES:
        overlap = set(merged) & set(m.ORACLES)
        if overlap:
            raise ValueError(f"duplicate oracle keys: {overlap}")
        merged.update(m.ORACLES)
    # Same priority-first ordering as all_queries(), in case the driver
    # iterates oracle keys rather than query keys.
    return {k: merged[k] for k in _emission_order(merged)}
