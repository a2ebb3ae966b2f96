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
    dq,
    graph,
    llm,
    merge,
    relational,
    reports,
    retrieval,
    skew,
    sortset,
    sqlfeatures,
    timeseries,
    training,
    udfs,
    windows,
)
from parquet_to_clickhouse_schema_spark.streaming import batch_twins

_MODULES = [
    core,
    relational,
    reports,
    retrieval,
    aggregation,
    windows,
    sortset,
    sqlfeatures,
    scalar,
    text,
    batch_twins,
    llm,
    timeseries,
    training,
    udfs,
    skew,
    merge,
    graph,
    dq,
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
# Round-17 sweep priority: the driver's correctness sweep checks the FIRST
# ~50 queries() keys each round. Rotation is rebuilt each round from the
# evidence ledger (`python scripts/sweep_ledger.py`, docs/SWEEP_LEDGER.md).
# After r16 the freshness backlog is: 16 keys whose latest row is r10 (the
# r16 rotation's documented overflow tail — VERDICT r16 task #3 names all
# 16) and 50 whose latest is r11. r17 leads with all 16 r10 keys, then the
# six new r17 keys (never swept — first driver row here), then the
# first 28 r11-era keys in ledger (alphabetical) order — exactly the
# 50-key budget. The 22 r11 tail keys overflow to r18. Zero overlap with
# the r16 sweep set by construction.
SWEEP_PRIORITY = (
    # (a) r10-era tail, VERDICT r16 task #3 (16 keys)
    "q_simhash_verified",
    "q_skew_stats",
    "q_stats_agg",
    "q_subquery_corr",
    "q_subquery_in",
    "q_subquery_scalar",
    "q_text_stats",
    "q_token_burstiness",
    "q_udaf_grouped",
    "q_udf_pandas",
    "q_udf_python",
    "q_unpivot",
    "q_vocab_overlap",
    "q_window_dist",
    "q_window_value",
    "q_winsorize",
    # (a2) new r17 keys — never swept, get their first driver row here
    "q_source_jaccard_matrix",
    "q_context_length_sweep",
    "q_tokenizer_fertility",
    "q_source_js_divergence",
    "q_image_dhash_dedup",
    "q_audio_fingerprint_dedup",
    # (b) r11-era refresh, ledger (alphabetical) order through q_lift_confidence (28 keys)
    "q_abc_classification",
    "q_auc_marker",
    "q_bitmap_distinct",
    "q_boilerplate_ngrams",
    "q_catalog_coverage",
    "q_chunk_dedup_ratio",
    "q_confidence_bins",
    "q_content_chunks",
    "q_coverage_curve",
    "q_ctr_smoothing",
    "q_cuped",
    "q_dataset_card",
    "q_delete_propagation",
    "q_dp_histogram",
    "q_effective_sample_size",
    "q_embed_standardize",
    "q_entropy_rate",
    "q_forecast_baseline",
    "q_gap_distribution",
    "q_graph_triangles",
    "q_group_split",
    "q_ivfpq_verified_topk",
    "q_join_pit",
    "q_kanon_audit",
    "q_km_survival",
    "q_ks_test",
    "q_late_data_report",
    "q_lift_confidence",
    # ---- ~50-budget line ----
    # (c) overflow: r11-era tail for r18
    "q_linear_probe",
    "q_lsh_param_sweep",
    "q_mann_whitney",
    "q_map_eval",
    "q_markov_stationary",
    "q_matryoshka_eval",
    "q_max_concurrency",
    "q_mh_odds",
    "q_minhash_union",
    "q_mrr",
    "q_ndcg",
    "q_pareto_8020",
    "q_pca_power",
    "q_price_index",
    "q_quantile_normalize",
    "q_sequence_count",
    "q_snapshot_diff",
    "q_twap",
    "q_weighted_quantile",
    "q_window_funnel",
    "q_wsample_es",
    "q_zorder_preview",
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
