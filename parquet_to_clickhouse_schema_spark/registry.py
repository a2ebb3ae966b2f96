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
# Round-15 sweep priority: the driver's correctness sweep checks the FIRST
# ~50 queries() keys each round. Rotation is rebuilt each round from the
# evidence ledger (`python scripts/sweep_ledger.py`, docs/SWEEP_LEDGER.md).
# After r14 the freshness backlog is: 11 keys whose latest row is r08 (the
# r14 rotation's documented overflow tail) and 50 whose latest is r09. r15
# leads with all 11 r08 keys (the r14 VERDICT's explicit order), then the
# two new never-swept r15 keys, then the first 37 r09-era keys in ledger
# (alphabetical) order — exactly the ~50-key budget. The 13 r09 tail keys
# overflow to r16. Zero overlap with the r14 sweep set by construction.
SWEEP_PRIORITY = (
    # (a) r8-era keys, VERDICT r14 task #2 (11 keys)
    "q_sliding_window",
    "q_spend_alerts",
    "q_stream_dedup",
    "q_stream_enrich",
    "q_table_checksum",
    "q_time_rollup",
    "q_top_movers",
    "q_tumbling_window",
    "q_video_frames",
    "q_window_time_range",
    "q_zipf_slope",
    # (a2) new r15 keys — never swept, get their first driver row here
    "q_percentile_verified",
    "q_bloom_prune",
    # (b) r9-era refresh, ledger (alphabetical) order (38 keys)
    "q_anomaly_zscore",
    "q_audio_resample",
    "q_benford",
    "q_bigram_pmi",
    "q_bpe_pairs",
    "q_cdc_apply",
    "q_dedup_containment",
    "q_dedup_pipeline",
    "q_dq_checks",
    "q_dup_rate_report",
    "q_embed_outliers",
    "q_embed_quantize",
    "q_event_transitions",
    "q_except_set",
    "q_format_roundtrip",
    "q_graph_degree",
    "q_having",
    "q_hourly_profile",
    "q_image_resize",
    "q_incremental_near_dedup",
    "q_interp_linear",
    "q_intersect_all",
    "q_layout_pruning",
    "q_length_histogram",
    "q_limit_offset",
    "q_mad_robust",
    "q_mix_balanced",
    "q_mode_agg",
    "q_near_dedup_minhash",
    "q_order_nulls",
    "q_percentile",
    "q_pii_scrub",
    "q_pivot",
    "q_profile_table",
    "q_quantile_bucketize",
    "q_report_big_orders",
    "q_report_late_orders",
    # ---- ~50-budget line ----
    # (c) overflow: r9-era tail for r16
    "q_report_order_count_dist",
    "q_report_returned_customers",
    "q_report_revenue_delta",
    "q_report_small_qty_revenue",
    "q_report_top_orders",
    "q_source_entropy",
    "q_stream_stream_join",
    "q_substring_dup",
    "q_training_mix_report",
    "q_udf_arrow",
    "q_unigram_nll",
    "q_variant_json",
    "q_video_thumbnail",
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
