#!/usr/bin/env python
"""Scale probe: do the headline plans scale linearly?

Synthesizes a k-times larger copy of the fact tables (lineitem/orders keys
shifted per replica so join cardinalities scale honestly), then times the
headline queries at sf0.1 and at the scaled size. A plan that survives 100 TB
should show time ratios ~= k (linear in input) — superlinear growth exposes a
shuffle/skew problem before a cluster ever does.

Usage: python scripts/scale_probe.py [k]      (default k=10, ~6M lineitem rows)
Writes scaled parquet under /tmp/spark_graft_scale/ (reused across runs).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from parquet_to_clickhouse_schema_spark.operators import aggregation, relational, sortset, windows
from parquet_to_clickhouse_schema_spark.session import get_spark
from parquet_to_clickhouse_schema_spark.sources.io import TABLES, load_table

BASE_SF = "/root/testdata/sf0.1"
SCALED_ROOT = "/tmp/spark_graft_scale_v2"  # v2: events now scale too

QUERIES = {
    "q_agg_hash": aggregation.q_agg_hash,
    "q_join_sortmerge": relational.q_join_sortmerge,
    "q_join_multiway": relational.q_join_multiway,
    "q_window_rank": windows.q_window_rank,
    "q_window_rank_scalable": windows.q_window_rank_scalable,
    "q_topk": sortset.q_topk,
}


def _llm_queries():
    from parquet_to_clickhouse_schema_spark.operators import llm, training
    from parquet_to_clickhouse_schema_spark.functions import text

    return {
        # round-5 additions. q_fuzzy_pairs is deliberately NOT probed: the
        # k-replica corpus gives every doc k exact copies, so its OUTPUT
        # (all pairs within edit distance 3) grows ~k² by construction
        # (~22M qualifying pairs at k=10) — the probe would measure the
        # dataset's quadratic pair count, not the plan. Its scale evidence
        # is the lossless-blocking equality test plus the measured 82s→22s
        # prefix-filter win at sf0.1.
        "q_bm25_score": text.q_bm25_score,
        "q_epoch_shuffle": training.q_epoch_shuffle,
        "q_pack_sequences": training.q_pack_sequences,
        "q_dedup_exact": llm.q_dedup_exact,
        "q_near_dedup_minhash": llm.q_near_dedup_minhash,
        "q_dedup_ngram": llm.q_dedup_ngram,
        "q_dedup_simhash": llm.q_dedup_simhash,
        "q_cosine_topk": llm.q_cosine_topk,
        "q_dedup_embedding": llm.q_dedup_embedding,
        "q_text_stats": llm.q_text_stats,
        "q_doc_fingerprint": text.q_doc_fingerprint,
        # the sub-quadratic ANN escape hatches for the two O(n²) exact ops
        "q_ann_lsh_topk": llm.q_ann_lsh_topk,
        "q_ivf_topk": llm.q_ivf_topk,
        "q_pq_topk": llm.q_pq_topk,
    }


def _r6_queries():
    from parquet_to_clickhouse_schema_spark.functions import text
    from parquet_to_clickhouse_schema_spark.operators import aggregation, dq, llm, merge
    from parquet_to_clickhouse_schema_spark.streaming import batch_twins

    return {
        # round-6 additions. q_interp_linear is grid-bounded (O(hours x
        # types) regardless of fact size) so a fact-scale probe is
        # uninformative; q_bigram_pmi/q_bpe_pairs outputs are fixed top-k.
        "q_dq_checks": dq.q_dq_checks,
        "q_unigram_nll": text.q_unigram_nll,
        "q_bigram_pmi": text.q_bigram_pmi,
        "q_bpe_pairs": text.q_bpe_pairs,
        "q_source_entropy": text.q_source_entropy,
        "q_cdc_apply": merge.q_cdc_apply,
        "q_event_transitions": batch_twins.q_event_transitions,
        "q_embed_outliers": llm.q_embed_outliers,
        "q_mode_agg": aggregation.q_mode_agg,
        "q_mad_robust": aggregation.q_mad_robust,
    }


def _r7_queries():
    from parquet_to_clickhouse_schema_spark.functions import text
    from parquet_to_clickhouse_schema_spark.operators import (
        reports,
        sqlfeatures,
        timeseries,
        training,
    )
    from parquet_to_clickhouse_schema_spark.streaming import batch_twins

    return {
        # round-7 additions. q_recursive_cte is spine-bounded (80 rows at
        # any fact scale) and q_order_nulls is a TakeOrdered scan — probing
        # them measures the scan, not a plan risk. The report shapes ride
        # lineitem/orders; the stream ops ride the scaled-users events
        # axis; the corpus ops ride documents.
        "q_report_volume_shipping": reports.q_report_volume_shipping,
        "q_report_market_share": reports.q_report_market_share,
        "q_report_ship_priority": reports.q_report_ship_priority,
        "q_report_top_supplier": reports.q_report_top_supplier,
        "q_report_part_supp_count": reports.q_report_part_supp_count,
        "q_report_min_cost_supplier": reports.q_report_min_cost_supplier,
        "q_report_waiting_suppliers": reports.q_report_waiting_suppliers,
        "q_report_idle_customers": reports.q_report_idle_customers,
        "q_distinct_on": sqlfeatures.q_distinct_on,
        "q_acf": timeseries.q_acf,
        "q_cusum": timeseries.q_cusum,
        "q_oov_rate": text.q_oov_rate,
        "q_freq_topk_sketch": text.q_freq_topk_sketch,
        "q_contamination_score": training.q_contamination_score,
        "q_curriculum_order": training.q_curriculum_order,
        "q_incremental_dedup": training.q_incremental_dedup,
        "q_stream_enrich": batch_twins.q_stream_enrich,
        "q_window_time_range": batch_twins.q_window_time_range,
        "q_time_rollup": batch_twins.q_time_rollup,
    }


def _r7b_queries():
    from parquet_to_clickhouse_schema_spark.functions import text
    from parquet_to_clickhouse_schema_spark.operators import (
        aggregation,
        dq,
        graph,
        llm,
        merge,
        reports,
        sqlfeatures,
        timeseries,
        training,
        udfs,
    )
    from parquet_to_clickhouse_schema_spark.streaming import batch_twins

    return {
        # round-7 second batch. q_benford/q_moving_median/q_chi_square are
        # aggregate-first like q_cusum (fact collapses to a calendar/digit
        # bounded table); included to confirm, not because risk is likely.
        "q_moving_median": aggregation.q_moving_median,
        "q_benford": aggregation.q_benford,
        "q_skyline": sqlfeatures.q_skyline,
        "q_limit_offset": sqlfeatures.q_limit_offset,
        "q_chi_square": timeseries.q_chi_square,
        "q_table_checksum": dq.q_table_checksum,
        "q_image_decode": llm.q_image_decode,
        "q_audio_decode": llm.q_audio_decode,
        "q_video_frames": llm.q_video_frames,
        "q_copurchase_pairs": graph.q_copurchase_pairs,
        "q_audience_overlap": graph.q_audience_overlap,
        "q_incremental_agg": merge.q_incremental_agg,
        "q_udf_arrow": udfs.q_udf_arrow,
        "q_oov_rate": text.q_oov_rate,  # re-probe: vocab K changed to 20
        "q_report_important_stock": reports.q_report_important_stock,
        "q_report_excess_supply": reports.q_report_excess_supply,
        "q_mix_temperature": training.q_mix_temperature,
        "q_funnel_time": reports.q_funnel_time,
        "q_ship_latency": reports.q_ship_latency,
        "q_cohort_ltv": reports.q_cohort_ltv,
        "q_spend_alerts": batch_twins.q_spend_alerts,
        "q_seasonal_decompose": timeseries.q_seasonal_decompose,
        "q_rolling_corr": timeseries.q_rolling_corr,
        "q_lang_confusion": text.q_lang_confusion,
        "q_filter_sweep": text.q_filter_sweep,
        "q_bootstrap_ci": aggregation.q_bootstrap_ci,
    }


KEY_SHIFT = 10_000_000_000


def build_scaled(spark, k: int) -> str:
    out = f"{SCALED_ROOT}/x{k}"
    if os.path.isdir(f"{out}/lineitem.parquet"):
        return out
    li = load_table(spark, BASE_SF, "lineitem")
    o = load_table(spark, BASE_SF, "orders")
    li_k = None
    o_k = None
    for i in range(k):
        shift = F.lit(i * KEY_SHIFT)
        li_i = li.withColumn("l_orderkey", F.col("l_orderkey") + shift)
        o_i = o.withColumn("o_orderkey", F.col("o_orderkey") + shift)
        li_k = li_i if li_k is None else li_k.unionAll(li_i)
        o_k = o_i if o_k is None else o_k.unionAll(o_i)
    li_k.write.mode("overwrite").parquet(f"{out}/lineitem.parquet")
    o_k.write.mode("overwrite").parquet(f"{out}/orders.parquet")
    # documents/embeddings scale by id shift too (text/vectors repeat —
    # fine for timing; dedup finds the planted copies, which is realistic)
    docs = load_table(spark, BASE_SF, "documents")
    emb = load_table(spark, BASE_SF, "embeddings")
    d_k = None
    e_k = None
    for i in range(k):
        shift = F.lit(i * KEY_SHIFT)
        d_i = docs.withColumn("doc_id", F.col("doc_id") + shift)
        e_i = emb.withColumn("vec_id", F.col("vec_id") + shift)
        d_k = d_i if d_k is None else d_k.unionAll(d_i)
        e_k = e_i if e_k is None else e_k.unionAll(e_i)
    d_k.write.mode("overwrite").parquet(f"{out}/documents.parquet")
    e_k.write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    # events scale by (event_id, user_id) shift: k-times more USERS with the
    # same per-user sequence depth — the realistic growth axis for event
    # streams (windows/sessionization per user stay constant-size)
    ev = load_table(spark, BASE_SF, "events")
    ev_k = None
    for i in range(k):
        shift = F.lit(i * KEY_SHIFT)
        ev_i = ev.withColumn("event_id", F.col("event_id") + shift).withColumn(
            "user_id", F.col("user_id") + shift
        )
        ev_k = ev_i if ev_k is None else ev_k.unionAll(ev_i)
    ev_k.write.mode("overwrite").parquet(f"{out}/events.parquet")
    for t in TABLES:
        if t in ("lineitem", "orders", "documents", "embeddings", "events"):
            continue
        dst = f"{out}/{t}.parquet"
        if not os.path.isdir(dst):
            load_table(spark, BASE_SF, t).write.mode("overwrite").parquet(dst)
    return out


def time_query(fn, spark, sf_dir: str) -> tuple[float, int]:
    from pyspark.sql import Observation

    t0 = time.time()
    obs = Observation()
    # observe on the noop write: row count from the SAME single execution
    fn(spark, sf_dir).observe(obs, F.count(F.lit(1)).alias("rows")).write.format(
        "noop"
    ).mode("overwrite").save()
    return round(time.time() - t0, 3), int(obs.get["rows"])


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    k = int(args[0]) if args else 10
    spark = get_spark("scale_probe")
    scaled = build_scaled(spark, k)

    queries = dict(QUERIES)
    if "--llm" in sys.argv:
        queries = _llm_queries()
    if "--r6" in sys.argv:
        queries = _r6_queries()
    if "--r7" in sys.argv:
        queries = _r7_queries()
    if "--r7b" in sys.argv:
        queries = _r7b_queries()
    for a in sys.argv[1:]:
        # --keys=q_a,q_b: probe a named subset (union of all known sets
        # plus anything registered) — for re-probing changed operators
        if a.startswith("--keys="):
            from parquet_to_clickhouse_schema_spark import registry

            pool = dict(QUERIES)
            for f in (_llm_queries, _r6_queries, _r7_queries, _r7b_queries):
                pool.update(f())
            pool.update(registry.all_queries())
            queries = {k: pool[k] for k in a[len("--keys="):].split(",")}

    results = {}
    for name, fn in queries.items():
        time_query(fn, spark, BASE_SF)  # warm (codegen, file listing)
        base, base_rows = time_query(fn, spark, BASE_SF)
        big, big_rows = time_query(fn, spark, scaled)
        entry = {
            "sf0.1_s": base,
            f"x{k}_s": big,
            "ratio": round(big / base, 1) if base > 0 else None,
            "rows": base_rows,
            f"x{k}_rows": big_rows,
        }
        # pair-emitting queries (dedup): in the replicated probe corpus the
        # TRUE pair count grows ~k^2 by construction (every planted copy
        # matches every other), so wall-ratio alone misreads as superlinear;
        # the per-output-row cost is the number that must stay flat.
        if big_rows > 0 and base_rows > 0 and big_rows > k * base_rows:
            entry["us_per_row"] = round(base * 1e6 / base_rows, 2)
            entry[f"x{k}_us_per_row"] = round(big * 1e6 / big_rows, 2)
        results[name] = entry
    print(json.dumps({"k": k, "results": results}))


if __name__ == "__main__":
    main()
