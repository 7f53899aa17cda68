#!/usr/bin/env python
"""Benchmark harness: runs the headline registry queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": total_sec, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...}

Each query is forced to full materialization with a noop-format write
(executes the whole plan, no driver collect overhead). A warmup run
of the flagship query absorbs JVM/codegen startup so per-query times
measure the plan, not the JIT.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from feast_hive_spark.registry import REGISTRY
import feast_hive_spark.registry_analytics  # noqa: F401
import feast_hive_spark.registry_corpus  # noqa: F401
import feast_hive_spark.registry_ext  # noqa: F401
import feast_hive_spark.registry_rel  # noqa: F401
from feast_hive_spark.session import get_spark
from feast_hive_spark.sources.tables import register_views

BENCH_QUERIES = [
    "pit_asof_join",
    "pit_multi_feature_view",
    "pull_latest",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_revenue_delta",
    "q7_nation_volume_shipping",
    "q9_product_type_profit",
    "q11_important_part_values",
    "q10_returned_items",
    "q14_promo_revenue",
    "q18_large_orders",
    "q21_sole_returning_supplier",
    "topk_parts_per_brand",
    "window_user_activity",
    "cube_order_stats",
    "percentile_order_value",
    "price_quantity_corr",
    "fuzzy_part_name_pairs",
    "events_daily_rollup",
    "events_sliding_rollup",
    "sliding_distinct_users",
    "events_json_props",
    "events_sessionize_batch",
    "interval_overlap_counts",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_jaccard_prefix",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "dedup_embedding_cosine_lsh",
    "dedup_components",
    "decontaminate_vs_benchmark",
    "curation_pipeline",
    "split_train_val_test",
    "epoch_shuffle_head",
    "pack_sequences_by_lang",
    "chi2_event_type_segment",
    "funnel_view_click_purchase",
    "outlier_zscore_counts",
    "stratified_sample_by_lang",
    "scrub_forbidden_terms",
    "quality_weighted_sample",
    "text_normalize_fp",
    "value_histogram",
    "pii_scrub_stats",
    "gopher_quality_flags",
    "vocab_zipf",
    "dedup_paragraph_chunks",
    "span_dedup_stats",
    "tfidf_top_terms",
    "events_rolling_7d",
    "asof_forward_daily",
    "materialize_delta",
    "cohort_retention_weekly",
    "event_transition_matrix",
    "salted_join_segments",
    "zorder_layout_quality",
    "data_quality_lineitem",
    "winsorized_event_values",
    "bm25_search_topk",
    "temperature_sample_by_lang",
    "embedding_quantization_error",
    "bigram_pmi_top",
    "text_repetition_stats",
    "langid_confusion",
    "corpus_mix_weights",
    "label_centroids",
    "knn_label_accuracy",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "multimodal_metadata",
    "multimodal_frame_sample",
    "multimodal_type_rollup",
    "text_analysis",
    "text_lang_quality_rollup",
]


def run_query(fn, spark, sf_dir: str) -> float:
    # clear intra-query operator caches from prior runs: they are
    # consumed within one query, and letting them pile up across the
    # whole bench session just adds GC pressure (and run-to-run noise)
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("bench")
    register_views(spark, sf_dir)

    names = [n for n in BENCH_QUERIES if n in REGISTRY]
    extra = [a for a in sys.argv[1:] if a in REGISTRY]
    if extra:
        names = extra

    # Per-query warmup run, then one timed run: reports steady-state
    # plan execution (whole-stage-codegen compiled, JIT warm, file
    # footers cached) rather than single-JVM first-run compile cost —
    # the regime a long-lived cluster actually operates in.
    times: dict[str, float] = {}
    for name in names:
        run_query(REGISTRY[name][0], spark, sf_dir)
        times[name] = round(run_query(REGISTRY[name][0], spark, sf_dir), 4)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": round(sum(times.values()), 4),
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
