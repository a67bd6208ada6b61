#!/usr/bin/env python3
"""Scale-growth validation for the dedup/ANN family (VERDICT r4 item 2).

Runs the candidate-generation queries at sf0.1-shaped and sf1-shaped
data from the SAME generator (scripts/gen_scale_data.py) and records
wall-clock growth. The claim under test: every bucketed candidate
generator (MinHash banding, SimHash chunk blocking, SRP tables, IVF
cells, broadcast incremental probe) grows ~linearly in corpus size,
while the labeled-exact paths (uncapped Jaccard) may not — that is why
they carry caps/LSH scale paths.

Writes SCALE_r8.json and prints a markdown table for the round notes.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from customer_360_etl_pipeline_on_azure_cloud_spark.session import get_spark  # noqa: E402
from customer_360_etl_pipeline_on_azure_cloud_spark.testdata_queries import (  # noqa: E402
    CORE_QUERIES,
)

QUERIES = [
    "streaming_holt_by_type",
    "part_bfs_hops",
    "part_affinity_route",
    "event_ohlc_bars",
    "curriculum_interleave",
    "hilbert_layout",
    "layout_curve_compare",
    "vocab_growth_curve",
    "streaming_ohlc_bars",
    "part_graph_route_indexed",
    "revenue_holt_forecast",
    "part_pagerank_weighted",
    "doc_jaccard_pairs",
    "minhash_near_dup",
    "simhash_near_dup",
    "embedding_near_dup",
    "ann_topk",
    "ann_topk_lsh",
    "ann_topk_ivf",
    "dedup_clusters",
    "incremental_corpus_dedup",
    "incremental_corpus_dedup_indexed",
    "dedup_clusters_twophase",
    "semantic_dedup",
    "doc_containment_pairs",
    "doc_rare_token_stats",
    # round-5 part-2 training-prep surface
    "cluster_aware_split",
    "duplicate_passages",
    "doc_lm_perplexity",
    "bpe_merge_pairs",
    "gopher_quality_flags",
    "embedding_quantization",
    "collocation_pmi",
    "cdc_chunking",
    "media_blob_dedup",
    "bpe_train_merges",
    "bpe_compression",
    "split_leakage_audit",
    "streaming_index_dedup",
    "incremental_index_update",
    # engine-ops additions (graph / DQ / classifier)
    "part_pagerank",
    "dq_expectations",
    "quality_classifier_score",
    "orders_quarantine",
    "source_quality_report",
    "embedding_gram",
    "basket_rules",
    "ann_topk_ivf_indexed",
    "ann_topk_pq",
    "ann_topk_ivfpq",
    "ann_topk_ivfpq_indexed",
    # round-6 surface: distributed centroid fit, IVF lifecycle,
    # substring cut spans, classifier training
    "semantic_dedup_distributed",
    "semantic_dedup_hierarchical",
    "histogram_rollup_quantiles",
    "incremental_ann_index_update",
    "duplicate_spans",
    "substring_dedup_apply",
    "decontamination_apply",
    "quality_classifier_train",
    "quality_classifier_trained_score",
    "doc_bigram_perplexity",
    "winnowing_dedup_pairs",
    "streaming_quality_gate",
    "corpus_curation_report",
    # post-freeze round-6 additions on scale-generated tables
    "source_kl_divergence",
    "training_shard_manifest",
    "importance_resample",
    "embedding_pca_project",
    "part_triangles",
    "benford_audit",
    "revenue_cusum",
    "quality_rank_calibration",
    # round-6 final-session warehouse additions (orders/lineitem only)
    "order_reconciliation",
    "part_recommendations",
    "revenue_bridge",
    "cohort_ltv",
    "bloom_pruned_join",
    "revenue_seasonal_decomp",
    "sole_delayed_supplier",
    "doc_near_dup_core",
    "part_communities",
    "layout_skipping_audit",
    "customer_survival",
    "media_phash_near_dup",
    "quality_classifier_gd_train",
    "quality_classifier_gd_score",
    "revenue_seasonal_outliers",
    "source_mixture_temperature",
    "incremental_components_update",
    "join_skew_audit",
    "streaming_sketch_rollup",
    "classifier_calibration",
    "point_in_time_features",
    # round-7: all ten driver tables exist at scale now — warehouse,
    # events, and the reference-shaped core join the growth table
    "customer_prospects",
    "revenue_backtest",
    "part_abc_class",
    "k_anonymity_audit",
    "k_anonymity_generalize",
    "customer_rfm",
    "nation_revenue_gini",
    "nation_revenue_hhi",
    "kmv_audience_overlap",
    "attribution_multitouch",
    "reference_e2e",
    "user_trend",
    "supplier_360",
    "point_in_time_features_daily",
]


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dirs = {
        "sf0.1": os.path.join(root, "testdata_scale", "sf0.1"),
        "sf1": os.path.join(root, "testdata_scale", "sf1"),
    }
    spark = get_spark(
        app_name="c360-scale",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": os.environ.get(
                "SPARK_GRAFT_DRIVER_MEM", "24g"
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    n_passes = int(os.environ.get("SPARK_GRAFT_SCALE_N", "2"))
    only = os.environ.get("SPARK_GRAFT_SCALE_ONLY")
    names = [q for q in QUERIES if not only or q in only.split(",")]
    out: dict[str, dict] = {}
    prior = {}
    # subset runs merge into the current round's artifact (falling back
    # to the previous round's as the base)
    for cand in ("SCALE_r8.json", "SCALE_r7.json", "SCALE_r6.json", "SCALE_r5.json"):
        prior_path = os.path.join(root, cand)
        if only and os.path.exists(prior_path):
            with open(prior_path) as fh:
                prior = json.load(fh)
            break
    for name in names:
        fn, _sql = CORE_QUERIES[name]
        rec: dict[str, float | int | str] = {}
        for sfname, d in dirs.items():
            best, rows = None, None
            try:
                for _ in range(n_passes):
                    spark.catalog.clearCache()
                    t0 = time.perf_counter()
                    got = fn(spark, d).collect()
                    dt = time.perf_counter() - t0
                    best = dt if best is None else min(best, dt)
                    rows = len(got)
            except Exception as exc:  # noqa: BLE001
                rec[f"{sfname}_err"] = f"{type(exc).__name__}: {exc}"[:200]
                continue
            rec[f"{sfname}_sec"] = round(best, 2)
            rec[f"{sfname}_rows"] = rows
        if "sf0.1_sec" in rec and "sf1_sec" in rec:
            rec["growth_10x"] = round(rec["sf1_sec"] / rec["sf0.1_sec"], 2)
        out[name] = rec
        print(name, rec, flush=True)

    merged = {**prior, **out} if prior else out
    with open(os.path.join(root, "SCALE_r8.json"), "w") as fh:
        json.dump(merged, fh, indent=1)
        fh.write("\n")

    print("\n| query | sf0.1 s | sf1 s | growth (10x data) | sf1 rows |")
    print("|---|---|---|---|---|")
    for name, rec in out.items():
        print(
            f"| {name} | {rec.get('sf0.1_sec', '-')} | {rec.get('sf1_sec', '-')}"
            f" | {rec.get('growth_10x', '-')} | {rec.get('sf1_rows', '-')} |"
        )


if __name__ == "__main__":
    main()
