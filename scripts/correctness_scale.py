#!/usr/bin/env python3
"""Correctness at 100x the gate scale: replay the Spark-vs-DuckDB
comparison on the sf1-SHAPED generated data (scripts/gen_scale_data.py
— 50k docs / 20k vectors / 1.5M orders / 6M lineitem; 10x the bench
sf0.1, 100x the sf0.01 gate) for every query whose tables exist there
and whose ORACLE is tractable at that size.

Included even at this size: the exact shared-shingle pair queries
(doc_jaccard_pairs, doc_containment_pairs — ~25 s DuckDB oracles).
Excluded: the LSH-COINCIDENCE oracles (minhash/simhash/incremental/
cluster families), whose DuckDB twin is the exact pair set under a
pinned corpus coincidence that deliberately does not extend to sf1
(NOTES_r5 measures LSH recall 96.7% there — the documented banding
trade, not a defect).  Since round 7 the scale generator mirrors all
ten driver tables (customer/part/supplier/nation/region/events added),
so the warehouse and events families are covered too.

Writes CORRECTNESS_SCALE_sf1_local.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from correctness_full import multiset  # noqa: E402
from customer_360_etl_pipeline_on_azure_cloud_spark.session import get_spark  # noqa: E402

QUERIES = [
    # documents / embeddings surface
    "doc_profile",
    "doc_exact_dedup",
    # exact-oracle dedup pair queries (tractable at sf1 in ~25 s each).
    # The LSH-coincidence oracles (minhash/simhash/incremental/cluster
    # families) are EXCLUDED by design: their DuckDB twin is the exact
    # pair set, and the pinned corpus coincidence deliberately does not
    # extend to sf1 (NOTES_r5 quantifies LSH recall there at 96.7%).
    "doc_jaccard_pairs",
    "doc_containment_pairs",
    "tfidf_keywords",
    "pii_redaction",
    "doc_chunking",
    # doc_packing excluded: its ORACLE is a one-row-per-step recursive
    # CTE (deliberately sequential replay) — quadratic in DuckDB at 50k
    # rows; the Spark side is linear per group and sf0.1-verified.
    "stratified_sample",
    "dataset_split",
    "doc_repetition",
    "lang_quota_sample",
    "source_mixture_plan",
    "weighted_doc_sample",
    "vocab_topk",
    "doc_rare_token_stats",
    "gopher_quality_flags",
    "bpe_merge_pairs",
    "doc_lm_perplexity",
    "collocation_pmi",
    "cdc_chunking",
    "duplicate_passages",
    "bpe_train_merges",
    "bpe_compression",
    "quality_classifier_score",
    "source_quality_report",
    "embedding_quantization",
    "embedding_norms",
    "embedding_gram",
    "ann_topk",
    # orders / lineitem surface
    "pricing_summary",
    "returnflag_pivot",
    "returnflag_rollup",
    "returnflag_cube",
    "returnflag_unpivot",
    "priority_recode",
    "priority_grouping_sets",
    "incremental_pricing",
    "orders_upsert",
    "orders_change_feed",
    "order_value_quartiles",
    "running_revenue",
    "part_pagerank",
    "basket_rules",
    "dq_expectations",
    "orders_quarantine",
    "streaming_dq_gate",
    # round-6 surface (exact oracles tractable at sf1)
    "duplicate_spans",
    "substring_dedup_apply",
    "decontamination_apply",
    "quality_classifier_train",
    "quality_classifier_trained_score",
    "semantic_dedup_distributed",
    "semantic_dedup_hierarchical",
    "histogram_rollup_quantiles",
    "ann_topk_pq",
    "ann_topk_ivfpq",
    "ann_topk_ivfpq_indexed",
    "incremental_ann_index_update",
    "ivf_cohesion_audit",
    "doc_bigram_perplexity",
    "winnowing_dedup_pairs",
    "streaming_quality_gate",
    "corpus_curation_report",
    # post-freeze round-6 additions on sf1-available tables
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
    # round-7: the scale generator now mirrors ALL ten driver tables
    # (customer/part/supplier/nation/region/events added — VERDICT r6
    # item 5), unlocking the warehouse + events families:
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
    # the reference-shaped core at 100x the gate scale
    "supplier_distinct_parts",
    "user_activeness",
    "customer_segmentation",
    "supplier_360",
    "region_rollup",
    "top_event_per_user",
    "dedup_user_event",
    "user_trend",
    "supplier_most_flag",
    "supplier_flag_mix",
    "union_halves",
    "positional_zip",
    "top_customers",
    "reference_e2e",
    "heavy_hitters_cms",
    "sketch_rollup_users",
    "point_in_time_features_daily",
]

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_dir = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(root, "testdata_scale", "sf1")
    )
    spark = get_spark(
        app_name="c360-correctness-sf1",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_conf={
            "spark.ui.enabled": "false",
            # same sizing as scripts/scale_growth.py: a single local JVM
            # standing in for a cluster at 100x the gate scale needs a
            # real heap (the 17M-edge co-purchase graph OOMs 1g).
            "spark.driver.memory": os.environ.get(
                "SPARK_GRAFT_DRIVER_MEM", "24g"
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    only = os.environ.get("SPARK_GRAFT_SCALE_ONLY")
    names = [q for q in QUERIES if not only or q in only.split(",")]
    con = duckdb.connect()
    con.execute("SET temp_directory='/tmp/duck_tmp'")
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    out: dict[str, dict] = {}
    art = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "CORRECTNESS_SCALE_sf1_local.json",
    )
    if only and os.path.exists(art):
        with open(art) as fh:
            out.update(json.load(fh))
    for name in names:
        rec: dict[str, object] = {
            "hash_match": False,
            "spark_rows": None,
            "oracle_rows": None,
            "spark_sec": None,
            "oracle_sec": None,
            "err": None,
        }
        try:
            t0 = time.perf_counter()
            sdf = queries[name](spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
            rec["spark_sec"] = round(time.perf_counter() - t0, 2)
            rec["spark_rows"] = len(s_rows)
            t0 = time.perf_counter()
            res = con.sql(oracles[name])
            d_cols = list(res.columns)
            d_rows = [tuple(r) for r in res.fetchall()]
            rec["oracle_sec"] = round(time.perf_counter() - t0, 2)
            rec["oracle_rows"] = len(d_rows)
            rec["hash_match"] = sorted(s_cols) == sorted(d_cols) and multiset(
                s_cols, s_rows
            ) == multiset(d_cols, d_rows)
        except Exception as exc:  # noqa: BLE001
            rec["err"] = f"{type(exc).__name__}: {exc}"[:250]
        out[name] = rec
        flag = "ok  " if rec["hash_match"] else "FAIL"
        print(f"{flag} {name} {rec}", file=sys.stderr)
    with open(art, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    n_ok = sum(1 for r in out.values() if r["hash_match"])
    print(json.dumps({"total": len(out), "hash_match": n_ok, "sf_dir": sf_dir}))


if __name__ == "__main__":
    main()
