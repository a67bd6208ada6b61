"""Pin the driver-contract registry invariants.

The external correctness gate checks the FIRST 50 registered queries,
so registration order is load-bearing: an innocent `CORE_QUERIES.update`
added in the wrong place silently demotes an operator family from the
strong driver-run oracle check to local-pytest-only coverage. These
tests fail loudly instead.
"""

from __future__ import annotations

from customer_360_etl_pipeline_on_azure_cloud_spark.testdata_queries import (
    CORE_QUERIES,
    DRIVER_WINDOW,
)


def test_first_fifty_registered_queries_are_the_driver_window():
    assert list(CORE_QUERIES)[:50] == DRIVER_WINDOW


def _banked_green() -> set[str]:
    """Query names with a GREEN driver-gate row in any prior round's
    committed CORRECTNESS_r*.json artifact."""
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    banked: set[str] = set()
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        with open(path) as fh:
            for name, row in json.load(fh).items():
                if row.get("hash_match") and row.get("err") is None:
                    banked.add(name)
    return banked


def test_driver_window_covers_every_operator_family():
    """Every operator family must carry DRIVER-GRADE evidence: a
    representative either inside the current 50-query window or with a
    banked green row in a committed CORRECTNESS_r*.json.

    r10 rotation policy (VERDICT r9 item 1): the window chases the
    never-driver-gated queries until the backlog empties, so families
    whose members are all banked green (reference core, as-of trio,
    sketches, CDC, layout, forecasting, exactly-once sink) legitimately
    rotate OUT of the window — their evidence is the banked rows plus
    full oracle coverage in correctness_full / tests/test_oracle_parity.
    This test fails if a family ever has NEITHER a window slot NOR a
    banked green row."""
    covered = set(DRIVER_WINDOW) | _banked_green()
    families = {
        "dedup": {"doc_exact_dedup", "minhash_near_dup", "simhash_near_dup",
                  "doc_jaccard_pairs", "embedding_near_dup", "dedup_clusters",
                  "dedup_clusters_twophase", "doc_near_dup_core",
                  "dedup_best_survivors"},
        "dedup_incremental": {"incremental_corpus_dedup",
                              "incremental_corpus_dedup_indexed",
                              "incremental_index_update",
                              "streaming_index_dedup"},
        "semantic_dedup": {"semantic_dedup", "semantic_dedup_distributed",
                           "semantic_dedup_hierarchical"},
        "ann": {"ann_topk", "ann_topk_lsh", "ann_topk_ivf", "ann_topk_pq",
                "ann_topk_ivfpq"},
        "ann_index_lifecycle": {"ann_topk_ivf_indexed",
                                "ann_topk_ivfpq_indexed",
                                "incremental_ann_index_update",
                                "streaming_ann_probe"},
        "text_curation": {"tfidf_keywords", "pii_redaction", "doc_chunking",
                          "contamination_check", "bm25_search", "doc_profile",
                          "gopher_quality_flags", "corpus_curation_report"},
        "training_prep": {"token_budget_fill", "dataset_split",
                          "cluster_aware_split", "split_leakage_audit",
                          "curriculum_interleave", "training_shard_manifest"},
        "sketch": {"heavy_hitters_cms", "sketch_rollup_users",
                   "kmv_audience_overlap"},
        "cdc": {"scd2_user_state", "orders_upsert", "scd2_snapshot",
                "orders_change_feed"},
        "event_time": {"asof_last_purchase", "event_gaps",
                       "sessionized_events", "event_time_buckets",
                       "point_in_time_features"},
        "streaming": {"streaming_event_counts", "streaming_sessions",
                      "streaming_attribution", "streaming_dedup"},
        "multimodal": {"media_decode_features", "media_phash_near_dup",
                       "media_blob_dedup"},
        "reference_core": {"pricing_summary", "supplier_360",
                           "customer360_merged", "reference_e2e"},
        "asof_trio": {"asof_next_purchase", "asof_nearest_purchase"},
        "graph": {"part_pagerank_weighted", "part_bfs_hops",
                  "part_triangles", "part_communities"},
        "graph_index_lifecycle": {"part_graph_route_indexed"},
        "layout": {"hilbert_layout", "zorder_layout"},
        "forecast": {"revenue_holt_forecast", "streaming_holt_by_type"},
        "exactly_once_sink": {"streaming_exactly_once_jdbc"},
        "ohlc": {"event_ohlc_bars", "streaming_ohlc_bars"},
    }
    missing = {
        fam: sorted(members - covered)
        for fam, members in families.items()
        if not members & covered
    }
    assert not missing, (
        f"families with neither a window slot nor a banked green driver "
        f"row: {missing}"
    )


def test_every_query_is_benchmarked():
    import bench

    registered = set(CORE_QUERIES)
    benched = set(bench.BENCH_QUERIES)
    assert benched <= registered, sorted(benched - registered)
    assert registered <= benched, (
        f"queries registered but never benchmarked: {sorted(registered - benched)}"
    )


def test_registry_entries_are_well_formed():
    for name, (fn, sql) in CORE_QUERIES.items():
        assert callable(fn), name
        assert sql is None or (isinstance(sql, str) and sql.strip()), name
