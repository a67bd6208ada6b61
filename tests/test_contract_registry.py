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


def test_driver_window_covers_every_operator_family():
    """One representative per family must sit inside the checked window."""
    window = set(DRIVER_WINDOW)
    families = {
        "dedup": {"doc_exact_dedup", "minhash_near_dup", "simhash_near_dup",
                  "doc_jaccard_pairs", "embedding_near_dup", "dedup_clusters"},
        "ann": {"ann_topk", "ann_topk_lsh", "ann_topk_ivf"},
        "text_curation": {"tfidf_keywords", "pii_redaction", "doc_chunking",
                          "contamination_check", "bm25_search", "doc_profile"},
        "sketch": {"heavy_hitters_cms"},
        "cdc": {"scd2_user_state", "orders_upsert"},
        "event_time": {"asof_last_purchase", "event_gaps",
                       "sessionized_events", "event_time_buckets"},
        "streaming": {"streaming_event_counts", "streaming_sessions"},
        "multimodal": {"media_decode_features", "media_phash_near_dup"},
        "reference_core": {"pricing_summary", "supplier_360",
                           "customer360_merged", "reference_e2e"},
        # r9 window additions (VERDICT r8 item 1): the r8-new operator
        # families get hard driver-verified rows. Families rotated out
        # (semantic dedup, KMV, quantile sketch, point-in-time features)
        # banked their driver rows in CORRECTNESS_r08.json and keep full
        # oracle coverage in correctness_full / tests/test_oracle_parity.
        "asof_trio": {"asof_next_purchase", "asof_nearest_purchase"},
        "graph": {"part_pagerank_weighted", "part_bfs_hops"},
        "graph_index_lifecycle": {"part_graph_route_indexed"},
        "layout": {"hilbert_layout", "zorder_layout"},
        "forecast": {"revenue_holt_forecast", "streaming_holt_by_type"},
        "exactly_once_sink": {"streaming_exactly_once_jdbc"},
        "ohlc": {"event_ohlc_bars", "streaming_ohlc_bars"},
    }
    missing = {
        fam: sorted(members - window)
        for fam, members in families.items()
        if not members & window
    }
    assert not missing, f"families with no in-window representative: {missing}"


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
