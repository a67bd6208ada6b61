"""Streaming histogram-sketch rollup
(analytics_queries.py streaming_sketch_rollup)."""

from __future__ import annotations

from conftest import SF_SMALL

from customer_360_etl_pipeline_on_azure_cloud_spark.analytics_queries import (
    q_streaming_sketch_rollup,
)


def test_reads_sink_across_micro_batches_and_merges_partials(spark):
    out = q_streaming_sketch_rollup(spark, SF_SMALL)
    rows = out.collect()
    files = out.inputFiles()
    # plan scans the per-batch sink (no driver-side accumulation)
    assert files and all("batch_id=" in f for f in files)
    bids = {f.split("batch_id=")[1].split("/")[0] for f in files}
    assert len(bids) >= 2, "expected >= 2 micro-batches"
    # the split by orderkey parity makes days straddle batches, so the
    # sink must hold PARTIAL rows for the same (day, bin) in different
    # batches — the merge absorbing them is the mergeability property
    sink_root = files[0].split("/batch_id=")[0]
    raw = spark.read.parquet(sink_root.replace("file:", ""))
    dup = (
        raw.groupBy("day", "bin").count().filter("count >= 2").count()
    )
    assert dup > 0, "expected same-(day,bin) partial sketch rows"
    # quantile output sanity: every scope has exactly p50/p90/p99
    scopes = {}
    for r in rows:
        scopes.setdefault(r["scope"], set()).add(r["q_pct"])
    assert all(v == {50, 90, 99} for v in scopes.values())
