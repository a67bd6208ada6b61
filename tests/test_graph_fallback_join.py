"""Past-broadcast-limit join strategy in the iterative graph ops.

bfs_hops / min_cost_bounded switch from broadcasting the vertex-sized
frame to a shuffled hash join once the frontier/dist count passes
``broadcast_limit``.  The r10 sf10 run caught the original fallback
building the hash relation from the EDGE side (the hint was attached to
``sym``/``e``): per task that build is |E|/partitions rows, and AQE's
partition coalescing concentrated it into 8 partitions x ~10M edges ->
"Can't acquire 1073741824 bytes memory to build hash relation".  The
fix hints the VERTEX side (graph.py bfs_hops/min_cost_bounded), so the
per-task build is frontier-sized at any edge scale.

Pins: (1) both paths produce identical results, (2) the operator's
fallback join shape resolves to ShuffledHashJoin with the vertex side
as build.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from customer_360_etl_pipeline_on_azure_cloud_spark.operators.graph import (
    bfs_hops,
    min_cost_bounded,
)


def _ring(spark, n=400):
    return spark.range(0, n).selectExpr(
        "id as id_a", f"(id + 1) % {n} as id_b"
    )


def test_bfs_fallback_path_matches_broadcast_path(spark):
    edges = _ring(spark)
    seeds = spark.range(0, 3).select(F.col("id"))
    via_bcast = sorted(
        map(tuple, bfs_hops(edges, seeds, max_hops=3).collect())
    )
    via_shj = sorted(
        map(
            tuple,
            bfs_hops(edges, seeds, max_hops=3, broadcast_limit=0).collect(),
        )
    )
    assert via_bcast == via_shj
    assert len(via_bcast) > 3  # expanded beyond the seeds


def test_mincost_fallback_path_matches_broadcast_path(spark):
    w = _ring(spark).selectExpr("id_a as u", "id_b as v", "7 as w")
    seeds = spark.range(0, 2).select(F.col("id"))
    a = sorted(map(tuple, min_cost_bounded(w, seeds, rounds=3).collect()))
    b = sorted(
        map(
            tuple,
            min_cost_bounded(w, seeds, rounds=3, broadcast_limit=0).collect(),
        )
    )
    assert a == b


def test_fallback_join_builds_vertex_side(spark):
    # the exact join shape graph.py uses past the limit: hint on the
    # vertex-sized left input must resolve to SHJ BuildLeft (an
    # edge-side build is the sf10 OOM — see module docstring)
    sym = (
        spark.range(0, 2000)
        .selectExpr("id as u", "(id + 1) % 2000 as v")
        .localCheckpoint(eager=True)
    )
    frontier = spark.range(0, 50).select(F.col("id")).localCheckpoint(eager=True)
    j = frontier.hint("shuffle_hash").join(sym, frontier["id"] == sym["u"])
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan
    assert "BuildLeft" in plan
