"""Incremental connected-components maintenance: the label-edges
theorem (analytics_queries.py incremental_components_update)."""

from __future__ import annotations

import random

from customer_360_etl_pipeline_on_azure_cloud_spark.operators.graph import (
    connected_components,
)
from pyspark.sql import functions as F


def _cc_ref(edges, vertices):
    parent = {v: v for v in vertices}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-id canonical labels
    return {v: min(u for u in vertices if find(u) == find(v)) for v in vertices}


def test_label_edges_preserve_connectivity(spark):
    """CC(label-edges(CC(old)) UNION new) == CC(old UNION new) —
    the theorem the incremental update rests on, on random graphs."""
    rng = random.Random(5)
    n = 40
    vertices = list(range(n))
    vdf = spark.createDataFrame([(v,) for v in vertices], "doc_id long")
    for trial in range(3):
        old = sorted({
            tuple(sorted(rng.sample(vertices, 2))) for _ in range(25)
        })
        new = sorted({
            tuple(sorted(rng.sample(vertices, 2))) for _ in range(10)
        })
        old_df = spark.createDataFrame(old, "id_a long, id_b long")
        new_df = spark.createDataFrame(new, "id_a long, id_b long")
        labels_old = connected_components(old_df, vertices=vdf)
        label_edges = labels_old.select(
            F.col("id").alias("id_a"), F.col("component").alias("id_b")
        )
        incremental = {
            r["id"]: r["component"]
            for r in connected_components(
                label_edges.unionByName(new_df), vertices=vdf
            ).collect()
        }
        scratch = {
            r["id"]: r["component"]
            for r in connected_components(
                old_df.unionByName(new_df), vertices=vdf
            ).collect()
        }
        ref = _cc_ref(old + new, vertices)
        assert incremental == scratch == ref, f"trial {trial}"
