#!/usr/bin/env python3
"""Above-the-old-cap distributed k-means evidence (VERDICT r5 item 2).

The sample-based centroid fit caps k at sample_size // 2 (= 1000 at the
2000-row default).  This script fits k = 2500 centroids on the sf1-shape
embeddings corpus (20k vectors — cell size ~8) with
``kmeans_distributed`` — 2.5x past the old cap — and records wall
time, distinct-centroid count, cell-population stats, and bit-exact
determinism under a different partitioning.  Writes KMEANS_BIGK_r6.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from customer_360_etl_pipeline_on_azure_cloud_spark.session import get_spark  # noqa: E402
from customer_360_etl_pipeline_on_azure_cloud_spark.operators.similarity import (  # noqa: E402
    _assign_centroids,
    kmeans_distributed,
    kmeans_hierarchical,
)


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    data = os.path.join(root, "testdata_scale", "sf1", "embeddings.parquet")
    spark = get_spark(
        app_name="c360-kmeans-bigk",
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
    emb = spark.read.parquet(data)
    n = emb.count()
    k = int(os.environ.get("SPARK_GRAFT_BIGK", "2500"))

    t0 = time.perf_counter()
    c1 = kmeans_distributed(emb, k=k, iters=3)
    fit_sec = time.perf_counter() - t0

    t0 = time.perf_counter()
    c2 = kmeans_distributed(emb.repartition(17), k=k, iters=3)
    refit_sec = time.perf_counter() - t0
    deterministic = bool(np.array_equal(c1, c2))

    e = emb.select("vec_id", emb["embedding"].cast("array<double>").alias("v"))
    import pyspark.sql.functions as F

    def cell_stats(cents):
        assigned = _assign_centroids(e, cents, "v", nprobe=1)
        return (
            assigned.select(F.element_at("__cells", 1).alias("cell"))
            .groupBy("cell")
            .count()
            .agg(
                F.count(F.lit(1)).alias("non_empty_cells"),
                F.max("count").alias("max_cell"),
                F.expr("percentile_approx(count, 0.5)").alias("p50_cell"),
            )
            .collect()[0]
        )

    def quant_err(cents):
        """Mean squared distance to the nearest centroid — the quantizer
        quality both fits compete on."""
        rows = emb.select(emb["embedding"].cast("array<double>")).collect()
        V = np.array([np.asarray(r[0]) for r in rows])
        tot, bs = 0.0, 4096
        for i in range(0, len(V), bs):
            b = V[i : i + bs]
            d = (
                (b**2).sum(1)[:, None]
                - 2.0 * (b @ cents.T)
                + (cents**2).sum(1)[None, :]
            )
            tot += d.min(axis=1).sum()
        return tot / len(V)

    pops = cell_stats(c1)

    # hierarchical fit at the SAME k: the large-k path with NO
    # driver-side seeding reduction (coarse sqrt(k) cells distributed,
    # per-cell refits executor-side in applyInPandas)
    t0 = time.perf_counter()
    h1 = kmeans_hierarchical(emb, k=k)
    hier_fit_sec = time.perf_counter() - t0
    h2 = kmeans_hierarchical(emb.repartition(17), k=k)
    hier_det = bool(np.array_equal(h1, h2))
    hpops = cell_stats(h1)

    payload = {
        "corpus_rows": n,
        "k": k,
        "old_sample_cap": 1000,
        "fit_sec": round(fit_sec, 2),
        "refit_other_partitioning_sec": round(refit_sec, 2),
        "bit_exact_deterministic": deterministic,
        "distinct_centroids": int(
            len(np.unique(np.round(c1, 9), axis=0))
        ),
        "non_empty_cells": int(pops["non_empty_cells"]),
        "max_cell_population": int(pops["max_cell"]),
        "median_cell_population": int(pops["p50_cell"]),
        "mean_sq_quant_err": round(float(quant_err(c1)), 6),
        "hierarchical": {
            "k": k,
            "fit_sec": round(hier_fit_sec, 2),
            "bit_exact_deterministic": hier_det,
            "centroids": int(h1.shape[0]),
            "non_empty_cells": int(hpops["non_empty_cells"]),
            "max_cell_population": int(hpops["max_cell"]),
            "median_cell_population": int(hpops["p50_cell"]),
            "mean_sq_quant_err": round(float(quant_err(h1)), 6),
            "driver_seeding_reduction": "none (per-cell executor refits)",
        },
    }
    with open(os.path.join(root, "KMEANS_BIGK_r6.json"), "w") as fh:
        json.dump(payload, fh, indent=1)
        fh.write("\n")
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
