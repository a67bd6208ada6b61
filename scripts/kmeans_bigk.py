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
    assigned = _assign_centroids(e, c1, "v", nprobe=1)
    import pyspark.sql.functions as F

    pops = (
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
    }
    with open(os.path.join(root, "KMEANS_BIGK_r6.json"), "w") as fh:
        json.dump(payload, fh, indent=1)
        fh.write("\n")
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
