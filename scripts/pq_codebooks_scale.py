#!/usr/bin/env python3
"""Whole-corpus PQ codebook trainer evidence (VERDICT r6 item 3).

The sample-based ``pq_codebooks`` fit sees only ``limit(sample_size)``
rows (2000 default) — standard FAISS practice, but the last trainer in
the repo that depended on a driver-side sample cap.  This script fits
FAISS-standard 8-bit codebooks (m=8 subspaces x ksub=256 centroids) on
the FULL sf1-shape embeddings corpus (20k vectors — 10x the sample the
old path trained on) with ``pq_codebooks_distributed`` (fused rounds:
one Arrow pass per Lloyd iteration regardless of m, integer-exact
reductions), and records wall time, bit-exact determinism under a
different partitioning, per-subspace distinct-centroid counts, and the
ADC quantization error vs the 2000-row sample fit (the whole-corpus
fit should match or beat it).  Writes PQ_CODEBOOKS_r7.json.
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
    pq_codebooks,
    pq_codebooks_distributed,
)


def _mse(U: np.ndarray, books: np.ndarray) -> float:
    """Mean squared PQ reconstruction error of unit vectors U under
    per-subspace codebooks (the ADC error driver)."""
    m, _, dsub = books.shape
    err = 0.0
    for j in range(m):
        sub = U[:, j * dsub : (j + 1) * dsub]
        d2 = (
            (sub**2).sum(axis=1)[:, None]
            - 2.0 * (sub @ books[j].T)
            + (books[j] ** 2).sum(axis=1)[None, :]
        )
        err += np.maximum(d2.min(axis=1), 0.0).sum()
    return float(err / len(U))


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    data = os.path.join(root, "testdata_scale", "sf1", "embeddings.parquet")
    spark = get_spark(
        app_name="c360-pq-codebooks-scale",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    raw = spark.read.parquet(data)
    emb = raw.select(
        "vec_id", raw["embedding"].cast("array<double>").alias("embedding")
    )
    n = emb.count()
    m, ksub = 8, int(os.environ.get("SPARK_GRAFT_PQ_KSUB", "256"))

    t0 = time.perf_counter()
    b1 = pq_codebooks_distributed(emb, m=m, ksub=ksub, iters=4)
    fit_sec = time.perf_counter() - t0

    t0 = time.perf_counter()
    b2 = pq_codebooks_distributed(emb.repartition(17), m=m, ksub=ksub, iters=4)
    refit_sec = time.perf_counter() - t0
    deterministic = bool(np.array_equal(b1, b2))

    # sample-fit baseline (the old path) + whole-corpus MSE comparison
    rows = emb.orderBy("vec_id").limit(2000).collect()
    S = np.array([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    S = S / np.where(np.linalg.norm(S, axis=1) == 0, 1.0, np.linalg.norm(S, axis=1))[:, None]
    t0 = time.perf_counter()
    bs = pq_codebooks(S, m=m, ksub=ksub)
    sample_fit_sec = time.perf_counter() - t0

    allrows = emb.collect()
    U = np.array([np.asarray(r["embedding"], dtype=np.float64) for r in allrows])
    U = U / np.where(np.linalg.norm(U, axis=1) == 0, 1.0, np.linalg.norm(U, axis=1))[:, None]

    out = {
        "corpus_rows": int(n),
        "m": m,
        "ksub": ksub,
        "old_sample_rows": 2000,
        "fit_sec": round(fit_sec, 2),
        "refit_other_partitioning_sec": round(refit_sec, 2),
        "bit_exact_deterministic": deterministic,
        "distinct_centroids_per_subspace": [
            int(len(np.unique(np.round(b1[j], 9), axis=0))) for j in range(m)
        ],
        "mse_distributed_whole_corpus": round(_mse(U, b1), 6),
        "mse_sample_fit": round(_mse(U, bs), 6),
        "sample_fit_sec": round(sample_fit_sec, 2),
    }
    with open(os.path.join(root, "PQ_CODEBOOKS_r7.json"), "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
