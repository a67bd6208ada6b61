#!/usr/bin/env python3
"""ANN recall-vs-latency curves (r7 verdict item 4): sweep the recall
knobs — multi-probe count for SRP-LSH, nprobe for IVF/IVFPQ — on the
structure-free noise corpora (the ANN worst case; scale-generated, a
DIFFERENT seed than the driver testdata) at sf0.1 and sf1 shapes, and
record recall@5, the worst exact rank returned, and wall-clock per
configuration so the shipped defaults are a measured point on a curve
rather than an assertion.

r7 baseline (ANN_RECALL_r7.json, single-probe / registered knobs):
lsh 0.64/0.78, ivf(nprobe=4) 0.64/0.70 at sf0.1/sf1.  The r8 target:
recall@5 >= 0.85 for LSH and IVF at <= 1.5x the prior latency.

Latency method: per configuration, min of ``PASSES`` full
plan-build+collect runs in one warm session (same methodology as
bench.py; this host has heavy steal noise, so compare MINs).

Writes ANN_RECALL_r8.json: {"curve": [...], "defaults": {...}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from customer_360_etl_pipeline_on_azure_cloud_spark.session import get_spark  # noqa: E402
from customer_360_etl_pipeline_on_azure_cloud_spark.operators.similarity import (  # noqa: E402
    cosine_topk_bruteforce,
    cosine_topk_ivf,
    cosine_topk_ivfpq,
    cosine_topk_lsh,
    pq_topk,
)

PASSES = int(os.environ.get("SPARK_GRAFT_RECALL_PASSES", "3"))

# (variant, knob-name, knob-value, callable)
GRID = [
    *[
        (
            "lsh", "probes", p,
            lambda emb, q, p=p: cosine_topk_lsh(
                emb, q, dim=64, k=5, nbits=4, tables=8, probes=p
            ),
        )
        for p in (0, 1, 2, 3)
    ],
    *[
        (
            "ivf", "nprobe", n,
            lambda emb, q, n=n: cosine_topk_ivf(
                emb, q, k=5, n_centroids=16, nprobe=n
            ),
        )
        for n in (4, 6, 8, 10)
    ],
    # PQ: subspace count m is the ADC resolution knob (r8) — m=16 is
    # the registered-query configuration; m=8 rows show the old floor
    ("pq", "m8_ksub16", 0, lambda emb, q: pq_topk(emb, q, k=5)),
    ("pq", "m8_ksub64", 0, lambda emb, q: pq_topk(emb, q, k=5, ksub=64)),
    ("pq", "m16_ksub16", 0, lambda emb, q: pq_topk(emb, q, k=5, m=16)),
    *[
        (
            "ivfpq", "nprobe_m8k16", n,
            lambda emb, q, n=n: cosine_topk_ivfpq(
                emb, q, k=5, n_centroids=16, nprobe=n
            ),
        )
        for n in (6, 10)
    ],
    (
        "ivfpq", "nprobe10_m16k64", 10,
        lambda emb, q: cosine_topk_ivfpq(
            emb, q, k=5, n_centroids=16, nprobe=10, m=16, ksub=64
        ),
    ),
]


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spark = get_spark(
        app_name="c360-ann-recall-sweep",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    curve: list[dict] = []
    for sfname in ("sf0.1", "sf1"):
        data = os.path.join(root, "testdata_scale", sfname, "embeddings.parquet")
        raw = spark.read.parquet(data)
        emb = raw.select(
            "vec_id", raw["embedding"].cast("array<double>").alias("embedding")
        )
        queries = emb.filter(F.col("vec_id") < 10)
        exact5 = {
            (r.query_id, r.neighbor_id)
            for r in cosine_topk_bruteforce(emb, queries, k=5).collect()
        }
        rank = {
            (r.query_id, r.neighbor_id): r.rk
            for r in cosine_topk_bruteforce(emb, queries, k=100).collect()
        }
        n = emb.count()
        for vname, knob, kval, fn in GRID:
            secs, got = [], None
            for _ in range(PASSES):
                t0 = time.perf_counter()
                rows = fn(emb, queries).collect()
                secs.append(time.perf_counter() - t0)
                pairs_now = [(r.query_id, r.neighbor_id) for r in rows]
                assert got is None or got == pairs_now  # determinism
                got = pairs_now
            pairs = set(got)
            rec = {
                "variant": vname,
                "knob": knob,
                "value": kval,
                "sf": sfname,
                "corpus_rows": int(n),
                "returned": len(got),
                "recall_at_5": round(len(pairs & exact5) / len(exact5), 3),
                "worst_exact_rank_returned": int(
                    max(rank.get(p, 999) for p in pairs)
                ),
                "sec_min": round(min(secs), 3),
            }
            curve.append(rec)
            print(json.dumps(rec), file=sys.stderr)
    out = {
        "passes": PASSES,
        "curve": curve,
        "defaults": {
            "lsh": {"nbits": 4, "tables": 8, "probes": 2},
            "ivf": {"n_centroids": 16, "nprobe": 10},
            # registered-query configurations (library fn defaults keep
            # m=8 because m must divide the corpus dim)
            "pq": {"m": 16, "ksub": 16, "shortlist": "auto", "fit": "sample"},
            "ivfpq": {"n_centroids": 16, "nprobe": 10, "m": 16, "ksub": 64,
                      "fit": "sample"},
        },
    }
    with open(os.path.join(root, "ANN_RECALL_r8.json"), "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(json.dumps({"rows": len(curve)}))


if __name__ == "__main__":
    main()
