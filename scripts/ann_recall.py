#!/usr/bin/env python3
"""Measured ANN recall evidence across scales (r7: gates the
corpus-size-independent `shortlist="auto"` bound of VERDICT r6 item 4
with numbers, not just the pass/fail pins).

For each ANN variant (SRP-LSH, IVF, PQ, IVFPQ) at sf0.1-shaped and
sf1-shaped corpora: recall@5 against the exact brute-force top-5, and
the worst exact rank of any returned neighbor.  Note the summary
oracles' inside-the-exact-top-20 assertions are pinned on the DRIVER
testdata corpora (where they hold at every SF, 194/194); the
scale-generated corpora here use a different seed, and uniform noise
is the worst case for ANN — ranks/recall below are the honest
no-neighbor-structure floor (e.g. ivf@sf0.1-shape returns one
rank-23 item on THIS corpus), not a violation of those oracles.
Writes ANN_RECALL_r7.json.
"""

from __future__ import annotations

import json
import os
import sys

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

VARIANTS = {
    "lsh": lambda emb, q: cosine_topk_lsh(emb, q, dim=64, k=5, nbits=4, tables=8),
    "ivf": lambda emb, q: cosine_topk_ivf(emb, q, k=5, n_centroids=16, nprobe=4),
    "pq": lambda emb, q: pq_topk(emb, q, k=5),
    "ivfpq": lambda emb, q: cosine_topk_ivfpq(emb, q, k=5, n_centroids=16, nprobe=6),
}


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spark = get_spark(
        app_name="c360-ann-recall",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict] = {}
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
        # exact rank of EVERY corpus vector per query (rank map for the
        # worst-returned-rank metric; 100-deep covers any in-top-20 claim)
        rank = {
            (r.query_id, r.neighbor_id): r.rk
            for r in cosine_topk_bruteforce(emb, queries, k=100).collect()
        }
        n = emb.count()
        for vname, fn in VARIANTS.items():
            got = [
                (r.query_id, r.neighbor_id) for r in fn(emb, queries).collect()
            ]
            pairs = set(got)
            recall = len(pairs & exact5) / len(exact5)
            worst = max(rank.get(p, 999) for p in pairs)
            out[f"{vname}@{sfname}"] = {
                "corpus_rows": int(n),
                "returned": len(got),
                "recall_at_5": round(recall, 3),
                "worst_exact_rank_returned": int(worst),
            }
            print(f"{vname}@{sfname}", out[f"{vname}@{sfname}"], file=sys.stderr)
    with open(os.path.join(root, "ANN_RECALL_r7.json"), "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
