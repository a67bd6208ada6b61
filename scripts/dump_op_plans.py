#!/usr/bin/env python3
"""Supplementary OPERATOR-level plan evidence for plans/r10/.

The round-10 contract queries checkpoint their heavy upstream work
(oracle-parity echo pattern), so their FINAL plans hide two of the
round's changes.  This script dumps the operator-level plans those
changes are visible in:

* ``op_minhash_signature_<suffix>.txt`` — the signature projection over
  the documents table.  Before (r9, nested transform/array_min) the
  Project contains nested ``transform(...array_min(transform(...``
  higher-order calls, which evaluate interpreted; after (r10 fold) it
  is one ``aggregate(transform(..), .., zip_with(.., least))`` fold.
  6.7x CPU difference measured at sf1 (NOTES_r10 item 18).

* ``op_graph_fallback_round_<suffix>.txt`` — the past-broadcast-limit
  per-round join of the iterative graph ops, replicated verbatim from
  the tree's graph.py (r9 = dd68724 ``sym.hint("shuffle_hash")`` edge-
  side build, graph.py:711; r10 = HEAD ``frontier.hint(..).join(
  sym_shj)`` vertex-side build over once-repartitioned persisted edges,
  graph.py:729-740).  The r9 shape OOMed at sf10 (edge-sized build per
  task); the r10 shape builds frontier-sized and is pinned by
  tests/test_graph_fallback_join.py.

Usage:
    python scripts/dump_op_plans.py REPO_ROOT SF_DIR OUT_DIR SUFFIX {r9|r10}
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    repo_root, sf_dir, out_dir, suffix, shape = sys.argv[1:6]
    sys.path.insert(0, repo_root)

    from pyspark import StorageLevel  # noqa: E402
    from pyspark.sql import functions as F  # noqa: E402

    from customer_360_etl_pipeline_on_azure_cloud_spark.operators.dedup import (  # noqa: E402
        minhash_signature,
    )
    from customer_360_etl_pipeline_on_azure_cloud_spark.session import (  # noqa: E402
        get_spark,
    )

    spark = get_spark(
        app_name="c360-op-plan-dump",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out_dir, exist_ok=True)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )

    def dump(name: str, df, header: str) -> None:
        text = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(header + "\n\n" + text)
        print(f"wrote {path}", file=sys.stderr)

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    dump(
        "op_minhash_signature",
        docs.select("doc_id", minhash_signature("text").alias("sig")),
        f"-- minhash_signature('text') over {sf_dir}/documents "
        f"({shape} tree)",
    )

    # The per-round fallback join, replicated verbatim from the tree's
    # bfs_hops source (the loop round itself is not a returned frame).
    sym = (
        spark.range(0, 200_000)
        .selectExpr("id as u", "(id + 1) % 200000 as v")
        .localCheckpoint(eager=True)
    )
    frontier = spark.range(0, 50).select(F.col("id")).localCheckpoint(
        eager=True
    )
    if shape == "r9":
        j = frontier.join(sym.hint("shuffle_hash"), frontier["id"] == sym["u"])
        hdr = (
            "-- past-broadcast-limit BFS round join, r9 form "
            "(graph.py:711@dd68724): hint on the EDGE side -> SHJ "
            "BuildRight, per-task build is |E|/partitions rows (the "
            "sf10 OOM)"
        )
    else:
        sym_shj = sym.repartition(F.col("u")).persist(StorageLevel.DISK_ONLY)
        j = frontier.hint("shuffle_hash").join(
            sym_shj, frontier["id"] == sym_shj["u"]
        )
        hdr = (
            "-- past-broadcast-limit BFS round join, r10 form "
            "(graph.py:729-740@HEAD): hint on the VERTEX side over "
            "once-repartitioned persisted edges -> SHJ BuildLeft, "
            "per-task build is frontier-sized; the persisted edge copy "
            "adds no per-round Exchange (InMemoryRelation preserves "
            "outputPartitioning)"
        )
    dump("op_graph_fallback_round", j, hdr)

    # IVFPQ encode input: corpus re-scan (r9) vs the shared persisted
    # (id, cell, resid) assignment pass (r10) — the fourth-session
    # change; codes bit-identical (tests/test_ivfpq_shared_assign.py)
    from customer_360_etl_pipeline_on_azure_cloud_spark.operators import (
        similarity as sim,
    )

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    if shape == "r9":
        cents, books = sim._ivfpq_fit(
            emb, 16, 16, 64, 2000, "vec_id", "embedding",
            codebook_fit="distributed",
        )
        coded = sim._ivfpq_encode(emb, cents, books, "vec_id", "embedding")
        hdr2 = (
            "-- IVFPQ encode, r9 form: re-scans the raw corpus and "
            "recomputes the normalize+assign+residual pass the "
            "distributed codebook fit already ran (plan roots at the "
            "embeddings parquet scan)"
        )
        dump("op_ivfpq_encode", coded, hdr2)
    else:
        cents, books, assigned = sim._ivfpq_fit(
            emb, 16, 16, 64, 2000, "vec_id", "embedding",
            codebook_fit="distributed", return_assigned=True,
        )
        coded = sim._ivfpq_encode(
            emb, cents, books, "vec_id", "embedding", assigned=assigned
        )
        hdr2 = (
            "-- IVFPQ encode, r10 form: codes the persisted (id, cell, "
            "resid) frame the codebook fit shared (plan roots at "
            "InMemoryTableScan of the assignment pass — the raw-corpus "
            "scan and the n_centroids-dim assign matmul are gone; "
            "codes bit-identical, tests/test_ivfpq_shared_assign.py)"
        )
        dump("op_ivfpq_encode", coded, hdr2)
        assigned.unpersist()


if __name__ == "__main__":
    main()
