#!/usr/bin/env python3
"""Supplementary OPERATOR-level plan evidence for plans/r11/.

The round-11 contract queries checkpoint or table-write their heavy
upstream work, so their FINAL plans hide three of the round's changes.
This script dumps the operator-level plans those changes are visible
in (run once against a worktree of the pre-r11 commit with suffix
``before`` / shape ``r10``, once against HEAD with ``after`` / ``r11``):

* ``op_kmeans_lloyd_input_<suffix>.txt`` — the frame the distributed
  Lloyd round's Arrow pass consumes.  Before, ``_lloyd_stats`` mapped
  over the full persisted ``(id, vec, qvec)`` frame (mapInPandas is
  opaque, so all three columns crossed the Python boundary every
  round); after, the caller projects ``qvec`` first, so the
  InMemoryTableScan reads one column (guide §4.1).

* ``op_pq_fit_round_input_<suffix>.txt`` — the frame the PQ codebook
  fit's per-round stats pass consumes when fed by the shared
  ``_ivfpq_assign_resid`` pass.  Before, the fit materialized a SECOND
  corpus-sized DISK_ONLY frame (fixed-point ``qvec``) from the
  persisted residual pass and each round scanned that (two chained
  InMemoryRelations in the plan, 2x scratch disk); after, the rounds
  read the residuals directly (ONE InMemoryRelation) and quantize
  in-batch with the same np.rint — bit-identical codebooks
  (tests/test_ivfpq_shared_assign.py).

* ``op_exact_cross_pairs_<suffix>.txt`` — the cross-membership exact
  echo behind the incremental/streaming dedup contracts, pre-finalize
  (finalize()'s localCheckpoint hides the shape in the query plans).
  Before, the full jaccard_pairs self-join enumerated and aggregated
  ALL same-shingle pairs (same-rank included) and rank joins dropped
  them afterwards; after, the rank rides the shingle rows and the join
  condition is ``a.rk > b.rk`` — only cross pairs are enumerated
  (measured 1,265,779 -> 407,185 aggregated pair rows at sf0.1,
  identical output).

* ``op_bfs_visited_<suffix>.txt`` — the BFS visited set after two
  expansion rounds.  Before, visited was eagerly re-checkpointed every
  round (plan = one block scan, but a full O(visited) copy job per
  round); after, it is a lazy union of the per-round checkpointed
  frontiers (plan = Union of block scans, no per-round copy job).

Usage:
    python scripts/dump_op_plans_r11.py REPO_ROOT SF_DIR OUT_DIR SUFFIX {r10|r11}
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    repo_root, sf_dir, out_dir, suffix, shape = sys.argv[1:6]
    sys.path.insert(0, repo_root)

    import numpy as np  # noqa: E402
    from pyspark import StorageLevel  # noqa: E402
    from pyspark.sql import functions as F  # noqa: E402

    from customer_360_etl_pipeline_on_azure_cloud_spark.operators import (  # noqa: E402
        similarity as sim,
    )
    from customer_360_etl_pipeline_on_azure_cloud_spark.operators.dedup import (  # noqa: E402
        word_shingles,
    )
    from customer_360_etl_pipeline_on_azure_cloud_spark.operators.util import (  # noqa: E402
        spread,
    )
    from customer_360_etl_pipeline_on_azure_cloud_spark.session import (  # noqa: E402
        get_spark,
    )

    spark = get_spark(
        app_name="c360-op-plan-dump-r11",
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

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    # --- 1. kmeans Lloyd-round Arrow input ------------------------------
    unit = sim.with_norm(emb, "embedding").select(
        F.col("vec_id").alias("vec_id"),
        F.transform(
            F.col("__vec"),
            lambda x: x
            / F.when(F.col("__norm") == 0, F.lit(1.0)).otherwise(
                F.col("__norm")
            ),
        ).alias("embedding"),
    )
    e = unit.select(
        F.col("vec_id").alias("id"),
        sim._as_double(F.col("embedding")).alias("vec"),
        sim._quantized("embedding", 1 << 20).alias("qvec"),
    ).persist()
    if shape == "r10":
        lloyd_in = e
        hdr = (
            "-- distributed-kmeans Lloyd round Arrow input, r10 form: "
            "_lloyd_stats mapped over the FULL persisted (id, vec, qvec) "
            "frame — mapInPandas is opaque, so id and the d-double vec "
            "crossed the Python boundary every round alongside qvec"
        )
    else:
        lloyd_in = e.select("qvec")
        hdr = (
            "-- distributed-kmeans Lloyd round Arrow input, r11 form "
            "(similarity.py kmeans_distributed): the caller projects "
            "qvec before the opaque mapInPandas, so the "
            "InMemoryTableScan ships ONE column per round (guide §4.1)"
        )
    dump("op_kmeans_lloyd_input", lloyd_in, hdr)
    e.unpersist()

    # --- 2. PQ fit per-round input over the shared residual pass --------
    cents = np.zeros((4, 64), dtype=np.float64)
    cents[:, 0] = np.arange(4)
    assigned = sim._ivfpq_assign_resid(emb, cents, "vec_id", "embedding").persist(
        StorageLevel.DISK_ONLY
    )
    if shape == "r10":
        # replicate the r10 prep_resid materialization: a SECOND
        # corpus-sized persisted frame of fixed-point rows
        import pandas as pd
        from pyspark.sql import types as T

        prep_schema = T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("qvec", T.ArrayType(T.LongType())),
            ]
        )

        def prep_resid(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                R_ = np.array(
                    [np.asarray(v, dtype=np.float64) for v in pdf["resid"]]
                )
                yield pd.DataFrame(
                    {
                        "id": pdf["id"].astype("int64"),
                        "qvec": list(
                            np.rint(R_ * float(1 << 20)).astype(np.int64)
                        ),
                    }
                )

        prepared = (
            assigned.select("id", "resid")
            .mapInPandas(prep_resid, prep_schema)
            .persist(StorageLevel.DISK_ONLY)
        )
        round_in = prepared
        hdr = (
            "-- PQ codebook fit per-round input, r10 form "
            "(pq_codebooks_distributed prepared_resid path): the fit "
            "materialized a SECOND corpus-sized DISK_ONLY frame "
            "(fixed-point qvec) from the already-persisted residual "
            "pass — two chained InMemoryRelations, ~2x scratch disk "
            "per index build"
        )
    else:
        round_in = assigned.select("resid")
        hdr = (
            "-- PQ codebook fit per-round input, r11 form "
            "(pq_codebooks_distributed prepared_resid path): the rounds "
            "read the caller-persisted (id, cell, resid) pass DIRECTLY "
            "— one InMemoryRelation, one persisted corpus-scale frame "
            "per build — and quantize each batch with the same np.rint "
            "(bit-identical codebooks, tests/test_ivfpq_shared_assign.py)"
        )
    dump("op_pq_fit_round_input", round_in, hdr)

    # --- 3. exact_cross_pairs echo join, pre-finalize --------------------
    rank = (F.col("doc_id") % 5 == 0).cast("int")
    if shape == "r10":
        sh = (
            spread(docs)
            .select(
                F.col("doc_id").alias("id"),
                F.explode(word_shingles("text", 3)).alias("s"),
            )
            .persist()
        )
        sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
        a, b = sh.alias("a"), sh.alias("b")
        inter = (
            a.join(
                b,
                (F.col("a.s") == F.col("b.s"))
                & (F.col("a.id") < F.col("b.id")),
            )
            .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .agg(F.count(F.lit(1)).alias("inter"))
        )
        sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("na"))
        sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("nb"))
        ex = (
            inter.join(sa, "id_a")
            .join(sb, "id_b")
            .withColumn("uni", F.col("na") + F.col("nb") - F.col("inter"))
            .filter(F.col("inter") * 100 >= F.col("uni") * 30)
            .select("id_a", "id_b", "inter", "uni")
        )
        ids = docs.select(F.col("doc_id").alias("__id"), rank.alias("__rk"))
        ra = ids.select(F.col("__id").alias("id_a"), F.col("__rk").alias("__rka"))
        rb = ids.select(F.col("__id").alias("id_b"), F.col("__rk").alias("__rkb"))
        j = ex.join(ra, "id_a").join(rb, "id_b").filter(
            F.col("__rka") != F.col("__rkb")
        )
        a_newer = F.col("__rka") > F.col("__rkb")
        out = j.select(
            F.when(a_newer, F.col("id_a")).otherwise(F.col("id_b")).alias("new_id"),
            F.when(a_newer, F.col("id_b")).otherwise(F.col("id_a")).alias("corpus_id"),
            "inter",
            "uni",
        )
        hdr = (
            "-- exact_cross_pairs echo, r10 form (pre-finalize): the "
            "full jaccard self-join enumerates ALL same-shingle pairs "
            "(a.id < b.id — same-rank corpus-internal pairs included, "
            "~70% of the aggregated rows at a 20/80 split) and the "
            "rank joins + filter discard them AFTER the aggregation"
        )
    else:
        sh = (
            spread(docs)
            .select(
                F.col("doc_id").alias("id"),
                rank.alias("rk"),
                F.explode(word_shingles("text", 3)).alias("s"),
            )
            .persist()
        )
        sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
        a, b = sh.alias("a"), sh.alias("b")
        inter = (
            a.join(
                b,
                (F.col("a.s") == F.col("b.s"))
                & (F.col("a.rk") > F.col("b.rk")),
            )
            .groupBy(
                F.col("a.id").alias("new_id"), F.col("b.id").alias("corpus_id")
            )
            .agg(F.count(F.lit(1)).alias("inter"))
        )
        sa = sizes.select(F.col("id").alias("new_id"), F.col("n_sh").alias("na"))
        sb = sizes.select(
            F.col("id").alias("corpus_id"), F.col("n_sh").alias("nb")
        )
        out = (
            inter.join(sa, "new_id")
            .join(sb, "corpus_id")
            .withColumn("uni", F.col("na") + F.col("nb") - F.col("inter"))
            .filter(F.col("inter") * 100 >= F.col("uni") * 30)
            .select("new_id", "corpus_id", "inter", "uni")
        )
        hdr = (
            "-- exact_cross_pairs echo, r11 form (pre-finalize, "
            "dedup.py exact_cross_pairs): the rank rides the shingle "
            "rows and the self-join condition is a.rk > b.rk — only "
            "cross-membership pairs are enumerated and aggregated "
            "(1,265,779 -> 407,185 aggregated rows at sf0.1), the "
            "rank-join stage is gone, output identical"
        )
    dump("op_exact_cross_pairs", out, hdr)
    sh.unpersist()

    # --- 4. BFS visited set after two rounds ------------------------------
    sym = (
        spark.range(0, 100_000)
        .selectExpr("id as u", "(id + 1) % 100000 as v")
        .localCheckpoint(eager=True)
    )
    frontier = spark.range(0, 50).select(F.col("id")).localCheckpoint(eager=True)
    visited = frontier.withColumn("hops", F.lit(0))
    for h in (1, 2):
        expanded = sym.join(F.broadcast(frontier), sym["u"] == frontier["id"])
        cand = expanded.select(F.col("v").alias("id")).distinct()
        nxt = cand.join(
            F.broadcast(visited.select("id")), "id", "left_anti"
        ).localCheckpoint(eager=True)
        if shape == "r10":
            visited = visited.unionByName(
                nxt.withColumn("hops", F.lit(h))
            ).localCheckpoint(eager=True)
        else:
            visited = visited.unionByName(nxt.withColumn("hops", F.lit(h)))
        frontier = nxt
    hdr = (
        "-- BFS visited set after two expansion rounds, "
        + ("r10 form: eagerly re-checkpointed every round — the plan is "
           "one block scan, but each round paid a separate job that "
           "re-copied the whole O(visited) set"
           if shape == "r10"
           else "r11 form (graph.py bfs_hops): a lazy union of the "
           "per-round checkpointed frontiers — plan depth grows one "
           "Union node per hop (bounded by max_hops), and the "
           "per-round visited copy job is gone")
    )
    dump("op_bfs_visited", visited, hdr)


if __name__ == "__main__":
    main()
