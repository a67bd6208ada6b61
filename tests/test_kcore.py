"""k-core decomposition (operators/graph.py k_core)."""

from __future__ import annotations

import pytest

from customer_360_etl_pipeline_on_azure_cloud_spark.operators.graph import k_core


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "id_a long, id_b long")


def test_clique_survives_chain_peeled(spark):
    # K5 clique (0-4) with a pendant chain 4-5-6-7
    clique = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    chain = [(4, 5), (5, 6), (6, 7)]
    got = {
        r["id"]: r["core_degree"]
        for r in k_core(_edges(spark, clique + chain), k=3).collect()
    }
    assert got == {i: 4 for i in range(5)}


def test_path_two_core_is_empty(spark):
    path = [(i, i + 1) for i in range(10)]
    assert k_core(_edges(spark, path), k=2).count() == 0


def test_cycle_is_its_own_two_core(spark):
    cyc = [(i, (i + 1) % 8) for i in range(8)]
    got = {
        r["id"]: r["core_degree"]
        for r in k_core(_edges(spark, cyc), k=2).collect()
    }
    assert got == {i: 2 for i in range(8)}


def test_peel_is_idempotent_past_convergence(spark):
    # two K4s sharing one vertex + assorted pendants: converges in <= 3
    k4a = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    k4b = [(a, b) for a in range(3, 7) for b in range(a + 1, 7)]
    pend = [(0, 100), (100, 101), (6, 200)]
    e = _edges(spark, k4a + k4b + pend)
    short = sorted(map(tuple, k_core(e, k=3, max_iter=4).collect()))
    long = sorted(map(tuple, k_core(e, k=3, max_iter=40).collect()))
    assert short == long and len(short) == 7


def test_invalid_k_rejected(spark):
    with pytest.raises(ValueError):
        k_core(_edges(spark, [(1, 2)]), k=0)


def test_exact_budget_convergence_does_not_raise(spark):
    """ADVICE r7: a peel that reaches its fixed point exactly on the
    final allowed round must return the k-core, not raise — the loop
    only observes stability at the top of the NEXT round, so k_core
    runs one confirming comparison before raising.  Corner case:
    max_iter=0 on a graph that is already a k-core."""
    # K4 + one pendant: round 1 peels the pendant, round 2 observes
    # stability — so max_iter=1 exits the loop right after the
    # converging peel without seeing it converge.
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    e = _edges(spark, k4 + [(0, 9)])
    got = {r["id"]: r["core_degree"] for r in k_core(e, k=3, max_iter=1).collect()}
    assert got == {i: 3 for i in range(4)}

    # already a 3-core: even max_iter=0 is enough (confirming recount)
    got0 = {
        r["id"]: r["core_degree"]
        for r in k_core(_edges(spark, k4), k=3, max_iter=0).collect()
    }
    assert got0 == {i: 3 for i in range(4)}

    # genuinely unconverged within budget still raises: chain peels one
    # layer per round
    chain = [(i, i + 1) for i in range(12)]
    with pytest.raises(RuntimeError, match="fixed point"):
        k_core(_edges(spark, chain + k4), k=2, max_iter=1)


def test_registered_rounds_suffice_on_gate_corpora(spark):
    """doc_near_dup_core caps the peel at _KCORE_ROUNDS for oracle
    parity; pin that the cap is PAST convergence on the shipped corpora
    (so the registered result is the true Seidman k-core, not a
    truncation), and that the gate corpora produce non-empty cores."""
    from pyspark.sql import functions as F

    from customer_360_etl_pipeline_on_azure_cloud_spark.analytics_queries import (
        _KCORE_K,
        _KCORE_ROUNDS,
        q_doc_near_dup_core,
    )
    from customer_360_etl_pipeline_on_azure_cloud_spark.operators.dedup import (
        jaccard_pairs,
    )

    for sf in ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]:
        capped = sorted(map(tuple, q_doc_near_dup_core(spark, sf).collect()))
        docs = spark.read.parquet(f"{sf}/documents.parquet")
        edges = jaccard_pairs(docs, n=3, threshold_pct=30, exact=True)
        uncapped = sorted(
            map(
                tuple,
                k_core(
                    edges,
                    k=_KCORE_K,
                    src="id_a",
                    dst="id_b",
                    max_iter=_KCORE_ROUNDS * 4,
                )
                .select(F.col("id").alias("doc_id"), "core_degree")
                .collect(),
            )
        )
        assert capped == uncapped and len(capped) > 0
