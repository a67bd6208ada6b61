"""MMR diversity rerank (operators/similarity.py mmr_rerank).

Pins the three contracts the oracle relies on:
* lam_pct=100 degenerates to pure relevance — identical ids, in rank
  order, to cosine_topk_bruteforce;
* the redundancy penalty actually diversifies: with a planted
  near-duplicate pair at the top of the relevance ranking, MMR spends
  the second pick on the off-cluster candidate;
* the selection is partition-invariant (the corpus scan is distributed;
  the greedy sees only the deterministic shortlist).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from customer_360_etl_pipeline_on_azure_cloud_spark.operators.similarity import (
    cosine_topk_bruteforce,
    mmr_rerank,
)

SF = "/root/testdata/sf0.01"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_lambda_100_is_pure_relevance(spark):
    emb = _emb(spark)
    corpus = emb.filter(F.col("vec_id") != 0)
    query = emb.filter(F.col("vec_id") == 0)
    got = mmr_rerank(corpus, query, k=8, lam_pct=100, shortlist=30).collect()
    exact = (
        cosine_topk_bruteforce(emb, query, k=8)
        .orderBy("rk")
        .select("neighbor_id")
        .collect()
    )
    assert [r["vec_id"] for r in sorted(got, key=lambda r: r["mmr_rank"])] == [
        r["neighbor_id"] for r in exact
    ]


def test_penalty_diversifies_planted_cluster(spark):
    # q = e1; a1/a2 near-duplicates very close to q; b distinct but
    # still relevant. Relevance order: a1, a2, b. MMR at lam=50 must
    # spend pick 2 on b (a2's sim-to-a1 penalty sinks it).
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),  # query
        (1, [0.99, 0.14, 0.0, 0.0]),  # a1
        (2, [0.99, 0.141, 0.0, 0.0]),  # a2 (near-dup of a1)
        (3, [0.8, 0.0, 0.6, 0.0]),  # b (off-cluster)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    corpus = df.filter(F.col("vec_id") != 0)
    query = df.filter(F.col("vec_id") == 0)
    rel_order = mmr_rerank(corpus, query, k=3, lam_pct=100).collect()
    assert [r["vec_id"] for r in sorted(rel_order, key=lambda r: r["mmr_rank"])] == [
        1, 2, 3,
    ]
    diverse = mmr_rerank(corpus, query, k=3, lam_pct=50).collect()
    assert [r["vec_id"] for r in sorted(diverse, key=lambda r: r["mmr_rank"])] == [
        1, 3, 2,
    ]


def test_partition_invariance_and_shapes(spark):
    emb = _emb(spark)
    corpus = emb.filter(F.col("vec_id") != 0)
    query = emb.filter(F.col("vec_id") == 0)
    a = sorted(
        map(tuple, mmr_rerank(corpus, query, k=10, lam_pct=70).collect())
    )
    b = sorted(
        map(
            tuple,
            mmr_rerank(corpus.repartition(7), query, k=10, lam_pct=70).collect(),
        )
    )
    assert a == b
    assert len(a) == 10
    assert [t[0] for t in a] == list(range(1, 11))
    assert len({t[1] for t in a}) == 10
    # rel_e9 is a fixed-point cosine: bounded, and rank 1 has the max
    assert all(-(10**9) <= t[2] <= 10**9 for t in a)
    assert a[0][2] == max(t[2] for t in a)


def test_k_exceeding_candidates_and_bad_lambda(spark):
    rows = [(i, [float(i == j) for j in range(4)]) for i in range(3)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    corpus = df.filter(F.col("vec_id") != 0)
    query = df.filter(F.col("vec_id") == 0)
    got = mmr_rerank(corpus, query, k=10, lam_pct=70).collect()
    assert len(got) == 2  # stops when the shortlist is exhausted
    with pytest.raises(ValueError):
        mmr_rerank(corpus, query, lam_pct=101)


# --- greedy k-center coreset (the corpus-sized diversity greedy) -----------


def test_kcenter_covers_planted_clusters(spark):
    from customer_360_etl_pipeline_on_azure_cloud_spark.operators.similarity import (
        kcenter_select,
    )

    # three orthogonal clusters; k=3 must pick one member of each
    rows = []
    for cid, base in enumerate(
        [[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 0]]
    ):
        for j in range(4):
            v = list(base)
            v[3] = 0.01 * j  # slight within-cluster spread
            rows.append((cid * 10 + j, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = sorted(
        map(tuple, kcenter_select(df, k=3).collect())
    )
    assert [t[0] for t in got] == [1, 2, 3]
    clusters = {t[1] // 10 for t in got}
    assert clusters == {0, 1, 2}
    assert got[0][1] == 0  # round 1 = lowest id
    assert got[0][2] == -2_000_000_000  # init sentinel


def test_kcenter_shapes_and_partition_invariance(spark):
    from customer_360_etl_pipeline_on_azure_cloud_spark.operators.similarity import (
        kcenter_select,
    )

    emb = _emb(spark)
    a = sorted(map(tuple, kcenter_select(emb, k=6).collect()))
    b = sorted(map(tuple, kcenter_select(emb.repartition(7), k=6).collect()))
    assert a == b
    assert [t[0] for t in a] == list(range(1, 7))
    assert len({t[1] for t in a}) == 6
    # maxcos at selection is the corpus min -> non-decreasing over rounds
    # (each round removes the farthest point, coverage only tightens)
    tail = [t[2] for t in a][1:]
    assert tail == sorted(tail)


def test_kcenter_exhaustion_and_bad_k(spark):
    import pytest as _pytest

    from customer_360_etl_pipeline_on_azure_cloud_spark.operators.similarity import (
        kcenter_select,
    )

    rows = [(i, [float(i == j) for j in range(4)]) for i in range(3)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    assert kcenter_select(df, k=10).count() == 3  # stops when exhausted
    with _pytest.raises(ValueError):
        kcenter_select(df, k=0)
