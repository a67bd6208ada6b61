"""Behavioral tests for the approximate/rows-only extension operators:
LSH recall against exact baselines, SimHash sanity, multimodal plumbing.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conftest import SF_SMALL

from customer_360_etl_pipeline_on_azure_cloud_spark.operators.dedup import (
    jaccard_pairs,
    minhash_lsh_pairs,
    simhash_near_pairs,
    simhash_table,
)
from customer_360_etl_pipeline_on_azure_cloud_spark.operators.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_lsh,
)
from customer_360_etl_pipeline_on_azure_cloud_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_SMALL, "documents").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_SMALL, "embeddings").cache()


def test_minhash_lsh_recall_vs_exact_jaccard(docs):
    exact = {
        (r["id_a"], r["id_b"])
        for r in jaccard_pairs(docs, n=3, threshold_pct=30).collect()
    }
    assert exact, "testdata should contain planted near-duplicates"
    lsh = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(
            docs, num_hashes=32, bands=8, verify_threshold_pct=30
        ).collect()
    }
    # banded LSH at b=8,r=4 catches j>=0.3 pairs with high probability;
    # the planted dups are j~0.95+ where recall is ~1.
    high = {
        (r["id_a"], r["id_b"])
        for r in jaccard_pairs(docs, n=3, threshold_pct=80).collect()
    }
    assert high <= lsh, "LSH must catch all very-high-similarity pairs"
    recall = len(exact & lsh) / len(exact)
    assert recall >= 0.8, f"LSH recall too low: {recall}"


def test_simhash_flags_near_identical_docs(spark, docs):
    sim = simhash_table(docs)
    assert sim.count() == docs.count()
    pairs = simhash_near_pairs(sim, max_hamming=3).collect()
    # near-identical planted dups should collide within small hamming
    exact = {
        (r["id_a"], r["id_b"])
        for r in jaccard_pairs(docs, n=3, threshold_pct=90).collect()
    }
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    if exact:
        overlap = len(exact & got) / len(exact)
        assert overlap >= 0.5, f"simhash missed too many near-identical pairs: {overlap}"


def test_ann_lsh_recall_vs_bruteforce(emb):
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk_bruteforce(emb, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk_lsh(
            emb, queries, dim=64, k=5, nbits=4, tables=8
        ).collect()
    }
    # testdata embeddings are UNIFORM RANDOM (top-1 cos ~0.37, no planted
    # clusters), the hardest case for LSH; (b=4, L=8) predicts ~0.6-0.7
    # recall at ~50% candidate fraction. Real corpora with actual
    # neighbor structure sit far above this.
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"multi-table SRP-LSH recall too low: {recall}"


def test_lsh_is_deterministic(emb):
    queries = emb.filter(F.col("vec_id") < 10)
    a = sorted(
        map(tuple, cosine_topk_lsh(emb, queries, dim=64, k=5, nbits=4, tables=4).collect())
    )
    b = sorted(
        map(tuple, cosine_topk_lsh(emb, queries, dim=64, k=5, nbits=4, tables=4).collect())
    )
    assert a == b


def test_ann_ivf_recall_vs_bruteforce(emb):
    from customer_360_etl_pipeline_on_azure_cloud_spark.operators.similarity import (
        cosine_topk_ivf,
    )

    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk_bruteforce(emb, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk_ivf(
            emb, queries, k=5, n_centroids=16, nprobe=6
        ).collect()
    }
    # uniform-random embeddings again (worst case); nprobe=6/16 probes
    # ~38% of cells — L2 cells only partially align with cosine
    # neighbors on this distribution
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4, f"IVF recall too low: {recall}"
    # determinism
    again = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk_ivf(
            emb, queries, k=5, n_centroids=16, nprobe=6
        ).collect()
    }
    assert approx == again
