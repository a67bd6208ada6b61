"""Perceptual hashing (operators/multimodal.py phash_table)."""

from __future__ import annotations

import hashlib

from customer_360_etl_pipeline_on_azure_cloud_spark.operators.dedup import (
    simhash_near_pairs,
)
from customer_360_etl_pipeline_on_azure_cloud_spark.operators.multimodal import (
    PHASH_DCT,
    documents_as_media,
    phash_table,
)
from pyspark.sql import functions as F


def _ref_phash(content: bytes) -> int:
    """Pure-Python third implementation of the stub-decode pHash."""
    raw = (
        hashlib.sha256(content).hexdigest()
        + hashlib.sha256(content + b"\x01").hexdigest()
    )
    px = [int(raw[i * 2 : i * 2 + 2], 16) for i in range(64)]
    P = [px[r * 8 : r * 8 + 8] for r in range(8)]
    C = PHASH_DCT
    coeff = [
        [
            sum(
                P[x][y] * C[u][x] * C[v][y]
                for x in range(8)
                for y in range(8)
            )
            for v in range(8)
        ]
        for u in range(8)
    ]
    flat = [coeff[u][v] for u in range(8) for v in range(8)][1:]
    med = sorted(flat)[31]
    h = 0
    for idx, v in enumerate(flat):
        if v > med:
            h |= 1 << idx
    return h


def _media(spark, rows):
    df = spark.createDataFrame(rows, "media_id long, text string")
    return df.select(
        "media_id", F.encode("text", "utf-8").alias("content")
    )


def test_phash_matches_pure_python(spark):
    rows = [(i, f"document number {i} with words " * (i % 5 + 1))
            for i in range(40)]
    got = {
        r["media_id"]: r["phash"]
        for r in phash_table(_media(spark, rows)).collect()
    }
    for i, text in rows:
        assert got[i] == _ref_phash(text.encode()), f"media {i}"


def test_identical_content_hamming_zero(spark):
    rows = [(1, "same bytes"), (2, "same bytes"), (3, "different")]
    ph = phash_table(_media(spark, rows))
    pairs = simhash_near_pairs(
        ph.select(
            F.col("media_id").alias("doc_id"),
            F.col("phash").alias("simhash"),
        ),
        max_hamming=0,
    ).collect()
    assert {(r["id_a"], r["id_b"], r["hamming"]) for r in pairs} == {
        (1, 2, 0)
    }


def test_phash_is_63_bits_nonnegative(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ph = phash_table(documents_as_media(docs)).collect()
    assert len(ph) == 500
    for r in ph:
        assert 0 <= r["phash"] < 1 << 63
