"""Classifier calibration curve
(curation_queries.py classifier_calibration)."""

from __future__ import annotations

import os
import tempfile

from customer_360_etl_pipeline_on_azure_cloud_spark.curation_queries import (
    q_classifier_calibration,
)

SF = "/root/testdata/sf0.001"


def test_deciles_are_balanced_ordered_partitions(spark):
    rows = sorted(
        q_classifier_calibration(spark, SF).collect(),
        key=lambda r: r["decile"],
    )
    n_labeled = sum(r["n_docs"] for r in rows)
    assert [r["decile"] for r in rows] == list(range(1, 11))
    # exact integer decile formula: sizes differ by at most 1
    sizes = {r["n_docs"] for r in rows}
    assert max(sizes) - min(sizes) <= 1
    assert n_labeled == 250  # even half of 500 docs
    # score ranges ascend without overlap
    for a, b in zip(rows, rows[1:]):
        assert a["score_hi"] <= b["score_lo"]


def test_separable_corpus_yields_monotone_curve(spark):
    rows = []
    for i in range(200):
        pos = i % 2 == 0  # doc_id even = labeled set; all labeled here
        # stronger signal with higher doc index within each class
        good = "excellent reliable signal " * (3 if pos else 0)
        bad = "spam junk noise " * (0 if pos else 3)
        text = (good + bad + "shared filler words").strip()
        rows.append((i * 2, text, "en" if pos else "xx", "s", len(text)))
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string,"
            " n_chars long"
        ).write.parquet(os.path.join(td, "documents.parquet"))
        got = sorted(
            q_classifier_calibration(spark, td).collect(),
            key=lambda r: r["decile"],
        )
    rates = [r["n_pos"] / r["n_docs"] for r in got]
    # perfectly separable synthetic corpus: bottom deciles all
    # negative, top deciles all positive
    assert rates[0] == 0.0 and rates[-1] == 1.0
    assert all(a <= b for a, b in zip(rates, rates[1:]))
