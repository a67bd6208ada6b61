"""Join-key skew audit (analytics_queries.py join_skew_audit)."""

from __future__ import annotations

import math
from collections import Counter

from customer_360_etl_pipeline_on_azure_cloud_spark.analytics_queries import (
    q_join_skew_audit,
)

SF = "/root/testdata/sf0.001"


def _ref(multiplicities):
    ms = sorted(multiplicities)
    n = len(ms)
    t = sum(ms)
    p50 = ms[(n + 1) // 2 - 1]
    p99 = ms[math.ceil(0.99 * n) - 1]
    k_top = -(-n // 100)
    top_rows = sum(sorted(ms, reverse=True)[:k_top])
    sum_rx2 = 2 * sum((i + 1) * v for i, v in enumerate(ms))
    gini_ppm = ((2 * sum_rx2 - 2 * (n + 1) * t) * 1_000_000) // (2 * n * t)
    return {
        "n_keys": n,
        "n_rows": t,
        "max_freq": ms[-1],
        "p50_freq": p50,
        "p99_freq": p99,
        "top1pct_share_ppm": top_rows * 1_000_000 // t,
        "freq_gini_ppm": gini_ppm,
    }


def test_matches_pure_python_on_real_data(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").collect()
    ms = list(Counter(r["l_orderkey"] for r in li).values())
    got = q_join_skew_audit(spark, SF).collect()[0].asDict()
    assert got == _ref(ms)


def test_gini_extremes():
    # uniform multiplicities -> gini 0; one dominant key -> near 1
    assert _ref([5] * 100)["freq_gini_ppm"] == 0
    skewed = _ref([1] * 99 + [100_000])
    assert skewed["freq_gini_ppm"] > 950_000
    assert skewed["top1pct_share_ppm"] > 990_000
