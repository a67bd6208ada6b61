"""Temperature mixture quotas and seasonal residual outliers."""

from __future__ import annotations

import math

from customer_360_etl_pipeline_on_azure_cloud_spark.analytics_queries import (
    _SEAS_MAD_K,
    q_revenue_seasonal_outliers,
)
from customer_360_etl_pipeline_on_azure_cloud_spark.curation_queries import (
    _TEMP_DOC_BUDGET,
    q_source_mixture_temperature,
)

SF = "/root/testdata/sf0.001"


def test_quotas_sum_exactly_to_budget(spark):
    rows = q_source_mixture_temperature(spark, SF).collect()
    assert sum(r["quota_docs"] for r in rows) == _TEMP_DOC_BUDGET


def test_weight_is_exact_integer_sqrt(spark):
    for r in q_source_mixture_temperature(spark, SF).collect():
        w, n = r["w_isqrt_tokens"], r["n_tokens"]
        assert w * w <= n < (w + 1) * (w + 1)
        assert w == math.isqrt(n)


def test_temperature_flattens_allocation(spark):
    # sqrt weighting gives small sources MORE than proportional share
    rows = q_source_mixture_temperature(spark, SF).collect()
    tot_tokens = sum(r["n_tokens"] for r in rows)
    smallest = min(rows, key=lambda r: r["n_tokens"])
    proportional = _TEMP_DOC_BUDGET * smallest["n_tokens"] / tot_tokens
    assert smallest["quota_docs"] >= proportional


def test_outlier_flags_match_pure_python(spark):
    rows = q_revenue_seasonal_outliers(spark, SF).collect()
    by_cm: dict[int, list] = {}
    for r in rows:
        by_cm.setdefault(r["cal_month"], []).append(r)
    for cm, grp in by_cm.items():
        devs = sorted((r["dev"], r["ym"]) for r in grp)
        med = devs[(len(devs) + 1) // 2 - 1][0]
        ads = sorted((abs(r["dev"] - med), r["ym"]) for r in grp)
        mad = ads[(len(ads) + 1) // 2 - 1][0]
        for r in grp:
            assert r["med"] == med and r["mad"] == mad, f"cal_month {cm}"
            assert r["is_outlier"] == (
                abs(r["dev"] - med) > _SEAS_MAD_K * mad
            )


def test_deviations_use_common_group_scale(spark):
    # within a calendar-month group the scale is 24 * seasonal_n: the
    # group's deviations must sum to zero when seasonal_n covers the
    # whole group (sum(detrended*n - sum24) = n*sum24 - n*sum24)
    rows = q_revenue_seasonal_outliers(spark, SF).collect()
    by_cm: dict[int, int] = {}
    for r in rows:
        by_cm[r["cal_month"]] = by_cm.get(r["cal_month"], 0) + r["dev"]
    assert all(v == 0 for v in by_cm.values())


def test_point_in_time_features_never_leak(spark):
    """Every feature must be reconstructable from STRICTLY earlier
    orders of the same customer — including the same-day tiebreak."""
    from collections import defaultdict

    from customer_360_etl_pipeline_on_azure_cloud_spark.analytics_queries import (
        q_point_in_time_features,
    )

    orders = spark.read.parquet(f"{SF}/orders.parquet").collect()
    hist = defaultdict(list)
    for r in orders:
        hist[r["o_custkey"]].append(
            (r["o_orderdate"], r["o_orderkey"],
             round(r["o_totalprice"] * 100))
        )
    got = {r["o_orderkey"]: r
           for r in q_point_in_time_features(spark, SF).collect()}
    for ck, rows in hist.items():
        rows.sort()
        spend = 0
        prev_date = None
        for i, (d, ok_, vc) in enumerate(rows):
            g = got[ok_]
            assert g["prior_orders"] == i
            assert g["prior_spend_cents"] == spend
            expect_gap = None if prev_date is None else (d - prev_date).days
            assert g["days_since_prev"] == expect_gap
            spend += int(vc)
            prev_date = d
