"""Multi-touch attribution, Kaplan-Meier survival, HHI
(analytics_queries.py round-6 additions)."""

from __future__ import annotations

import pytest

from customer_360_etl_pipeline_on_azure_cloud_spark.analytics_queries import (
    _ATTR_SCALE,
    _KM_ENC,
    _KM_SCALE,
    q_attribution_multitouch,
    q_customer_survival,
    q_nation_revenue_hhi,
)

SF = "/root/testdata/sf0.001"


def test_attribution_reconciles_to_total_purchase_value(spark):
    rows = q_attribution_multitouch(spark, SF).collect()
    credited = sum(r["credit_microcents"] for r in rows)
    ev = spark.read.parquet(f"{SF}/events.parquet")
    from pyspark.sql import functions as F

    total_cents = (
        ev.filter(F.col("event_type") == "purchase")
        .agg(F.sum(F.round(F.col("value") * 100, 0).cast("long")))
        .collect()[0][0]
    )
    total_micro = total_cents * _ATTR_SCALE
    # each attributed purchase loses < total_w micro-cents to the
    # truncating division; orphans lose nothing
    n_purch = sum(r["n_purchases"] for r in rows)
    assert credited <= total_micro
    assert total_micro - credited < n_purch * 10_000


def test_attribution_u_shape_on_constructed_journey(spark):
    # one purchase (100.00) after touches at t-3h, t-2h, t-1h:
    # first 2/5, middle 1/5, last 2/5
    from pyspark.sql import Row

    base = 1_700_000_000_000_000  # epoch micros
    rows = [
        Row(event_id=1, ts=base - 3 * 3_600_000_000, user_id=7,
            event_type="click", value=0.0, props="{}"),
        Row(event_id=2, ts=base - 2 * 3_600_000_000, user_id=7,
            event_type="view", value=0.0, props="{}"),
        Row(event_id=3, ts=base - 1 * 3_600_000_000, user_id=7,
            event_type="signup", value=0.0, props="{}"),
        Row(event_id=4, ts=base, user_id=7,
            event_type="purchase", value=100.0, props="{}"),
    ]
    import os
    import tempfile

    from pyspark.sql import functions as F

    with tempfile.TemporaryDirectory() as td:
        df = spark.createDataFrame(rows).withColumn(
            "ts", F.timestamp_micros("ts")
        )
        df.write.parquet(os.path.join(td, "events.parquet"))
        got = {
            r["touch_type"]: r["credit_microcents"]
            for r in q_attribution_multitouch(spark, td).collect()
        }
    cents = 10_000
    assert got["click"] == cents * _ATTR_SCALE * 2 // 5
    assert got["view"] == cents * _ATTR_SCALE * 1 // 5
    assert got["signup"] == cents * _ATTR_SCALE * 2 // 5
    assert got["(none)"] == 0


def _km_ref(durations, censor_flags, scale, enc):
    """Pure-Python third implementation of the integer KM fold."""
    from collections import Counter

    d = Counter()
    c = Counter()
    for dur, churned in zip(durations, censor_flags):
        (d if churned else c)[dur] += 1
    ts = sorted(set(d) | set(c))
    out = {}
    acc = scale
    remaining = len(durations)
    for t in ts:
        n = remaining
        acc = acc * (n - d[t]) // n
        out[t] = (n, d[t], c[t], acc)
        remaining -= d[t] + c[t]
    return out


def test_survival_matches_pure_python(spark):
    rows = q_customer_survival(spark, SF).collect()
    # rebuild the inputs exactly as the query defines them
    from pyspark.sql import functions as F

    o = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("m"),
    )
    span = (
        o.groupBy("o_custkey")
        .agg(F.min("m").alias("f"), F.max("m").alias("l"))
        .collect()
    )
    max_m = max(r["l"] for r in span)
    durations = [r["l"] - r["f"] for r in span]
    flags = [max_m - r["l"] >= 6 for r in span]
    ref = _km_ref(durations, flags, _KM_SCALE, _KM_ENC)
    got = {
        r["tenure_month"]: (
            r["n_at_risk"], r["d_churned"], r["c_censored"], r["survival_fp9"]
        )
        for r in rows
    }
    assert got == ref


def test_survival_is_monotone_nonincreasing(spark):
    rows = sorted(
        q_customer_survival(spark, SF).collect(),
        key=lambda r: r["tenure_month"],
    )
    surv = [r["survival_fp9"] for r in rows]
    assert all(a >= b for a, b in zip(surv, surv[1:]))
    assert surv[0] <= _KM_SCALE


def test_hhi_bounds_and_extremes(spark):
    rows = q_nation_revenue_hhi(spark, SF).collect()
    for r in rows:
        lo = 1_000_000 // r["n_suppliers"]  # equal shares floor
        assert lo <= r["hhi_ppm"] <= 1_000_000
    single = [r for r in rows if r["n_suppliers"] == 1]
    for r in single:
        assert r["hhi_ppm"] == 1_000_000
