"""Mann-Kendall / Spearman trend statistics
(analytics_queries.py nation_trend_rank_stats)."""

from __future__ import annotations

from customer_360_etl_pipeline_on_azure_cloud_spark.analytics_queries import (
    q_nation_trend_rank_stats,
)

SF = "/root/testdata/sf0.001"


def _mk_ref(series):
    s = 0
    for i in range(len(series)):
        for j in range(i + 1, len(series)):
            d = series[j] - series[i]
            s += (d > 0) - (d < 0)
    return s


def _spearman_d2x4_ref(series):
    # average ranks doubled: 2*min_rank + tie_count - 1
    n = len(series)
    srt = sorted(series)
    out = 0
    for t, v in enumerate(series, start=1):
        min_rank = srt.index(v) + 1
        ties = srt.count(v)
        rx2 = 2 * min_rank + ties - 1
        out += (rx2 - 2 * t) ** 2
    return out


def test_matches_pure_python_reference(spark):
    from pyspark.sql import functions as F

    monthly = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .join(
            spark.read.parquet(f"{SF}/orders.parquet"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            spark.read.parquet(f"{SF}/customer.parquet"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(
            "c_nationkey",
            (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("m"),
        )
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice")
                    * (F.lit(1.0) - F.col("l_discount"))
                    * 100,
                    0,
                ).cast("long")
            ).alias("rev")
        )
        .collect()
    )
    by_nation: dict[int, list] = {}
    for r in monthly:
        by_nation.setdefault(r["c_nationkey"], []).append((r["m"], r["rev"]))
    got = {
        r["c_nationkey"]: (r["n_months"], r["mk_s"], r["spearman_d2x4"])
        for r in q_nation_trend_rank_stats(spark, SF).collect()
    }
    for nk, months in by_nation.items():
        series = [rev for _, rev in sorted(months)]
        assert got[nk] == (
            len(series),
            _mk_ref(series),
            _spearman_d2x4_ref(series),
        ), f"nation {nk}"


def test_mk_is_outlier_robust_where_ols_is_not():
    # strictly increasing series with one 50x spike early on:
    # OLS slope goes NEGATIVE (the spike dominates), MK stays positive.
    series = [10, 11, 5000, 13, 14, 15, 16, 17, 18, 19]
    n = len(series)
    xm = (n - 1) / 2
    ym = sum(series) / n
    ols_num = sum((i - xm) * (y - ym) for i, y in enumerate(series))
    assert ols_num < 0
    assert _mk_ref(series) > 0
