"""Seasonal decomposition (analytics_queries.q_revenue_seasonal_decomp):
pure-Python third implementation replayed from the raw parquet, plus the
textbook edge/identity properties.
"""

from __future__ import annotations

import duckdb

from customer_360_etl_pipeline_on_azure_cloud_spark.analytics_queries import (
    q_revenue_seasonal_decomp,
)

SF = "/root/testdata/sf0.001"


def _python_reference():
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT),
               CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                    AS BIGINT)
        FROM '{SF}/orders.parquet' GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    by_ym = dict(rows)
    lo, hi = min(by_ym), max(by_ym)
    yms = []
    ym = lo
    while ym <= hi:
        yms.append(ym)
        ym = ym + 1 if ym % 100 < 12 else (ym // 100 + 1) * 100 + 1
    y = [by_ym.get(m, 0) for m in yms]
    n = len(y)
    out = {}
    for t in range(n):
        if 6 <= t < n - 6:
            trend24 = y[t - 6] + 2 * sum(y[t - 5 : t + 6]) + y[t + 6]
            det = 24 * y[t] - trend24
        else:
            trend24 = det = None
        out[yms[t]] = (y[t], trend24, det)
    seas = {}
    for m, (_, _, det) in out.items():
        if det is not None:
            s, c = seas.get(m % 100, (0, 0))
            seas[m % 100] = (s + det, c + 1)
    return out, seas


def test_matches_pure_python_reference(spark):
    ref, seas = _python_reference()
    got = {
        r["ym"]: r for r in q_revenue_seasonal_decomp(spark, SF).collect()
    }
    assert set(got) == set(ref)
    for ym, (rev, trend24, det) in ref.items():
        r = got[ym]
        assert r["revenue_cents"] == rev
        assert r["trend24"] == trend24
        assert r["detrended24"] == det
        s_sum, s_n = seas.get(ym % 100, (None, 0))
        assert r["seasonal_sum24"] == s_sum
        assert r["seasonal_n"] == s_n


def test_edge_months_carry_null_trend(spark):
    rows = sorted(
        q_revenue_seasonal_decomp(spark, SF).collect(),
        key=lambda r: r["ym"],
    )
    assert all(r["trend24"] is None for r in rows[:6] + rows[-6:])
    assert all(r["trend24"] is not None for r in rows[6:-6])
    # the identity detrended24 = 24*y - trend24 wherever trend exists
    for r in rows[6:-6]:
        assert (
            r["detrended24"] == 24 * r["revenue_cents"] - r["trend24"]
        )
