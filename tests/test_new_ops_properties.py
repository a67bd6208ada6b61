"""Property-based tests (hypothesis) for the round-6 operator
additions: arbitrary inputs must agree with the plain-Python
references — the edge cases fixtures miss (singleton domains, all-equal
keys, k larger than the set, file counts near the row count)."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

from customer_360_etl_pipeline_on_azure_cloud_spark.operators.kmv import (
    kmv_sketch,
)
from customer_360_etl_pipeline_on_azure_cloud_spark.operators.layout import (
    linear_file_bounds,
)


def _ref_file_bounds(rows, n_files):
    srt = sorted(rows)
    n = len(srt)
    out = {}
    for r, (px, sx) in enumerate(srt):
        f = r * n_files // n
        cur = out.setdefault(f, [px, px, sx, sx])
        cur[0] = min(cur[0], px)
        cur[1] = max(cur[1], px)
        cur[2] = min(cur[2], sx)
        cur[3] = max(cur[3], sx)
    return {f: tuple(v) for f, v in out.items()}


@settings(max_examples=12, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 6)),
        min_size=1,
        max_size=120,
    ),
    n_files=st.integers(1, 12),
)
def test_linear_file_bounds_fuzz(spark, rows, n_files):
    df = spark.createDataFrame(rows, "px long, sx long")
    got = {
        r["file_id"]: (r["px_min"], r["px_max"], r["sx_min"], r["sx_max"])
        for r in linear_file_bounds(df, ["px", "sx"], n_files).collect()
    }
    assert got == _ref_file_bounds(rows, n_files)


@settings(max_examples=12, deadline=None)
@given(
    values=st.lists(st.integers(0, 40), min_size=1, max_size=150),
    k=st.integers(2, 32),
)
def test_kmv_sketch_fuzz(spark, values, k):
    data = [("g", v) for v in values]
    df = spark.createDataFrame(data, "grp string, v long")
    got = sorted(
        r["h"] for r in kmv_sketch(df, "grp", "v", k).collect()
    )
    hs = {
        int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
        for v in values
    }
    assert got == sorted(hs)[:k]
