"""Linear-layout file bounds without a global sort
(operators/layout.py linear_file_bounds)."""

from __future__ import annotations

import random

import pytest

from customer_360_etl_pipeline_on_azure_cloud_spark.operators.layout import (
    linear_file_bounds,
)


def _ref_bounds(rows, n_files):
    """Pure-Python third implementation: actually sort the rows and
    slice them into n_files contiguous files (rank r -> file
    r * n_files // n), then take per-file min/max of each column —
    the bounds an actual clustered write would produce."""
    srt = sorted(rows)
    n = len(srt)
    out: dict[int, list] = {}
    for r, (px, sx) in enumerate(srt):
        f = r * n_files // n
        cur = out.setdefault(f, [px, px, sx, sx])
        cur[0] = min(cur[0], px)
        cur[1] = max(cur[1], px)
        cur[2] = min(cur[2], sx)
        cur[3] = max(cur[3], sx)
    return {f: tuple(v) for f, v in out.items()}


@pytest.mark.parametrize("seed,n_files", [(0, 8), (1, 16), (2, 5)])
def test_bounds_match_actual_sorted_write(spark, seed, n_files):
    rng = random.Random(seed)
    rows = [(rng.randrange(20), rng.randrange(20)) for _ in range(400)]
    df = spark.createDataFrame(rows, "px long, sx long")
    got = {
        r["file_id"]: (r["px_min"], r["px_max"], r["sx_min"], r["sx_max"])
        for r in linear_file_bounds(df, ["px", "sx"], n_files).collect()
    }
    assert got == _ref_bounds(rows, n_files)


def test_bounds_are_partitioning_invariant(spark):
    rng = random.Random(3)
    rows = [(rng.randrange(10), rng.randrange(10)) for _ in range(300)]
    df = spark.createDataFrame(rows, "px long, sx long")
    a = sorted(
        tuple(r) for r in linear_file_bounds(df, ["px", "sx"], 8).collect()
    )
    b = sorted(
        tuple(r)
        for r in linear_file_bounds(
            df.repartition(13), ["px", "sx"], 8
        ).collect()
    )
    assert a == b


def test_single_file_covers_domain(spark):
    rows = [(i % 7, i % 5) for i in range(100)]
    df = spark.createDataFrame(rows, "px long, sx long")
    got = linear_file_bounds(df, ["px", "sx"], 1).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["px_min"], r["px_max"], r["sx_min"], r["sx_max"]) == (0, 6, 0, 4)


def test_n_files_validation(spark):
    df = spark.createDataFrame([(1, 1)], "px long, sx long")
    with pytest.raises(ValueError):
        linear_file_bounds(df, ["px", "sx"], 0)


def test_zorder_beats_linear_on_second_dimension(spark):
    """The audit's reason to exist: the linear layout must scan far
    more files for second-dimension predicates than Z-order does."""
    from customer_360_etl_pipeline_on_azure_cloud_spark.analytics_queries import (
        q_layout_skipping_audit,
    )

    # sf0.01: sf0.001 has only 10 suppliers, so the sx domain is
    # degenerate there (one band holds everything) and the contrast
    # can't show
    got = {
        (r["layout"], r["pred_dim"]): r["files_scanned"]
        for r in q_layout_skipping_audit(
            spark, "/root/testdata/sf0.01"
        ).collect()
    }
    assert got[("linear", "sx")] > 2 * got[("zorder", "sx")]
    # the linear layout prunes its own sort dimension well but is
    # blind on the second one — the gap IS the finding
    assert got[("linear", "sx")] > 2 * got[("linear", "px")]
