"""KMV bottom-k sketches (operators/kmv.py)."""

from __future__ import annotations

import hashlib
import random

import pytest

from customer_360_etl_pipeline_on_azure_cloud_spark.operators.kmv import (
    KMV_HASH_BITS,
    kmv_pair_overlap,
    kmv_sketch,
)


def _h(value) -> int:
    return int(hashlib.md5(str(value).encode()).hexdigest()[:15], 16)


def _rows(spark, data):
    return spark.createDataFrame(data, "grp string, v long")


def _ref_sketch(data, k):
    by_grp: dict[str, set[int]] = {}
    for g, v in data:
        by_grp.setdefault(g, set()).add(_h(v))
    return {
        g: sorted(hs)[:k] for g, hs in by_grp.items()
    }


def test_sketch_matches_pure_python(spark):
    rng = random.Random(7)
    data = [(g, rng.randrange(10_000)) for g in "abc" for _ in range(500)]
    k = 32
    got = {}
    for r in kmv_sketch(_rows(spark, data), "grp", "v", k).collect():
        got.setdefault(r["grp"], []).append(r["h"])
    ref = _ref_sketch(data, k)
    assert {g: sorted(v) for g, v in got.items()} == ref


def test_small_group_sketch_is_exact_set(spark):
    data = [("a", i) for i in range(5)]
    got = sorted(
        r["h"] for r in kmv_sketch(_rows(spark, data), "grp", "v", 32).collect()
    )
    assert got == sorted(_h(i) for i in range(5))


def test_pair_overlap_matches_pure_python(spark):
    rng = random.Random(11)
    data = [("a", rng.randrange(3_000)) for _ in range(2_000)]
    data += [("b", rng.randrange(1_500, 4_500)) for _ in range(2_000)]
    data += [("c", rng.randrange(50_000, 60_000)) for _ in range(2_000)]
    k = 64
    sk = kmv_sketch(_rows(spark, data), "grp", "v", k)
    got = {
        (r["ga"], r["gb"]): (r["kmv_common"], r["kmv_kept"], r["kmv_kth_hash"])
        for r in kmv_pair_overlap(sk, k).collect()
    }
    ref_sk = _ref_sketch(data, k)
    expected = {}
    for ga, gb in [("a", "b"), ("a", "c"), ("b", "c")]:
        sa, sb = set(ref_sk[ga]), set(ref_sk[gb])
        kept = sorted(sa | sb)[:k]
        j = sum(1 for h in kept if h in sa and h in sb)
        expected[(ga, gb)] = (j, len(kept), kept[-1])
    assert got == expected


def test_estimates_land_near_exact(spark):
    # Known ground truth: |A| = |B| = 4000 distinct, overlap 2000.
    a_vals = range(6_000)
    b_vals = range(4_000, 10_000)
    data = [("a", v) for v in a_vals] + [("b", v) for v in b_vals]
    k = 256
    sk = kmv_sketch(_rows(spark, data), "grp", "v", k)
    row = kmv_pair_overlap(sk, k).collect()[0]
    est_union = (row["kmv_kept"] - 1) * 2**KMV_HASH_BITS / row["kmv_kth_hash"]
    est_inter = row["kmv_common"] / row["kmv_kept"] * est_union
    assert abs(est_union - 10_000) / 10_000 < 0.15
    assert abs(est_inter - 2_000) / 2_000 < 0.30


def test_k_validation(spark):
    with pytest.raises(ValueError):
        kmv_sketch(_rows(spark, [("a", 1)]), "grp", "v", 1)


def test_sketch_is_mergeable(spark):
    # bottom-k of the UNION of two groups' sketches == the sketch of
    # the concatenated rows — the stop-rescanning-history contract.
    rng = random.Random(23)
    day1 = [("u", rng.randrange(10_000)) for _ in range(1_500)]
    day2 = [("u", rng.randrange(5_000, 15_000)) for _ in range(1_500)]
    k = 48
    sk1 = _ref_sketch(day1, k)["u"]
    sk2 = _ref_sketch(day2, k)["u"]
    merged_from_sketches = sorted(set(sk1) | set(sk2))[:k]
    full = sorted(
        r["h"]
        for r in kmv_sketch(
            _rows(spark, day1 + day2), "grp", "v", k
        ).collect()
    )
    assert full == merged_from_sketches
