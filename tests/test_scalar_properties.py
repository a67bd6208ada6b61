"""Property-based tests (hypothesis) for the scalar expression library:
the Spark column expressions must agree with a plain-Python reference
implementation on arbitrary inputs — including the edge cases random
data finds that hand-written fixtures miss."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from customer_360_etl_pipeline_on_azure_cloud_spark.functions.scalar import (
    argmax_label,
    bucketize,
    conditional_concat,
    recode,
)

LABELS = ["A", "B", "C", "D"]


def py_argmax(values):
    top = max(values)
    for v, label in zip(values, LABELS):
        if v == top:
            return label


def py_taste(values):
    return "-".join(l for v, l in zip(values, LABELS) if v != 0)


def py_bucket(n):
    for lo, hi, label in [(1, 7, "vl"), (8, 14, "lo"), (15, 21, "mid")]:
        if lo <= n <= hi:
            return label
    return "error"


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 50),
            st.integers(0, 50),
            st.integers(0, 50),
            st.integers(0, 50),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_argmax_and_taste_match_python_reference(spark, rows):
    df = spark.createDataFrame(rows, LABELS)
    out = df.select(
        argmax_label([(c, c) for c in LABELS]).alias("am"),
        conditional_concat("-", [(c, c) for c in LABELS]).alias("taste"),
    ).collect()
    for (a, b, c, d), r in zip(rows, out):
        assert r["am"] == py_argmax((a, b, c, d))
        assert r["taste"] == py_taste((a, b, c, d))


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(-5, 30), min_size=1, max_size=30))
def test_bucketize_matches_python_reference(spark, ns):
    df = spark.createDataFrame([(n,) for n in ns], ["n"])
    out = df.select(
        bucketize("n", [(1, 7, "vl"), (8, 14, "lo"), (15, 21, "mid")]).alias("b")
    ).collect()
    for n, r in zip(ns, out):
        assert r["b"] == py_bucket(n)


@settings(max_examples=15, deadline=None)
@given(st.lists(st.sampled_from(["x", "y", "z", "unknown1", "unknown2"]), min_size=1, max_size=20))
def test_recode_matches_python_reference(spark, vals):
    mapping = {"x": "EX", "y": "WHY", "z": "ZED"}
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    out = df.select(recode("v", mapping).alias("r")).collect()
    for v, r in zip(vals, out):
        assert r["r"] == mapping.get(v, "error")


def py_pack(tokens, budget):
    """Reference greedy packer."""
    out, cum, pack = [], None, 0
    for t in tokens:
        if cum is None:
            cum = t
        elif cum + t <= budget:
            cum += t
        else:
            pack += 1
            cum = t
        out.append(pack)
    return out


@settings(max_examples=15, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=700), min_size=1, max_size=40),
    st.integers(min_value=1, max_value=600),
)
def test_pack_sequences_matches_reference_walk(spark, tokens, budget):
    from customer_360_etl_pipeline_on_azure_cloud_spark.operators.packing import (
        pack_sequences,
    )

    df = spark.createDataFrame(
        [("g", i, t) for i, t in enumerate(tokens)], ["grp", "ord", "tok"]
    )
    got = {
        r["ord"]: r["pack_id"]
        for r in pack_sequences(df, "grp", "ord", "tok", budget=budget).collect()
    }
    want = dict(enumerate(py_pack(tokens, budget)))
    assert got == want
    # invariants: pack ids start at 0, are contiguous, and no pack
    # exceeds the budget unless it holds a single oversize row
    by_pack: dict[int, list[int]] = {}
    for i, p in got.items():
        by_pack.setdefault(p, []).append(tokens[i])
    assert sorted(by_pack) == list(range(len(by_pack)))
    for members in by_pack.values():
        assert sum(members) <= budget or len(members) == 1
