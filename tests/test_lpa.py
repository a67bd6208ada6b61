"""Synchronous label propagation (operators/graph.py label_propagation)."""

from __future__ import annotations

import random
from collections import Counter

import pytest

from customer_360_etl_pipeline_on_azure_cloud_spark.operators.graph import (
    label_propagation,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "id_a long, id_b long")


def _lpa_ref(pairs, rounds):
    """Pure-Python third implementation: synchronous rounds, neighbor
    majority, ties -> smallest label."""
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    labels = {v: v for v in adj}
    for _ in range(rounds):
        new = {}
        for v, ns in adj.items():
            cnt = Counter(labels[u] for u in ns)
            best = max(cnt.values())
            new[v] = min(l for l, c in cnt.items() if c == best)
        labels = new
    return labels


def test_clique_converges_to_one_label(spark):
    clique = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    got = {
        r["id"]: r["label"]
        for r in label_propagation(_edges(spark, clique), rounds=4).collect()
    }
    assert got == _lpa_ref(clique, 4)
    assert len(set(got.values())) == 1


def test_bridged_cliques_stay_separate(spark):
    # Two K4s joined by ONE bridge edge: connected components would
    # merge them; LPA keeps each clique with its own majority label.
    c1 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    c2 = [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    bridge = [(3, 10)]
    pairs = c1 + c2 + bridge
    got = {
        r["id"]: r["label"]
        for r in label_propagation(_edges(spark, pairs), rounds=6).collect()
    }
    assert got == _lpa_ref(pairs, 6)
    left = {got[v] for v in range(4)}
    right = {got[v] for v in range(10, 14)}
    assert len(left) == 1 and len(right) == 1 and left != right


@pytest.mark.parametrize("seed", [0, 1])
def test_matches_reference_on_random_graphs(spark, seed):
    rng = random.Random(seed)
    n = 30
    pairs = sorted(
        {
            (a, b)
            for _ in range(60)
            for a, b in [sorted(rng.sample(range(n), 2))]
        }
    )
    for rounds in (1, 3, 5):
        got = {
            r["id"]: r["label"]
            for r in label_propagation(
                _edges(spark, pairs), rounds=rounds
            ).collect()
        }
        assert got == _lpa_ref(pairs, rounds), f"rounds={rounds}"


def test_rounds_validation(spark):
    with pytest.raises(ValueError):
        label_propagation(_edges(spark, [(1, 2)]), rounds=0)


def test_oscillating_graph_is_still_deterministic(spark):
    # A 4-cycle (bipartite) can oscillate under synchronous LPA; the
    # operator's contract is "exact result for the given round count",
    # so equal rounds must give equal labels across partitionings and
    # must match the reference at every round count.
    cyc = [(0, 1), (1, 2), (2, 3), (0, 3)]
    for rounds in (1, 2, 3, 4):
        a = {
            r["id"]: r["label"]
            for r in label_propagation(
                _edges(spark, cyc), rounds=rounds
            ).collect()
        }
        b = {
            r["id"]: r["label"]
            for r in label_propagation(
                _edges(spark, cyc).repartition(7), rounds=rounds
            ).collect()
        }
        assert a == b == _lpa_ref(cyc, rounds), f"rounds={rounds}"
