"""Distributed graph clustering for dedup pipelines.

Near-dup detection (Jaccard / MinHash-LSH / SimHash — ``dedup.py``)
produces PAIRS; an actual deduplicated corpus needs the transitive
closure of those pairs — A~B and B~C must collapse into ONE cluster even
when A and C were never compared. That closure is connected components,
and it is the step that turns "we found the duplicates" into "here is
the corpus with one survivor per duplicate cluster" (the standard
LLM-corpus dedup recipe: candidate pairs -> components -> keep
min-id doc per component).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    vertices: DataFrame | None = None,
    max_iter: int = 50,
) -> DataFrame:
    """Connected components by hash-min label propagation: every vertex
    repeatedly adopts the minimum label among itself and its neighbors
    until a fixpoint. Returns ``(id, component)`` where ``component`` is
    the MINIMUM vertex id in the component — a deterministic canonical
    representative, independent of partitioning and iteration order.

    ``vertices`` (optional, first column used) adds isolated vertices —
    docs with no near-dup pair become singleton components, which is
    what a dedup survivor-selection wants.

    Scale analysis: each iteration is ONE hash-partition shuffle (the
    ``groupBy(id).min`` — the edge join shuffles on the same key and AQE
    reuses/coalesces). Iterations needed = the largest component's
    diameter, and near-dup clusters are small and dense (diameter
    typically <= 3-4), so the loop runs ~3 rounds at any corpus size;
    the ``localCheckpoint(eager=True)`` per round truncates lineage so
    plan size stays O(1) across iterations instead of O(rounds)
    (the classic iterative-Spark failure mode). For adversarial
    long-path graphs (diameter ~ |V|) the right algorithm is
    large-star/small-star [Kiveris et al., "Connected Components in
    MapReduce and Beyond"], which converges in O(log^2 n) rounds with
    the same building blocks; hash-min is the right default for dedup
    graphs and converges to the identical fixpoint.

    The driver-side loop is control flow only — per round it moves one
    scalar (the changed-label count) to the driver, never data.
    """
    sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = sym.union(sym.select(F.col("v").alias("u"), F.col("u").alias("v")))
    verts = sym.select(F.col("u").alias("id"))
    if vertices is not None:
        verts = verts.union(
            vertices.select(F.col(vertices.columns[0]).alias("id"))
        )
    labels = (
        verts.distinct().select("id", F.col("id").alias("component"))
        .localCheckpoint(eager=True)
    )
    sym = sym.distinct().localCheckpoint(eager=True)
    for _ in range(max_iter):
        # neighbor labels flow along edges; a vertex keeps its own label
        # in the running via the union, then takes the min
        msgs = sym.join(labels, sym["u"] == labels["id"]).select(
            F.col("v").alias("id"), F.col("component")
        )
        new_labels = (
            labels.union(msgs)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.join(
                labels.withColumnRenamed("component", "old"), "id"
            )
            .filter(F.col("component") != F.col("old"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def dedup_survivors(
    edges: DataFrame,
    vertices: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    priority_col: str | None = None,
) -> DataFrame:
    """Survivor selection over a near-dup pair graph: every vertex with
    its component and whether it is the kept copy. Output:
    ``(id, component, is_survivor)``.

    Default rule: keep the component's minimum id (the same
    deterministic keep-lowest-id rule as ``cleaning.dedup_deterministic``).
    With ``priority_col`` (a numeric column of ``vertices``, e.g.
    document length or a quality score): keep the HIGHEST-priority
    member, id ascending on ties — "keep the best copy", the rule real
    corpus dedup wants. The per-component argmax is ONE hash aggregate
    via ``max(struct(priority, -id))`` (map-side combine; numeric ids
    required for the negation tiebreak) — no window, no sort.
    """
    comp = connected_components(edges, src=src, dst=dst, vertices=vertices)
    if priority_col is None:
        return comp.select(
            "id",
            "component",
            (F.col("id") == F.col("component")).alias("is_survivor"),
        )
    id_col = vertices.columns[0]
    verts = vertices.select(
        F.col(id_col).alias("id"), F.col(priority_col).alias("__prio")
    )
    labeled = comp.join(verts, "id")
    best = labeled.groupBy("component").agg(
        F.max(
            F.struct(F.col("__prio"), (-F.col("id")).alias("__negid"))
        ).alias("b")
    )
    best_ids = best.select(
        "component", (-F.col("b.__negid")).alias("__surv_id")
    )
    return labeled.join(best_ids, "component").select(
        "id",
        "component",
        (F.col("id") == F.col("__surv_id")).alias("is_survivor"),
    )
