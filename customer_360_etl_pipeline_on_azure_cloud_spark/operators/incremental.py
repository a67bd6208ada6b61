"""Incremental (delta-maintained) aggregation: algebraic partial states
that merge without reprocessing history.

A 100 TB warehouse never recomputes a daily rollup from scratch — it
keeps per-partition *aggregate state* and folds each new batch in. That
works exactly when every measure is algebraic: the merge of two states
is the same aggregate applied to the states (sum->sum, count->sum,
min->min, max->max; avg is carried as (sum, count) and finalized at read
time). This module makes the state table explicit:

* :func:`partial_aggregate` — collapse one batch to its state table.
* :func:`merge_partials` — fold any number of state tables into one
  (union + one hash aggregate; map-side partial aggregation applies, so
  merging N daily states shuffles only the state rows, never raw data).
* :func:`finalize` — derive non-algebraic outputs (avg) from the state.

Spark's own partial aggregation does this *within* one job; these
operators persist the same algebra *across* jobs/batches — the
incremental-ETL pattern the reference's daily pipeline implies
(reference ETL_pipeline.py reprocesses the full input each run; this is
the scale-correct replacement).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: measure kind -> (batch aggregator, state merger)
_KINDS = {
    "sum": (F.sum, F.sum),
    "count": (lambda c: F.count(c), F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}

MeasureSpec = dict[str, tuple[str, str]]  # out_col -> (kind, in_col)


def _check(measures: MeasureSpec) -> None:
    for out, (kind, _col) in measures.items():
        if kind not in _KINDS:
            raise ValueError(
                f"measure {out!r}: kind {kind!r} is not algebraic-mergeable "
                f"(supported: {sorted(_KINDS)}); carry avg as sum+count and "
                "use finalize()"
            )


def partial_aggregate(
    df: DataFrame, keys: Iterable[str], measures: MeasureSpec
) -> DataFrame:
    """Collapse one batch into its aggregate-state table (one row per
    key). COUNT state is stored as BIGINT so it merges with SUM."""
    _check(measures)
    aggs = []
    for out, (kind, col) in measures.items():
        batch_fn, _ = _KINDS[kind]
        expr = batch_fn(col)
        if kind == "count":
            expr = expr.cast("long")
        aggs.append(expr.alias(out))
    return df.groupBy(*keys).agg(*aggs)


def merge_partials(
    states: Iterable[DataFrame], keys: Iterable[str], measures: MeasureSpec
) -> DataFrame:
    """Fold state tables into one: union + a single hash aggregate using
    each measure's merge function. Associative and commutative, so any
    batch arrival order produces the identical state."""
    _check(measures)
    states = list(states)
    if not states:
        raise ValueError("merge_partials: need at least one state table")
    unioned = states[0]
    for s in states[1:]:
        unioned = unioned.unionByName(s)
    aggs = []
    for out, (kind, _col) in measures.items():
        _, merge_fn = _KINDS[kind]
        aggs.append(merge_fn(out).alias(out))
    return unioned.groupBy(*keys).agg(*aggs)


def finalize(
    state: DataFrame, derived: dict[str, tuple[str, str]]
) -> DataFrame:
    """Attach read-time derived measures: ``out -> (sum_col, count_col)``
    computes ``sum/count`` as DOUBLE (the only non-algebraic measure the
    state algebra needs)."""
    out = state
    for name, (sum_col, cnt_col) in derived.items():
        out = out.withColumn(
            name,
            F.col(sum_col).cast("double") / F.col(cnt_col).cast("double"),
        )
    return out
