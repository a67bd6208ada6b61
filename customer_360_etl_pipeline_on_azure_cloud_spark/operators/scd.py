"""Slowly-changing-dimension (SCD Type 2) history construction.

The reference is a Customer-360 ETL pipeline (ETL_pipeline.py builds a
point-in-time customer snapshot); a production warehouse around it keeps
the *history* of attribute changes. ``scd2_collapse`` turns an ordered
change/event log into validity intervals: consecutive rows whose tracked
attributes are unchanged collapse into one version with
``[valid_from, valid_to)`` bounds and an ``is_current`` flag.

Construction (pure window algebra — no Python rows, no iteration):

1. ``lag(attrs) over (partition by key order by ts, id)`` marks rows
   where any tracked attribute differs from the previous row (the
   "island" starts of the classic gaps-and-islands pattern).
2. A running SUM of the change markers over the same window numbers the
   islands (``version``).
3. One aggregate per (key, version) takes ``min(ts) -> valid_from`` plus
   the (constant-within-island) attributes.
4. ``lead(valid_from)`` over (key, version-order) closes each interval;
   the open tail gets NULL ``valid_to`` and ``is_current = true``.

Physical shape: ONE shuffle on the entity key — steps 1, 2 and 4 share
the same partitioning (Catalyst reuses the exchange; the step-3 hash
aggregate on (key, version) is partial-agg'd map-side and its shuffle is
on a superset key, which AQE coalesces locally). At 100 TB this is the
only correct shape: all history for one entity is colocated once, and
nothing ever materializes driver-side.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_collapse(
    df: DataFrame,
    key_cols: Iterable[str],
    attr_cols: Iterable[str],
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Collapse an ordered attribute log into SCD2 validity intervals.

    ``tiebreak_col`` must make (ts_col, tiebreak_col) a total order per
    key — same-timestamp rows would otherwise make version numbering
    nondeterministic. NULL attribute values are treated as a value
    (NULL -> NULL is "no change"): change detection uses null-safe
    equality (``<=>``), matching warehouse MERGE semantics.

    Returns one row per (key, version): key cols, attr cols,
    ``version`` (1-based BIGINT), ``valid_from``, ``valid_to`` (NULL =
    open), ``is_current``.
    """
    keys = list(key_cols)
    attrs = list(attr_cols)
    w = Window.partitionBy(*keys).orderBy(ts_col, tiebreak_col)

    changed = F.lit(False)
    for a in attrs:
        changed = changed | ~F.col(a).eqNullSafe(F.lag(a).over(w))
    # first row per key: lag is NULL -> eqNullSafe(False-ish) handled by
    # row_number check instead of relying on NULL semantics
    is_start = F.when(F.row_number().over(w) == 1, F.lit(1)).otherwise(
        changed.cast("int")
    )

    marked = df.withColumn("__start", is_start)
    versioned = marked.withColumn(
        "version",
        F.sum("__start")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
    )

    per_version = versioned.groupBy(*keys, "version").agg(
        F.min(ts_col).alias("valid_from"),
        *[F.first(a).alias(a) for a in attrs],
    )

    wv = Window.partitionBy(*keys).orderBy("version")
    closed = per_version.withColumn("valid_to", F.lead("valid_from").over(wv))
    return closed.select(
        *keys,
        *attrs,
        "version",
        "valid_from",
        "valid_to",
        F.col("valid_to").isNull().alias("is_current"),
    )


def scd2_point_in_time(
    history: DataFrame, ts: Column | str, keys: Iterable[str] | None = None
) -> DataFrame:
    """Snapshot an SCD2 history at time ``ts``: the version whose
    ``[valid_from, valid_to)`` interval contains ``ts``. A plain filter
    (no join, no window) — partition pruning applies if the history is
    stored partitioned by valid_from date."""
    t = F.lit(ts) if isinstance(ts, str) else ts
    return history.filter(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    )
