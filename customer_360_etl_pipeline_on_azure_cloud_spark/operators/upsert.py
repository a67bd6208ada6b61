"""Warehouse maintenance: MERGE-style upsert and snapshot diff (CDC).

Completes the maintenance family (scd.py keeps history, incremental.py
merges aggregate state): ``merge_upsert`` is the MERGE INTO WHEN MATCHED
UPDATE / WHEN NOT MATCHED INSERT with whole-row update semantics;
``snapshot_diff`` derives a change-data feed (insert/update/delete rows)
from two snapshots — what table-format CDF readers emit, computed with
one co-partitioned full-outer join.

Both are pure joins on the entity key: one shuffle pair, no windows, no
driver state. At 100 TB the update set is normally tiny relative to the
target — Catalyst/AQE broadcasts it and the target never shuffles
(plan-test pinned for the contract query).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame, updates: DataFrame, keys: Iterable[str]
) -> DataFrame:
    """MERGE with whole-row semantics: update rows replace matching
    target rows, unmatched update rows insert. ``updates`` must carry
    the full target schema, and must hold at most one row per key
    (enforce upstream with dedup_deterministic — a duplicate-key update
    is ambiguous and this operator will happily emit both).

    Anti-join + union: the target side is a single LeftAnti hash join
    (broadcast when updates are small), then the updates append
    unchanged — no row comparison, no window.
    """
    keys = list(keys)
    kept = target.join(updates.select(*keys), keys, "left_anti")
    return kept.unionByName(updates)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Iterable[str],
    compare_cols: Iterable[str] | None = None,
) -> DataFrame:
    """Change-data feed between two snapshots: one row per changed key
    with ``change_type`` in ('insert', 'delete', 'update') and the NEW
    attribute values (OLD values for deletes).

    One full-outer join on the key; change classification is null-safe
    column comparison (NULL -> NULL is unchanged). Unchanged keys are
    filtered out, so the output is the (small) change set, not the
    snapshot.
    """
    keys = list(keys)
    cols = list(compare_cols) if compare_cols is not None else [
        c for c in old.columns if c not in keys
    ]
    # presence markers are explicit (robust to all-NULL attribute rows)
    o = old.select(
        *keys, F.lit(True).alias("__in_old"),
        *[F.col(c).alias(f"__o_{c}") for c in cols],
    )
    n = new.select(
        *keys, F.lit(True).alias("__in_new"),
        *[F.col(c).alias(f"__n_{c}") for c in cols],
    )
    j = o.join(n, keys, "full_outer")
    same = F.lit(True)
    for c in cols:
        same = same & F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("insert"))
        .when(F.col("__in_new").isNull(), F.lit("delete"))
        .when(~same, F.lit("update"))
    )
    out_cols = [
        F.coalesce(F.col(f"__n_{c}"), F.col(f"__o_{c}")).alias(c) for c in cols
    ]
    return (
        j.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(*keys, *out_cols, "change_type")
    )
