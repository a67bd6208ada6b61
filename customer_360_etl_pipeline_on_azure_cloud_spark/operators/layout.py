"""Data-layout optimization: Z-order (Morton) clustering keys.

Multi-dimensional min/max file skipping is the highest-leverage scan
optimization after partition pruning: sorting 100 TB of parquet by a
Z-order key over (colA, colB) makes each file's min/max range tight in
BOTH dimensions, so a reader filtering on either column (or both) skips
most files — a linear sort on one column only skips for that column.

``zorder_key`` builds the Morton interleave as a pure JVM expression
tree (shift/and/or — whole-stage-codegen'd, no UDF); ``cluster_by_zorder``
range-partitions + sorts by it, which is exactly the write-side layout
Delta/Iceberg OPTIMIZE ZORDER produces.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def zorder_key(cols: Iterable[Column | str], bits: int = 8) -> Column:
    """Morton-interleave the low ``bits`` bits of each column into one
    BIGINT key. Columns must already be non-negative integers scaled to
    ``[0, 2^bits)`` (callers bucketize/normalize first — rank-based
    normalization keeps skewed columns uniform).

    The expression unrolls to ``bits * n_cols`` shift/mask/or terms —
    constant-folded and codegen'd by Catalyst; at 8 bits x 2 cols the
    whole key is ~32 JVM ops per row, no shuffle, no Python.
    """
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    n = len(cs)
    if n == 0:
        raise ValueError("zorder_key: need at least one column")
    if bits * n > 63:
        raise ValueError(f"zorder_key: {bits} bits x {n} cols overflows BIGINT")
    out = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cs):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            out = out.bitwiseOR(F.shiftleft(bit, i * n + j))
    return out


def zorder_key_sql(cols: Iterable[str], bits: int = 8) -> str:
    """The identical interleave as ANSI SQL (oracle twin / pushdown into
    engines that lack a native zorder). Kept in lockstep with
    :func:`zorder_key`."""
    cs = list(cols)
    n = len(cs)
    terms = []
    for i in range(bits):
        for j, c in enumerate(cs):
            terms.append(f"((({c} >> {i}) & 1) << {i * n + j})")
    return " | ".join(terms)


def cluster_by_zorder(
    df: DataFrame,
    cols: Iterable[Column | str],
    bits: int = 8,
    num_partitions: int | None = None,
) -> DataFrame:
    """Layout rewrite before a write: range-partition on the Z-key (so
    files hold contiguous Z-ranges -> tight per-file min/max on every
    interleaved dimension) and sort within partitions. Downstream:
    ``.write.parquet(...)`` — parquet row-group stats then give readers
    multi-column skipping for free."""
    key = zorder_key(cols, bits).alias("__zkey")
    out = df.withColumn("__zkey", key)
    if num_partitions:
        out = out.repartitionByRange(num_partitions, "__zkey")
    else:
        out = out.repartitionByRange("__zkey")
    return out.sortWithinPartitions("__zkey").drop("__zkey")


def linear_file_bounds(
    df: DataFrame, cols: list[str], n_files: int
) -> DataFrame:
    """Per-file min/max column bounds of an ``n_files``-file clustered
    write sorted lexicographically by ``cols`` — computed WITHOUT a
    global sort of the fact table (the naive ``ntile`` formulation
    funnels 100 TB through one sorted partition; this never touches
    more than the key-domain aggregate).

    How: aggregate row counts per distinct key tuple (domain-sized,
    not fact-sized), cumulative-sum ranks over the sorted key domain,
    map each key's rank interval ``[start, end)`` to the file span
    ``[floor(start * n_files / total), floor((end-1) * n_files /
    total)]`` it would occupy in the sorted write, explode the span,
    min/max per file.  When ``n_files`` exceeds the row count some
    file ids receive NO rows (``floor(r * n_files / total)`` skips
    them); the span explode would still emit those ids, so the explode
    is followed by a keep-only-nonempty filter: file ``f`` is real iff
    ``ceil(f * total / n_files) < ceil((f+1) * total / n_files)``
    (its rank interval is non-empty) — a no-op whenever
    ``total >= n_files``.  Equal keys may straddle a file boundary, but
    bounds depend only on the sorted key MULTISET, so the result is
    deterministic and exactly SQL-replayable.  The one unpartitioned
    window runs over the key-domain aggregate — callers guarantee the
    domain is bounded (bucketized/low-cardinality keys), which is
    already the precondition for min/max skipping to be useful.

    Returns ``(file_id, <col>_min, <col>_max ... , n_keys)``.
    """
    if n_files < 1:
        raise ValueError(f"n_files must be >= 1, got {n_files}")
    keyed = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("n"))
    w = (
        Window.orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = keyed.withColumn("end_rank", F.sum("n").over(w)).withColumn(
        "start_rank", F.col("end_rank") - F.col("n")
    )
    total = keyed.agg(F.sum("n").alias("total"))
    spans = (
        cum.crossJoin(F.broadcast(total))
        .withColumn(
            "fs", F.expr(f"(start_rank * {n_files}) div total")
        )
        .withColumn(
            "fe", F.expr(f"((end_rank - 1) * {n_files}) div total")
        )
        .select(
            *cols,
            F.col("total"),
            F.explode(F.sequence("fs", "fe")).alias("file_id"),
        )
        .where(
            F.expr(
                f"(file_id * total + {n_files} - 1) div {n_files}"
                f" < ((file_id + 1) * total + {n_files} - 1) div {n_files}"
            )
        )
        .drop("total")
    )
    aggs = []
    for c in cols:
        aggs.append(F.min(c).alias(f"{c}_min"))
        aggs.append(F.max(c).alias(f"{c}_max"))
    aggs.append(F.count(F.lit(1)).alias("n_keys"))
    return spans.groupBy("file_id").agg(*aggs)
