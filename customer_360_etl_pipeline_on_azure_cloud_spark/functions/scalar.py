"""Scalar expression library (SURVEY.md §2.8 F1-F10, generalized).

Every function here returns a ``pyspark.sql.Column`` built purely from
built-in expressions — no Python UDFs — so plans containing them stay
inside whole-stage codegen (the reference's entire scalar surface is
UDF-free too, SURVEY.md §2.11).
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def recode(col: Column | str, mapping: Mapping[str, str], default: str | None = "error") -> Column:
    """CASE-chain recode of a categorical column.

    Generalizes the reference's AppName -> viewing-category chain
    (reference ETL_pipeline.py:63-76). ``default`` mirrors its
    ``otherwise('error')`` sentinel; pass ``None`` to yield NULL for
    unmapped values instead.
    """
    col = _col(col)
    expr: Column | None = None
    for value, label in mapping.items():
        cond = col == value
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    if expr is None:
        return F.lit(default)
    return expr.otherwise(F.lit(default)) if default is not None else expr


def bucketize(
    col: Column | str,
    buckets: Iterable[tuple[float, float, str]],
    default: str | None = "error",
) -> Column:
    """Label a numeric column by inclusive [lo, hi] ranges.

    Generalizes the reference's Days_Active -> Activeness bucketing
    (reference ETL_pipeline.py:50-58).
    """
    col = _col(col)
    expr: Column | None = None
    for lo, hi, label in buckets:
        cond = col.between(lo, hi)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    assert expr is not None, "bucketize requires at least one bucket"
    return expr.otherwise(F.lit(default)) if default is not None else expr


def argmax_label(pairs: Iterable[tuple[Column | str, str]]) -> Column:
    """Label of the row-wise maximum among several columns; ties resolve
    to the first listed pair (fixed order).

    Exactly the reference's MostWatch semantics
    (reference ETL_pipeline.py:88-96): ``when(col == greatest(*all),
    label)`` checked in declaration order.
    """
    pairs = [( _col(c), label) for c, label in pairs]
    top = F.greatest(*[c for c, _ in pairs]) if len(pairs) > 1 else pairs[0][0]
    expr: Column | None = None
    for c, label in pairs:
        cond = c == top
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    assert expr is not None
    return expr


def conditional_concat(
    sep: str,
    pairs: Iterable[tuple[Column | str, str]],
    predicate=None,
) -> Column:
    """``concat_ws`` of labels whose column passes ``predicate``
    (default: ``!= 0``); failing parts become NULL and are *skipped* by
    concat_ws — that null-dropping is load-bearing, exactly as in the
    reference's CustomerTaste (reference ETL_pipeline.py:98-107).
    """
    if predicate is None:
        predicate = lambda c: c != 0  # noqa: E731
    parts = [F.when(predicate(_col(c)), F.lit(label)) for c, label in pairs]
    return F.concat_ws(sep, *parts)


def row_sum(*cols: Column | str) -> Column:
    """Row-wise sum of columns (reference ETL_pipeline.py:112)."""
    out = _col(cols[0])
    for c in cols[1:]:
        out = out + _col(c)
    return out


def money_cents(col: Column | str) -> Column:
    """Exact-money bridge: double price -> integer cents (BIGINT).

    Floating-point sums are order-dependent, so a distributed SUM(double)
    is not reproducible across partitionings (nor across engines — our
    DuckDB oracles would drift in the last ulp). Converting to integer
    cents *before* aggregating makes every money aggregate exact,
    associative, and bit-identical at any scale. The double->cents
    rounding itself is deterministic per row.
    """
    return F.round(_col(col) * 100, 0).cast("long")
