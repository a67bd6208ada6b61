"""Set operators (SURVEY.md §2.7 U1)."""

from __future__ import annotations

from collections.abc import Iterable
from functools import reduce

from pyspark.sql import DataFrame


def union_by_name_all(
    dfs: Iterable[DataFrame], allow_missing_columns: bool = False
) -> DataFrame:
    """Union any number of DataFrames by column name.

    Replaces the reference's incremental union loop that re-``cache()``s
    the growing plan every iteration (reference ETL_pipeline.py:256-260,
    322-326; SURVEY.md §0.1). A union is purely logical — zero shuffle —
    so there is nothing to cache; when the inputs are files, prefer a
    single multi-path read (sources.read_json_daily) which collapses the
    union into one scan node.
    """
    dfs = list(dfs)
    if not dfs:
        raise ValueError("union_by_name_all: empty input")
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=allow_missing_columns),
        dfs,
    )
