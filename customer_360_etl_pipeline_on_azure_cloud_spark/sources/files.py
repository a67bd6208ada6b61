"""File sources: date-ranged daily files/folders, dimension CSVs.

Covers SURVEY.md §2.1 S2-S8. The reference discovers daily files with
driver-side ``dbutils.fs.ls`` loops, reads them one at a time, and folds
them with ``unionByName`` + ``cache`` per iteration (reference
ETL_pipeline.py:22-36,249-260,305-326). That is O(days) schema-inference
jobs and a linearly deepening plan. Here discovery still happens on the
driver (it is metadata), but the *read* is a single multi-path scan with a
declared schema — one job, one relation, full predicate/column pushdown.

At 100 TB the preferred layout is Hive-partitioned (``date=YYYY-MM-DD/``)
so partition pruning replaces name filtering entirely; these helpers exist
for the reference's legacy flat `YYYYMMDD.json` layout.
"""

from __future__ import annotations

import os
import re
from datetime import datetime

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def paths_in_date_range(
    path: str,
    start_date: int,
    end_date: int,
    suffix: str = "",
) -> list[str]:
    """List direct children of ``path`` whose basename starts with a
    ``YYYYMMDD`` date within [start_date, end_date].

    Replaces the reference's dbutils listing loops
    (reference ETL_pipeline.py:22-29 for `*.json` files, :305-306 for
    day-named parquet folders) with a portable, sorted, suffix-filtered
    version. Driver-side by design: this is metadata, not data.
    """
    out: list[str] = []
    for name in sorted(os.listdir(path)):
        if suffix and not name.endswith(suffix):
            continue
        m = re.match(r"^(\d{8})", name)
        if not m:
            continue
        if start_date <= int(m.group(1)) <= end_date:
            out.append(os.path.join(path, name))
    return out


def date_from_filename(pattern: str = r"(\d{8})") -> Column:
    """Column expression deriving a DateType from the file name.

    Replaces the reference's per-file driver loop that parses the name
    with ``datetime.strptime`` and injects it as a literal
    (reference ETL_pipeline.py:37-39,255). A single expression keeps the
    multi-path read intact (no per-file plans) and stays codegen-friendly.
    """
    return F.to_date(
        F.regexp_extract(F.input_file_name(), pattern, 1), "yyyyMMdd"
    )


def read_json_daily(
    spark: SparkSession,
    path: str,
    start_date: int,
    end_date: int,
    schema: T.StructType | None = None,
    flatten_struct: str | None = None,
    date_col: str = "Date",
    corrupt_col: str | None = None,
) -> DataFrame:
    """Read a date range of daily ``YYYYMMDD.json`` files as ONE scan.

    Replaces the reference's read-union-cache loop
    (reference ETL_pipeline.py:249-260): one ``spark.read.json(paths)``
    call, optional `_source`-style struct flatten, and a filename-derived
    date column.

    ``corrupt_col`` opts into malformed-record ROUTING (the reference —
    and Spark's default PERMISSIVE mode — silently nulls bad records):
    the raw text of any unparseable line is captured in that column so
    the caller can split clean rows from a quarantine set instead of
    silently ingesting nulls or failing a 100 TB load on one bad line.
    Requires an explicit ``schema`` (Spark drops the corrupt column
    during schema inference).
    """
    paths = paths_in_date_range(path, start_date, end_date, suffix=".json")
    if not paths:
        raise FileNotFoundError(
            f"no .json files in {path} for [{start_date}, {end_date}]"
        )
    reader = spark.read
    if corrupt_col is not None:
        if schema is None:
            raise ValueError(
                "corrupt_col requires an explicit schema (inference drops "
                "the corrupt-record column)"
            )
        schema = T.StructType(
            list(schema.fields)
            + [T.StructField(corrupt_col, T.StringType())]
        )
        reader = reader.option("mode", "PERMISSIVE").option(
            "columnNameOfCorruptRecord", corrupt_col
        )
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.json(paths)
    df = df.withColumn(date_col, date_from_filename(r"(\d{8})\.json$"))
    if flatten_struct:
        cols = [f"{flatten_struct}.*", date_col]
        if corrupt_col is not None:
            cols.append(corrupt_col)
        df = df.select(*cols)
    return df


def read_parquet_daily(
    spark: SparkSession,
    path: str,
    start_date: int,
    end_date: int,
) -> DataFrame:
    """Read a date range of daily ``YYYYMMDD/`` parquet folders as ONE scan
    (replaces reference ETL_pipeline.py:312-326 loop)."""
    paths = paths_in_date_range(path, start_date, end_date)
    if not paths:
        raise FileNotFoundError(
            f"no day folders in {path} for [{start_date}, {end_date}]"
        )
    return spark.read.parquet(*paths)


def read_csv_dim(
    spark: SparkSession,
    path: str,
    key: str,
    schema: T.StructType | None = None,
    deterministic: bool = True,
) -> DataFrame:
    """Read a dimension CSV and deduplicate on its natural key.

    The reference uses ``dropDuplicates(["search"])`` whose surviving row
    is arbitrary (reference ETL_pipeline.py:302). With
    ``deterministic=True`` the survivor is the row that sorts first on the
    remaining columns — stable across runs and partitionings.
    """
    reader = spark.read.option("header", True)
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.csv(path)
    if not deterministic:
        return df.dropDuplicates([key])
    from ..operators.cleaning import dedup_deterministic

    others = [c for c in df.columns if c != key]
    return dedup_deterministic(df, [key], order_by=others or [key])


def _parse_yyyymmdd(s: str):
    return datetime.strptime(s, "%Y%m%d").date()
