"""Loaders for the driver testdata star schema (TESTDATA.md)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import TESTDATA_TABLES


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table; parquet scans get column pruning and
    predicate pushdown for free once the plan narrows them.

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark has no native
    type for; with ``spark.sql.legacy.parquet.nanosAsLong`` it arrives as
    long nanoseconds and is converted here to a microsecond timestamp
    (same truncation DuckDB applies when casting ns -> its us-precision
    timestamps, so both engines see identical instants).
    """
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}
