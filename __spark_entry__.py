"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All implementations live in the ``customer_360_etl_pipeline_on_azure_cloud_spark``
package; this module is the thin contract layer.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from customer_360_etl_pipeline_on_azure_cloud_spark.testdata_queries import (  # noqa: E402
    CORE_QUERIES,
    q_supplier_360,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    supplier_360 exercises the reference's full interaction-pipeline
    shape: scan -> exact-money pivot with declared values -> argmax ->
    conditional concat -> distinct-count -> two-pass quantile
    segmentation -> broadcast dim join (SURVEY.md §3.1).
    """
    return q_supplier_360(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: fn for name, (fn, _sql) in CORE_QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted entries get
    a weaker rows-only check)."""
    return {
        name: sql for name, (_fn, sql) in CORE_QUERIES.items() if sql is not None
    }
