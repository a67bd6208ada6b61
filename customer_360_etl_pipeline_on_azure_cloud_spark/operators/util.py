"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition a DataFrame up to cluster parallelism when its input
    has too few partitions.

    Small-file inputs (one parquet file under maxPartitionBytes) arrive
    as a SINGLE partition, which serializes every downstream CPU-bound
    narrow map onto one core — measured 30x slowdowns for the
    shingling/hashing operators. At 100 TB inputs are naturally
    many-partitioned and this is a no-op (the guard avoids gratuitous
    shuffles); the repartition only fires for pathological small inputs.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
