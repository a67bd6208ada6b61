"""Sinks (SURVEY.md §2.1 S9-S10).

The reference writes its ≤250-row result through one JDBC connection with
``mode("overwrite")`` (reference ETL_pipeline.py:198-211). The engine's
JDBC sink exposes the knobs that matter when the result is NOT tiny:
``numPartitions`` (parallel connections), ``batchsize`` (rows per INSERT
batch), and ``truncate`` (TRUNCATE instead of DROP+CREATE on overwrite,
preserving indexes/grants).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    user: str,
    password: str,
    driver: str = "com.microsoft.sqlserver.jdbc.SQLServerDriver",
    mode: str = "overwrite",
    batchsize: int = 10000,
    num_partitions: int | None = None,
    truncate: bool = True,
) -> None:
    writer = (
        df.write.format("jdbc")
        .mode(mode)
        .option("url", url)
        .option("dbtable", table)
        .option("user", user)
        .option("password", password)
        .option("driver", driver)
        .option("batchsize", str(batchsize))
        .option("truncate", str(truncate).lower())
    )
    if num_partitions is not None:
        writer = writer.option("numPartitions", str(num_partitions))
    writer.save()


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """CSV sink — the README-claimed output format (reference README.md:54)."""
    df.write.mode(mode).option("header", True).csv(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Parquet sink with optional Hive partitioning — the layout the
    engine prefers for 100 TB fact data (partition pruning on read)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """ORC sink — same columnar/pushdown properties as parquet for
    warehouses standardized on ORC (Hive-lineage stacks). Interop only;
    parquet stays the engine-preferred layout."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def overwrite_partitions(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    file_format: str = "parquet",
) -> None:
    """Idempotent daily reload: overwrite ONLY the partitions present
    in ``df``, leaving every other partition untouched — the write mode
    a day-keyed 100 TB fact table actually needs.  Spark's default
    (``partitionOverwriteMode=static``) TRUNCATES THE ENTIRE TABLE on
    ``mode("overwrite")`` with ``partitionBy``; re-running one day's
    load under it silently deletes all history.  Dynamic mode rewrites
    exactly the partitions the batch contains, so the daily job is
    safe to re-run (same-batch replay produces byte-identical state).

    The conf flip is scoped: the session's prior
    ``spark.sql.sources.partitionOverwriteMode`` is restored afterward
    (other writers in the session keep their expected semantics).
    """
    spark = df.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    prior = spark.conf.get(key, "static")
    spark.conf.set(key, "dynamic")
    try:
        (
            df.write.mode("overwrite")
            .partitionBy(*partition_by)
            .format(file_format)
            .save(path)
        )
    finally:
        spark.conf.set(key, prior)
