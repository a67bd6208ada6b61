"""SparkSession construction and per-session tuning.

The reference relies on a Databricks-provided session and ``dbutils``
mounts (reference ETL_pipeline.py:10-19). This engine builds portable
sessions: plain local paths for tests, ``abfss://`` / ``s3a://`` URIs with
``spark.conf`` credentials on a real cluster.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

#: Configs that are safe (and desirable) to apply to an existing session at
#: runtime. Everything here is a runtime-settable SQL conf.
RUNTIME_CONF: dict[str, str] = {
    # AQE re-plans at runtime: coalesces tiny shuffle partitions, converts
    # sort-merge joins to broadcast when a side turns out small, and splits
    # skewed partitions — all critical at 100 TB where static planning on
    # stale stats picks wrong strategies.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Deterministic calendar arithmetic regardless of host timezone.
    "spark.sql.session.timeZone": "UTC",
    # Parquet TIMESTAMP(NANOS) is not a Spark-native type; read it as
    # long nanoseconds (sources.tables converts back to timestamp).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Spark 4.1 infers tz-less parquet timestamps as TIMESTAMP_NTZ, which
    # unix_micros()/withWatermark() reject; keep scans (including streaming
    # schema inference) on plain TIMESTAMP. sources.tables.load_table also
    # casts defensively in case the driver owns a session without this conf.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    # Arrow transfer for the few Pandas-UDF operators (SimHash, media).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


#: Opt-in streaming state-store config (VERDICT r4 item 4): RocksDB keeps
#: streaming state off-heap and on local disk instead of the default
#: HDFS-backed in-memory provider — the standard choice for large or
#: long-lived state (stream-stream joins, sessionization) where state no
#: longer fits executor heap. Runtime-settable; pass
#: ``use_rocksdb_state=True`` to :func:`tune`/:func:`get_spark`, or set
#: the conf on an existing session before starting the stream.
ROCKSDB_STATE_CONF: dict[str, str] = {
    "spark.sql.streaming.stateStore.providerClass": (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    ),
    # changelog checkpointing ships per-batch deltas instead of full
    # SST snapshots — the recommended pairing for RocksDB state.
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": (
        "true"
    ),
}


def tune(
    spark: SparkSession,
    shuffle_partitions: int | None = None,
    use_rocksdb_state: bool = False,
) -> SparkSession:
    """Apply runtime tuning to an existing session (idempotent).

    Used by every ``queries()`` entry because the driver owns the session:
    we cannot rely on builder-time config, only runtime SQL confs.
    """
    for k, v in RUNTIME_CONF.items():
        spark.conf.set(k, v)
    if use_rocksdb_state:
        for k, v in ROCKSDB_STATE_CONF.items():
            spark.conf.set(k, v)
    if shuffle_partitions is not None:
        # At small SF the default 200 partitions means 200 near-empty
        # tasks per shuffle; AQE coalesces them but scheduling overhead
        # remains. On a real cluster size this to ~2-3x total cores and
        # let AQE coalesce down.
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    return spark


def get_spark(
    app_name: str = "c360-engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    use_rocksdb_state: bool = False,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults."""
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    return tune(spark, shuffle_partitions, use_rocksdb_state=use_rocksdb_state)


def configure_azure_blob(spark: SparkSession, account: str, key: str) -> None:
    """Portable replacement for the reference's dbutils mount
    (reference ETL_pipeline.py:10-19): set the fs.azure account key so
    ``abfss://container@account.dfs.core.windows.net/path`` URIs resolve.
    No Databricks dependency.
    """
    spark.conf.set(f"fs.azure.account.key.{account}.dfs.core.windows.net", key)
