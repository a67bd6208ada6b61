"""Structured Streaming operators (SURVEY.md §2.10).

The reference has NO streaming — its incremental story is re-reading
date-named files (reference ETL_pipeline.py:22-29,305-306). The engine
formalizes that as a Structured Streaming file source with
``trigger(availableNow=True)``: each run processes exactly the files that
arrived since the last checkpoint, then stops — the modern version of the
reference's daily batch, with exactly-once bookkeeping instead of
filename arithmetic.

Pivot (A4) and ranking windows (W1) are unsupported on streams; the
engine runs those inside ``foreachBatch`` (micro-batch = small batch
DataFrame), which is exactly how the reference's daily granularity maps
onto streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def stream_file_source(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over a directory (new files become new data).
    Schema is REQUIRED — streaming reads never infer."""
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)


def windowed_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Event-time windowed counts with a watermark for late data — the
    canonical streaming aggregate. State is bounded: windows older than
    the watermark are finalized and dropped."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            key_col,
            "n",
        )
    )


def run_incremental(
    stream_df: DataFrame,
    checkpoint: str,
    sink_table: str,
    mode: str = "append",
    state_partitions: int | None = None,
) -> None:
    """Process everything available now, then stop (the reference's
    'catch up on daily files' pattern with exactly-once checkpoints).
    Results land in an in-memory table for tests; swap format for
    parquet/kafka in production.

    ``state_partitions`` sizes the stateful operator's shuffle/state
    partition count for THIS query, independent of the session's batch
    ``spark.sql.shuffle.partitions``.  Streaming state cost is
    per-partition-per-micro-batch (an HDFS-state-store delta file, a
    task, a commit) regardless of rows held, so a query whose state
    cardinality is small pays pure fixed overhead for every extra
    partition: measured on streaming_event_counts at sf0.1 (~600 state
    groups), 32 partitions = 4.4 s, 8 = 2.2 s, 4 = 1.2 s min-of-3
    (NOTES_r10, VERDICT r9 item 2 drift diagnosis).  Size it to state
    cardinality — a 100 TB stream with billions of groups wants many
    partitions; a bounded dashboard aggregate wants few.  The count is
    baked into the checkpoint at first start (Spark pins
    ``sql.shuffle.partitions`` per checkpoint), so it must be chosen
    when the query is FIRST started; the session conf is restored only
    after the run completes — batch-0 planning reads the conf
    ASYNCHRONOUSLY after ``start()`` returns, so restoring earlier
    would race it.
    """
    spark = stream_df.sparkSession
    prior = None
    if state_partitions is not None:
        prior = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(sink_table)
            .outputMode(mode)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if prior is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prior)


def run_foreach_batch(
    stream_df: DataFrame,
    checkpoint: str,
    batch_fn,
) -> None:
    """foreachBatch escape hatch: run batch-only operators (pivot,
    ranking windows, JDBC writes) per micro-batch."""
    q = (
        stream_df.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def sink_foreach_batch(
    stream_df: DataFrame,
    checkpoint: str,
    sink_path: str,
    transform,
) -> None:
    """The SCALE-SAFE foreachBatch recipe: each micro-batch is pushed
    through ``transform`` (a DataFrame -> DataFrame function) and the
    result is WRITTEN to a per-batch parquet directory
    (``{sink_path}/batch_id={id}``) — never collected to the driver.
    Per-batch results stay executor-side end to end, so the pattern
    holds when a batch's output is data-proportional (quarantine rows,
    near-dup pairs) rather than bounded.

    Exactly-once under retries: a re-delivered micro-batch rewrites its
    own ``batch_id=`` directory with mode("overwrite") — the canonical
    idempotent-sink recipe for foreachBatch (batch_id is stable across
    retries; the checkpoint guarantees each input file lands in exactly
    one batch_id).

    Read the union of batches back with :func:`read_batch_sink`.
    """
    import os

    def cb(batch_df: DataFrame, batch_id: int) -> None:
        transform(batch_df).write.mode("overwrite").parquet(
            os.path.join(sink_path, f"batch_id={batch_id}")
        )

    run_foreach_batch(stream_df, checkpoint, cb)


def read_batch_sink(spark: SparkSession, sink_path: str) -> DataFrame:
    """Union-of-micro-batches view over a :func:`sink_foreach_batch`
    sink: one partitioned parquet read (the ``batch_id=`` directories
    become a pruned-away partition column, dropped here). The returned
    plan is a plain FileScan — downstream consumers see an ordinary
    distributed table, not driver-held rows."""
    return spark.read.parquet(sink_path).drop("batch_id")


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    l_ts: str,
    r_ts: str,
    max_delay: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked stream-stream inner join: right rows match left rows
    with the same ``key`` whose timestamp falls in
    ``[l_ts, l_ts + max_delay]`` — the attribution join (click ->
    purchase within the window) that batch as-of/range joins express
    offline.

    Both sides carry watermarks and the join condition bounds event time
    on BOTH streams, so Spark can evict matched-out state: left rows
    older than ``watermark + max_delay`` past the right watermark can
    never match again and are dropped — bounded state at 100 TB/day
    rates. Under ``availableNow`` over static files the whole input
    arrives before the terminal batch, so the emitted set equals the
    batch join exactly (oracle-checkable).
    """
    lw = left.withWatermark(l_ts, watermark)
    rw = right.withWatermark(r_ts, watermark)
    cond = (
        (lw[key] == rw[key])
        & (rw[r_ts] >= lw[l_ts])
        & (rw[r_ts] <= lw[l_ts] + F.expr(f"INTERVAL {max_delay}"))
    )
    # both sides keep their key attribute after a condition join; drop
    # the right one so downstream selects are unambiguous
    return lw.join(rw, cond, "inner").drop(rw[key])
