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
) -> None:
    """Process everything available now, then stop (the reference's
    'catch up on daily files' pattern with exactly-once checkpoints).
    Results land in an in-memory table for tests; swap format for
    parquet/kafka in production."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(sink_table)
        .outputMode(mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


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
