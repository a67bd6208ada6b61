"""Out-of-order / late-arrival watermark EVICTION evidence (VERDICT r6
item 6): the availableNow file streams used by the registered streaming
queries deliver roughly in arrival order, so watermark eviction never
really fires there.  These tests feed deliberately LATE rows in >=3
micro-batch streams (maxFilesPerTrigger=1) and pin the drop/keep
semantics against the batch computation over the same arrived data:

* windowed aggregate: a row arriving after the watermark passed its
  window is DROPPED — the streamed count excludes it, the batch count
  includes it (and a window the watermark never passes is NOT emitted
  in append mode — both halves of the bounded-state trade, stated).
* stateful sessionizer: a late event for an already-closed session is
  dropped — the emitted session keeps its original bounds.
* stream-stream interval join: a late right-side row older than the
  global watermark is dropped on input — its would-be match is never
  emitted, while the batch join over the full data finds it.

Measured nuance pinned here: the row-level late filter uses the
watermark computed from batches strictly BEFORE the current one, so a
late row landing in the very batch where the watermark first passes
its window can still be merged; one batch later it is reliably
dropped.  The tests therefore interpose one keep-alive batch between
the watermark-advancing batch and the late delivery.
"""

from __future__ import annotations

import datetime as dt
import shutil
import tempfile

from pyspark.sql import functions as F

from customer_360_etl_pipeline_on_azure_cloud_spark.streaming.incremental import (
    run_incremental,
    stream_stream_interval_join,
    windowed_counts,
)
from customer_360_etl_pipeline_on_azure_cloud_spark.streaming.stateful import (
    stateful_sessionize,
)

D0 = dt.datetime(2024, 5, 1, 0, 0, 0)


def _at(hours: float) -> dt.datetime:
    return D0 + dt.timedelta(hours=hours)


def _write_batches(spark, path: str, schema_cols, *batches) -> None:
    """Write each batch as its own parquet file, in order (the file
    stream consumes them oldest-first, one per trigger; the small sleep
    keeps modification times strictly increasing so that order is
    deterministic)."""
    import time

    for rows in batches:
        spark.createDataFrame(rows, schema_cols).coalesce(1).write.mode(
            "append"
        ).parquet(path)
        time.sleep(0.25)


def test_windowed_counts_evict_late_row(spark):
    """1-hour windows, 2-hour watermark, four micro-batches:
    batch 1 fills the 10:00 window; batch 2 (an event at 14:00)
    advances the watermark to 12:00, finalizing it; batch 3 keeps the
    stream moving (watermark filtering uses the PREVIOUS batch's
    watermark, so eviction takes effect one batch after the advance —
    measured, and worth pinning); batch 4 delivers a LATE 10:15 row
    (dropped — window finalized, watermark 12:15) plus a 14:30 row
    whose window the watermark never passes (never emitted in append
    mode).  The streamed 10:00 count is 2; the batch aggregate over
    the same arrived rows says 3 — the difference IS the eviction."""
    tmp = tempfile.mkdtemp(prefix="c360_late_win_")
    try:
        src = f"{tmp}/src"
        b1 = [(_at(10 + 5 / 60), "click"), (_at(10 + 20 / 60), "click")]
        b2 = [(_at(14.0), "view")]
        b3 = [(_at(14.25), "view")]
        b4 = [(_at(10 + 15 / 60), "click"), (_at(14.5), "view")]
        _write_batches(
            spark, src, "ts timestamp, event_type string", b1, b2, b3, b4
        )

        stream = (
            spark.readStream.schema("ts timestamp, event_type string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        counts = windowed_counts(
            stream, window="1 hour", watermark="2 hours"
        )
        run_incremental(counts, f"{tmp}/ckpt", "late_win_sink", mode="append")
        got = {
            (r["window_start"], r["event_type"]): r["n"]
            for r in spark.table("late_win_sink").collect()
        }
        # the finalized 10:00 window excludes the late third click
        assert got == {(_at(10.0), "click"): 2}, got
        # batch truth over the SAME arrived rows counts all three — the
        # late row is what the watermark evicted
        batch = (
            spark.read.parquet(src)
            .groupBy(F.window("ts", "1 hour"), "event_type")
            .count()
            .filter(F.col("window.start") == _at(10.0))
            .collect()
        )
        assert batch[0]["count"] == 3
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_stateful_sessionize_drops_late_event(spark):
    """30-min-gap sessions: u1's session [0:00, 0:10] closes when the
    10:00 event arrives (batch 2); batch 3 keeps the stream moving (the
    one-batch watermark-filter lag, as above); batch 4 then delivers a
    LATE u1 event at 0:20 — inside the closed session's gap window, so
    accepting it would have extended the session to [0:00, 0:20] x3.
    It is dropped before the operator: the emitted session keeps
    (end=0:10, n=2)."""
    tmp = tempfile.mkdtemp(prefix="c360_late_sess_")
    try:
        src = f"{tmp}/src"
        b1 = [("u1", _at(0.0)), ("u1", _at(10 / 60))]
        b2 = [("u1", _at(10.0))]
        b3 = [("u1", _at(10 + 5 / 60))]
        b4 = [("u1", _at(20 / 60))]  # late: watermark is ~10:04
        _write_batches(
            spark, src, "user_id string, ts timestamp", b1, b2, b3, b4
        )

        stream = (
            spark.readStream.schema("user_id string, ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        sessions = stateful_sessionize(
            stream, key_col="user_id", gap_seconds=1800, watermark="1 minute"
        )
        run_incremental(
            sessions, f"{tmp}/ckpt", "late_sess_sink", mode="append"
        )
        rows = spark.table("late_sess_sink").collect()
        # the [10:00, 10:05] session is still open (watermark never
        # passes its end+gap) — only [0:00, 0:10] closed, WITHOUT the
        # late event
        assert len(rows) == 1
        r = rows[0]
        assert r["user_id"] == "u1"
        assert (r["session_start"], r["session_end"]) == (_at(0.0), _at(10 / 60))
        assert r["n_events"] == 2
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_interval_join_drops_late_right_row(spark):
    """Click->purchase interval join (30-min delay, 1-h watermark),
    four right-side micro-batches: the k1 pair matches in batch 1;
    batch 2 advances both sides' watermarks to 12:00 via the k2 pair;
    batch 3 keeps the stream moving (the one-batch watermark-filter
    lag, as above); batch 4 delivers a LATE k1 purchase at 10:20 —
    inside the click's 30-min delay window, so the batch join matches
    it, but the stream drops it on input (older than the global
    watermark).  Streamed matches = 2, batch matches = 3."""
    tmp = tempfile.mkdtemp(prefix="c360_late_join_")
    try:
        lsrc, rsrc = f"{tmp}/clicks", f"{tmp}/purchases"
        _write_batches(
            spark, lsrc, "key string, l_ts timestamp",
            [("k1", _at(10.0))], [("k2", _at(13.0))],
        )
        _write_batches(
            spark, rsrc, "key string, r_ts timestamp",
            [("k1", _at(10 + 10 / 60))],
            [("k2", _at(13 + 5 / 60))],
            [("k2", _at(13 + 10 / 60))],
            [("k1", _at(10 + 20 / 60))],  # late vs global watermark 12:00
        )
        ls = (
            spark.readStream.schema("key string, l_ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(lsrc)
        )
        rs = (
            spark.readStream.schema("key string, r_ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(rsrc)
        )
        joined = stream_stream_interval_join(
            ls, rs, "key", "l_ts", "r_ts",
            max_delay="30 minutes", watermark="1 hour",
        )
        run_incremental(joined, f"{tmp}/ckpt", "late_join_sink", mode="append")
        got = {
            (r["key"], r["l_ts"], r["r_ts"])
            for r in spark.table("late_join_sink").collect()
        }
        assert got == {
            ("k1", _at(10.0), _at(10 + 10 / 60)),
            ("k2", _at(13.0), _at(13 + 5 / 60)),
            ("k2", _at(13.0), _at(13 + 10 / 60)),
        }, got
        # batch join over the full arrived data ALSO matches the late
        # purchase — the stream's missing third row is the eviction
        lb = spark.read.parquet(lsrc)
        rb = spark.read.parquet(rsrc)
        nb = lb.join(
            rb,
            (lb["key"] == rb["key"])
            & (rb["r_ts"] >= lb["l_ts"])
            & (rb["r_ts"] <= lb["l_ts"] + F.expr("INTERVAL 30 minutes")),
        ).count()
        assert nb == 4
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_run_incremental_state_partitions_pins_and_restores(spark):
    """The state_partitions knob (r10, streaming_event_counts drift fix)
    must (a) actually run the stateful operator at the requested
    partition count — pinned via the checkpoint's offset metadata,
    where Spark records the conf it froze at first start — (b) leave
    the session's batch shuffle conf untouched afterwards, and (c)
    change no results."""
    import json
    import os

    tmp = tempfile.mkdtemp(prefix="c360_state_parts_")
    try:
        src = f"{tmp}/src"
        b1 = [(_at(10.0), "click"), (_at(10.25), "view")]
        b2 = [(_at(11.0), "click")]
        _write_batches(spark, src, "ts timestamp, event_type string", b1, b2)
        stream = (
            spark.readStream.schema("ts timestamp, event_type string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        counts = windowed_counts(stream, window="1 hour", watermark="2 hours")
        prior = spark.conf.get("spark.sql.shuffle.partitions")
        run_incremental(
            counts, f"{tmp}/ckpt", "state_parts_sink", mode="complete",
            state_partitions=3,
        )
        assert spark.conf.get("spark.sql.shuffle.partitions") == prior
        got = {
            (r["window_start"], r["event_type"]): r["n"]
            for r in spark.table("state_parts_sink").collect()
        }
        assert got == {
            (_at(10.0), "click"): 1,
            (_at(10.0), "view"): 1,
            (_at(11.0), "click"): 1,
        }, got
        # offset metadata records the conf frozen into the checkpoint
        offsets_dir = f"{tmp}/ckpt/offsets"
        first = sorted(
            f for f in os.listdir(offsets_dir)
            if not f.startswith(".") and not f.endswith(".crc")
        )[0]
        with open(os.path.join(offsets_dir, first)) as fh:
            lines = fh.read().splitlines()
        meta = json.loads(lines[1])
        assert (
            meta["conf"]["spark.sql.shuffle.partitions"] == "3"
        ), meta["conf"]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
