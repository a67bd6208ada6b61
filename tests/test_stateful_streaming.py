"""Batch-equivalence gate for the applyInPandasWithState sessionizer:
the closed sessions a stream emits must equal the batch
``operators.windows.sessionize`` result over the same arrived data
(SURVEY §2.10 extension; the stateful operator the reference lacks)."""

from __future__ import annotations

import datetime as dt
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from customer_360_etl_pipeline_on_azure_cloud_spark.operators.windows import sessionize
from customer_360_etl_pipeline_on_azure_cloud_spark.streaming.incremental import (
    run_incremental,
)
from customer_360_etl_pipeline_on_azure_cloud_spark.streaming.stateful import (
    stateful_sessionize,
)

T0 = dt.datetime(2024, 3, 1, 12, 0, 0)


def _ts(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


def test_stateful_sessionize_matches_batch(spark):
    # file 1: u1 has two sessions (gap 30 min): [0,10] and [50];
    #         u2 one session [0]; u3 one session [5,15].
    # file 2: u1/u2 events 10 h later — closes their open sessions via
    #         the data path AND advances the watermark so u3 (no new
    #         data) closes via the event-time TIMEOUT path.
    batch1 = [
        ("u1", _ts(0)),
        ("u1", _ts(10)),
        ("u1", _ts(50)),
        ("u2", _ts(0)),
        ("u3", _ts(5)),
        ("u3", _ts(15)),
    ]
    batch2 = [("u1", _ts(600)), ("u2", _ts(600))]

    tmp = tempfile.mkdtemp(prefix="c360_state_")
    try:
        src = f"{tmp}/src"
        df1 = spark.createDataFrame(batch1, ["user_id", "ts"])
        df1.coalesce(1).write.mode("append").parquet(src)
        spark.createDataFrame(batch2, ["user_id", "ts"]).coalesce(1).write.mode(
            "append"
        ).parquet(src)

        stream = (
            spark.readStream.schema(df1.schema)
            .option("maxFilesPerTrigger", 1)  # honored by availableNow
            .parquet(src)
        )
        sessions = stateful_sessionize(
            stream, key_col="user_id", ts_col="ts", gap_seconds=1800
        )
        run_incremental(sessions, f"{tmp}/ckpt", "closed_sessions")
        got = sorted(
            (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
            for r in spark.table("closed_sessions").collect()
        )

        # batch twin over the FULLY-ARRIVED file-1 data (file-2 sessions
        # are still open — a stream can't know they ended)
        want_df = (
            sessionize(df1, keys=["user_id"], ts_col="ts", gap_seconds=1800)
            .groupBy("user_id", "session_id")
            .agg(
                F.min("ts").alias("session_start"),
                F.max("ts").alias("session_end"),
                F.count(F.lit(1)).alias("n_events"),
            )
        )
        want = sorted(
            (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
            for r in want_df.collect()
        )
        assert got == want
        assert len(got) == 4  # u1 x2, u2 x1, u3 x1 (u3 = timeout path)
        assert ("u3", _ts(5), _ts(15), 2) in got
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_stream_stream_join_equals_batch_join(spark):
    # availableNow stream-stream interval join over a static file must
    # emit exactly the batch join's pair set
    from pyspark.sql import functions as F
    from conftest import SF_SMALL
    from customer_360_etl_pipeline_on_azure_cloud_spark.testdata_queries import (
        CORE_QUERIES,
    )
    from customer_360_etl_pipeline_on_azure_cloud_spark.sources.tables import (
        load_table,
    )

    fn, _ = CORE_QUERIES["streaming_attribution"]
    got = {tuple(r) for r in fn(spark, SF_SMALL).collect()}

    ev = load_table(spark, SF_SMALL, "events")
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("cts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("pts"),
    )
    want = {
        tuple(r)
        for r in c.join(
            p,
            (F.col("user_id") == F.col("pu"))
            & (F.col("pts") >= F.col("cts"))
            & (F.col("pts") <= F.col("cts") + F.expr("INTERVAL 30 minutes")),
        )
        .select("user_id", "click_id", "purchase_id",
                F.unix_micros("cts").alias("click_ts_us"))
        .collect()
    }
    assert got == want and len(got) > 0


def test_rocksdb_state_store_optin_matches_default(spark):
    """Opt-in RocksDB state store (session.ROCKSDB_STATE_CONF) must
    produce byte-identical streaming results; the provider changes WHERE
    state lives, never WHAT is computed. Conf is restored afterwards so
    the rest of the suite keeps the default provider."""
    from conftest import SF_SMALL

    from customer_360_etl_pipeline_on_azure_cloud_spark.session import (
        ROCKSDB_STATE_CONF,
        tune,
    )
    from customer_360_etl_pipeline_on_azure_cloud_spark.testdata_queries import (
        CORE_QUERIES,
    )

    fn, _ = CORE_QUERIES["streaming_event_counts"]
    want = sorted(map(tuple, fn(spark, SF_SMALL).collect()))
    saved = {k: spark.conf.get(k, None) for k in ROCKSDB_STATE_CONF}
    tune(spark, use_rocksdb_state=True)
    try:
        assert (
            "RocksDB"
            in spark.conf.get("spark.sql.streaming.stateStore.providerClass")
        )
        got = sorted(map(tuple, fn(spark, SF_SMALL).collect()))
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    assert got == want
