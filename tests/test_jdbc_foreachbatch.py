"""End-to-end JDBC sink test (embedded Derby, which ships in Spark's
jars) and the foreachBatch streaming escape hatch for batch-only
operators (SURVEY §7 risk item 1)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from customer_360_etl_pipeline_on_azure_cloud_spark.sinks import write_jdbc
from customer_360_etl_pipeline_on_azure_cloud_spark.streaming.incremental import (
    run_foreach_batch,
    stream_file_source,
)

DERBY_URL = "jdbc:derby:memory:c360test;create=true"
DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def test_jdbc_sink_roundtrip_embedded_derby(spark):
    df = spark.createDataFrame(
        [(1, "a", 10.5), (2, "b", 20.25)], ["id", "k", "v"]
    )
    # Derby has no TEXT type; Spark maps string->CLOB which Derby can't
    # equality-compare, so exercise overwrite+append with explicit mode.
    write_jdbc(
        df,
        url=DERBY_URL,
        table="feature_out",
        user="",
        password="",
        driver=DERBY_DRIVER,
        mode="overwrite",
        batchsize=100,
        num_partitions=2,
        truncate=False,
    )
    back = (
        spark.read.format("jdbc")
        .option("url", DERBY_URL)
        .option("dbtable", "feature_out")
        .option("driver", DERBY_DRIVER)
        .load()
    )
    got = sorted((int(r["id"]), float(r["v"])) for r in back.collect())
    assert got == [(1, 10.5), (2, 20.25)]

    # overwrite replaces, not duplicates
    write_jdbc(
        df,
        url=DERBY_URL,
        table="feature_out",
        user="",
        password="",
        driver=DERBY_DRIVER,
        mode="overwrite",
        truncate=False,
    )
    assert (
        spark.read.format("jdbc")
        .option("url", DERBY_URL)
        .option("dbtable", "feature_out")
        .option("driver", DERBY_DRIVER)
        .load()
        .count()
        == 2
    )


def test_foreachbatch_runs_batch_only_operators_per_microbatch(spark):
    """Ranking windows are unsupported on streams; foreachBatch runs
    them per micro-batch — the engine's documented path for the
    reference's daily top-k (SURVEY §2.10)."""
    from customer_360_etl_pipeline_on_azure_cloud_spark.operators.windows import (
        top_k_per_group,
    )

    tmp = tempfile.mkdtemp(prefix="c360_feb_")
    try:
        src = f"{tmp}/src"
        df = spark.createDataFrame(
            [("u1", "a"), ("u1", "a"), ("u1", "b"), ("u2", "c")], ["uid", "term"]
        )
        df.write.parquet(src)
        stream = stream_file_source(spark, src, df.schema)
        results = []

        def handle(batch_df, batch_id):
            counts = batch_df.groupBy("uid", "term").agg(
                F.count(F.lit(1)).alias("n")
            )
            top = top_k_per_group(
                counts, ["uid"], [F.col("n").desc(), F.col("term")], k=1
            )
            results.extend((r["uid"], r["term"]) for r in top.collect())

        run_foreach_batch(stream, f"{tmp}/ckpt", handle)
        assert sorted(results) == [("u1", "a"), ("u2", "c")]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
