"""Tests for the file sources (date-ranged daily layouts, the
reference's ingestion shape) and sinks."""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from customer_360_etl_pipeline_on_azure_cloud_spark.schemas import (
    LOG_CONTENT_SCHEMA,
    MAPPING_SCHEMA,
)
from customer_360_etl_pipeline_on_azure_cloud_spark.sinks import (
    write_csv,
    write_parquet,
)
from customer_360_etl_pipeline_on_azure_cloud_spark.sources.files import (
    paths_in_date_range,
    read_csv_dim,
    read_json_daily,
    read_parquet_daily,
)


@pytest.fixture(scope="module")
def daily_layout():
    tmp = tempfile.mkdtemp(prefix="c360_src_")
    jdir = os.path.join(tmp, "log_content")
    os.makedirs(jdir)
    for day, rows in {
        "20220401": [("C1", "m1", "CHANNEL", 10), ("C2", "m2", "VOD", 20)],
        "20220402": [("C1", "m1", "SPORT", 30)],
        "20220410": [("C3", "m3", "CHILD", 40)],
    }.items():
        with open(os.path.join(jdir, f"{day}.json"), "w") as f:
            for c, m, a, t in rows:
                f.write(
                    json.dumps(
                        {"_source": {"Contract": c, "Mac": m, "AppName": a, "TotalDuration": t}}
                    )
                    + "\n"
                )
    # a non-matching file that must be ignored
    with open(os.path.join(jdir, "notes.txt"), "w") as f:
        f.write("ignore me")
    yield tmp
    shutil.rmtree(tmp, ignore_errors=True)


def test_paths_in_date_range(daily_layout):
    jdir = os.path.join(daily_layout, "log_content")
    got = paths_in_date_range(jdir, 20220401, 20220402, suffix=".json")
    assert [os.path.basename(p) for p in got] == ["20220401.json", "20220402.json"]


def test_read_json_daily_single_scan_flatten_and_date(spark, daily_layout):
    jdir = os.path.join(daily_layout, "log_content")
    df = read_json_daily(
        spark,
        jdir,
        20220401,
        20220409,
        schema=LOG_CONTENT_SCHEMA,
        flatten_struct="_source",
    )
    rows = df.collect()
    assert len(rows) == 3  # 20220410 excluded by range
    assert set(df.columns) == {"Contract", "Mac", "AppName", "TotalDuration", "Date"}
    by_contract = {r["Contract"]: r for r in rows if r["Mac"] == "m1"}
    assert by_contract["C1"]["Date"] in (dt.date(2022, 4, 1), dt.date(2022, 4, 2))
    # the whole range is ONE logical scan relation, not a union of N reads
    assert df._jdf.queryExecution().optimizedPlan().toString().count("Relation") == 1


def test_read_json_daily_empty_range_raises(spark, daily_layout):
    jdir = os.path.join(daily_layout, "log_content")
    with pytest.raises(FileNotFoundError):
        read_json_daily(spark, jdir, 20230101, 20230131)


def test_read_parquet_daily(spark, daily_layout):
    pdir = os.path.join(daily_layout, "log_search")
    os.makedirs(pdir, exist_ok=True)
    base = spark.createDataFrame(
        [("2022-06-01 10:00:00", "u1", "kw")], ["datetime", "user_id", "keyword"]
    )
    for day in ("20220601", "20220602"):
        base.write.mode("overwrite").parquet(os.path.join(pdir, day))
    df = read_parquet_daily(spark, pdir, 20220601, 20220601)
    assert df.count() == 1


def test_read_csv_dim_deterministic_survivor(spark, daily_layout):
    path = os.path.join(daily_layout, "mapping.csv")
    with open(path, "w") as f:
        f.write("search,category\nfoo,zzz\nfoo,aaa\nbar,movies\n")
    df = read_csv_dim(spark, path, key="search", schema=MAPPING_SCHEMA)
    got = {r["search"]: r["category"] for r in df.collect()}
    # deterministic survivor: first by remaining-column sort order
    assert got == {"foo": "aaa", "bar": "movies"}


def test_csv_and_parquet_sink_roundtrip(spark, daily_layout):
    out = os.path.join(daily_layout, "out")
    df = spark.createDataFrame([("a", 1), ("b", 2)], ["k", "v"])
    write_csv(df, f"{out}/csv")
    back = spark.read.option("header", True).csv(f"{out}/csv")
    assert sorted((r["k"], int(r["v"])) for r in back.collect()) == [("a", 1), ("b", 2)]

    write_parquet(df, f"{out}/pq", partition_by=["k"])
    assert os.path.isdir(f"{out}/pq/k=a")  # Hive-partitioned layout
    back = spark.read.parquet(f"{out}/pq")
    assert back.count() == 2

    from customer_360_etl_pipeline_on_azure_cloud_spark.sinks import write_orc

    write_orc(df, f"{out}/orc", partition_by=["k"])
    assert os.path.isdir(f"{out}/orc/k=a")  # same Hive-partitioned layout
    back = spark.read.orc(f"{out}/orc")
    assert sorted((r["k"], r["v"]) for r in back.collect()) == [("a", 1), ("b", 2)]


def test_partition_pruning_on_hive_layout(spark, daily_layout):
    """The engine's preferred 100TB layout: date-partitioned parquet ->
    a filter on the partition column prunes at PLAN time (PartitionFilters),
    replacing the reference's driver-side filename arithmetic."""
    out = os.path.join(daily_layout, "pruned")
    df = spark.createDataFrame(
        [("2022-04-01", i, float(i)) for i in range(50)]
        + [("2022-04-02", i, float(i)) for i in range(50)],
        ["date", "id", "v"],
    )
    write_parquet(df, out, partition_by=["date"])
    back = spark.read.parquet(out).filter(F.col("date") == "2022-04-01")
    plan = back._jdf.queryExecution().executedPlan().toString()
    scan = [ln for ln in plan.splitlines() if "FileScan" in ln][0]
    assert "PartitionFilters: [isnotnull(date" in scan or "PartitionFilters: [" in scan
    # only one of the two partitions is read
    assert back.count() == 50
    n_files = back.select(F.input_file_name()).distinct().count()
    all_files = spark.read.parquet(out).select(F.input_file_name()).distinct().count()
    assert n_files < all_files


def test_jdbc_partitioned_read_embedded_derby(spark):
    """JDBC READ source (the reference only writes): partitioned range
    read opens numPartitions concurrent range queries, and filters push
    into the database (PushedFilters on the JDBCRelation scan)."""
    from customer_360_etl_pipeline_on_azure_cloud_spark.sinks import write_jdbc
    from customer_360_etl_pipeline_on_azure_cloud_spark.sources.jdbc import read_jdbc

    url = "jdbc:derby:memory:c360read;create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    df = spark.range(100).select(
        F.col("id").cast("long"), (F.col("id") * 2).cast("double").alias("v")
    )
    write_jdbc(df, url=url, table="src_tbl", user="", password="",
               driver=driver, mode="overwrite", truncate=False)

    back = read_jdbc(
        spark, url, "src_tbl", driver=driver,
        partition_column="id", lower_bound=0, upper_bound=100,
        num_partitions=4,
    )
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 100
    # bounds only split ranges — rows outside still arrive
    narrow = read_jdbc(
        spark, url, "src_tbl", driver=driver,
        partition_column="id", lower_bound=40, upper_bound=60,
        num_partitions=3,
    )
    assert narrow.count() == 100

    filtered = back.filter(F.col("id") > 90).select("id")
    plan = filtered._sc._jvm.PythonSQLUtils.explainString(
        filtered._jdf.queryExecution(), "formatted"
    )
    assert "PushedFilters" in plan and "GreaterThan" in plan


# --- event-time type normalization (Spark 4.1 NTZ drift regression) ---------


def test_event_ts_normalizes_every_arrival_type(spark):
    """events.ts must reach queries as TIMESTAMP regardless of which
    parquet-reader default produced the scan: legacy long-nanos,
    TIMESTAMP_NTZ (Spark 4.1 inference for tz-less files), or already
    TIMESTAMP. All three must yield identical instants (session tz is
    pinned UTC, so the NTZ cast is lossless). Regression for the round-3
    environment drift that broke 12 queries."""
    import os

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from customer_360_etl_pipeline_on_azure_cloud_spark.sources.tables import (
        event_ts,
        load_table,
    )
    from conftest import SF_SMALL

    path = os.path.join(SF_SMALL, "events.parquet")

    def instants(df):
        df = df.select(F.unix_micros("ts").alias("us")).orderBy("us")
        return [r["us"] for r in df.limit(50).collect()]

    baseline = instants(load_table(spark, SF_SMALL, "events"))
    assert baseline, "events table should not be empty"

    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.legacy.parquet.nanosAsLong",
            "spark.sql.parquet.inferTimestampNTZ.enabled",
        )
    }
    try:
        # arrival type 1: long nanoseconds (legacy conf on)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.read.parquet(path)
        if isinstance(raw.schema["ts"].dataType, T.LongType):
            fixed = event_ts(raw)
            assert isinstance(fixed.schema["ts"].dataType, T.TimestampType)
            assert instants(fixed) == baseline

        # arrival type 2: TIMESTAMP_NTZ (Spark 4.1 inference on)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
        raw = spark.read.parquet(path)
        if isinstance(raw.schema["ts"].dataType, T.TimestampNTZType):
            fixed = event_ts(raw)
            assert isinstance(fixed.schema["ts"].dataType, T.TimestampType)
            assert instants(fixed) == baseline

        # arrival type 3: plain TIMESTAMP (NTZ inference off) — no-op path
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        raw = spark.read.parquet(path)
        if isinstance(raw.schema["ts"].dataType, T.TimestampType):
            assert event_ts(raw) is raw or instants(event_ts(raw)) == baseline
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_overwrite_partitions_touches_only_arriving_days(spark, tmp_path):
    """Dynamic partition overwrite: reloading one day's batch must
    leave every other day intact (static mode would truncate them),
    replace that day's prior content, and restore the session conf."""
    from customer_360_etl_pipeline_on_azure_cloud_spark.sinks import (
        overwrite_partitions,
    )

    path = str(tmp_path / "daily")
    key = "spark.sql.sources.partitionOverwriteMode"
    prior = spark.conf.get(key, "static")
    full = spark.createDataFrame(
        [("2024-01-01", 1, 10), ("2024-01-02", 2, 20), ("2024-01-03", 3, 30)],
        "day string, id int, v int",
    )
    overwrite_partitions(full, path, ["day"])
    redo = spark.createDataFrame(
        [("2024-01-02", 2, 99), ("2024-01-02", 4, 40)],
        "day string, id int, v int",
    )
    overwrite_partitions(redo, path, ["day"])
    got = sorted(
        (str(r["day"]), r["id"], r["v"])
        for r in spark.read.parquet(path).collect()
    )
    assert got == [
        ("2024-01-01", 1, 10),
        ("2024-01-02", 2, 99),
        ("2024-01-02", 4, 40),
        ("2024-01-03", 3, 30),
    ]
    assert spark.conf.get(key, "static") == prior
    # replaying the same batch is a no-op on state
    overwrite_partitions(redo, path, ["day"])
    again = sorted(
        (str(r["day"]), r["id"], r["v"])
        for r in spark.read.parquet(path).collect()
    )
    assert again == got
