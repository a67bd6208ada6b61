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


def jdbc_exactly_once_sink(
    url: str,
    target_table: str,
    app_id: str,
    user: str = "",
    password: str = "",
    driver: str = "com.microsoft.sqlserver.jdbc.SQLServerDriver",
    epoch_table: str = "stream_epochs",
    batchsize: int = 10000,
    num_partitions: int | None = None,
):
    """foreachBatch JDBC sink with EXACTLY-ONCE semantics under
    micro-batch replay (r7 verdict item 6).

    Structured Streaming's recovery contract is at-least-once into
    foreachBatch: after a crash the same ``epoch_id`` is redelivered,
    and a plain append sink double-writes it.  This sink makes the
    delivery idempotent with the stage-then-promote pattern:

      1. REPLAY CHECK — the epoch ledger ``epoch_table`` (app_id,
         epoch) is consulted; an already-committed epoch returns
         immediately (the whole handler is a no-op on replay).
      2. STAGE — the batch is written through Spark's parallel JDBC
         writer (``numPartitions``/``batchsize`` as in
         :func:`write_jdbc`) into a per-app staging table with
         ``mode("overwrite")``, so a crash mid-stage is healed by the
         replay overwriting it.  Executors never touch the target.
      3. PROMOTE — one driver-side JDBC TRANSACTION runs
         ``INSERT INTO target SELECT * FROM stage`` and inserts the
         epoch-ledger row, then commits.  The data move and the
         done-marker are ATOMIC: a crash before commit rolls both
         back (replay re-stages and re-promotes), a crash after
         commit makes the replay a no-op at step 1.  A duplicate
         ledger insert (two racing replays) violates the ledger's
         PRIMARY KEY and rolls back — at most one promote per epoch
         can ever commit.

    Scale notes: the stage table is batch-sized, not table-sized; the
    promote is one set-based INSERT-SELECT inside the database (no
    row round-trips through the driver); micro-batches are delivered
    serially per query, so one stage table per ``app_id`` suffices.
    ``app_id`` must be unique per (streaming query, target) — it is
    the ledger key that separates two streams writing the same DB.

    Returns a ``handle(batch_df, epoch_id)`` callable for
    ``run_foreach_batch`` / ``DataStreamWriter.foreachBatch``.
    Tested end-to-end on embedded Derby with deliberate replays
    (tests/test_jdbc_foreachbatch.py).
    """
    stage_table = f"{target_table}_stage_{app_id}"

    def _connect(jvm):
        jvm.java.lang.Class.forName(driver)
        dm = jvm.java.sql.DriverManager
        if user:
            return dm.getConnection(url, user, password)
        return dm.getConnection(url)

    def _execute_ignore_exists(conn, sql: str) -> None:
        st = conn.createStatement()
        try:
            st.execute(sql)
        except Exception as exc:  # noqa: BLE001 - "already exists" is fine
            if "exists" not in str(exc).lower():
                raise
        finally:
            st.close()

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        jvm = spark._jvm
        conn = _connect(jvm)
        try:
            conn.setAutoCommit(True)
            _execute_ignore_exists(
                conn,
                f"CREATE TABLE {epoch_table} ("
                "app VARCHAR(128) NOT NULL, epoch BIGINT NOT NULL, "
                "PRIMARY KEY (app, epoch))",
            )
            ps = conn.prepareStatement(
                f"SELECT 1 FROM {epoch_table} WHERE app = ? AND epoch = ?"
            )
            ps.setString(1, app_id)
            ps.setLong(2, int(epoch_id))
            rs = ps.executeQuery()
            seen = rs.next()
            rs.close()
            ps.close()
            if seen:  # replayed epoch: already promoted, exactly-once no-op
                return
            # stage (parallel, overwrite heals any crashed prior attempt)
            write_jdbc(
                batch_df,
                url=url,
                table=stage_table,
                user=user,
                password=password,
                driver=driver,
                mode="overwrite",
                batchsize=batchsize,
                num_partitions=num_partitions,
                truncate=False,
            )
            # first epoch bootstraps the target with the stage's schema
            _execute_ignore_exists(
                conn,
                f"CREATE TABLE {target_table} AS SELECT * FROM "
                f"{stage_table} WITH NO DATA",
            )
            # atomic promote: data move + ledger row in ONE transaction
            conn.setAutoCommit(False)
            st = conn.createStatement()
            try:
                st.execute(
                    f"INSERT INTO {target_table} SELECT * FROM {stage_table}"
                )
                ps2 = conn.prepareStatement(
                    f"INSERT INTO {epoch_table} (app, epoch) VALUES (?, ?)"
                )
                ps2.setString(1, app_id)
                ps2.setLong(2, int(epoch_id))
                ps2.executeUpdate()
                ps2.close()
                conn.commit()
            except Exception:
                conn.rollback()
                raise
            finally:
                st.close()
            conn.setAutoCommit(True)
            _execute_ignore_exists(conn, f"DROP TABLE {stage_table}")
        finally:
            conn.close()

    return handle


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
