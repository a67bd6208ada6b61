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
         epoch, batch fingerprint) is consulted; an already-committed
         epoch whose CONTENT matches returns immediately (no-op), and
         one whose content DIVERGED raises loudly rather than
         silently dropping the new rows (see "replay contract").
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

    Replay contract: exactly-once composes from (a) this sink's
    idempotence per (app_id, epoch_id) and (b) the source redelivering
    the SAME rows under the same epoch_id — which Structured Streaming
    guarantees when restarting FROM THE SAME CHECKPOINT.  A
    fresh-checkpoint restart renumbers epochs from 0, and if the
    source's batch composition changed meanwhile (new files arrived,
    different rate limits), epoch 0 no longer means the same rows.
    The ledger therefore stores an order-insensitive CONTENT
    fingerprint (row count + summed row-hash, one cheap aggregate per
    batch) and the replay check compares it: identical content
    no-ops; diverged content raises ``RuntimeError`` so the operator
    re-points the stream at a new ``app_id`` (or restores the
    checkpoint) instead of losing rows silently.

    Dialect notes: table-existence is probed with a dialect-free
    ``SELECT ... WHERE 1=0`` (never by matching error-message text);
    the target bootstrap tries the standard ``CREATE TABLE ... AS
    SELECT ... WITH NO DATA`` (Derby/PostgreSQL/standard) and falls
    back to T-SQL ``SELECT * INTO ... WHERE 1=0`` (SQL Server) — or
    pre-create the target yourself and neither runs.

    Scale notes: the stage table is batch-sized, not table-sized; the
    promote is one set-based INSERT-SELECT inside the database (no
    row round-trips through the driver); the fingerprint is one
    map-side-combinable aggregate over the batch; micro-batches are
    delivered serially per query, so one stage table per ``app_id``
    suffices.  ``app_id`` must be unique per (streaming query,
    target) — it is the ledger key that separates two streams writing
    the same DB.

    Returns a ``handle(batch_df, epoch_id)`` callable for
    ``run_foreach_batch`` / ``DataStreamWriter.foreachBatch``.
    Tested end-to-end on embedded Derby with deliberate replays,
    orphan-stage healing, and content-divergence detection
    (tests/test_jdbc_foreachbatch.py).
    """
    from pyspark.sql import functions as F

    stage_table = f"{target_table}_stage_{app_id}"

    def _connect(jvm):
        jvm.java.lang.Class.forName(driver)
        dm = jvm.java.sql.DriverManager
        if user:
            return dm.getConnection(url, user, password)
        return dm.getConnection(url)

    def _table_exists(conn, table: str) -> bool:
        # dialect-free existence probe: a zero-row SELECT succeeds iff
        # the table exists (never parse error-message text — the
        # "already exists" wording is engine- and locale-specific)
        st = conn.createStatement()
        try:
            st.execute(f"SELECT 1 FROM {table} WHERE 1=0")
            return True
        except Exception:  # noqa: BLE001
            return False
        finally:
            st.close()

    def _execute(conn, sql: str) -> None:
        st = conn.createStatement()
        try:
            st.execute(sql)
        finally:
            st.close()

    def _fingerprint(batch_df: DataFrame) -> tuple[int, str]:
        # order-insensitive content fingerprint: row count + the sum of
        # per-row 48-bit md5 prefixes over all columns, exact in
        # decimal(38,0) — one map-side-combinable aggregate
        h = F.conv(
            F.substring(
                F.md5(F.concat_ws("\u0001", *batch_df.columns)), 1, 12
            ),
            16,
            10,
        ).cast("decimal(38,0)")
        row = batch_df.agg(
            F.count(F.lit(1)).alias("n"), F.sum(h).alias("hs")
        ).collect()[0]
        return int(row["n"]), str(row["hs"] or 0)

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        jvm = spark._jvm
        n_rows, content_fp = _fingerprint(batch_df)
        fp = f"{n_rows}:{content_fp}"
        conn = _connect(jvm)
        try:
            conn.setAutoCommit(True)
            if not _table_exists(conn, epoch_table):
                _execute(
                    conn,
                    f"CREATE TABLE {epoch_table} ("
                    "app VARCHAR(128) NOT NULL, epoch BIGINT NOT NULL, "
                    "fp VARCHAR(64) NOT NULL, PRIMARY KEY (app, epoch))",
                )
            ps = conn.prepareStatement(
                f"SELECT fp FROM {epoch_table} WHERE app = ? AND epoch = ?"
            )
            ps.setString(1, app_id)
            ps.setLong(2, int(epoch_id))
            rs = ps.executeQuery()
            seen_fp = rs.getString(1) if rs.next() else None
            rs.close()
            ps.close()
            if seen_fp is not None:
                if seen_fp == fp:
                    return  # true replay: already promoted, no-op
                raise RuntimeError(
                    f"jdbc_exactly_once_sink: epoch {epoch_id} of app "
                    f"{app_id!r} was already committed with content "
                    f"fingerprint {seen_fp} but is being redelivered "
                    f"with {fp} — the stream was restarted from a "
                    "fresh checkpoint over CHANGED source batches. "
                    "Refusing to silently drop the new rows: restore "
                    "the original checkpoint, or write the re-run "
                    "under a new app_id (new ledger namespace)."
                )
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
            if not _table_exists(conn, target_table):
                try:
                    _execute(
                        conn,
                        f"CREATE TABLE {target_table} AS SELECT * FROM "
                        f"{stage_table} WITH NO DATA",
                    )
                except Exception:  # noqa: BLE001 - T-SQL fallback
                    _execute(
                        conn,
                        f"SELECT * INTO {target_table} FROM "
                        f"{stage_table} WHERE 1=0",
                    )
            # atomic promote: data move + ledger row in ONE transaction
            conn.setAutoCommit(False)
            st = conn.createStatement()
            try:
                st.execute(
                    f"INSERT INTO {target_table} SELECT * FROM {stage_table}"
                )
                ps2 = conn.prepareStatement(
                    f"INSERT INTO {epoch_table} (app, epoch, fp) "
                    "VALUES (?, ?, ?)"
                )
                ps2.setString(1, app_id)
                ps2.setLong(2, int(epoch_id))
                ps2.setString(3, fp)
                ps2.executeUpdate()
                ps2.close()
                conn.commit()
            except Exception:
                conn.rollback()
                raise
            finally:
                st.close()
            conn.setAutoCommit(True)
            if _table_exists(conn, stage_table):
                _execute(conn, f"DROP TABLE {stage_table}")
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
