"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference's incremental story is daily batch re-reads (reference
ETL_pipeline.py:22-29) — it has no per-key state across runs. This module
supplies the streaming-native version the survey marks as the engine
extension: gap-based sessionization as an *arbitrary stateful* operator,
the batch twin of ``operators.windows.sessionize``.

Why not ``F.session_window``? Spark's built-in session window aggregates
into (start, end) per session but cannot carry custom per-session state
or custom close logic; ``applyInPandasWithState`` is the documented
escape hatch for operators whose state machine Spark lacks. State here is
three scalars per key (open-session start/end/count), Arrow-batched both
ways — bounded by key cardinality, not data volume, and evicted by
event-time timeout, so it scales to unbounded streams.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_US_PER_SEC = 1_000_000


def _session_state_fn(gap_seconds: int):
    """Build the per-key state-transition function.

    State tuple: ``(start_us, end_us, n_events)`` for the one OPEN
    session of the key. Closed sessions are emitted as soon as they are
    known closed — either a newer event arrives more than ``gap`` after
    the session end (in-batch or cross-batch), or the event-time
    watermark passes ``end + gap`` (timeout path; fires even if the key
    never receives another event).
    """
    gap_us = gap_seconds * _US_PER_SEC

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        closed: list[tuple[Any, int, int, int]] = []

        def emit(start_us: int, end_us: int, n: int) -> None:
            closed.append((key[0], start_us, end_us, n))

        if state.hasTimedOut:
            # Watermark passed end+gap with no new data: the open
            # session can never be extended — flush it.
            start_us, end_us, n = state.get
            emit(start_us, end_us, n)
            state.remove()
        else:
            # All of this key's rows for the micro-batch, sorted by
            # event time (micro-batch delivery order is arbitrary).
            ts_us = (
                pd.concat([pdf["__ts"] for pdf in pdfs])
                .astype("int64")
                .floordiv(1000)  # ns -> us
                .sort_values()
            )
            cur = state.get if state.exists else None
            for t in ts_us:
                if cur is None:
                    cur = (int(t), int(t), 1)
                elif t - cur[1] > gap_us:
                    emit(*cur)
                    cur = (int(t), int(t), 1)
                else:
                    cur = (cur[0], int(t), cur[2] + 1)
            if cur is not None:
                state.update(cur)
                # Event-time timeout: fire once the watermark proves no
                # in-order event can extend this session.
                state.setTimeoutTimestamp(cur[1] // 1000 + gap_seconds * 1000)

        if closed:
            yield pd.DataFrame(
                {
                    "key": [c[0] for c in closed],
                    "session_start": pd.to_datetime(
                        [c[1] for c in closed], unit="us"
                    ),
                    "session_end": pd.to_datetime(
                        [c[2] for c in closed], unit="us"
                    ),
                    "n_events": [c[2 + 1] for c in closed],
                }
            )

    return fn


def stateful_sessionize(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    watermark: str = "1 minute",
) -> DataFrame:
    """Streaming gap sessionization: one output row per CLOSED session
    ``(key, session_start, session_end, n_events)``.

    Semantics match the batch ``operators.windows.sessionize`` run over
    the same (fully-arrived) data: a session closes when the next event
    of the key is more than ``gap_seconds`` later, or when the event-time
    watermark passes ``session_end + gap_seconds`` (so tail sessions
    flush without waiting for another event). Events later than the
    watermark are dropped by Spark before reaching the operator — the
    standard bounded-state trade.

    Scale: state is O(distinct live keys) x 3 scalars, partitioned by
    the shuffle on ``key_col``; Arrow batches carry the data, and the
    timeout sweep is Spark-managed. No per-row Python — the Python work
    is one vectorized sort per key per batch.
    """
    key_field = events.schema[key_col]
    out_schema = T.StructType(
        [
            T.StructField("key", key_field.dataType),
            T.StructField("session_start", T.TimestampType()),
            T.StructField("session_end", T.TimestampType()),
            T.StructField("n_events", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("start_us", T.LongType()),
            T.StructField("end_us", T.LongType()),
            T.StructField("n", T.LongType()),
        ]
    )
    from pyspark.sql import functions as F

    prepared = events.select(
        F.col(key_col), F.col(ts_col).alias("__ts")
    ).withWatermark("__ts", watermark)
    return (
        prepared.groupBy(key_col)
        .applyInPandasWithState(
            _session_state_fn(gap_seconds),
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
        .withColumnRenamed("key", key_col)
    )


def _holt_state_fn():
    """Per-key Holt(1/2, 1/2) integer state transition.

    State: ``(last_day, level, trend, n_days)``.  Each batch delivers
    (day, cents) rows; days are summed, sorted, and folded with the
    SAME parity-exact halving as the batch query (fdiv2(x) =
    (x - (x & 1)) // 2 — even operand, exact division, no
    truncate-vs-floor ambiguity on negative trends).  A batch
    containing a day <= the folded frontier violates the day-complete
    in-order delivery contract and RAISES (the exactly-once sink's
    divergence discipline: fail loudly, never silently fold a day
    twice).
    """

    def fdiv2(x: int) -> int:
        return (x - (x & 1)) // 2

    def fn(
        key: Any,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        rows = pd.concat(list(pdfs), ignore_index=True)
        daily = (
            rows.groupby("day", as_index=False)["cents"].sum()
            .sort_values("day")
        )
        if state.exists:
            last_day, level, trend, n_days = state.get
        else:
            last_day, level, trend, n_days = -1, 0, 0, 0
        if len(daily) and int(daily["day"].iloc[0]) <= last_day:
            raise RuntimeError(
                f"stateful_holt: key {key} received day "
                f"{int(daily['day'].iloc[0])} <= folded frontier "
                f"{last_day} — day-complete in-order delivery violated"
            )
        for day, cents in zip(daily["day"], daily["cents"]):
            day, cents = int(day), int(cents)
            if n_days == 0:
                level, trend = cents, 0
            else:
                new_level = fdiv2(cents + level + trend)
                trend = fdiv2(trend + new_level - level)
                level = new_level
            last_day, n_days = day, n_days + 1
        state.update((last_day, level, trend, n_days))
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "through_day": [last_day],
                "n_days": [n_days],
                "level_cents": [level],
                "trend_cents": [trend],
            }
        )

    return fn


def stateful_holt(
    values: DataFrame,
    key_col: str,
    day_col: str,
    cents_col: str,
) -> DataFrame:
    """Streaming Holt linear smoothing as an ARBITRARY STATEFUL
    operator: per key, the integer Holt(1/2, 1/2) walk of
    ``analytics_queries.q_revenue_holt_forecast`` maintained ACROSS
    micro-batches — the forecasting state machine Spark has no
    built-in for (session_window can't carry a (level, trend)
    recursion).  Emits the folded state after every batch; the final
    row per key (max through_day) is the same (level, trend) the
    batch fold produces over the fully-arrived series — exact batch
    equivalence, pinned by the shared oracle.

    Delivery contract: batches must be DAY-COMPLETE and in day order
    per key (the daily-ingest deployment; violations raise — see
    _holt_state_fn).  State is 4 scalars per key, Arrow-batched; the
    Python work is one vectorized groupby-sum per key per batch plus
    an O(new days) integer fold.  No watermark is needed: the
    operator never waits on event time, it folds what each batch
    completes (ProcessingTimeTimeout-free, timeout NoTimeout).
    """
    key_field = values.schema[key_col]
    out_schema = T.StructType(
        [
            T.StructField("key", key_field.dataType),
            T.StructField("through_day", T.LongType()),
            T.StructField("n_days", T.LongType()),
            T.StructField("level_cents", T.LongType()),
            T.StructField("trend_cents", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("last_day", T.LongType()),
            T.StructField("level", T.LongType()),
            T.StructField("trend", T.LongType()),
            T.StructField("n_days", T.LongType()),
        ]
    )
    from pyspark.sql import functions as F

    prepared = values.select(
        F.col(key_col),
        F.col(day_col).cast("long").alias("day"),
        F.col(cents_col).cast("long").alias("cents"),
    )
    return (
        prepared.groupBy(key_col)
        .applyInPandasWithState(
            _holt_state_fn(),
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        .withColumnRenamed("key", key_col)
    )
