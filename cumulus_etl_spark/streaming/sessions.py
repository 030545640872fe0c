"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` (SURVEY §2.10 — "custom stateful operators").

The batch catalog already has gaps-and-islands sessionization
(window_sessionize); this is the *streaming* form: per-user state holds
the open session across micro-batches, closed sessions emit as soon as
the closing gap arrives, and an idle timeout flushes sessions whose user
went quiet. State is bounded: one row per active user.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", IntegerType()),
        StructField("closed_by", StringType()),  # gap | timeout
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", IntegerType()),
    ]
)


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    idle_flush: bool = False,
) -> DataFrame:
    """Emit one row per closed session (append mode).

    ``idle_flush=True`` adds a processing-time timeout that closes a
    user's open session after ``gap_seconds`` of silence — for
    continuously-running queries ONLY: pending timeouts make an
    ``availableNow`` query spin empty micro-batches instead of
    terminating, so batch-style runs must keep the default (open
    sessions stay in state for the next run, which is also the correct
    resume semantic).
    """
    gap_us = gap_seconds * 1_000_000

    def fold(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (user,) = key
        if state.hasTimedOut:
            if state.exists:
                start_us, last_us, n = state.get
                state.remove()
                yield _session_row(user, start_us, last_us, n, "timeout")
            return

        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us = last_us = None
            n = 0

        out = []
        ts_values = []
        for pdf in pdfs:
            ts_values.append(pdf[ts_col])
        ts_sorted = pd.concat(ts_values).sort_values()
        for ts in ts_sorted:
            us = int(ts.value // 1000)  # ns → µs
            if start_us is None:
                start_us, last_us, n = us, us, 1
            elif us - last_us > gap_us:
                out.append((user, start_us, last_us, n, "gap"))
                start_us, last_us, n = us, us, 1
            else:
                last_us, n = us, n + 1
        state.update((start_us, last_us, n))
        if idle_flush:
            state.setTimeoutDuration(gap_seconds * 1000)
        for row in out:
            yield _session_row(*row)

    return events.groupBy(user_col).applyInPandasWithState(
        fold,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout if idle_flush else GroupStateTimeout.NoTimeout
        ),
    )


def _session_row(user, start_us, last_us, n, closed_by) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user],
            "session_start": [pd.Timestamp(start_us, unit="us")],
            "session_end": [pd.Timestamp(last_us, unit="us")],
            "n_events": [n],
            "closed_by": [closed_by],
        }
    )


def sessionize_stream_native(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Gap-based sessionization via the NATIVE ``session_window``
    aggregation — the JVM-side scale path (no Python workers, state in
    the state store with watermark-driven eviction, merge-capable
    partial aggregation).

    Prefer this over ``sessionize_stream`` whenever the per-session
    output is expressible as an aggregation (count/min/max/sum);
    ``applyInPandasWithState`` remains for genuinely imperative
    per-session logic (e.g. the closed_by provenance column above).
    Sessions emit when the watermark passes their close — append mode,
    late events beyond the watermark are dropped, state is bounded by
    open sessions per user.

    Works identically on a batch DataFrame (session_window is a plain
    grouping expression there), so batch backfill and the streaming
    query share this one code path.
    """
    from pyspark.sql import functions as F

    wm = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    sess = F.session_window(F.col(ts_col), f"{gap_seconds} seconds")
    return (
        wm.groupBy(F.col(user_col), sess)
        .agg(F.count(F.lit(1)).cast("int").alias("n_events"))
        .select(
            user_col,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )
