"""Streaming per-key anomaly scoring via EWMA state.

The batch catalog flags outliers with exact per-user power sums
(``events_anomaly_zscore``); on a stream the full history is
unavailable, so the standard production substitute is an exponentially
weighted mean/variance per key (Welford-style EWMA): O(1) state per
user, updated per event, anomalies emitted the moment they arrive —
the detect-at-ingestion counterpart of the batch sweep, the way
streaming/dedup_index.py is dedup-at-ingestion.

State per key is three doubles (count, ewma, ewvar) — bounded by the
key cardinality, never by event volume; ``applyInPandasWithState``
checkpoints it with the query, so an interrupted run resumes with its
learned baselines intact.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

ANOMALY_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
        StructField("score", DoubleType()),  # |value-ewma| / sqrt(ewvar)
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("ewma", DoubleType()),
        StructField("ewvar", DoubleType()),
    ]
)


def anomaly_scores_stream(
    events: DataFrame,
    alpha: float = 0.1,
    threshold: float = 3.0,
    min_events: int = 10,
    user_col: str = "user_id",
) -> DataFrame:
    """Emit events whose value deviates ≥ ``threshold`` EWMA standard
    deviations from the key's learned baseline (append mode).

    ``alpha`` is the EWMA decay (higher = faster adaptation); the first
    ``min_events`` per key only train the baseline — emitting during
    warm-up would flag everything while variance is still meaningless.
    Anomalous values still update the baseline (a level shift stops
    alerting once the EWMA catches up — the standard EWMA-chart
    behavior). Processing order within a micro-batch is (ts, event_id),
    so scores are deterministic for a given file/batch layout.
    """

    def fold(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (user,) = key
        if state.exists:
            n, ewma, ewvar = state.get
        else:
            n, ewma, ewvar = 0, 0.0, 0.0

        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        out = []
        for _, r in rows.iterrows():
            v = float(r["value"])
            if n == 0:
                ewma, ewvar = v, 0.0
            else:
                delta = v - ewma
                if n >= min_events and ewvar > 0:
                    score = abs(delta) / ewvar**0.5
                    if score >= threshold:
                        out.append((user, int(r["event_id"]), r["ts"], v, score))
                # Welford-style EWMA update (West 1979): variance uses the
                # pre-update delta so a single outlier can't mask itself.
                ewma = ewma + alpha * delta
                ewvar = (1 - alpha) * (ewvar + alpha * delta * delta)
            n += 1
        state.update((n, ewma, ewvar))
        if out:
            yield pd.DataFrame(
                out, columns=["user_id", "event_id", "ts", "value", "score"]
            )

    return events.groupBy(user_col).applyInPandasWithState(
        fold,
        outputStructType=ANOMALY_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
