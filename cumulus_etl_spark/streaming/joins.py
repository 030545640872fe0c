"""Streaming dedup and stream-stream joins (SURVEY §2.10 depth).

Two state-bounded streaming shapes the batch engine's operators map onto
when sources become continuous:

- ``streaming_dedup``: the reference's duplicate-input suppression (F5,
  ref sample/cli.py:165-170) and in-batch dedup (F6) assume one batch in
  memory. On a stream, `dropDuplicatesWithinWatermark` gives the same
  guarantee with BOUNDED state: duplicates arriving within the lateness
  budget are suppressed, and state for keys older than the watermark is
  evicted — re-exported FHIR bundles landing twice in the same window
  produce one merge, not two.

- ``interval_join``: correlate two event streams on a key within a time
  bound (impression→conversion, order→fulfillment). Both sides are
  watermarked and the join condition carries the time range, so Spark
  can evict state once the watermark passes the bound — without the
  range condition a stream-stream join would buffer forever.

Both functions also accept batch DataFrames (same plan, no watermark),
so the oracle/test story is identical to the batch operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_dedup(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exactly-once-per-key within the lateness budget.

    Streaming: `withWatermark` + `dropDuplicatesWithinWatermark` — state
    holds only keys newer than the watermark (bounded by arrival rate ×
    budget, not by total history). Batch: plain dropDuplicates on the
    same columns, so batch backfills and the live stream share one code
    path.
    """
    if df.isStreaming:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    max_delay: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Join right-events to left-events with the same ``key`` where
    ``left_ts <= right_ts <= left_ts + max_delay``.

    The equi-key hashes; the range rides along as a post-hash filter.
    On streams the watermark + range bound let Spark GC both state
    stores; on batch inputs the identical plan is a plain conditional
    join (AQE picks broadcast/SMJ). Column names must be disjoint apart
    from ``key``.

    ``how="left_outer"`` emits unmatched left rows with a NULL right
    side — but only once the GLOBAL watermark (the min over both inputs)
    passes the row's join window, and the emission lands in a LATER
    micro-batch than the one that advanced the watermark. An
    ``availableNow`` run therefore holds them in state for the next run
    (tests/test_streaming.py::test_interval_join_left_outer_emits_unmatched
    demonstrates the two-run emission).
    """
    if left.isStreaming:
        left = left.withWatermark(left_ts, watermark)
    if right.isStreaming:
        right = right.withWatermark(right_ts, watermark)
    lk = left[key] == right[key]
    in_range = (right[right_ts] >= left[left_ts]) & (
        right[right_ts] <= left[left_ts] + F.expr(f"INTERVAL {max_delay}")
    )
    return left.join(right, lk & in_range, how).drop(right[key])


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "left",
) -> DataFrame:
    """Enrich a stream with a static dimension table (stream-static join).

    The streaming counterpart of the batch broadcast-dimension joins
    (practitioner enrichment J3, cohort semi-join J4): the dimension is
    broadcast to every micro-batch, the stream side never buffers state
    (stream-static joins are stateless — only stream-stream joins hold
    store state), and the dimension is re-read per micro-batch, so a
    dimension table backed by a ManagedTable/Delta path picks up updates
    between batches without restarting the query.

    Works identically on batch frames — backfill and live share the plan.
    """
    keys = [on] if isinstance(on, str) else list(on)
    return stream.join(F.broadcast(dim), keys, how)
