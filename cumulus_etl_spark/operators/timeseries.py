"""Time-series regime analysis: CUSUM changepoint detection.

The events family (plans/analytics.py) covers rates, anomalies
(z-score, EWMA), retention and transitions; what it lacks is SUSTAINED
mean-shift detection — "the rate didn't spike, it moved". CUSUM (Page
1954) is the standard test, but its recurrence

    S+_t = max(0, S+_{t-1} + y_t)        y_t = x_t - mu - kappa*sigma

looks like an imperative fold. It is not: with P_t = sum(y_1..y_t),

    S+_t = P_t - min(P_0..P_t)           (and symmetrically S- with max)

so both one-sided statistics are a running SUM window plus a running
MIN/MAX window — pure Catalyst, no UDF, no recursion, and the same two
windows DuckDB would run. Per-key detection partitions both windows by
the key: one shuffle on the key, state never leaves the executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def cusum_changepoints(
    df: DataFrame,
    value_col: str,
    order_col: str,
    key_col: str | None = None,
    kappa: float = 0.5,
    h: float = 5.0,
) -> DataFrame:
    """Two-sided CUSUM over an ordered series (optionally per key).

    Reference mean/std come from the series itself (per key when
    ``key_col`` is given — one aggregate, broadcast back by join);
    ``kappa`` is the slack and ``h`` the decision threshold, both in
    units of the reference std (the usual (0.5, 5) defaults detect a
    1-sigma sustained shift quickly while ignoring noise).

    Output: input columns + ``cusum_pos``, ``cusum_neg`` (in sigmas) and
    ``changepoint`` (true where either statistic first crosses h coming
    from below — the alarm points, not the whole excursion).

    Scale note: with ``key_col`` the windows partition by key (one
    shuffle, arbitrary key cardinality). Without it the ordered fold is
    inherently sequential, so the series lands in ONE task — correct
    for the intended input (an already-aggregated series like daily
    counts: thousands of rows), wrong for raw event streams; aggregate
    first."""
    keys = [key_col] if key_col else []
    stats = df.groupBy(*keys).agg(
        F.avg(value_col).alias("__mu"),
        F.coalesce(F.stddev_pop(value_col), F.lit(0.0)).alias("__sigma"),
    )
    joined = (
        df.join(F.broadcast(stats), keys) if keys
        else df.crossJoin(F.broadcast(stats))
    )
    sigma = F.greatest(F.col("__sigma"), F.lit(1e-12))  # constant series guard
    y_pos = (F.col(value_col) - F.col("__mu")) / sigma - F.lit(kappa)
    y_neg = (F.col(value_col) - F.col("__mu")) / sigma + F.lit(kappa)
    w = Window.partitionBy(*keys).orderBy(order_col) if keys else (
        Window.orderBy(order_col)
    )
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    p_pos = F.sum(y_pos).over(run)
    p_neg = F.sum(y_neg).over(run)
    # the max(0, ...) fold as running-extreme identities; min/max over
    # (0, prefix sums) — the leading 0 is the fold's S_0 = 0
    s_pos = p_pos - F.least(F.lit(0.0), F.min(p_pos).over(run))
    s_neg = -(p_neg - F.greatest(F.lit(0.0), F.max(p_neg).over(run)))
    out = joined.withColumn("cusum_pos", s_pos).withColumn("cusum_neg", s_neg)
    alarm = (F.col("cusum_pos") > h) | (F.col("cusum_neg") > h)
    prev = F.lag(alarm, 1, False).over(w)
    return (
        out.withColumn("changepoint", alarm & ~prev)
        .drop("__mu", "__sigma")
    )
