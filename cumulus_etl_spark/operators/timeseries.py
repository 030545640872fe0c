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


def cusum_changepoints_distributed(
    df: DataFrame,
    value_col: str,
    order_col: str,
    kappa: float = 0.5,
    h: float = 5.0,
    scan_partitions: int = 64,
    exact: bool = False,
) -> DataFrame:
    """Keyless CUSUM without the single-task ceiling: a distributed
    two-pass prefix scan.

    ``cusum_changepoints`` without a key runs the whole series through
    ONE task (an ordered fold has no free parallelism) — fine for the
    intended daily-counts input, wrong for a long raw series.  This
    variant implements the classic parallel-scan decomposition instead:

    1. range-partition the series on ``order_col`` and compute LOCAL
       prefix sums/extrema per partition (windows partitioned by the
       materialized partition id — all parallel);
    2. fold the ``scan_partitions`` per-partition aggregates (total,
       local prefix-min/max) into cumulative offsets driver-side — a
       BOUNDED collect, |partitions| rows, the centroid-collect
       discipline — and broadcast them back;
    3. finish per row: global prefix P_t = offset + local prefix,
       running extrema via min(prior partitions' floor, offset + local
       running extremum), then the same S+ = P − min(0, runmin) /
       S− = −(P − max(0, runmax)) identities as the single-task form.

    The alarm edge (``changepoint`` = first crossing) also needs the
    PREVIOUS row's alarm across partition boundaries; the driver fold
    derives each partition's last-row alarm from its aggregates and
    ships it as the first row's predecessor, so no second scan.

    Equality with the single-task form is pinned in tests to 1e-9 (the
    reassociated float sums differ only at ulp level).  Scale shape:
    two shuffles (range partition + the stats broadcast join), one
    bounded collect; no task ever holds more than |series|/partitions
    rows.

    ``exact=True`` quantizes the per-row deviations to DECIMAL(20,9)
    before any summation (the catalog dsum discipline applied to a
    prefix SCAN).  Precision 20 is a hard Spark constraint, not taste:
    a window SUM widens to precision+10 → decimal(30,9), and the
    carry-broadcast adds on top must stay within Spark's 38-digit
    ceiling or Catalyst silently REDUCES THE SCALE
    (allowPrecisionLoss) — at 28,9 the sums widen to 38,9, the adds
    overflow, and the output comes back at scale ~7, empirically
    breaking the bit-exactness this mode exists for (r13, found by the
    r12 advice's alignment attempt).  The DuckDB oracle casts to the
    SAME 20,9 (cross-engine equality needs the same SCALE; both stay
    overflow-free at this precision).  Decimal addition is exact and
    order-independent, so
    the distributed reassociation — local sums + driver-folded offsets
    — lands BIT-IDENTICAL to a sequential fold of the same quantized
    series on any engine, which is what lets the distributed path carry
    its own DuckDB hash row (plans/analytics.py:
    events_cusum_keyless_distributed).  The only remaining cross-engine
    freedom is the quantization itself, in two parts: (a) y is known to
    ~1e-15 relative (stddev_pop partial-merge order), 6 orders below
    the 1e-9 grid; (b) the double→decimal cast rounding mode — both
    Spark and DuckDB round HALF_UP at the grid, and an exact 5e-10
    midpoint is unrepresentable in binary doubles anyway, so the
    nearest-double argument both engines share resolves identically.
    Decimals carry no signed zero, so the round-11 -0.0 hash class is
    structurally dead here.  Cost: decimal ops run ~2-3x double ops —
    the audit mode, not the default."""
    keys: list[str] = []
    stats = df.groupBy(*keys).agg(
        F.avg(value_col).alias("__mu"),
        F.coalesce(F.stddev_pop(value_col), F.lit(0.0)).alias("__sigma"),
    )
    joined = df.crossJoin(F.broadcast(stats))
    sigma = F.greatest(F.col("__sigma"), F.lit(1e-12))
    y_pos = (F.col(value_col) - F.col("__mu")) / sigma - F.lit(kappa)
    y_neg = (F.col(value_col) - F.col("__mu")) / sigma + F.lit(kappa)
    if exact:
        y_pos = y_pos.cast("decimal(20,9)")
        y_neg = y_neg.cast("decimal(20,9)")

    ranged = (
        joined.repartitionByRange(scan_partitions, F.col(order_col))
        .select("*", F.spark_partition_id().alias("__pid"),
                y_pos.alias("__y_pos"), y_neg.alias("__y_neg"))
    )
    w = Window.partitionBy("__pid").orderBy(order_col)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    local = ranged.select(
        "*",
        F.sum("__y_pos").over(run).alias("__lp_pos"),
        F.sum("__y_neg").over(run).alias("__lp_neg"),
    ).select(
        "*",
        F.min("__lp_pos").over(run).alias("__lmin_pos"),
        F.max("__lp_neg").over(run).alias("__lmax_neg"),
    ).localCheckpoint(eager=True)
    # ^ pinned: the frame is executed twice (aggregate collect below +
    # the final join), and repartitionByRange SAMPLES its boundaries per
    # execution — without the checkpoint the second execution could
    # partition differently than the one the offsets were folded from.
    # The checkpoint is also the scan's natural cost shape: pass 2
    # reuses pass 1's rows instead of recomputing the windows.
    per_part = (
        local.groupBy("__pid")
        .agg(
            F.sum("__y_pos").alias("__tot_pos"),
            F.sum("__y_neg").alias("__tot_neg"),
            F.min("__lp_pos").alias("__min_pos"),
            F.max("__lp_neg").alias("__max_neg"),
        )
        .orderBy("__pid")
        .collect()
    )
    # driver fold over <= scan_partitions rows: cumulative offsets, the
    # running extrema floor carried INTO each partition, and the
    # previous partition's last-row alarm for the boundary edge.
    # Arithmetic stays in whatever type the scan used (decimal.Decimal
    # in exact mode — a float detour here would undo the exactness);
    # "no prior partition" is None, which Spark's least/greatest skip
    # exactly like the fold's min/max-with-infinity did.
    from decimal import Decimal

    zero = Decimal(0) if exact else 0.0
    carry = []
    off_pos = off_neg = zero
    prior_min = None   # min of global prefixes BEFORE this partition
    prior_max = None
    prev_last_alarm = False
    for r in per_part:
        carry.append((int(r["__pid"]), off_pos, off_neg,
                      prior_min, prior_max, prev_last_alarm))
        end_pos = off_pos + r["__tot_pos"]
        end_neg = off_neg + r["__tot_neg"]
        local_min = off_pos + r["__min_pos"]
        local_max = off_neg + r["__max_neg"]
        end_min = local_min if prior_min is None else min(prior_min, local_min)
        end_max = local_max if prior_max is None else max(prior_max, local_max)
        s_pos_last = end_pos - min(zero, end_min)
        s_neg_last = -(end_neg - max(zero, end_max))
        prev_last_alarm = float(s_pos_last) > h or float(s_neg_last) > h
        prior_min, prior_max = end_min, end_max
        off_pos, off_neg = end_pos, end_neg
    spark = df.sparkSession
    num_t = "decimal(30,9)" if exact else "double"
    carry_df = spark.createDataFrame(
        carry,
        f"__pid int, __off_pos {num_t}, __off_neg {num_t}, "
        f"__prior_min {num_t}, __prior_max {num_t}, __prev_last_alarm boolean",
    )
    g = local.join(F.broadcast(carry_df), "__pid")
    zlit = F.lit(Decimal(0)).cast(num_t) if exact else F.lit(0.0)
    p_pos = F.col("__off_pos") + F.col("__lp_pos")
    p_neg = F.col("__off_neg") + F.col("__lp_neg")
    runmin = F.least(F.col("__prior_min"), F.col("__off_pos") + F.col("__lmin_pos"))
    runmax = F.greatest(F.col("__prior_max"), F.col("__off_neg") + F.col("__lmax_neg"))
    s_pos = p_pos - F.least(zlit, runmin)
    s_neg = -(p_neg - F.greatest(zlit, runmax))
    out = g.withColumn("cusum_pos", s_pos).withColumn("cusum_neg", s_neg)
    alarm = (F.col("cusum_pos") > h) | (F.col("cusum_neg") > h)
    prev = F.coalesce(
        F.lag(alarm, 1).over(w),          # within-partition predecessor
        F.col("__prev_last_alarm"),       # boundary: prior partition's last row
    )
    return (
        out.withColumn("changepoint", alarm & ~prev)
        .drop("__mu", "__sigma", "__pid", "__y_pos", "__y_neg",
              "__lp_pos", "__lp_neg", "__lmin_pos", "__lmax_neg",
              "__off_pos", "__off_neg", "__prior_min", "__prior_max",
              "__prev_last_alarm")
    )
