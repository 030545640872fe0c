"""Wall-clock proof for the distributed keyless CUSUM (round-11
verdict ask 5 / round-12 delivery): the two-pass prefix scan
(operators/timeseries.py:cusum_changepoints_distributed) vs the
single-task keyless form on a LONG series, and its scaling with
``scan_partitions``.

The series is deterministic and synthetic (spark.range + hash noise +
a real level shift at 60%) because the shipped parquet has no
10M-point ordered series — this measures the SCAN's shape, not query
correctness (the operator's values are oracled at sf0.01 via
`events_cusum_keyless_distributed` and pinned ≡ single-task in
tests/test_timeseries.py).

Usage:  python cusum_scan_proof.py [N]     (default N=10_000_000)
Prints one JSON line:
  {"metric": "cusum_scan", "n": N,
   "single_task_sec": s, "distributed": {"4": s, "32": s, "128": s},
   "speedup_at_32": x}
Each timing is min-of-2 (JIT/cache warmup excluded the cheap way).
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

from cumulus_etl_spark.operators.timeseries import (
    cusum_changepoints,
    cusum_changepoints_distributed,
)
from cumulus_etl_spark.session import get_spark


def build_series(spark, n: int):
    base = spark.range(n).select(
        F.col("id").alias("t"),
        (
            F.lit(10.0)
            + F.pmod(F.hash(F.col("id")), F.lit(1000)).cast("double") / 250.0
            + F.when(F.col("id") >= int(n * 0.6), 3.0).otherwise(0.0)
        ).alias("x"),
    )
    # materialize once so every variant times the SCAN, not range codegen
    df = base.localCheckpoint(eager=True)
    return df


def timed(fn) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    return round(best, 2)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    spark = get_spark("cusum-scan-proof")
    df = build_series(spark, n)

    def force(out) -> None:
        # sum + count forces every window/carry column
        out.select(
            F.sum("cusum_pos"), F.sum("cusum_neg"), F.count(F.lit(1))
        ).collect()

    single = timed(lambda: force(cusum_changepoints(df, "x", "t")))
    dist = {
        str(p): timed(
            lambda p=p: force(
                cusum_changepoints_distributed(df, "x", "t", scan_partitions=p)
            )
        )
        for p in (4, 32, 128)
    }
    print(json.dumps({
        "metric": "cusum_scan",
        "n": n,
        "single_task_sec": single,
        "distributed": dist,
        "speedup_at_32": round(single / dist["32"], 2) if dist["32"] else None,
    }))


if __name__ == "__main__":
    main()
