"""Same-JVM interleaved A/B of the r13 `_parallel_floor` per entry
(r13-verdict ask 1: bm25_topk regressed 2.65x driver-side; the floor was
the only code change on its path and shipped without a per-entry A/B).

Variant A = tree as-is (floor active); variant B = `_parallel_floor`
monkeypatched to identity. Output signatures (xxhash64 sum over every
column) must be identical — the floor is placement-only by design.

Usage: python _ab_floor.py [reps]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

import cumulus_etl_spark.operators.dedup as dedup_mod
from cumulus_etl_spark.plans import CATALOG
from cumulus_etl_spark.plans.catalog import BENCH_RIGS
from cumulus_etl_spark.session import get_spark

SF = "/root/testdata/sf0.1"
NAMES = ["text_minhash_dedup", "text_dedup_keep_best", "corpus_prepare_pipeline"]


def signature(df):
    agg = df.select(F.xxhash64(*df.columns).alias("h")).agg(
        F.count("h").alias("n"), F.sum(F.col("h").cast("decimal(38,0)")).alias("s")
    )
    row = agg.collect()[0]
    return (int(row["n"]), None if row["s"] is None else int(row["s"]))


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark(app_name="ab-floor-r14")
    spark.sparkContext.setLogLevel("ERROR")
    qs = dict(CATALOG)
    qs.update(BENCH_RIGS)
    real_floor = dedup_mod._parallel_floor

    def run(name, floored):
        dedup_mod._parallel_floor = real_floor if floored else (lambda df: df)
        try:
            spark.sparkContext.setJobDescription(
                f"ab-floor {name} floor={'on' if floored else 'off'}"
            )
            entry = qs[name]
            build = entry.build if hasattr(entry, "build") else entry
            t0 = time.monotonic()
            sig = signature(build(spark, SF))
            return time.monotonic() - t0, sig
        finally:
            dedup_mod._parallel_floor = real_floor

    for name in NAMES:
        if name not in qs:
            print(f"{name}: NOT FOUND"); continue
        # one warm-up of each arm (JIT/codegen), then interleaved reps
        run(name, True); run(name, False)
        on, off, sigs = [], [], set()
        for _ in range(reps):
            t, s = run(name, True); on.append(t); sigs.add(s)
            t, s = run(name, False); off.append(t); sigs.add(s)
        fmt = lambda xs: "[" + ", ".join(f"{x:.2f}" for x in xs) + "]"
        print(
            f"{name}: floor ON min {min(on):.3f} {fmt(on)} | "
            f"OFF min {min(off):.3f} {fmt(off)} | "
            f"signatures {'IDENTICAL' if len(sigs) == 1 else 'MISMATCH ' + repr(sigs)}"
        )


if __name__ == "__main__":
    main()
