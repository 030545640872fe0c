"""Scale proof: run the headline bench at sf0.1 AND at a ~10× replica
("sf1-equivalent") and report per-query scaling ratios.

The driver only ships sf≤0.1 test data, so the larger scale is
synthesized from sf0.1 itself: each fact table is unioned K times with
key-space offsets (ids shifted by copy × stride), so keys stay unique,
join fan-out stays realistic (each customer copy gets its own order
copies), and value distributions are preserved exactly. Dimension
tables (region/nation) keep their real-world cardinality — exactly how
TPC-H itself scales. This measures SCALING SHAPE, not correctness
(CORRECTNESS_r*.json owns that at sf0.01).

Usage:  python scale_proof.py [K]       (default K=10)
Prints one JSON line:
  {"metric": "scale_ratio_p50", "value": R, "unit": "x per 10x data",
   "queries": {name: {"sf0.1": s, "sf1": s, "ratio": r}, ...}}

A query whose ratio ≪ K scales sublinearly (fixed overhead dominates);
ratio ≈ K is linear; ratio ≫ K is superlinear and a red flag.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

from pyspark.sql import functions as F

from bench import materialize
from cumulus_etl_spark.plans import CATALOG
from cumulus_etl_spark.session import get_spark

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/cumulus-scale-sf1")

# key columns to offset per table so replicas don't collide.
# documents.source is keyed too: a 10× corpus means MORE sources (new
# domains/feeds), not 10× denser ones — per-source density is the blocked
# all-pairs operators' documented contract (operators/corpus.py,
# plans/textops.py), and holding it fixed mirrors how TPC-H grows fact
# data against stable dimension semantics. Without this, replicating
# docs into the same 20 sources inflates each quadratic ground-truth
# block 10× and measures the replica artifact, not the plan (observed:
# text_dedup_clusters 16.9× per 10× data from exactly this).
_KEYED = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],  # l_partkey/l_suppkey keep real cardinality
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id"],
    "documents": ["doc_id", "source"],
    "embeddings": ["vec_id"],
}
_DIMS = ("region", "nation")
STRIDE = 100_000_000


def build_replica(spark, k: int) -> None:
    # events carries TIMESTAMP(NANOS); read it the same way the catalog
    # loader does (sources/tables.py:45-51)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if os.path.isdir(WORK):
        shutil.rmtree(WORK)
    os.makedirs(WORK)
    for t in _DIMS:
        shutil.copy(f"{BASE}/{t}.parquet", f"{WORK}/{t}.parquet")
    for t, keys in _KEYED.items():
        src = spark.read.parquet(f"{BASE}/{t}.parquet")
        copies = []
        for i in range(k):
            c = src
            for key in keys:
                dt = dict(src.dtypes)[key]
                if dt in ("bigint", "int"):
                    c = c.withColumn(key, F.col(key) + F.lit(i * STRIDE))
                else:  # string ids: prefix the copy number
                    c = c.withColumn(
                        key, F.concat(F.lit(f"x{i}-" if i else ""), F.col(key))
                    )
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.write.mode("overwrite").parquet(f"{WORK}/{t}.parquet")


def run_suite(spark, sf_dir: str) -> dict[str, float]:
    timings = {}
    from cumulus_etl_spark.plans.catalog import BENCH_RIGS

    bench = {n: q for n, q in CATALOG.items() if q.bench}
    bench.update(BENCH_RIGS)  # bench-only rigs scale too (deid scrub)
    materialize(CATALOG["q1_pricing_summary"].build(spark, sf_dir))  # warm
    for name, q in sorted(bench.items()):
        t0 = time.perf_counter()
        materialize(q.build(spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)
    return timings


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark(app_name="cumulus-etl-spark-scale-proof")
    spark.sparkContext.setLogLevel("ERROR")
    build_replica(spark, k)
    small = run_suite(spark, BASE)
    big = run_suite(spark, WORK)
    queries = {
        n: {
            "sf0.1": small[n],
            f"sf{0.1 * k:g}": big[n],
            "ratio": round(big[n] / small[n], 2) if small[n] else None,
        }
        for n in sorted(small)
    }
    ratios = [v["ratio"] for v in queries.values() if v["ratio"]]
    print(
        json.dumps(
            {
                "metric": "scale_ratio_p50",
                "value": round(statistics.median(ratios), 2),
                "unit": f"x per {k}x data",
                "total_small": round(sum(small.values()), 2),
                "total_big": round(sum(big.values()), 2),
                "queries": queries,
            }
        )
    )


if __name__ == "__main__":
    main()
