"""r14: isolate q5_local_supplier_volume at sf1 (baseline scale block
flagged ratio 17.9 once, single-run measurement under loadavg ~9).
3 cold-lineage reps at sf1 + the executed plan, quiet machine."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from pyspark.sql import functions as F  # noqa: E402

from cumulus_etl_spark.plans import CATALOG  # noqa: E402
from cumulus_etl_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name="r14-q5-sf1")
spark.sparkContext.setLogLevel("ERROR")
SF1 = os.path.join(os.path.dirname(__file__), "..", "..", "_scale_sf1")
SF01 = "/root/testdata/sf0.1"


def mat(df):
    agg = df.select(F.xxhash64(*df.columns).alias("h")).agg(
        F.count("h").alias("n"), F.sum(F.col("h").cast("decimal(38,0)")).alias("s")
    )
    return tuple(agg.collect()[0])


q = CATALOG["q5_local_supplier_volume"]
mat(q.build(spark, SF01))  # warm JVM/codegen on the small side
for name, d in (("sf0.1", SF01), ("sf1", SF1)):
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        sig = mat(q.build(spark, d))
        times.append(round(time.perf_counter() - t0, 3))
    print(f"q5 {name}: {times} min={min(times):.3f} sig={sig}")

df = q.build(spark, SF1)
df.explain("formatted")
