"""r14: per-phase wall breakdown of ann_index_lifecycle on this host
(guide §1.2). Mirrors plans/sink_rigs.py:ann_index_lifecycle exactly;
times each phase so the left-alone decision is backed by current-host
numbers, not the r13 slow-host profile. 2 reps, warm JVM.
"""
from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from pyspark.sql import functions as F  # noqa: E402

from cumulus_etl_spark.session import get_spark  # noqa: E402
from cumulus_etl_spark.sources import table  # noqa: E402
from cumulus_etl_spark.streaming.ann_index import IvfIndex  # noqa: E402

spark = get_spark(app_name="r14-ann-phases")
spark.sparkContext.setLogLevel("ERROR")
SF = "/root/testdata/sf0.1"


def run() -> dict[str, float]:
    emb = table(spark, SF, "embeddings")
    root = tempfile.mkdtemp(prefix="ann_prof_")
    landing = os.path.join(root, "landing")
    out: dict[str, float] = {}

    def phase(name: str, fn):
        t0 = time.perf_counter()
        r = fn()
        out[name] = round(time.perf_counter() - t0, 3)
        return r

    try:
        idx = IvfIndex(spark, os.path.join(root, "ivf"))
        phase("build", lambda: idx.build(emb, n_centroids=16))
        phase("land1", lambda: emb.filter(F.col("vec_id") % 2 == 0)
              .write.parquet(landing, mode="overwrite"))
        phase("ingest1", lambda: idx.ingest(landing))
        phase("land2", lambda: emb.filter(F.col("vec_id") % 2 == 1)
              .write.parquet(landing, mode="append"))
        phase("ingest2", lambda: idx.ingest(landing))
        phase("stats", idx.stats)
        queries = emb.filter(F.col("vec_id") < 100)
        phase("search", lambda: idx.search(queries, k=10, n_probe=4).count())
        return out
    finally:
        shutil.rmtree(root, ignore_errors=True)


for rep in range(2):
    r = run()
    total = round(sum(r.values()), 3)
    print(f"rep{rep}: total={total} " + " ".join(f"{k}={v}" for k, v in r.items()))
print(f"load={os.getloadavg()[0]:.2f}")
