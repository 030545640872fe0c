"""r14 sf1 measurement rig (verdict asks 4 and 7).

Ask 4: job time of ``_vocab_injective`` at sf1 as a share of the
prefix_filter_pairs entry it guards.

Ask 7: task-skew proof for the measured-fan-out stages of
``prefix_filter_pairs`` at sf1 — the bench's 10x key-shifted replication
carries 10-sized exact-duplicate clusters per doc, the designed stress
feed. ``_fanout_partitions`` sizes the expansion/verify stages by TOTAL
fan-out; a single pathological bucket would still land in one task
(guide §2.5). Evidence: per-stage max-vs-median task time from the
event log, keyed to phases by job description.

Run: python plans/r14/_measure_sf1_dedup.py  (quiet machine)
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

EVDIR = "/tmp/spark-events-r14"
os.makedirs(EVDIR, exist_ok=True)

from cumulus_etl_spark.session import get_spark  # noqa: E402
from cumulus_etl_spark.operators import dedup as D  # noqa: E402

spark = get_spark(
    app_name="r14-sf1-dedup-measure",
    extra_conf={
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": f"file://{EVDIR}",
        # no zstandard module in the sandbox: keep the log parseable
        "spark.eventLog.compress": "false",
    },
)
spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext

SF1 = os.path.join(os.path.dirname(__file__), "..", "..", "_scale_sf1")
d = spark.read.parquet(f"{SF1}/documents.parquet")

# ---- warmup (JVM + file listing; not measured) ----
d.count()

results = {}

# ---- ask 4: _vocab_injective share ----
sh = D._shingle_frame(d, "doc_id", "text", "source", 1).cache()
sc.setJobDescription("r14: materialize shingle frame (excluded)")
sh.write.format("noop").mode("overwrite").save()

sc.setJobDescription("r14: _vocab_injective")
t0 = time.perf_counter()
ok = D._vocab_injective(sh)
vocab_s = time.perf_counter() - t0
results["vocab_injective_s"] = round(vocab_s, 3)
results["vocab_injective_ok"] = ok
sh.unpersist()

# ---- full entry, cold lineage: prefix_filter_pairs at sf1 ----
sc.setJobDescription("r14: prefix_filter_pairs sf1")
t0 = time.perf_counter()
pairs = D.prefix_filter_pairs(
    d, "doc_id", "text", threshold=0.5, block_col="source", shingle_k=1
)
entry_s = time.perf_counter() - t0
results["prefix_filter_pairs_s"] = round(entry_s, 3)
results["n_pairs"] = pairs.count()
results["vocab_share_of_entry"] = round(vocab_s / entry_s, 4)
sc.setJobDescription(None)

spark.stop()
print(json.dumps(results, indent=1))

# ---- parse event log: per-stage task skew ----
# Spark 4 rolling logs are DIRECTORIES (eventlog_v2_<app>/events_*).
ev_entries = sorted(
    (os.path.join(EVDIR, f) for f in os.listdir(EVDIR)),
    key=os.path.getmtime,
)
latest = ev_entries[-1]
if os.path.isdir(latest):
    parts = sorted(
        os.path.join(latest, f)
        for f in os.listdir(latest)
        if f.startswith("events_")
    )
else:
    parts = [latest]


def _lines():
    for p in parts:
        with open(p) as fh:
            yield from fh


stage_tasks: dict[int, list[float]] = {}
stage_name: dict[int, str] = {}
stage_to_desc: dict[int, str] = {}
if True:
    for line in _lines():
        e = json.loads(line)
        ev = e.get("Event")
        if ev == "SparkListenerJobStart":
            desc = e.get("Properties", {}).get("spark.job.description", "")
            for si in e.get("Stage Infos", []):
                stage_to_desc[si["Stage ID"]] = desc
        elif ev == "SparkListenerStageCompleted":
            si = e["Stage Info"]
            stage_name[si["Stage ID"]] = si["Stage Name"]
        elif ev == "SparkListenerTaskEnd":
            ti = e.get("Task Info", {})
            dur = (ti.get("Finish Time", 0) - ti.get("Launch Time", 0)) / 1000.0
            stage_tasks.setdefault(e["Stage ID"], []).append(dur)

stages = []
for sid, durs in sorted(stage_tasks.items()):
    med = statistics.median(durs)
    stages.append(
        {
            "stage": sid,
            "desc": stage_to_desc.get(sid, "")[:48],
            "name": stage_name.get(sid, "?")[:60],
            "n_tasks": len(durs),
            "sum_s": round(sum(durs), 2),
            "med_s": round(med, 3),
            "max_s": round(max(durs), 3),
            "skew": round(max(durs) / max(med, 1e-3), 1),
        }
    )

print("\nper-stage task skew (prefix_filter_pairs sf1 phase only shown last):")
for s in stages:
    print(
        f"  stage {s['stage']:>3} tasks={s['n_tasks']:>4} sum={s['sum_s']:>7}s "
        f"med={s['med_s']:>7}s max={s['max_s']:>7}s skew={s['skew']:>5}x  "
        f"{s['desc']} | {s['name']}"
    )
