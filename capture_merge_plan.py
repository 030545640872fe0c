"""Capture the physical plan of the merge sink's version-write frame and
the delete's remaining-rows frame (the frames whose exchanges the r13
optimization targets) — bench.py's rig only explains the summary agg, so
these dedicated captures are the before/after evidence for plans/r13/.

Usage: python capture_merge_plan.py <suffix>   (writes plans/r13/merge_write_frame_<suffix>.txt)
"""

import contextlib
import io
import os
import sys
import tempfile
import shutil

from pyspark.sql import functions as F
from cumulus_etl_spark.session import get_spark
from cumulus_etl_spark.sources import table
from cumulus_etl_spark.sinks import ManagedTable, MergePolicy

suffix = sys.argv[1]
spark = get_spark(app_name="merge-plan-capture")
spark.sparkContext.setLogLevel("ERROR")
sf_dir = "/root/testdata/sf0.01"
orders = table(spark, sf_dir, "orders").select(
    F.col("o_orderkey").cast("string").alias("id"),
    F.col("o_orderstatus").alias("status"),
)
updates = orders.filter(F.col("id").cast("long") % 100 == 0).withColumn(
    "status", F.lit("U")
)
root = tempfile.mkdtemp(prefix="merge_plan_")
try:
    tbl = ManagedTable(spark, root, "t")
    pol = MergePolicy(keys=("id",), last_updated_field=None)
    tbl.merge(orders, pol)

    # Re-create the upsert's pre-write frame exactly as merge() builds it,
    # by monkeypatching _write_raw to capture instead of write.
    from cumulus_etl_spark.sinks.merge import BUCKET_COL, _bucket_expr

    captured = {}
    orig = ManagedTable._write_raw

    def spy(self, df, *a, **kw):
        # Reconstruct the exact frame _write_raw hands to the writer —
        # old code adds BUCKET_COL + repartition inside _write_raw, new
        # code receives it pre-bucketed (pre_bucketed=True) — so the
        # captured plan shows precisely the exchanges the write executes.
        if kw.get("pre_bucketed"):
            frame = df.sortWithinPartitions(BUCKET_COL, "id")
        else:
            frame = (
                df.withColumn(BUCKET_COL, _bucket_expr(("id",), 64))
                .repartition(F.col(BUCKET_COL))
                .sortWithinPartitions(BUCKET_COL, "id")
            )
        captured["df"] = frame
        captured["kw"] = kw
        return orig(self, df, *a, **kw)

    ManagedTable._write_raw = spy
    try:
        tbl.merge(updates, pol)
        upsert_df, upsert_kw = captured["df"], captured["kw"]
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            upsert_df.explain("formatted")
        upsert_plan = buf.getvalue()

        tbl.delete_ids([r["id"] for r in updates.select("id").limit(50).collect()])
        delete_df, delete_kw = captured["df"], captured["kw"]
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            delete_df.explain("formatted")
        delete_plan = buf.getvalue()
    finally:
        ManagedTable._write_raw = orig

    os.makedirs("plans/r13", exist_ok=True)
    with open(f"plans/r13/merge_write_frame_{suffix}.txt", "w") as fh:
        fh.write(
            f"== merge() upsert pre-write frame (pre_bucketed="
            f"{upsert_kw.get('pre_bucketed', False)}) ==\n{upsert_plan}\n"
            f"== delete_ids() pre-write frame (pre_bucketed="
            f"{delete_kw.get('pre_bucketed', False)}) ==\n{delete_plan}"
        )
    print(f"wrote plans/r13/merge_write_frame_{suffix}.txt")
finally:
    shutil.rmtree(root, ignore_errors=True)
