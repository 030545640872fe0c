"""Merge sink semantics tests — mirrors the reference's Delta behavior
suite (tests/formats/test_deltalake.py layer, SURVEY §5.5) against the
versioned-parquet fallback."""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import Row

from cumulus_etl_spark.sinks import ManagedTable, MergePolicy, dedupe_last_wins
from cumulus_etl_spark.sinks.batched import read_meta, write_ndjson_batches


def make_df(spark, rows):
    return spark.createDataFrame(
        [Row(id=i, val=v, meta=Row(lastUpdated=ts)) for i, v, ts in rows],
        "id string, val string, meta struct<lastUpdated: string>",
    )


def rows_of(tbl):
    return {
        r["id"]: (r["val"], r["meta"]["lastUpdated"] if r["meta"] else None)
        for r in tbl.read().collect()
    }


def test_insert_then_upsert(spark, tmp_path):
    tbl = ManagedTable(spark, str(tmp_path), "patient")
    pol = MergePolicy()
    tbl.merge(make_df(spark, [("a", "1", "2021-01-01T00:00:00Z"), ("b", "1", None)]), pol)
    assert rows_of(tbl)["a"] == ("1", "2021-01-01T00:00:00Z")
    tbl.merge(make_df(spark, [("a", "2", "2021-02-01T00:00:00Z"), ("c", "1", None)]), pol)
    got = rows_of(tbl)
    assert got["a"][0] == "2"  # updated
    assert got["b"][0] == "1"  # untouched
    assert got["c"][0] == "1"  # inserted


def test_last_updated_guard(spark, tmp_path):
    tbl = ManagedTable(spark, str(tmp_path), "t")
    pol = MergePolicy()
    tbl.merge(make_df(spark, [("a", "new", "2021-06-01T00:00:00Z")]), pol)
    # older update → rejected
    tbl.merge(make_df(spark, [("a", "stale", "2020-01-01T00:00:00Z")]), pol)
    assert rows_of(tbl)["a"][0] == "new"
    # equal timestamp → accepted (re-upload tolerance, deltalake.py:213-232)
    tbl.merge(make_df(spark, [("a", "same-ts", "2021-06-01T00:00:00Z")]), pol)
    assert rows_of(tbl)["a"][0] == "same-ts"
    # null timestamp on update → accepted (null-safe)
    tbl.merge(make_df(spark, [("a", "nullts", None)]), pol)
    assert rows_of(tbl)["a"][0] == "nullts"


def test_update_existing_false_keeps_first(spark, tmp_path):
    tbl = ManagedTable(spark, str(tmp_path), "t")
    pol = MergePolicy(update_existing=False)
    tbl.merge(make_df(spark, [("a", "first", None)]), pol)
    tbl.merge(make_df(spark, [("a", "second", None), ("b", "new", None)]), pol)
    got = rows_of(tbl)
    assert got["a"][0] == "first"
    assert got["b"][0] == "new"


def test_group_replacement(spark, tmp_path):
    """NLP re-run: 2 rows where 3 existed in a group → stale row deleted."""
    tbl = ManagedTable(spark, str(tmp_path), "t")
    pol = MergePolicy(keys=("id",), group_field="grp", last_updated_field=None)
    df1 = spark.createDataFrame(
        [("a", "g1", "x"), ("b", "g1", "x"), ("c", "g1", "x"), ("d", "g2", "x")],
        "id string, grp string, val string",
    )
    tbl.merge(df1, pol)
    df2 = spark.createDataFrame(
        [("a", "g1", "y"), ("b", "g1", "y")], "id string, grp string, val string"
    )
    tbl.merge(df2, pol)
    got = {r["id"]: r["val"] for r in tbl.read().collect()}
    assert got == {"a": "y", "b": "y", "d": "x"}  # c deleted, g2 untouched


def test_in_batch_duplicate_keys_freshest_wins(spark, tmp_path):
    tbl = ManagedTable(spark, str(tmp_path), "t")
    tbl.merge(
        make_df(
            spark,
            [("a", "old", "2021-01-01T00:00:00Z"), ("a", "fresh", "2021-03-01T00:00:00Z")],
        ),
        MergePolicy(),
    )
    assert rows_of(tbl)["a"][0] == "fresh"


def test_schema_evolution_adds_column(spark, tmp_path):
    tbl = ManagedTable(spark, str(tmp_path), "t")
    pol = MergePolicy(last_updated_field=None)
    tbl.merge(spark.createDataFrame([("a", "1")], "id string, val string"), pol)
    tbl.merge(
        spark.createDataFrame([("b", "2", "extra")], "id string, val string, added string"), pol
    )
    got = {r["id"]: r for r in tbl.read().collect()}
    assert got["a"]["added"] is None
    assert got["b"]["added"] == "extra"


def test_delete_ids(spark, tmp_path):
    tbl = ManagedTable(spark, str(tmp_path), "t")
    tbl.merge(make_df(spark, [("a", "1", None), ("b", "1", None), ("c", "1", None)]), MergePolicy())
    tbl.delete_ids(["a", "c"])
    assert set(rows_of(tbl)) == {"b"}


def test_crash_safety_and_finalize(spark, tmp_path):
    tbl = ManagedTable(spark, str(tmp_path), "t")
    tbl.merge(make_df(spark, [("a", "1", None)]), MergePolicy())
    tbl.merge(make_df(spark, [("b", "1", None)]), MergePolicy())
    # a stray half-written version dir without a pointer flip is invisible
    os.makedirs(os.path.join(tbl.path, "v99"))
    assert set(rows_of(tbl)) == {"a", "b"}
    assert tbl.current_version() == 2
    tbl.finalize()
    assert not os.path.exists(os.path.join(tbl.path, "v1"))
    assert set(rows_of(tbl)) == {"a", "b"}


def test_dedupe_last_wins_explicit_order(spark):
    df = spark.createDataFrame(
        [("a", "first", 1), ("a", "last", 2), ("b", "only", 1)],
        "id string, val string, ord int",
    )
    out = dedupe_last_wins(df, ["id"], "ord")
    got = {r["id"]: r["val"] for r in out.collect()}
    assert got == {"a": "last", "b": "only"}


def test_write_ndjson_batches_sidecar_and_nulls(spark, tmp_path):
    df = spark.createDataFrame(
        [("a", "g1", None), ("b", "g2", "x")], "id string, grp string, maybe string"
    )
    out = str(tmp_path / "out")
    write_ndjson_batches(df, out, batch_size=10, group_field="grp", deleted_ids=["z"])
    meta = read_meta(out)
    assert meta["groups"] == ["g1", "g2"]
    assert meta["deleted"] == ["z"]
    lines = []
    for f in glob.glob(os.path.join(out, "*.json")):
        with open(f) as fh:
            lines += [json.loads(line) for line in fh if line.strip()]
    by_id = {d["id"]: d for d in lines}
    assert "maybe" not in by_id["a"]  # sparse rows: nulls dropped
    assert by_id["b"]["maybe"] == "x"
