"""NDJSON source tests (SURVEY §2.1 S1-S5)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from cumulus_etl_spark.sources import (
    detect_resources,
    read_deleted_ids,
    scan_resources,
    scan_with_quarantine,
)
from tests.fhir_fixtures import write_ndjson, write_standard_input


def test_scan_filters_resource_type(spark, tmp_path):
    root = write_standard_input(str(tmp_path))
    df = scan_resources(spark, root, ["Patient"])
    rows = df.select("id", "gender", "birthDate").orderBy("id").collect()
    assert [r["id"] for r in rows] == ["pat-1", "pat-2"]
    assert rows[0]["gender"] == "female"


def test_scan_nested_fields(spark, tmp_path):
    root = write_standard_input(str(tmp_path))
    df = scan_resources(spark, root, ["Encounter"])
    row = df.filter(F.col("id") == "enc-1").select(F.col("class.code").alias("c"), "period.start").collect()[0]
    assert row["c"] == "AMB"
    assert row["start"] == "2021-02-01T09:00:00Z"


def test_scan_recursive_and_multi_type(spark, tmp_path):
    sub = tmp_path / "nested" / "deeper"
    write_ndjson(str(sub), "mixed.ndjson", [
        {"resourceType": "Patient", "id": "p9"},
        {"resourceType": "Condition", "id": "c9"},
        {"resourceType": "Device", "id": "d9"},  # not requested -> filtered
    ])
    df = scan_resources(spark, str(tmp_path), ["Patient", "Condition"])
    assert {r["id"] for r in df.select("id").collect()} == {"p9", "c9"}


def test_corrupt_rows_quarantined(spark, tmp_path):
    path = os.path.join(str(tmp_path), "bad.ndjson")
    os.makedirs(str(tmp_path), exist_ok=True)
    with open(path, "w") as fh:
        fh.write(json.dumps({"resourceType": "Patient", "id": "ok-1"}) + "\n")
        fh.write("{this is not json\n")
    good, bad = scan_with_quarantine(spark, str(tmp_path), ["Patient"])
    assert [r["id"] for r in good.select("id").collect()] == ["ok-1"]
    bad_rows = bad.collect()
    assert len(bad_rows) == 1
    assert "not json" in bad_rows[0]["raw_line"]


def test_detect_resources(spark, tmp_path):
    root = write_standard_input(str(tmp_path))
    found = detect_resources(spark, root)
    assert found == {"Patient", "Encounter", "Condition", "DocumentReference"}
    assert detect_resources(spark, str(tmp_path / "empty")) == set()


def test_read_deleted_ids(spark, tmp_path):
    write_ndjson(str(tmp_path / "deleted"), "del.ndjson", [
        {
            "resourceType": "Bundle",
            "entry": [
                {"request": {"method": "DELETE", "url": "Patient/pat-1"}},
                {"request": {"method": "DELETE", "url": "Observation/obs-3"}},
                {"request": {"method": "GET", "url": "Patient/pat-2"}},
            ],
        }
    ])
    df = read_deleted_ids(spark, str(tmp_path))
    got = {(r["resource_type"], r["id"]) for r in df.collect()}
    assert got == {("Patient", "pat-1"), ("Observation", "obs-3")}


def test_read_deleted_ids_empty(spark, tmp_path):
    df = read_deleted_ids(spark, str(tmp_path))
    assert df.count() == 0
