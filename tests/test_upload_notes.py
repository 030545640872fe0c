"""Chart-review operator tests (J3/J5/O4/O5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cumulus_etl_spark.etl.upload_notes import (
    enrich_with_practitioners,
    group_notes_by_encounter,
    order_charts,
    pick_human_name,
)
from cumulus_etl_spark.nlp import extract_note_text
from cumulus_etl_spark.sources import scan_resources
from tests.fhir_fixtures import write_ndjson
from tests.test_nlp import docref


def test_pick_human_name(spark):
    df = spark.createDataFrame(
        [
            ([{"use": "nickname", "family": "Nick", "given": ["N"]},
              {"use": "official", "family": "Off", "given": ["O", "Q"]},
              {"use": "usual", "family": "Usu", "given": ["U"]}],),
            ([{"use": None, "family": "Only", "given": None}],),
            (None,),
        ],
        "name array<struct<use:string,family:string,given:array<string>>>",
    )
    got = [r["d"] for r in df.select(pick_human_name(F.col("name")).alias("d")).collect()]
    assert got == ["O Q Off", "Only", None]


def test_enrich_with_practitioners(spark, tmp_path):
    notes = spark.createDataFrame(
        [("d1", [{"reference": "PractitionerRole/r1"}]),
         ("d2", [{"reference": "Practitioner/p2"}]),
         ("d3", None)],
        "id string, author array<struct<reference:string>>",
    )
    roles = spark.createDataFrame(
        [("r1", {"reference": "Practitioner/p1"},
          [{"text": "Cardiology"}, {"text": "Internal Medicine"}])],
        "id string, practitioner struct<reference:string>, specialty array<struct<text:string>>",
    )
    pracs = spark.createDataFrame(
        [("p1", [{"use": "official", "family": "House", "given": ["Greg"]}]),
         ("p2", [{"use": "usual", "family": "Wilson", "given": ["James"]}])],
        "id string, name array<struct<use:string,family:string,given:array<string>>>",
    )
    out = {r["id"]: r for r in enrich_with_practitioners(notes, roles, pracs).collect()}
    assert out["d1"]["author_display"] == "Greg House"  # via role hop
    assert out["d1"]["author_specialties"] == ["Cardiology", "Internal Medicine"]
    assert out["d2"]["author_display"] == "James Wilson"  # direct ref
    assert out["d3"]["author_display"] is None


def test_group_notes_by_encounter_offsets(spark, tmp_path):
    docs = [
        docref("n1", text="AAAA", enc="e1"),
        docref("n2", text="BBBBBB", enc="e1"),
        docref("n3", text="CC", enc="e2"),
    ]
    # dates drive merge order inside the chart
    docs[0]["date"] = "2021-01-02T00:00:00Z"
    docs[1]["date"] = "2021-01-01T00:00:00Z"
    docs[2]["date"] = None
    write_ndjson(str(tmp_path), "d.ndjson", docs)
    notes = extract_note_text(scan_resources(spark, str(tmp_path), ["DocumentReference"]))
    charts = {r["chart_id"]: r for r in group_notes_by_encounter(notes).collect()}
    e1 = charts["Encounter/e1"]
    assert e1["chart_text"] == "BBBBBB\n\nAAAA"  # date order, n2 first
    n2, n1 = e1["notes"]
    assert (n2["offset_start"], n2["offset_end"]) == (0, 6)
    assert (n1["offset_start"], n1["offset_end"]) == (8, 12)  # after "\n\n"
    assert e1["chart_text"][n1["offset_start"]:n1["offset_end"]] == "AAAA"
    assert charts["Encounter/e2"]["chart_text"] == "CC"


def test_order_charts_nulls_last(spark, tmp_path):
    docs = [
        docref("n1", text="x", enc="e1"),
        docref("n2", text="y", enc="e2"),
        docref("n3", text="z", enc="e3"),
    ]
    docs[0]["date"] = "2021-06-01T00:00:00Z"
    docs[1]["date"] = None
    docs[2]["date"] = "2021-01-01T00:00:00Z"
    write_ndjson(str(tmp_path), "d.ndjson", docs)
    notes = extract_note_text(scan_resources(spark, str(tmp_path), ["DocumentReference"]))
    ordered = [r["chart_id"] for r in order_charts(group_notes_by_encounter(notes)).collect()]
    assert ordered == ["Encounter/e3", "Encounter/e1", "Encounter/e2"]
