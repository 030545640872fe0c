"""sample verb, export-log parse, catalog registration, CLI dispatch."""

from __future__ import annotations

import json
import os

from cumulus_etl_spark.cli import main as cli_main
from cumulus_etl_spark.etl.sample import sample_notes
from cumulus_etl_spark.sinks import ManagedTable, MergePolicy
from cumulus_etl_spark.sinks.catalog_ddl import register_table
from cumulus_etl_spark.sources.export_log import parse_export_log
from tests.fhir_fixtures import write_ndjson
from tests.test_nlp import docref


def test_sample_notes_deterministic(spark, tmp_path):
    docs = [docref(f"d{i}", text=f"note number {i}") for i in range(20)]
    docs.append(docref("d0", text="note number 0"))  # dup suppressed (F5)
    docs.append(docref("no-text"))  # F7: no inline text
    write_ndjson(str(tmp_path), "d.ndjson", docs)
    s1 = sample_notes(spark, str(tmp_path), 5, seed=7)
    s2 = sample_notes(spark, str(tmp_path), 5, seed=7)
    ids1 = [r["id"] for r in s1.collect()]
    ids2 = [r["id"] for r in s2.collect()]
    assert ids1 == ids2  # seeded determinism
    assert len(ids1) == 5 and len(set(ids1)) == 5
    assert "no-text" not in ids1


def test_parse_export_log(tmp_path):
    log = [
        {"eventId": "kickoff",
         "eventDetail": {"exportUrl": "https://fhir.example.com/Group/cohort-a/$export"}},
        {"eventId": "status_complete",
         "eventDetail": {"transactionTime": "2021-03-05T10:00:00Z"}},
    ]
    with open(os.path.join(str(tmp_path), "log.ndjson"), "w") as fh:
        for e in log:
            fh.write(json.dumps(e) + "\n")
    info = parse_export_log(str(tmp_path))
    assert info.group_name == "cohort-a"
    assert info.transaction_time == "2021-03-05T10:00:00Z"
    assert parse_export_log(str(tmp_path / "missing")) is None


def test_register_table_in_catalog(spark, tmp_path):
    tbl = ManagedTable(spark, str(tmp_path), "reg_demo")
    tbl.merge(spark.createDataFrame([("a", 1)], "id string, v int"), MergePolicy(last_updated_field=None))
    name = register_table(spark, tbl, db="testdb")
    assert name == "testdb.reg_demo"
    assert spark.sql("SELECT sum(v) s FROM testdb.reg_demo").collect()[0]["s"] == 1
    # merge then re-register points at the new version
    tbl.merge(spark.createDataFrame([("b", 2)], "id string, v int"), MergePolicy(last_updated_field=None))
    register_table(spark, tbl, db="testdb")
    assert spark.sql("SELECT sum(v) s FROM testdb.reg_demo").collect()[0]["s"] == 3


def test_cli_init_and_etl(spark, tmp_path, capsys):
    from tests.fhir_fixtures import write_standard_input

    input_dir = write_standard_input(str(tmp_path / "in"))
    rc = cli_main(["etl", input_dir, str(tmp_path / "out"), str(tmp_path / "phi"),
                   "--task", "patient"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["tables"]["patient"]["rows"] == 2
    rc = cli_main(["init", str(tmp_path / "out2")])
    assert rc == 0
