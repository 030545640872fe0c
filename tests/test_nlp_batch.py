"""Batch-API orchestration + response-schema compiler tests (U4, U7)."""

from __future__ import annotations

import json
import os

from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructType,
)

from cumulus_etl_spark.nlp.batch_api import BatchRun, LocalStubBatchProvider
from cumulus_etl_spark.nlp.provider import StubSymptomModel
from cumulus_etl_spark.nlp.response_schema import SPANS_TYPE, compile_response_schema


def test_compile_response_schema():
    spec = {
        "symptoms": [{"text": "str", "cui": "str", "spans": "spans"}],
        "severity": "int",
        "notes": "str?",
    }
    t = compile_response_schema(spec)
    assert isinstance(t, StructType)
    sym = t["symptoms"].dataType
    assert isinstance(sym, ArrayType) and isinstance(sym.elementType, StructType)
    assert sym.elementType["spans"].dataType == SPANS_TYPE
    assert t["severity"].dataType == LongType()
    assert t["notes"].dataType == StringType()
    inner = SPANS_TYPE.elementType
    assert isinstance(inner, ArrayType) and inner.elementType == IntegerType()


def test_batch_run_submit_poll_resume(spark, tmp_path):
    misses = spark.createDataFrame(
        [(f"sum{i}", f"note with cough number {i}") for i in range(10)],
        "checksum string, note_text string",
    )
    work = str(tmp_path / "batchwork")
    provider = LocalStubBatchProvider(StubSymptomModel())

    run = BatchRun(spark, work)
    meta1 = run.submit(misses, provider)
    assert meta1["total_requests"] == 10
    # resume: a second submit is a no-op returning the same metadata
    meta2 = run.submit(misses, provider)
    assert [b["batch_id"] for b in meta1["batches"]] == [b["batch_id"] for b in meta2["batches"]]

    assert run.poll(provider) is True
    results = run.results()
    assert results.count() == 10
    row = results.collect()[0]
    parsed = json.loads(row["result"])
    assert parsed and parsed[0]["text"] == "cough"

    # a fresh BatchRun over the same work dir resumes from disk metadata
    run2 = BatchRun(spark, work)
    assert run2.poll(provider) is True
    assert run2.results().count() == 10
    assert os.path.exists(os.path.join(work, "batch-metadata.json"))


def test_usage_accounting(spark):
    from cumulus_etl_spark.nlp.provider import StubSymptomModel, run_model
    from cumulus_etl_spark.nlp.usage import usage_summary

    notes = spark.createDataFrame(
        [("a", "cough and fever with six words here"), ("b", None)],
        "id string, note_text string",
    )
    scored = run_model(notes, StubSymptomModel())
    assert "usage" in scored.columns
    s = usage_summary(scored, price_per_mtok_in=3.0, price_per_mtok_out=15.0)
    assert s["calls"] == 2
    assert s["input_tokens"] == 7  # whitespace tokens of the non-null note
    assert s["output_tokens"] == 1
    assert s["cost"] > 0


def test_load_study_tasks_from_toml(tmp_path):
    from cumulus_etl_spark.nlp.studies import load_study_tasks

    toml = tmp_path / "tasks.toml"
    toml.write_text(
        '[tasks.demo__symptoms]\n'
        'version = 3\n'
        'model = "stub-symptoms"\n'
        'terms = ["wheeze", "rash"]\n'
        '[tasks.demo__symptoms.note_codings]\n'
        '"http://loinc.org" = ["34111-5"]\n'
        '\n'
        '[tasks.demo__all_notes]\n'
        'version = 1\n'
    )
    tasks = load_study_tasks(str(toml))
    by_name = {t.name: t for t in tasks}
    t1 = by_name["demo__symptoms"]
    assert t1.task_version == 3
    assert t1.model.terms == ("wheeze", "rash")
    assert t1.note_codings == {"http://loinc.org": {"34111-5"}}
    t2 = by_name["demo__all_notes"]
    assert t2.note_codings is None
    assert t2.model("wheeze and rash") == [] or t2.model.terms != ("wheeze", "rash")


def test_run_nlp_task_batch_mode(spark, tmp_path):
    from cumulus_etl_spark.nlp.batch_api import LocalStubBatchProvider
    from cumulus_etl_spark.nlp.task import run_nlp_task
    from cumulus_etl_spark.sinks import ManagedTable
    from cumulus_etl_spark.sources import scan_resources
    from tests.fhir_fixtures import write_ndjson
    from tests.test_nlp import _anon, docref

    model = StubSymptomModel()
    write_ndjson(str(tmp_path / "in"), "d.ndjson", [
        docref("d1", text="cough and headache today"),
        docref("d2", text="nothing to report"),
    ])
    df = scan_resources(spark, str(tmp_path / "in"), ["DocumentReference"])
    s = run_nlp_task(spark, df, model, "batch_study", 1, str(tmp_path / "out"),
                     str(tmp_path / "phi"), generated_on="2021-01-01T00:00:00Z",
                     batch_provider=LocalStubBatchProvider(model))
    assert s["with_text"] == 2 and s["from_cache"] == 0
    tbl = ManagedTable(spark, str(tmp_path / "out"), "batch_study").read()
    d1_ref = f"DocumentReference/{_anon(str(tmp_path / 'phi'), 'd1')}"
    d1 = tbl.filter(tbl["note_ref"] == d1_ref).collect()
    assert {r["match"]["text"] for r in d1} == {"cough", "headache"}
    # re-run in batch mode: everything cached now, no resubmission needed
    s2 = run_nlp_task(spark, df, model, "batch_study", 1, str(tmp_path / "out"),
                      str(tmp_path / "phi"), generated_on="2021-02-01T00:00:00Z",
                      batch_provider=LocalStubBatchProvider(model))
    assert s2["from_cache"] == 2
