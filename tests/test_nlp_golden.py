"""NLP golden-output e2e test (VERDICT r3 item 6; reference analog:
tests/data/nlp-regression/ — a frozen end-to-end NLP run compared
byte-for-byte so ANY envelope drift fails loudly).

Freezes a stub-model run_nlp_task output: envelope columns (note_ref /
encounter_ref / subject_ref / generated_on / task_version), match
structs with spans, the no-match null row, cache behavior, and group
replacement on re-run — with a PINNED codebook salt so the pseudonyms
are stable.

Regenerate after an INTENTIONAL change:
    REGEN_GOLDEN=1 python -m pytest tests/test_nlp_golden.py
then review the golden diff like any code change.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from cumulus_etl_spark.nlp.provider import StubSymptomModel
from cumulus_etl_spark.nlp.task import run_nlp_task
from cumulus_etl_spark.sinks import ManagedTable
from tests.test_golden import _normalize
from tests.test_nlp import docref, load_docrefs

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden", "nlp_lake.json")
TASK = "stub__symptoms"


def _fixture_docs():
    return [
        docref("d1", text="Severe cough and fever since Tuesday. Denies headache.",
               patient="p1", enc="e1"),
        docref("d2", text="Follow-up: no cough today; nausea resolved, mild congestion.",
               patient="p2", enc="e2"),
        docref("d3", text="Routine wellness visit, unremarkable exam.",  # no symptoms
               patient="p1", enc="e3"),
        docref("d4", url="https://blob/att-only"),  # no inline text -> funnel only
    ]


def _snapshot(spark, out_dir: str):
    df = ManagedTable(spark, out_dir, TASK).read()
    rows = [
        json.loads(r["j"])
        for r in df.select(F.to_json(F.struct("*")).alias("j")).collect()
    ]
    return sorted((_normalize(r) for r in rows), key=lambda r: r["id"])


def test_nlp_golden(spark, tmp_path):
    docs = load_docrefs(spark, tmp_path / "in", _fixture_docs())
    phi = str(tmp_path / "phi")
    os.makedirs(phi)
    with open(os.path.join(phi, "codebook.json"), "w") as fh:
        json.dump({"version": 1, "id": "pinned", "salt": "1234"}, fh)
    out = str(tmp_path / "out")

    funnel = run_nlp_task(
        spark, docs, StubSymptomModel(), TASK, task_version=4,
        output_dir=out, phi_dir=phi, generated_on="2021-03-05T00:00:00Z",
    )
    assert funnel == {"seen": 4, "with_text": 3, "from_cache": 0, "model_called": 3}

    snap = _snapshot(spark, out)
    if os.environ.get("REGEN_GOLDEN"):
        with open(GOLDEN_PATH, "w") as fh:
            json.dump(snap, fh, indent=1, sort_keys=True)
    with open(GOLDEN_PATH) as fh:
        golden = json.load(fh)
    assert snap == golden

    # Re-run: every note served from cache, zero model calls, and the
    # group replacement leaves the lake byte-identical.
    funnel2 = run_nlp_task(
        spark, docs, StubSymptomModel(), TASK, task_version=4,
        output_dir=out, phi_dir=phi, generated_on="2021-03-05T00:00:00Z",
    )
    assert funnel2 == {"seen": 4, "with_text": 3, "from_cache": 3, "model_called": 0}
    assert _snapshot(spark, out) == golden


def test_bundled_example_study_matrix(spark, tmp_path):
    """VERDICT r3 item 7: the bundled reference-format example study
    (cumulus_etl_spark/studies/example/) through the nlp CLI verb — the
    2-task x 2-model matrix produces one correctly-named output table per
    (task, model)."""
    from cumulus_etl_spark.cli import main as cli_main

    import cumulus_etl_spark

    study_dir = os.path.join(
        os.path.dirname(cumulus_etl_spark.__file__), "studies", "example"
    )
    from tests.fhir_fixtures import write_ndjson

    input_dir = str(tmp_path / "in")
    write_ndjson(input_dir, "docs.ndjson", [d for d in _fixture_docs() if "content" in d])
    out = str(tmp_path / "out")
    phi = str(tmp_path / "phi")

    rc = cli_main([
        "nlp", input_dir, out, phi,
        "--task-config", os.path.join(study_dir, "tasks.toml"),
    ])
    assert rc == 0

    expected = {
        f"example__nlp_{task}_{model}"
        for task in ("age", "smoking")
        for model in ("claude_sonnet45", "gpt4o")
    }
    produced = {
        name for name in os.listdir(out)
        if ManagedTable(spark, out, name).exists()
    }
    assert expected <= produced, (expected, produced)
    for name in expected:
        t = ManagedTable(spark, out, name)
        df = t.read()
        # envelope contract holds per table
        assert {"id", "note_ref", "encounter_ref", "subject_ref",
                "generated_on", "task_version"} <= set(df.columns)
        assert df.count() > 0
    # per-task versions flow through from the toml
    v_age = ManagedTable(spark, out, "example__nlp_age_gpt4o").read() \
        .select("task_version").first()["task_version"]
    v_smk = ManagedTable(spark, out, "example__nlp_smoking_gpt4o").read() \
        .select("task_version").first()["task_version"]
    assert (v_age, v_smk) == (1, 2)
