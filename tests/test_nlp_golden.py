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
