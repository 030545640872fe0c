"""Golden-output e2e test (reference test strategy layer 1, SURVEY §5):
run the real pipeline on the checked-in fixture with a PINNED codebook
salt, JSON-normalize the whole lake, compare against a golden file.

Regenerate after an INTENTIONAL output change:
    REGEN_GOLDEN=1 python -m pytest tests/test_golden.py
then review the golden diff like any code change.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from cumulus_etl_spark.etl import run_etl
from cumulus_etl_spark.sinks import ManagedTable
from tests.fhir_fixtures import write_standard_input

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden", "simple_lake.json")
PINNED_SALT = "1234"
TABLES = ("patient", "encounter", "condition", "documentreference")


def _normalize(value):
    """Drop nulls/empties recursively; sort keys — formatting-insensitive
    comparison like the reference's TreeCompareMixin (tests/utils.py)."""
    if isinstance(value, dict):
        out = {k: _normalize(v) for k, v in sorted(value.items())}
        return {k: v for k, v in out.items() if v not in (None, [], {})}
    if isinstance(value, list):
        return [_normalize(v) for v in value]
    return value


def lake_snapshot(spark, output_dir: str) -> dict:
    snap = {}
    for t in TABLES:
        df = ManagedTable(spark, output_dir, t).read()
        rows = [
            json.loads(r["j"])
            for r in df.select(F.to_json(F.struct("*")).alias("j")).collect()
        ]
        snap[t] = sorted((_normalize(r) for r in rows), key=lambda r: r.get("id", ""))
    return snap


def test_golden_lake(spark, tmp_path):
    input_dir = write_standard_input(str(tmp_path / "in"))
    phi = str(tmp_path / "phi")
    os.makedirs(phi)
    with open(os.path.join(phi, "codebook.json"), "w") as fh:
        json.dump({"version": 1, "id": "pinned", "salt": PINNED_SALT}, fh)
    out = str(tmp_path / "out")
    summary = run_etl(spark, input_dir, out, phi, group_name="golden",
                      export_datetime="2021-03-05T00:00:00Z")
    assert summary["success"]

    snap = lake_snapshot(spark, out)
    if os.environ.get("REGEN_GOLDEN") == "1" or not os.path.exists(GOLDEN_PATH):
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        with open(GOLDEN_PATH, "w") as fh:
            json.dump(snap, fh, indent=1, sort_keys=True)
    with open(GOLDEN_PATH) as fh:
        golden = json.load(fh)
    assert snap == golden
