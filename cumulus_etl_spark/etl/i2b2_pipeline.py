"""The i2b2 ETL verb: CSV dump → FHIR frames → de-identified lake
(SURVEY §3.1 i2b2 branch; ref etl/pipeline.py:192-195 chooses the i2b2
loader, loaders/i2b2/loader.py drives the conversion).

File conventions (reference CSV dump layout):
  patient_dimension.csv          → Patient
  visit_dimension.csv            → Encounter
  observation_fact_diagnosis.csv → Condition
  observation_fact_lab_views.csv / observation_fact_vitals.csv → Observation
  observation_fact_notes.csv     → DocumentReference
  observation_fact_medications.csv → MedicationRequest
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from cumulus_etl_spark.deid import Codebook, Scrubber
from cumulus_etl_spark.etl.config import check_output_phi_pairing
from cumulus_etl_spark.sinks import ManagedTable, MergePolicy
from cumulus_etl_spark.sources import i2b2

_FILE_MAP: list[tuple[str, str, str]] = [
    # (csv filename, resource type, loader fn name)
    ("patient_dimension.csv", "Patient", "patients"),
    ("visit_dimension.csv", "Encounter", "encounters"),
    ("observation_fact_diagnosis.csv", "Condition", "conditions"),
    ("observation_fact_lab_views.csv", "Observation", "observations"),
    ("observation_fact_vitals.csv", "Observation", "observations"),
    ("observation_fact_notes.csv", "DocumentReference", "documentreferences"),
    ("observation_fact_medications.csv", "MedicationRequest", "medicationrequests"),
]


def run_etl_i2b2(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    phi_dir: str,
    philter: bool = False,
) -> dict:
    """i2b2 CSVs present in ``input_dir`` → scrubbed managed tables."""
    codebook = Codebook(phi_dir)
    check_output_phi_pairing(output_dir, codebook.codebook_id)
    scrubber = Scrubber(salt=codebook.salt, philter_enabled=philter)

    summary: dict = {"tables": {}, "success": True}
    for filename, resource_type, fn_name in _FILE_MAP:
        path = os.path.join(input_dir, filename)
        if not os.path.exists(path):
            continue
        fhir: DataFrame = getattr(i2b2, fn_name)(spark, path)
        codebook.save_mappings(fhir, resource_type)
        scrubbed = scrubber.scrub(fhir, resource_type)
        table_name = resource_type.lower()
        table = ManagedTable(spark, output_dir, table_name)
        table.merge(scrubbed, MergePolicy())
        rows = table.read().count()
        # Two CSVs can feed one table (lab_views + vitals → observation);
        # accumulate sources instead of letting the last file overwrite.
        entry = summary["tables"].setdefault(table_name, {"rows": 0, "sources": []})
        entry["rows"] = rows  # table total after this merge
        entry["sources"].append(filename)
    return summary
