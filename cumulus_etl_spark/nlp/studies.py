"""Study task definitions: config-driven NLP pipelines (SURVEY §2.9 U3;
ref etl/studies/covid_symptom/covid_tasks.py, dynamic TOML tasks
nlp_task.py:485-561).

A study task = note filter config + model + task metadata. The
covid_symptom-shaped example composes the ED-note coding filter with the
symptom model; swapping the model/filter dict defines a new study with
no new code — the reference's ``tasks.toml`` mechanism as plain data.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from cumulus_etl_spark.nlp.provider import StubSymptomModel
from cumulus_etl_spark.nlp.selection import filter_by_coding
from cumulus_etl_spark.nlp.task import run_nlp_task


@dataclass(frozen=True)
class StudyTask:
    name: str
    task_version: int
    model: object
    # (system → codes) allow-list for note type/category; None = all notes
    note_codings: dict | None = None
    filter_fields: tuple[str, ...] = ("type", "category")

    def run(
        self,
        spark: SparkSession,
        docrefs: DataFrame,
        output_dir: str,
        phi_dir: str,
        generated_on: str,
        batch_provider=None,
    ) -> dict:
        notes = docrefs
        if self.note_codings:
            notes = filter_by_coding(notes, self.note_codings, self.filter_fields)
        return run_nlp_task(
            spark,
            notes,
            self.model,
            self.name,
            self.task_version,
            output_dir,
            phi_dir,
            generated_on,
            batch_provider=batch_provider,
        )


# ED-visit note codings (LOINC ED notes + a couple of system-specific
# document-type codes; shape of covid_tasks.py:18-79's dictionary).
ED_NOTE_CODINGS: dict[str, set[str]] = {
    "http://loinc.org": {
        "18842-5",  # Discharge summary
        "34878-9",  # Emergency medicine note
        "34111-5",  # Emergency department note
        "47039-3",  # Inpatient admission history and physical note
    },
}

COVID_SYMPTOM_TASK = StudyTask(
    name="covid_symptom__nlp_results",
    task_version=1,
    model=StubSymptomModel(),
    note_codings=ED_NOTE_CODINGS,
)


def load_study_tasks(toml_path: str, models: dict | None = None) -> list[StudyTask]:
    """Dynamic task loading from a tasks.toml (ref nlp_task.py:485-561 +
    etl/studies/*/tasks.toml): each ``[tasks.<name>]`` block gives the
    version, model name, and optional note-coding filter.

    ::

        [tasks.my_study__symptoms]
        version = 2
        model = "stub-symptoms"          # key into the models registry
        terms = ["cough", "fever"]       # stub model dictionary override
        [tasks.my_study__symptoms.note_codings]
        "http://loinc.org" = ["34111-5"]
    """
    import tomllib

    with open(toml_path, "rb") as fh:
        doc = tomllib.load(fh)
    registry = {"stub-symptoms": StubSymptomModel}
    registry.update(models or {})
    out = []
    for name, spec in doc.get("tasks", {}).items():
        model_cls = registry[spec.get("model", "stub-symptoms")]
        kwargs = {}
        if "terms" in spec and model_cls is StubSymptomModel:
            kwargs["terms"] = tuple(spec["terms"])
        codings = spec.get("note_codings")
        out.append(
            StudyTask(
                name=name,
                task_version=int(spec.get("version", 1)),
                model=model_cls(**kwargs),
                note_codings={k: set(v) for k, v in codings.items()} if codings else None,
            )
        )
    return out
