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


def load_study_tasks(
    toml_path: str,
    models: dict | None = None,
    llm_url: str | None = None,
    prefix: str | None = None,
) -> list[StudyTask]:
    """Dynamic task loading from a study tasks.toml.

    Two formats are accepted:

    1. The REFERENCE format (ref nlp_task.py:485-561,
       etl/studies/{irae,example}/tasks.toml): a ``[shared]`` block with
       fallback ``system-prompt`` / ``user-prompt`` / ``models``, and
       ``[[task]]`` entries carrying ``name`` / ``version`` /
       ``response-schema`` (a JSON-schema file next to the toml; its
       serialized form replaces ``%JSON-SCHEMA%`` in the system prompt).
       One StudyTask is emitted per (task × model) as
       ``{prefix}__nlp[_{name}]_{model_id}`` — prefix defaults to the
       toml's directory name (the study). With ``llm_url`` set each task
       gets a chat-completions model carrying its prompts and response
       format; without it, a deterministic stub stands in (offline runs,
       CI).
    2. The compact legacy form: ``[tasks.<name>]`` blocks with
       ``version`` / ``model`` / ``terms`` / ``note_codings``.
    """
    import json
    import os
    import tomllib

    with open(toml_path, "rb") as fh:
        doc = tomllib.load(fh)
    registry = {"stub-symptoms": StubSymptomModel}
    registry.update(models or {})

    if "task" in doc or "shared" in doc:
        from cumulus_etl_spark.nlp.http_provider import LlmHttpModel

        shared = doc.get("shared", {})
        prefix = prefix or os.path.basename(os.path.dirname(os.path.abspath(toml_path)))
        out = []
        for spec in doc.get("task", []):
            name = spec.get("name")
            suffix = f"_{name}" if name else ""
            version = int(spec.get("version", 0))
            schema_file = spec.get("response-schema")
            if not schema_file:
                raise ValueError("The 'response-schema' key is required for each task")
            if "/" in schema_file:
                raise ValueError("response-schema must be a simple filename, no path elements")
            system_prompt = (spec.get("system-prompt") or shared.get("system-prompt", "")).strip()
            if not system_prompt:
                raise ValueError("The 'system-prompt' key is required for each task")
            user_prompt = spec.get("user-prompt") or shared.get("user-prompt")
            model_ids = spec.get("models") or shared.get("models", [])
            if not model_ids:
                raise ValueError("The 'models' key is required for each task")
            with open(os.path.join(os.path.dirname(os.path.abspath(toml_path)), schema_file)) as f:
                response_schema = json.load(f)
            system_prompt = system_prompt.replace(
                "%JSON-SCHEMA%", json.dumps(response_schema, indent=2)
            )
            for model_id in model_ids:
                task_name = f"{prefix}__nlp{suffix}_{model_id.replace('-', '_')}"
                if model_id in registry:
                    model = registry[model_id]()
                elif llm_url:
                    model = LlmHttpModel(
                        url=llm_url,
                        model_name=model_id,
                        system_prompt=system_prompt,
                        user_prompt_template=user_prompt and user_prompt.strip(),
                        response_format={
                            "type": "json_schema",
                            "json_schema": {"name": name or "task", "schema": response_schema},
                        },
                    )
                else:
                    model = StubSymptomModel()  # offline fallback, deterministic
                out.append(StudyTask(name=task_name, task_version=version, model=model))
        return out

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
