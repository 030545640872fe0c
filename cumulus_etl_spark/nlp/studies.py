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
    # JSON schema → structured-extraction envelope (one typed struct row
    # per note in `result_col`) instead of the match explode; see
    # run_nlp_task (ref BaseCovidGptTask covid_tasks.py:244-329)
    response_schema: dict | None = None
    result_col: str = "result"

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
            response_schema=self.response_schema,
            result_col=self.result_col,
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

# --- GPT covid-symptom variant (ref covid_tasks.py:230-331) ---------------
#
# The reference's CovidSymptomNlpResultsGpt{35,4}Task asks a chat model
# eleven yes/no symptom questions and lands one boolean-struct row per
# note.  Field names and the symptom/synonym vocabulary below are the
# study's public CDC symptom list as the reference encodes it
# (CovidSymptoms pydantic model covid_tasks.py:230-242; prompt
# covid_tasks.py:249-295) — config data required for output parity,
# same stance as the deid zip/extension lists.

COVID_SYMPTOM_FIELDS = (
    "Congestion or runny nose",
    "Cough",
    "Diarrhea",
    "Dyspnea",
    "Fatigue",
    "Fever or chills",
    "Headache",
    "Loss of taste or smell",
    "Muscle or body aches",
    "Nausea or vomiting",
    "Sore throat",
)

COVID_SYMPTOMS_RESPONSE_SCHEMA = {
    "type": "object",
    "properties": {f: {"type": "boolean"} for f in COVID_SYMPTOM_FIELDS},
    "required": list(COVID_SYMPTOM_FIELDS),
    "additionalProperties": False,
}

COVID_GPT_SYSTEM_PROMPT = "You are a helpful assistant."

# Condensed from the reference prompt (covid_tasks.py:249-295): same
# instructions, section-heading rule, synonym rule, and JSON contract;
# the full synonym expansion rides in through the response schema +
# symptom list rather than a wall of quoted strings.
COVID_GPT_USER_PROMPT = (
    "### Instructions ###\n"
    "You are a helpful assistant identifying symptoms from emergency "
    "department notes that could relate to infectious respiratory "
    "diseases.\nOutput positively documented symptoms, looking out "
    "specifically for the following: " + ", ".join(COVID_SYMPTOM_FIELDS) + ".\n"
    "Symptoms only need to be positively mentioned once to be included.\n"
    "Do not mention symptoms that are not present in the note.\n"
    "Rule (1): Symptoms must be positively documented and relevant to "
    "the presenting illness or reason for visit.\n"
    "Rule (2): Medical section headings must be specific to the present "
    "emergency department encounter.\n"
    "Rule (3): Positive symptom mentions must be a definite medical "
    "synonym.\nYour reply must be parsable as JSON, one boolean per "
    "symptom name. Never explain yourself, and only reply with JSON.\n"
    "### Text ###\n"
    "%CLINICAL-NOTE%"
)


class StubCovidBooleanModel:
    """Deterministic offline stand-in for the GPT covid model: keyword
    scan → the eleven-field boolean dict (same contract as the real
    dialect model, so the struct envelope is testable without network)."""

    _KEYWORDS = {
        "Congestion or runny nose": ("congestion", "runny nose", "rhinorrhea"),
        "Cough": ("cough",),
        "Diarrhea": ("diarrhea",),
        "Dyspnea": ("dyspnea", "shortness of breath", "sob"),
        "Fatigue": ("fatigue", "tired", "malaise"),
        "Fever or chills": ("fever", "chills", "pyrexia"),
        "Headache": ("headache", "migraine"),
        "Loss of taste or smell": ("anosmia", "loss of taste", "loss of smell"),
        "Muscle or body aches": ("myalgia", "body aches", "muscle aches"),
        "Nausea or vomiting": ("nausea", "vomiting", "emesis"),
        "Sore throat": ("sore throat", "pharyngitis"),
    }

    def __call__(self, text: str | None) -> dict:
        lower = (text or "").lower()
        return {
            f: any(k in lower for k in keys) for f, keys in self._KEYWORDS.items()
        }


def covid_gpt_task(model=None, model_id: str = "gpt4", version: int = 3) -> StudyTask:
    """Build the GPT covid-symptom task for any chat model-callable
    (ref CovidSymptomNlpResultsGpt4Task covid_tasks.py:348-360; version
    3 is the reference's current serialized format).  ``model`` defaults
    to the deterministic keyword stub for offline runs."""
    return StudyTask(
        name=f"covid_symptom__nlp_results_{model_id.replace('-', '_').replace('.', '')}",
        task_version=version,
        model=model or StubCovidBooleanModel(),
        note_codings=ED_NOTE_CODINGS,
        response_schema=COVID_SYMPTOMS_RESPONSE_SCHEMA,
        result_col="symptoms",
    )


def load_study_tasks(
    toml_path: str,
    models: dict | None = None,
    llm_url: str | None = None,
    prefix: str | None = None,
    dialect=None,
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
       toml's directory name (the study). With ``dialect`` set (the
       ``--provider`` path) each task gets a provider-dialect model
       carrying its prompts and response format; else with ``llm_url``
       a plain chat-completions model; without either, a deterministic
       stub stands in (offline runs, CI).
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
                elif dialect is not None:
                    from cumulus_etl_spark.nlp.dialects import DialectLlmModel

                    model = DialectLlmModel(
                        dialect=dialect,
                        system_prompt=system_prompt,
                        user_prompt_template=user_prompt and user_prompt.strip(),
                        response_format={
                            "type": "json_schema",
                            "json_schema": {"name": name or "task", "schema": response_schema},
                        },
                        unwrap=None,  # schema tasks take the object whole
                    )
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
                out.append(
                    StudyTask(
                        name=task_name,
                        task_version=version,
                        model=model,
                        response_schema=response_schema,
                    )
                )
        return out

    out = []
    for name, spec in doc.get("tasks", {}).items():
        model_cls = registry[spec.get("model", "stub-symptoms")]
        kwargs = {}
        if "terms" in spec and model_cls is StubSymptomModel:
            kwargs["terms"] = tuple(spec["terms"])
        if "bsv" in spec and model_cls is StubSymptomModel:
            # study BSV vocabulary (ref nlp/watcher.py custom-dictionary
            # mechanism): the task matches its own dictionary with its
            # real CUIs — path relative to the toml
            bsv_path = os.path.join(
                os.path.dirname(os.path.abspath(toml_path)), spec["bsv"]
            )
            model = StubSymptomModel.from_bsv(bsv_path)
        else:
            model = model_cls(**kwargs)
        codings = spec.get("note_codings")
        out.append(
            StudyTask(
                name=name,
                task_version=int(spec.get("version", 1)),
                model=model,
                note_codings={k: set(v) for k, v in codings.items()} if codings else None,
            )
        )
    return out
