from cumulus_etl_spark.nlp.notes import extract_note_text, note_checksum
from cumulus_etl_spark.nlp.cache import NlpCache
from cumulus_etl_spark.nlp.provider import StubSymptomModel, run_model
from cumulus_etl_spark.nlp.span import anchor_span, anchor_spans_udf
from cumulus_etl_spark.nlp.selection import (
    filter_by_cohort,
    filter_by_regex,
    filter_by_words,
)
from cumulus_etl_spark.nlp.task import run_nlp_task

__all__ = [
    "extract_note_text",
    "note_checksum",
    "NlpCache",
    "StubSymptomModel",
    "run_model",
    "anchor_span",
    "anchor_spans_udf",
    "filter_by_words",
    "filter_by_regex",
    "filter_by_cohort",
    "run_nlp_task",
]
