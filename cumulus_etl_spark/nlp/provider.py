"""NLP model providers: executor-side fan-out via mapInPandas (U1-U4).

The reference POSTs note text to cTAKES / cNLP / LLM endpoints one note
at a time from a single process (nlp/extract.py:16-66, nlp/models.py:
95-664, ~0.1-1.4 notes/s per BASELINE.md). Spark-first, provider calls
happen INSIDE ``mapInPandas`` partitions: each executor task drains its
Arrow batches and fans requests out concurrently, so throughput scales
with executors × per-task concurrency, and a provider hiccup fails only
one task (retried by the scheduler), not the run.

Real HTTP clients live in :mod:`cumulus_etl_spark.nlp.http_provider`
(cTAKES, cNLP negation, LLM chat, batch API) and are tested against a
local fake server. :class:`StubSymptomModel` remains as the offline
deterministic fixture with the same interface and result schema.
"""

from __future__ import annotations

import json
from collections.abc import Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# result rows: list of matches, each with concept text, CUI-style code,
# polarity, and [begin, end) span — the covid_symptom task shape
# (etl/studies/covid_symptom/covid_ctakes.py:13-130).
MATCH_SCHEMA = ArrayType(
    StructType(
        [
            StructField("text", StringType(), True),
            StructField("code", StringType(), True),
            StructField("polarity", StringType(), True),
            StructField("begin", IntegerType(), True),
            StructField("end", IntegerType(), True),
        ]
    )
)


@dataclass(frozen=True)
class StubSymptomModel:
    """Deterministic keyword 'model' standing in for cTAKES+cNLP (U1-U3).

    Finds dictionary terms in the note, emits one match per occurrence
    with a fake CUI and a trivial negation check ('no X' / 'denies X').
    """

    terms: tuple[str, ...] = ("cough", "fever", "headache", "nausea", "congestion")
    # optional real CUIs per term (from a study BSV dictionary); terms
    # without an entry keep the deterministic md5 fake
    cuis: tuple[tuple[str, str], ...] = ()

    @classmethod
    def from_bsv(cls, bsv_path: str) -> "StubSymptomModel":
        """Build the stub from a study BSV dictionary (4- or 6-column,
        nlp/ctakes_dict.py) so an offline non-covid study matches its
        OWN vocabulary with its real CUIs — the no-server analog of
        CtakesHttpModel.install_dictionary."""
        from cumulus_etl_spark.nlp.ctakes_dict import parse_bsv_rows

        with open(bsv_path) as fh:
            rows = parse_bsv_rows(fh.read())
        return cls(
            terms=tuple(r["text"].lower() for r in rows),
            cuis=tuple((r["text"].lower(), r["cui"]) for r in rows),
        )

    def usage(self, text: str | None) -> tuple[int, int]:
        """(input_tokens, output_tokens) accounting — a whitespace proxy
        here; real providers return exact counts per response
        (ref nlp/models.py:76-93)."""
        if not text:
            return 0, 0
        n_in = len(text.split())
        return n_in, max(1, n_in // 10)

    def _code(self, term: str) -> str:
        # md5, not hash(): PYTHONHASHSEED randomizes hash() across
        # processes, which would unpin the golden output
        # (tests/test_nlp_golden.py). Pure function of the term, so one
        # digest per (model, term) regardless of corpus size.
        import hashlib

        for t, cui in self.cuis:  # study BSV vocabulary wins
            if t == term:
                return cui
        code_n = int(hashlib.md5(term.encode()).hexdigest()[:6], 16)
        return f"C{code_n % 10_000_000:07d}"

    def __call__(self, text: str | None) -> list[dict]:
        if not text:
            return []
        lower = text.lower()
        codes = {term: self._code(term) for term in self.terms}
        out = []
        for term in self.terms:
            start = 0
            while (idx := lower.find(term, start)) != -1:
                prefix = lower[max(0, idx - 12) : idx]
                negated = "no " in prefix or "denies " in prefix or "without " in prefix
                out.append(
                    {
                        "text": term,
                        "code": codes[term],
                        "polarity": "negated" if negated else "positive",
                        "begin": idx,
                        "end": idx + len(term),
                    }
                )
                start = idx + len(term)
        # deterministic order: by code then begin (ref covid_ctakes.py:80-83)
        out.sort(key=lambda m: (m["code"], m["begin"]))
        return out


# Depth 3 allows (array of) struct-of-struct metadata columns while
# rejecting real FHIR resource trees (DocumentReference.contained alone
# nests 7 levels / ~2700 fields — the measured Arrow crash shape).
_MAX_ARROW_DEPTH = 3


def _struct_depth(dtype) -> int:
    if isinstance(dtype, StructType):
        return 1 + max((_struct_depth(f.dataType) for f in dtype.fields), default=0)
    if isinstance(dtype, ArrayType):
        return _struct_depth(dtype.elementType)
    return 0


def run_model(
    notes: DataFrame,
    model,
    text_col: str = "note_text",
    result_col: str = "result",
) -> DataFrame:
    """Apply ``model`` to each note via mapInPandas; adds a JSON string
    ``result`` column (JSON at the boundary keeps the cache table schema
    stable across task versions; parsing to structs happens downstream
    with ``from_json`` against the task's declared schema)."""
    # Guard the Arrow boundary: a full FHIR resource struct (thousands of
    # nested fields) must never reach mapInPandas — deep-struct conversion
    # crashes the Python worker outright, and even healthy it serializes
    # megabytes per row. Callers prune to flat scalars first
    # (nlp/task.py); failing fast here turns a worker segfault into a
    # diagnosable driver error.
    deep = [
        f.name
        for f in notes.schema.fields
        if _struct_depth(f.dataType) > _MAX_ARROW_DEPTH
    ]
    if deep:
        raise ValueError(
            f"run_model input carries deeply nested columns {deep}; "
            "select the needed scalars before crossing into Python "
            "(see nlp/task.py run_nlp_task)"
        )
    usage_schema = StructType(
        [
            StructField("input_tokens", LongType(), True),
            StructField("output_tokens", LongType(), True),
        ]
    )
    track_usage = hasattr(model, "usage")
    out_fields = list(notes.schema.fields) + [StructField(result_col, StringType(), True)]
    if track_usage:
        out_fields.append(StructField("usage", usage_schema, True))
    out_schema = StructType(out_fields)

    def apply_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # One model instance per task. Providers exposing map_batch (the
        # HTTP clients in nlp/http_provider.py) fan the whole Arrow batch
        # out concurrently; plain callables run sequentially.
        for pdf in batches:
            pdf = pdf.copy()
            texts = list(pdf[text_col])
            if hasattr(model, "map_batch"):
                results = model.map_batch(texts)
            else:
                results = [model(t) for t in texts]
            pdf[result_col] = [json.dumps(r) for r in results]
            if track_usage:
                pdf["usage"] = [
                    dict(zip(("input_tokens", "output_tokens"), model.usage(t)))
                    for t in pdf[text_col]
                ]
            yield pdf

    return notes.mapInPandas(apply_batches, schema=out_schema)
