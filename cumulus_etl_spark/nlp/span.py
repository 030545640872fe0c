"""Span re-anchoring: fuzzy-match model-returned text back into the note
(SURVEY §2.9 U5; ref etl/tasks/nlp_task.py:397-452).

LLMs return the *text* of a span, not offsets; this finds the text in
the original note tolerating whitespace runs, punctuation differences,
and case, returning ``[begin, end)`` or None. Row-wise regex work → a
pandas_udf (Arrow-batched), the sanctioned slow path.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType, StringType


def _fuzzy_pattern(span_text: str) -> re.Pattern | None:
    # tokenize on word chars; allow any junk (non-word run) between tokens
    tokens = re.findall(r"\w+", span_text)
    if not tokens:
        return None
    body = r"[\W_]+".join(re.escape(t) for t in tokens)
    return re.compile(body, re.IGNORECASE)


def anchor_span(note: str | None, span_text: str | None) -> tuple[int, int] | None:
    """Locate ``span_text`` in ``note`` (first match), fuzzily."""
    if not note or not span_text:
        return None
    pat = _fuzzy_pattern(span_text)
    if pat is None:
        return None
    m = pat.search(note)
    return (m.start(), m.end()) if m else None


@F.pandas_udf(ArrayType(IntegerType()))
def anchor_spans_udf(notes: pd.Series, span_texts: pd.Series) -> pd.Series:
    """Vectorized anchor: returns [begin, end] or null per row."""
    out = []
    for note, st in zip(notes, span_texts):
        anchored = anchor_span(note, st)
        out.append(list(anchored) if anchored else None)
    return pd.Series(out)


_STRIP_CHARS = None  # built lazily: string.punctuation + string.whitespace


def rewrite_textual_spans(parsed, note_text: str | None) -> bool:
    """Recursively replace every ``spans`` field's TEXTUAL entries with
    anchored ``[begin, end)`` index pairs, in place — the reference's
    BaseModelTaskWithSpans._process_dict (etl/tasks/nlp_task.py:407-452):
    LLMs return span *text*, and the output table must carry integer
    offsets (no note text may reach the de-identified side). Matching is
    fuzzy the same way: ends stripped of punctuation/whitespace,
    whitespace runs match any whitespace, case-insensitive — and EVERY
    occurrence in the note is appended, not just the first. Returns
    False when any span had no match (that span is dropped, mirroring
    the reference's warn-and-drop).
    """
    import string

    global _STRIP_CHARS
    if _STRIP_CHARS is None:
        _STRIP_CHARS = string.punctuation + string.whitespace

    all_found = True
    if isinstance(parsed, list):
        for item in parsed:
            if isinstance(item, (dict, list)):
                all_found &= rewrite_textual_spans(item, note_text)
        return all_found
    if not isinstance(parsed, dict):
        return all_found
    for key, value in parsed.items():
        if key != "spans":
            if isinstance(value, (dict, list)):
                all_found &= rewrite_textual_spans(value, note_text)
            continue
        new_spans = []
        for span_text in value or []:
            if isinstance(span_text, (list, tuple)):
                # already index pairs (idempotent on replays)
                new_spans.append(list(span_text))
                continue
            body = re.escape(str(span_text).strip(_STRIP_CHARS))
            body = re.sub(r"(\\[ \t\n\r\f\v])+", r"\\s+", body)
            found = False
            if body and note_text:
                for m in re.finditer(body, note_text, re.IGNORECASE):
                    found = True
                    new_spans.append([m.start(), m.end()])
            all_found &= found
        parsed[key] = new_spans
    return all_found


@F.pandas_udf(StringType())
def rewrite_spans_udf(results: pd.Series, notes: pd.Series) -> pd.Series:
    """Vectorized JSON-boundary form: parse each result answer, rewrite
    its textual spans against the note, re-serialize. Non-JSON / list
    envelopes pass through untouched (match envelopes carry offsets
    already)."""
    import json

    out = []
    for res, note in zip(results, notes):
        if res is None:
            out.append(None)
            continue
        try:
            parsed = json.loads(res)
        except (TypeError, ValueError):
            out.append(res)
            continue
        if isinstance(parsed, dict):
            rewrite_textual_spans(parsed, note)
            out.append(json.dumps(parsed))
        else:
            out.append(res)
    return pd.Series(out)


def schema_mentions_spans(schema) -> bool:
    """True when a JSON response schema declares a ``spans`` property at
    any depth — the cue for run_nlp_task to run the textual-span rewrite
    before parsing answers against the compiled (integer-pair) type."""
    if isinstance(schema, dict):
        props = schema.get("properties")
        if isinstance(props, dict) and "spans" in props:
            return True
        return any(schema_mentions_spans(v) for v in schema.values())
    if isinstance(schema, list):
        return any(schema_mentions_spans(v) for v in schema)
    return False
