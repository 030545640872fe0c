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
from pyspark.sql.types import ArrayType, IntegerType


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
