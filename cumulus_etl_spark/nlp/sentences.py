"""Sentence splitting as a Python UDTF (Spark 4 user-defined table
function).

The NLP pipeline anchors model-returned spans back into note text
(nlp/span.py); upstream of that, chart review and windowed NLP want
notes split into sentences WITH character offsets so every downstream
span stays anchorable. A UDTF is the right shape: one note row in,
N sentence rows out, usable from both the DataFrame API and SQL
(``SELECT s.* FROM notes, LATERAL split_sentences(note_text)``).

The splitter is a deterministic rule-based segmenter (terminal
punctuation + abbreviation guard) — the same class of segmenter
philter-lite and cTAKES front-ends use before tagging. Offsets are
[begin, end) into the ORIGINAL string: ``text[begin:end]`` round-trips
exactly, property-tested.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

# Common clinical/English abbreviations that end with '.' but do not
# terminate a sentence.
_ABBREV = frozenset(
    "dr mr mrs ms prof st jr sr vs etc eg ie cf al approx dept est min max"
    " no pt pts hx dx rx fx tx wk wks mo mos yr yrs".split()
)

_BOUNDARY = re.compile(r"[.!?]+(?=\s|$)")


def split_sentences_py(text: str) -> list[tuple[str, int, int]]:
    """Pure-Python core (unit-testable without Spark): (sentence, begin,
    end) triples over the original string, whitespace preserved inside
    sentences, boundaries after terminal punctuation unless the
    preceding token is a known abbreviation or a single initial."""
    out: list[tuple[str, int, int]] = []
    if not text or not text.strip():
        return out
    start = 0
    for m in _BOUNDARY.finditer(text):
        prev = text[start : m.start()]
        last_word = re.split(r"[\s(]+", prev.strip())[-1].lower() if prev.strip() else ""
        if last_word in _ABBREV or re.fullmatch(r"[a-z]", last_word):
            continue  # abbreviation / initial: not a boundary
        end = m.end()
        chunk = text[start:end]
        stripped = chunk.strip()
        if stripped:
            b = start + (len(chunk) - len(chunk.lstrip()))
            out.append((stripped, b, b + len(stripped)))
        start = end
    tail = text[start:]
    if tail.strip():
        b = start + (len(tail) - len(tail.lstrip()))
        stripped = tail.strip()
        out.append((stripped, b, b + len(stripped)))
    return out


@udtf(returnType="sentence: string, begin: int, end: int, sentence_idx: int")
class SplitSentences:
    """UDTF: one (text) argument row → one row per sentence."""

    def eval(self, text: str):  # noqa: A002 - Spark passes the column
        for i, (s, b, e) in enumerate(split_sentences_py(text or "")):
            yield s, b, e, i


def register_sentence_udtf(spark) -> None:
    """Make the splitter available to SQL as ``split_sentences``."""
    spark.udtf.register("split_sentences", SplitSentences)
