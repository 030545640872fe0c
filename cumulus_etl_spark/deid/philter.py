"""Philter-lite: regex-based PHI masking for free-text fields (P8).

The reference wraps the ``philter-lite`` package (cumulus_etl/deid/
philter.py:13-43): detect PHI spans in text, replace each span with
asterisks of equal length. That package isn't available here, so this is
a clearly-scoped regex subset covering the structured-PHI classes
(emails, phone numbers, SSNs, URLs, MRN-like digit runs).

Two implementations, same patterns:

- :func:`philter_mask` — pure Catalyst ``regexp_replace`` chain replacing
  each match with ``***``. Usable anywhere, including inside higher-order
  ``transform`` lambdas over nested arrays-of-structs (Spark forbids
  Python UDFs there), and stays in whole-stage codegen. NOT
  length-preserving (divergence from the reference, documented).
- :func:`scrub_text` / :func:`philter_udf` — length-preserving asterisk
  replacement as an Arrow-batched pandas_udf, for top-level note text
  where downstream span arithmetic must keep offsets (upload-notes path).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

# (python regex, java regex) pairs — kept in sync; java flavor used JVM-side.
_PATTERNS: list[tuple[str, str]] = [
    # RFC 5322 atext local part (hypothesis-found: '*@a.com' is a valid email)
    (r"[A-Za-z0-9.!#$%&'*+/=?^_`{|}~-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",) * 2,  # email
    (r"\b\d{3}[-.]\d{2}[-.]\d{4}\b",) * 2,  # SSN
    (r"(?<!\w)(?:\+?1[-. ]?)?(?:\(\d{3}\)[-. ]?|\d{3}[-. ])\d{3}[-. ]\d{4}\b",) * 2,  # phone
    (r"\bhttps?://\S+",) * 2,  # URL
    (r"\b\d{7,10}\b",) * 2,  # MRN-like bare digit run
]

_PHI_PATTERNS: list[re.Pattern] = [re.compile(py, re.IGNORECASE) for py, _ in _PATTERNS]

REDACTION = "***"


def philter_mask(col: Column) -> Column:
    """JVM-side PHI masking: each detected span becomes ``***``."""
    for _, java_pat in _PATTERNS:
        col = F.regexp_replace(col, "(?i)" + java_pat, REDACTION)
    return col


def scrub_text(text: str | None) -> str | None:
    """Length-preserving PHI masking (each span → equal-length asterisks)."""
    if text is None:
        return None
    for pat in _PHI_PATTERNS:
        text = pat.sub(lambda m: "*" * len(m.group(0)), text)
    return text


@F.pandas_udf(StringType())
def philter_udf(texts: pd.Series) -> pd.Series:
    return texts.map(scrub_text)
