"""Note selection filters (SURVEY §2.4 F2, §2.5 J4; ref nlp/selection.py).

Word/regex filters become ``rlike`` predicates; cohort CSV / table
filters become broadcast semi- or anti-joins. All Catalyst.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def filter_by_words(
    notes: DataFrame, words: list[str], text_col: str = "note_text", reject: bool = False
) -> DataFrame:
    """Whole-word match on any of ``words`` (ref cli_utils.py:187-201
    compiles words to whole-word regexes the same way)."""
    pattern = "(?i)\\b(?:" + "|".join(re.escape(w) for w in words) + ")\\b"
    return filter_by_regex(notes, pattern, text_col=text_col, reject=reject)


def filter_by_regex(
    notes: DataFrame, pattern: str, text_col: str = "note_text", reject: bool = False
) -> DataFrame:
    cond = F.col(text_col).rlike(pattern)
    return notes.filter(~F.coalesce(cond, F.lit(False)) if reject else cond)


def filter_by_coding(
    notes: DataFrame,
    allowed: dict[str, set[str]],
    fields: tuple[str, ...] = ("type", "category"),
) -> DataFrame:
    """F3: keep notes whose type/category codings hit an allow-list of
    (system → codes) — the ED-note filter shape
    (etl/studies/covid_symptom/covid_tasks.py:18-79). Pure higher-order
    array expressions: exists over flattened codings, no explode shuffle.
    """
    conds = []
    for field in fields:
        if field not in notes.columns:
            continue
        dtype = notes.schema[field].dataType.simpleString()
        codings = (
            F.flatten(F.col(field + ".coding"))
            if dtype.startswith("array")
            else F.col(field + ".coding")
        )
        def coding_hit(c):
            expr = F.lit(False)
            for sys, codes in allowed.items():
                expr = expr | F.coalesce(
                    (c["system"] == sys) & c["code"].isin(*codes), F.lit(False)
                )
            return expr

        conds.append(F.coalesce(F.exists(codings, coding_hit), F.lit(False)))
    if not conds:
        raise ValueError(f"none of {fields} present in the notes frame")
    keep = conds[0]
    for c in conds[1:]:
        keep = keep | c
    return notes.filter(keep)


def filter_by_cohort(
    notes: DataFrame,
    cohort: DataFrame,
    note_col: str,
    cohort_col: str | None = None,
    reject: bool = False,
) -> DataFrame:
    """Semi-join (or anti-join for rejects) against a cohort id frame —
    CSV- or table-sourced (S8/S9). Broadcast: cohorts are small."""
    cohort_col = cohort_col or cohort.columns[0]
    ids = F.broadcast(cohort.select(F.col(cohort_col).alias("__cohort_id")).distinct())
    how = "left_anti" if reject else "left_semi"
    return notes.join(ids, notes[note_col] == F.col("__cohort_id"), how)
