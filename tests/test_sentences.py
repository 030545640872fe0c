"""Sentence-splitter UDTF (nlp/sentences.py)."""

from __future__ import annotations

from cumulus_etl_spark.nlp.sentences import (
    register_sentence_udtf,
    split_sentences_py,
)


def test_offsets_roundtrip_exactly():
    text = "Pt seen today. Dr. Smith reviewed labs.  Follow up in 2 wks. "
    sents = split_sentences_py(text)
    assert [s for s, _, _ in sents] == [
        "Pt seen today.",
        "Dr. Smith reviewed labs.",
        "Follow up in 2 wks.",
    ]
    for s, b, e in sents:
        assert text[b:e] == s


def test_abbreviations_do_not_split():
    sents = split_sentences_py("Hx of dm vs. htn etc. continues unchanged.")
    assert len(sents) == 1


def test_empty_and_whitespace():
    assert split_sentences_py("") == []
    assert split_sentences_py("   \n ") == []


def test_udtf_in_sql_lateral_join(spark):
    register_sentence_udtf(spark)
    spark.createDataFrame(
        [(1, "First thought. Second thought!"), (2, "Only one here")],
        "doc_id long, note string",
    ).createOrReplaceTempView("notes_for_split")
    rows = spark.sql(
        """SELECT n.doc_id, s.sentence, s.begin, s.end, s.sentence_idx
           FROM notes_for_split n, LATERAL split_sentences(n.note) s
           ORDER BY n.doc_id, s.sentence_idx"""
    ).collect()
    assert [(r["doc_id"], r["sentence"]) for r in rows] == [
        (1, "First thought."),
        (1, "Second thought!"),
        (2, "Only one here"),
    ]
    # offsets anchor into the original note text
    notes = {1: "First thought. Second thought!", 2: "Only one here"}
    for r in rows:
        assert notes[r["doc_id"]][r["begin"]:r["end"]] == r["sentence"]
