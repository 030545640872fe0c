"""The ``sample`` verb: uniform random clinical-note samples
(SURVEY §2.7 O1, F5, F7; ref cumulus_etl/sample/cli.py).

The reference runs Algorithm R over a note stream with a seeded RNG and
re-reads winners by byte offset (S10). Distributed, the same contract is
a seeded top-N: every row gets a stable ``rand(seed)`` draw; TakeOrdered
keeps a per-partition heap — no global sort, no re-read (rows stay in
the DataFrame).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cumulus_etl_spark.nlp import extract_note_text
from cumulus_etl_spark.operators.sampling import reservoir_sample
from cumulus_etl_spark.sources import scan_resources


def sample_notes(
    spark: SparkSession,
    input_dir: str,
    n: int,
    seed: int = 42,
) -> DataFrame:
    """N uniformly-sampled DocumentReferences that have inline text.

    F5 duplicate suppression (dropDuplicates on resourceType+id) and F7
    has-text predicate applied before sampling, like the reference's
    seen-set + text filter (sample/cli.py:159-170).
    """
    docs = scan_resources(spark, input_dir, ["DocumentReference"])
    docs = docs.dropDuplicates(["resourceType", "id"])
    notes = extract_note_text(docs).filter(F.col("note_text").isNotNull())
    return reservoir_sample(notes, n, seed=seed, tiebreak=["id"])
