"""NLP result cache: content-checksum keyed, join-first (SURVEY §4).

The reference caches each model response on disk keyed by
sha256(note text) so re-runs cost nothing (nlp/extract.py:69-88,
nlp/utils.py:89-127, nlp/models.py:571-582). At cluster scale a local
file per note doesn't work; the cache is a table, and the lookup is a
join:

    misses = notes LEFT ANTI JOIN cache ON checksum
    hits   = notes JOIN cache ON checksum

Only misses reach the provider; results append to the cache table. The
cache key includes the task name + task version so prompt changes
invalidate cleanly.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class NlpCache:
    def __init__(self, spark: SparkSession, cache_dir: str, task_name: str, task_version: int):
        self.spark = spark
        self.path = os.path.join(cache_dir, f"nlp-cache__{task_name}__v{task_version}")

    def _table(self) -> DataFrame | None:
        if not os.path.exists(self.path):
            return None
        return self.spark.read.parquet(self.path)

    def split(self, notes: DataFrame, checksum_col: str = "checksum") -> tuple[DataFrame, DataFrame]:
        """(hits with cached ``result`` column, misses unchanged)."""
        cache = self._table()
        if cache is None:
            return None, notes
        cache = cache.dropDuplicates(["checksum"])
        hits = notes.join(cache, notes[checksum_col] == cache["checksum"], "inner").drop(
            cache["checksum"]
        )
        misses = notes.join(cache, notes[checksum_col] == cache["checksum"], "left_anti")
        return hits, misses

    def append(self, results: DataFrame, checksum_col: str = "checksum") -> None:
        """Persist (checksum, result) pairs for future runs."""
        (
            results.select(F.col(checksum_col).alias("checksum"), F.col("result"))
            .dropDuplicates(["checksum"])
            .write.mode("append")
            .parquet(self.path)
        )
