"""Incrementally maintained, partition-pruned IVF ANN index.

Batch IVF (operators/similarity.py:ann_ivf) shuffles the corpus onto
centroid lists per query run; a 100 TB embedding lake wants the inverted
lists to be a PERSISTENT physical layout instead — assigned once at
ingest, laid out so a search only reads the lists it probes:

- ``build``  trains coarse centroids on a seeded sample and freezes them
  (FAISS practice: re-train means re-build). It writes NO data — every
  vector, the initial corpus included, enters through ``ingest``, so the
  lists directory has exactly one writer and one commit log. (A batch
  write mixed into a streaming sink's directory would be hidden from
  readers the moment ``_spark_metadata`` exists — the sink's log takes
  over file discovery.)
- ``ingest`` tails a landing directory with Structured Streaming
  (availableNow + checkpoint = exactly-once across re-runs): new vectors
  are assigned to their nearest frozen centroid with a pure-expression
  argmax and APPENDED to the parquet layout partitioned by ``list_id`` —
  per-wave cost is proportional to the wave, never the index.
- ``search`` collects the probed list ids (≤ n_probe × |queries| ints,
  bounded by n_centroids) into a LITERAL ``isin`` filter so Catalyst
  prunes unprobed partitions at the SCAN — the IVF promise ("only probed
  lists are read") made physical: ``search(...).inputFiles()`` touches
  only ``list_id=<probed>/`` directories (pinned in
  tests/test_ann_index.py). Scoring then reuses the batch operator's
  exact cosine + per-query top-k window.

Search results equal ann_ivf over the same rows and centroids
(pytest-pinned): the index changes WHERE bytes live, not the math.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cumulus_etl_spark.operators.similarity import (
    _nearest_centroids,
    as_double_array,
    cosine,
    train_ivf_centroids,
)

_CENTROIDS_FILE = "centroids.json"
_LISTS_DIR = "lists"


class IvfIndex:
    """A persistent IVF index rooted at ``root`` (local or object-store
    path): ``centroids.json`` + ``lists/list_id=N/*.parquet``."""

    def __init__(self, spark: SparkSession, root: str,
                 id_col: str = "vec_id", vec_col: str = "embedding"):
        self.spark = spark
        self.root = root
        self.id_col = id_col
        self.vec_col = vec_col
        self.lists_dir = os.path.join(root, _LISTS_DIR)

    # -- centroid state ----------------------------------------------------
    @property
    def _centroids_path(self) -> str:
        return os.path.join(self.root, _CENTROIDS_FILE)

    def centroids(self) -> list[list[float]]:
        with open(self._centroids_path) as fh:
            return json.load(fh)["centroids"]

    # -- build / ingest ----------------------------------------------------
    def _assigned(self, vecs: DataFrame, centroids: list[list[float]]) -> DataFrame:
        v = as_double_array(self.vec_col)
        return vecs.select(
            F.col(self.id_col).alias("neighbor_id"),
            v.alias("cvec"),
            F.element_at(_nearest_centroids(v, centroids, 1), 1).alias("list_id"),
        )

    def build(self, corpus: DataFrame, n_centroids: int = 16,
              seed: int = 42, sample_rows: int = 10_000) -> int:
        """Train and freeze the coarse centroids (no data is written —
        load the corpus itself via ``ingest``). Returns the number of
        centroids."""
        cents = train_ivf_centroids(
            corpus, n_centroids=n_centroids, vec_col=self.vec_col,
            sample_rows=sample_rows, seed=seed,
        )
        os.makedirs(self.root, exist_ok=True)
        with open(self._centroids_path, "w") as fh:
            json.dump({"centroids": cents, "seed": seed}, fh)
        return len(cents)

    def ingest(self, landing_dir: str) -> None:
        """Append every not-yet-ingested vector under ``landing_dir`` to
        its centroid's list partition. The checkpoint lives under the
        index root, so re-running after a crash (or on a landing dir
        with no new files) is a no-op: availableNow + checkpoint means
        files already processed are never re-appended.

        One landing zone, one checkpoint, one sink: the parquet sink's
        commit log identifies batches by id, so a second query lineage
        (fresh checkpoint) against the same lists directory would
        restart at batch 0 and be silently skipped as already-committed.
        New data therefore arrives as new FILES in the same landing
        directory — exactly the lake layout a 100 TB embedding feed
        already has."""
        cents = self.centroids()
        schema = self.spark.read.parquet(landing_dir).schema
        stream = self.spark.readStream.schema(schema).parquet(landing_dir)
        q = (
            self._assigned(stream, cents)
            .writeStream.trigger(availableNow=True)
            .option("checkpointLocation", os.path.join(self.root, "_checkpoint"))
            .partitionBy("list_id")
            .format("parquet")
            .option("path", self.lists_dir)
            .start()
        )
        q.awaitTermination()

    # -- search --------------------------------------------------------------
    def search(self, queries: DataFrame, k: int = 5, n_probe: int = 4,
               exclude_self: bool = True) -> DataFrame:
        """Top-k cosine neighbors per query over the probed lists only.
        Output: (query_id, rank, neighbor_id, score) — identical to
        operators/similarity.py:ann_ivf over the same rows/centroids."""
        cents = self.centroids()
        qv = as_double_array(self.vec_col)
        probes = queries.select(
            F.col(self.id_col).alias("query_id"),
            qv.alias("qvec"),
            F.explode(_nearest_centroids(qv, cents, n_probe)).alias("list_id"),
        )
        # Bounded collect (≤ n_centroids ints): the probed ids must be
        # LITERALS for partition pruning to happen at the scan.
        probed = sorted(
            r["list_id"] for r in probes.select("list_id").distinct().collect()
        )
        lists = self.spark.read.parquet(self.lists_dir).filter(
            F.col("list_id").isin(probed)
        )
        cands = lists.join(F.broadcast(probes), "list_id")
        if exclude_self:
            cands = cands.filter(F.col("query_id") != F.col("neighbor_id"))
        scored = cands.select(
            "query_id", "neighbor_id",
            cosine(F.col("qvec"), F.col("cvec")).alias("score"),
        )
        w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id", "score")
        )
