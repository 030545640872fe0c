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

With ``pq_sub`` set at build time the index is IVFPQ (Jégou et al.,
the FAISS IVFPQ layout): lists store ``n_sub`` small-int codes per
vector INSTEAD of the raw floats (the 100 TB index shrinks to codes +
ids), ``search`` scores candidates by asymmetric distance — each query
precomputes its per-subspace distance table once, a candidate costs
n_sub array lookups — and an optional ``refine_with`` corpus re-ranks
the ADC shortlist with exact cosine (candidates × k rows join back to
the lake by id, broadcast-sized).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cumulus_etl_spark.sources import hadoop_io
from cumulus_etl_spark.operators.similarity import (
    _nearest_centroids,
    as_double_array,
    cosine,
    train_ivf_centroids,
)

_CENTROIDS_FILE = "centroids.json"
_LISTS_DIR = "lists"


class IvfIndex:
    """A persistent IVF index rooted at ``root``: ``centroids.json`` +
    ``lists/list_id=N/*.parquet``.

    The root may live on ANY filesystem the session's Hadoop
    configuration can resolve (local path, ``file://``, ``s3a://``,
    ``abfs://``, ...): the parquet lists and the streaming checkpoint
    already go through Spark, and the centroid/codebook sidecar goes
    through the Hadoop FileSystem API (sources/hadoop_io.py) rather
    than plain ``open()``/``os.makedirs`` — pinned by the ``file://``
    round-trip in tests/test_ann_index.py, a URI scheme the os-path
    calls would reject."""

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

    def _state(self) -> dict:
        return json.loads(hadoop_io.read_text(self.spark, self._centroids_path))

    def centroids(self) -> list[list[float]]:
        return self._state()["centroids"]

    def codebooks(self) -> list[list[list[float]]] | None:
        return self._state().get("pq_codebooks")

    # -- build / ingest ----------------------------------------------------
    def _assigned(self, vecs: DataFrame, centroids: list[list[float]],
                  codebooks: list[list[list[float]]] | None) -> DataFrame:
        from cumulus_etl_spark.operators.quantize import _pq_codes_expr

        v = as_double_array(self.vec_col)
        payload = (
            _pq_codes_expr(v, codebooks).alias("codes")
            if codebooks is not None
            else v.alias("cvec")
        )
        return vecs.select(
            F.col(self.id_col).alias("neighbor_id"),
            payload,
            F.element_at(_nearest_centroids(v, centroids, 1), 1).alias("list_id"),
        )

    def build(self, corpus: DataFrame, n_centroids: int = 16,
              seed: int = 42, sample_rows: int = 10_000,
              pq_sub: int | None = None, pq_k: int = 32) -> int:
        """Train and freeze the coarse centroids — and, with ``pq_sub``,
        the per-subspace PQ codebooks (``pq_sub`` subspaces × ``pq_k``
        codewords each) — no data is written; load the corpus itself via
        ``ingest``. Returns the number of centroids."""
        from cumulus_etl_spark.operators.quantize import pq_codebooks_trained

        cents = train_ivf_centroids(
            corpus, n_centroids=n_centroids, vec_col=self.vec_col,
            sample_rows=sample_rows, seed=seed,
        )
        state: dict = {"centroids": cents, "seed": seed}
        if pq_sub is not None:
            state["pq_codebooks"] = pq_codebooks_trained(
                corpus, n_sub=pq_sub, k=pq_k, vec_col=self.vec_col,
                id_col=self.id_col, sample_rows=sample_rows, seed=seed,
            )
        hadoop_io.write_text(self.spark, self._centroids_path, json.dumps(state))
        return len(cents)

    def ingest(self, landing_dir: str, compact: bool = False) -> None:
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
        state = self._state()
        schema = self.spark.read.parquet(landing_dir).schema
        stream = self.spark.readStream.schema(schema).parquet(landing_dir)
        assigned = self._assigned(stream, state["centroids"], state.get("pq_codebooks"))
        if compact:
            # one file per list per batch: the rebuild path trades one
            # shuffle for the compacted layout (normal ingest stays
            # shuffle-free — output files then follow input partitions)
            assigned = assigned.repartition("list_id")
        q = (
            assigned
            .writeStream.trigger(availableNow=True)
            .option("checkpointLocation", os.path.join(self.root, "_checkpoint"))
            .partitionBy("list_id")
            .format("parquet")
            .option("path", self.lists_dir)
            .start()
        )
        q.awaitTermination()

    def rebuild_into(self, new_root: str, landing_dir: str) -> "IvfIndex":
        """The compaction posture SCALE.md documents: a FRESH index root
        re-ingested from the landing zone in one pass. Centroids (and PQ
        codebooks) are copied verbatim — a rebuild compacts the file
        layout, it never re-trains, so search results are unchanged by
        construction. The new root gets its own checkpoint/sink lineage;
        the old root is left untouched for the caller to delete after
        cutover. Re-assignment cost is one expression-only scan of the
        landing zone — no shuffle beyond the partitioned write."""
        if hadoop_io.exists(self.spark, new_root):
            raise ValueError(f"rebuild target {new_root} already exists")
        hadoop_io.write_text(
            self.spark,
            os.path.join(new_root, _CENTROIDS_FILE),
            json.dumps(self._state()),
        )
        new = IvfIndex(self.spark, new_root, id_col=self.id_col, vec_col=self.vec_col)
        new.ingest(landing_dir, compact=True)
        return new

    def stats(self) -> dict:
        """Index-health report: per-list row counts, imbalance factor
        (max/mean — probe cost at search time is proportional to the
        probed lists' sizes, so a hot list is a hot probe), and file
        counts per list (ingest waves append files; a high file:row
        ratio says the index wants a rebuild). One aggregate over the
        lists' (list_id, file) metadata — the vectors/codes columns are
        never read."""
        lists = self.spark.read.parquet(self.lists_dir).select(
            "list_id",
            # projected BEFORE the agg: non-deterministic expressions are
            # not allowed inside aggregate functions
            F.input_file_name().alias("__file"),
        )
        per = (
            lists.groupBy("list_id")
            .agg(
                F.count(F.lit(1)).alias("rows"),
                F.countDistinct("__file").alias("files"),
            )
            .orderBy("list_id")
            .collect()
        )
        rows = [r["rows"] for r in per]
        n_centroids = len(self.centroids())
        mean = sum(rows) / max(len(rows), 1)
        return {
            "n_centroids": n_centroids,
            "n_lists_nonempty": len(per),
            "n_rows": sum(rows),
            "n_files": sum(r["files"] for r in per),
            "pq": self.codebooks() is not None,
            "list_rows": {str(r["list_id"]): r["rows"] for r in per},
            "imbalance_max_over_mean": round(max(rows) / mean, 3) if rows else None,
        }

    # -- search --------------------------------------------------------------
    def _pruned_candidates(self, queries: DataFrame, n_probe: int,
                           extra_q: list) -> DataFrame:
        """Probed-partition candidate pairs: explode each query's n_probe
        nearest centroids, collect the probe ids (bounded: ≤ n_centroids
        ints) into a LITERAL isin so partition pruning happens at the
        scan, then broadcast-join queries onto the surviving lists.

        The probe frame is eagerly pinned (r13 opt, guide §2.4/§5): it
        feeds BOTH the probe-id collect and the broadcast build, and
        un-pinned each consumer re-ran the query-side scan + the
        nearest-centroid argmin projection. One |queries|·n_probe-row
        checkpoint (bounded by the query set) computes it once —
        measured 1.09 → 0.87 s warm on the sf0.1 search, output
        signature identical."""
        cents = self.centroids()
        qv = as_double_array(self.vec_col)
        probes = queries.select(
            F.col(self.id_col).alias("query_id"),
            *extra_q,
            F.explode(_nearest_centroids(qv, cents, n_probe)).alias("list_id"),
        ).localCheckpoint(eager=True)
        probed = sorted(
            r["list_id"] for r in probes.select("list_id").distinct().collect()
        )
        lists = self.spark.read.parquet(self.lists_dir).filter(
            F.col("list_id").isin(probed)
        )
        return lists.join(F.broadcast(probes), "list_id")

    def search(self, queries: DataFrame, k: int = 5, n_probe: int = 4,
               exclude_self: bool = True,
               refine_with: DataFrame | None = None,
               refine_factor: int = 4) -> DataFrame:
        """Top-k neighbors per query over the probed lists only.

        Raw-vector index → exact cosine over probed lists, output
        (query_id, rank, neighbor_id, score) — identical to
        operators/similarity.py:ann_ivf over the same rows/centroids.

        PQ index → asymmetric distance over the stored codes, output
        (query_id, rank, neighbor_id, approx_sq_dist). With
        ``refine_with`` (the lake table holding the original vectors)
        the ADC shortlist of k × refine_factor is re-ranked by exact
        cosine — output (query_id, rank, neighbor_id, score); only the
        shortlist's ids join back to the lake."""
        books = self.codebooks()
        qv = as_double_array(self.vec_col)
        if books is None:
            cands = self._pruned_candidates(queries, n_probe, [qv.alias("qvec")])
            if exclude_self:
                cands = cands.filter(F.col("query_id") != F.col("neighbor_id"))
            scored = cands.select(
                "query_id", "neighbor_id",
                cosine(F.col("qvec"), F.col("cvec")).alias("score"),
            )
            w = Window.partitionBy("query_id").orderBy(
                F.desc("score"), F.asc("neighbor_id")
            )
            return (
                scored.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
                .select("query_id", "rank", "neighbor_id", "score")
            )

        from cumulus_etl_spark.operators.quantize import _pq_subspace_dists

        n_sub = len(books)
        sub = len(books[0][0])
        dts = [
            _pq_subspace_dists(qv, m, sub, book).alias(f"dt{m}")
            for m, book in enumerate(books)
        ]
        cands = self._pruned_candidates(queries, n_probe, dts)
        if exclude_self:
            cands = cands.filter(F.col("query_id") != F.col("neighbor_id"))
        # fixed-order fold m=0..n_sub-1, same arithmetic as pq_adc_topk
        d = F.element_at(F.col("dt0"), F.element_at("codes", 1) + 1)
        for m in range(1, n_sub):
            d = d + F.element_at(F.col(f"dt{m}"), F.element_at("codes", m + 1) + 1)
        scored = cands.select(
            "query_id", "neighbor_id", d.alias("approx_sq_dist")
        )
        w = Window.partitionBy("query_id").orderBy(
            F.asc("approx_sq_dist"), F.asc("neighbor_id")
        )
        shortlist_k = k * refine_factor if refine_with is not None else k
        shortlist = (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= shortlist_k)
        )
        if refine_with is None:
            return shortlist.select(
                "query_id", "rank", "neighbor_id", "approx_sq_dist"
            )
        lake = refine_with.select(
            F.col(self.id_col).alias("neighbor_id"),
            as_double_array(self.vec_col).alias("nvec"),
        )
        qside = queries.select(
            F.col(self.id_col).alias("query_id"), qv.alias("qvec")
        )
        exact = (
            shortlist.select("query_id", "neighbor_id")
            .join(lake, "neighbor_id")
            .join(F.broadcast(qside), "query_id")
            .select(
                "query_id", "neighbor_id",
                cosine(F.col("qvec"), F.col("nvec")).alias("score"),
            )
        )
        w2 = Window.partitionBy("query_id").orderBy(
            F.desc("score"), F.asc("neighbor_id")
        )
        return (
            exact.withColumn("rank", F.row_number().over(w2))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id", "score")
        )
