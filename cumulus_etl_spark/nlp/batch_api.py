"""Provider batch-API orchestration (SURVEY §2.9 U4).

The reference's OpenAI-batch mode submits prompt files (≤50k requests /
≤200MB each), polls every 5 minutes, and resumes interrupted runs via
persisted batch metadata (nlp/models.py:208-210,352-389,600-624).

The Spark-shaped equivalent here:

1. misses (post cache-join) are split into provider-sized chunks —
   count-based via ``ntile``-style bucketing on a stable hash, so the
   split is deterministic and distributed;
2. each chunk's prompts are written as a parquet "batch file";
3. a provider submits each file and later delivers a results file;
   submitted-batch metadata persists as JSON next to the files, so a
   crashed driver re-polls instead of re-submitting (resume);
4. delivered results join back to notes by checksum and append to the
   NLP cache — after which the normal cache-first task flow proceeds.

No real provider exists in this container: :class:`LocalStubBatchProvider`
executes the model synchronously at poll time, exercising the full
submit/poll/resume machinery.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Reference limits: 50k requests / 200MB per batch file.
MAX_REQUESTS_PER_BATCH = 50_000


class LocalStubBatchProvider:
    """Stand-in for an LLM batch API: 'submission' records the file path;
    'polling' runs the model over the file and writes results. Swap for a
    real provider by implementing submit()/poll() with HTTP calls."""

    def __init__(self, model):
        self.model = model

    def submit(self, prompts_path: str) -> str:
        return f"stub-batch-{uuid.uuid4()}"

    def poll(self, spark: SparkSession, batch_id: str, prompts_path: str, results_path: str) -> bool:
        """Returns True when results are ready (stub: immediately)."""
        prompts = spark.read.parquet(prompts_path)
        model = self.model

        def score(batches):
            import pandas as pd

            for pdf in batches:
                pdf = pdf.copy()
                pdf["result"] = [json.dumps(model(t)) for t in pdf["note_text"]]
                yield pdf[["checksum", "result"]]

        out_schema = "checksum string, result string"
        prompts.mapInPandas(score, schema=out_schema).write.mode("overwrite").parquet(results_path)
        return True


class BatchRun:
    """One batch-mode submission round with resume metadata."""

    def __init__(self, spark: SparkSession, work_dir: str):
        self.spark = spark
        self.work_dir = work_dir
        self.meta_path = os.path.join(work_dir, "batch-metadata.json")

    def _load_meta(self) -> dict | None:
        if os.path.exists(self.meta_path):
            with open(self.meta_path) as fh:
                return json.load(fh)
        return None

    def submit(self, misses: DataFrame, provider) -> dict:
        """Split + write prompt files + submit; idempotent (resume: if
        metadata exists, return it without re-submitting)."""
        meta = self._load_meta()
        if meta is not None:
            return meta
        os.makedirs(self.work_dir, exist_ok=True)
        n = misses.count()
        n_chunks = max(1, (n + MAX_REQUESTS_PER_BATCH - 1) // MAX_REQUESTS_PER_BATCH)
        chunked = misses.select(
            "checksum", "note_text", (F.pmod(F.xxhash64("checksum"), F.lit(n_chunks))).alias("__chunk")
        )
        batches = []
        for i in range(n_chunks):
            prompts_path = os.path.join(self.work_dir, f"prompts-{i:05d}.parquet")
            chunked.filter(F.col("__chunk") == i).drop("__chunk").write.mode(
                "overwrite"
            ).parquet(prompts_path)
            batch_id = provider.submit(prompts_path)
            batches.append(
                {
                    "batch_id": batch_id,
                    "prompts": prompts_path,
                    "results": os.path.join(self.work_dir, f"results-{i:05d}.parquet"),
                    "done": False,
                }
            )
        meta = {"batches": batches, "total_requests": n}
        self._save(meta)
        return meta

    def poll(self, provider) -> bool:
        """Poll every pending batch; returns True when all delivered."""
        meta = self._load_meta()
        if meta is None:
            raise RuntimeError("poll() before submit()")
        all_done = True
        for b in meta["batches"]:
            if b["done"]:
                continue
            if provider.poll(self.spark, b["batch_id"], b["prompts"], b["results"]):
                b["done"] = True
            else:
                all_done = False
        self._save(meta)
        return all_done

    def results(self) -> DataFrame:
        """Union of delivered (checksum, result) frames."""
        meta = self._load_meta() or {"batches": []}
        paths = [b["results"] for b in meta["batches"] if b["done"]]
        if not paths:
            return self.spark.createDataFrame([], "checksum string, result string")
        return self.spark.read.parquet(*paths)

    def _save(self, meta: dict) -> None:
        tmp = self.meta_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(meta, fh)
        os.replace(tmp, self.meta_path)
