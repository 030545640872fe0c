"""cumulus_etl_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of smart-on-fhir/cumulus-etl.

Architecture (Spark-first, not a port):

- ``session``    — SparkSession factory (AQE, Delta-if-available, UTC, tuned shuffle).
- ``schemas``    — contractual FHIR StructType generation (ref: etl/tasks/base.py:458-467).
- ``sources``    — NDJSON / CSV / parquet scans with pushdown (ref: common.py:134-168).
- ``deid``       — the de-identification engine compiled to Catalyst expressions
                   (ref: deid/scrubber.py — but here it is a plan compiler, not a row loop).
- ``sinks``      — merge/upsert writers (Delta when available, parquet-merge otherwise;
                   ref: formats/deltalake.py:92-263).
- ``operators``  — dedup (exact/MinHash/SimHash), similarity search, text analysis,
                   sampling, multimodal plumbing (beyond-parity scale operators).
- ``functions``  — scalar expression helpers shared by deid + operators.
- ``plans``      — the relational query catalog exercised by the correctness harness.
- ``etl``        — task/job orchestration parity (JobSpec, task registry, completion).
- ``streaming``  — incremental AvailableNow ingestion with foreachBatch merge.
"""

__version__ = "0.1.0"
