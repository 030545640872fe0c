"""FHIR bulk-export NDJSON sources (SURVEY §2.1 S1-S5).

The reference streams dict-per-line with a Python iterator
(cumulus_etl/common.py:134-168) and stages remote inputs to local disk
first (loaders/fhir/ndjson_loader.py:40-69). Spark-first, the whole layer
collapses to a schema'd ``spark.read.json`` with ``recursiveFileLookup``:
predicate pushdown prunes non-matching resourceType rows at scan time, and
S3 is read natively (s3a) with no staging copy.

Malformed lines are quarantined, not dropped silently: PERMISSIVE mode
routes them to ``_corrupt_record`` and callers can split good/bad with
:func:`scan_with_quarantine` (parity: common.py:159-168 warns and skips).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

from cumulus_etl_spark.schemas import schema_for, wide_schema

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: StructType) -> StructType:
    return StructType(list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)])


def scan_resources(
    spark: SparkSession,
    root: str,
    resource_types: list[str] | tuple[str, ...],
) -> DataFrame:
    """S1: read every ``*.ndjson`` under ``root`` (recursively), keep rows of
    the requested resource types, under the contractual union schema.

    The resourceType filter is a plain predicate — Catalyst pushes it into
    the scan, and column pruning drops unread resource-specific fields.
    """
    schema = wide_schema(list(resource_types))
    df = (
        spark.read.schema(_with_corrupt(schema))
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.ndjson")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(root)
    )
    return df.filter(F.col(CORRUPT_COL).isNull() & F.col("resourceType").isin(list(resource_types))).drop(
        CORRUPT_COL
    )


def scan_with_quarantine(
    spark: SparkSession,
    root: str,
    resource_types: list[str] | tuple[str, ...],
) -> tuple[DataFrame, DataFrame]:
    """S1 + K7: (good rows, quarantined raw lines) from one scan.

    The quarantine side carries the raw line plus its source file so a
    run can spill them to ``errors/`` (parity: etl/tasks/base.py:356-364).
    """
    schema = wide_schema(list(resource_types))
    # Text-then-parse, not read.json: Spark disallows queries that touch
    # only the corrupt-record column, and this keeps good/bad a single
    # scan with the raw line available for the quarantine side.
    raw = (
        spark.read.option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.ndjson")
        .text(root)
        .select(
            F.col("value").alias("raw_line"),
            F.input_file_name().alias("source_file"),
            # PERMISSIVE + corrupt column: fully-malformed lines parse to an
            # all-null struct AND field-level type mismatches (e.g. a
            # singleton object where FHIR requires an array) populate the
            # corrupt column — both route to quarantine instead of flowing
            # through with silently-nulled fields.
            F.from_json(
                F.col("value"),
                _with_corrupt(schema),
                {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
            ).alias("parsed"),
        )
    )
    ok = (
        F.col("parsed").isNotNull()
        & F.col("parsed.resourceType").isNotNull()
        & F.col(f"parsed.{CORRUPT_COL}").isNull()
    )
    good = (
        raw.filter(ok)
        .select("parsed.*")
        .drop(CORRUPT_COL)
        .filter(F.col("resourceType").isin(list(resource_types)))
    )
    bad = raw.filter(~ok).select("raw_line", "source_file")
    return good, bad


def scan_one(spark: SparkSession, root: str, resource_type: str) -> DataFrame:
    """Single-resource-type scan under its exact contractual schema."""
    return scan_resources(spark, root, [resource_type]).drop(
        *[
            f.name
            for f in wide_schema([resource_type]).fields
            if f.name not in {x.name for x in schema_for(resource_type).fields}
        ]
    )


def detect_resources(spark: SparkSession, root: str) -> set[str]:
    """S2: which resource types are present under ``root``?

    Reads only the ``resourceType`` column (column pruning keeps the scan
    cheap) — drives task selection like ndjson_loader.py:36-38.
    """
    if not _has_ndjson(root):
        return set()
    df = (
        spark.read.schema(StructType([StructField("resourceType", StringType(), True)]))
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.ndjson")
        .json(root)
    )
    return {r["resourceType"] for r in df.distinct().collect() if r["resourceType"]}


def read_deleted_ids(spark: SparkSession, root: str) -> DataFrame:
    """S4: parse ``deleted/`` Bundle NDJSON into (resource_type, id) rows.

    Bulk-export deleted bundles hold entries whose ``request.method`` is
    DELETE and ``request.url`` is ``Type/id``
    (loaders/fhir/ndjson_loader.py:92-116). Expressed as explode+filter+
    split — fully Catalyst, no driver loop.
    """
    deleted_dir = os.path.join(root, "deleted")
    schema = StructType(
        [
            StructField("resourceType", StringType(), True),
            StructField(
                "entry",
                ArrayType(
                    StructType(
                        [
                            StructField(
                                "request",
                                StructType(
                                    [
                                        StructField("method", StringType(), True),
                                        StructField("url", StringType(), True),
                                    ]
                                ),
                                True,
                            )
                        ]
                    )
                ),
                True,
            ),
        ]
    )
    if not _has_ndjson(deleted_dir):
        return spark.createDataFrame(
            [],
            StructType(
                [
                    StructField("resource_type", StringType(), False),
                    StructField("id", StringType(), False),
                ]
            ),
        )
    df = (
        spark.read.schema(schema)
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.ndjson")
        .json(deleted_dir)
    )
    entries = df.filter(F.col("resourceType") == "Bundle").select(
        F.explode("entry").alias("e")
    )
    url = F.col("e.request.url")
    parts = F.split(url, "/")
    return (
        entries.filter(F.upper(F.col("e.request.method")) == "DELETE")
        .filter(F.size(parts) == 2)
        .select(parts.getItem(0).alias("resource_type"), parts.getItem(1).alias("id"))
        .distinct()
    )


def _has_ndjson(root: str) -> bool:
    """Local-path existence probe so empty dirs don't throw AnalysisException.

    On object stores Spark handles missing-path listing itself; this guard
    is test/local convenience only.
    """
    if "://" in root:
        return True
    for dirpath, _dirs, files in os.walk(root):
        if any(f.endswith(".ndjson") for f in files):
            return True
    return False
