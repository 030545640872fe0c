"""Disclosure-control audits over de-identified output: k-anonymity and
small-cell suppression.

The reference pipeline de-identifies rows (`/root/reference/cumulus_etl/
deid/scrubber.py`) but leaves release-side disclosure control to the
downstream Cumulus count tables, whose public convention is to censor
any cell counting fewer than 10 individuals before results leave the
site (the standard small-cell-suppression rule used across public-health
reporting).  This module makes that release step a first-class,
distributed operator plus the audit that justifies it:

- ``k_anonymity_classes``  — quasi-identifier equivalence classes + size.
- ``k_anonymity_histogram`` — class-size distribution (the k-anonymity
  audit: the smallest class size IS the k of the release).
- ``small_cell_release``   — the censored count table: classes of at
  least ``k`` individuals release their counts verbatim; everything
  smaller is pooled into one ``<suppressed>`` row so totals still
  reconcile while no small cell is disclosed.

Scale shape: one hash aggregate over the quasi-identifier columns —
map-side combine collapses each partition to its distinct QI tuples, so
the shuffle is bounded by the QI-space cardinality, not the row count.
Everything after that operates on |classes| rows (tiny by construction:
a release with 10^9 distinct cells is not a release).  No UDFs, no
collects — both stages are whole-stage-codegen aggregates.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SUPPRESSED = "<suppressed>"


def k_anonymity_classes(df: DataFrame, qi_cols: Sequence[str]) -> DataFrame:
    """Equivalence classes of the quasi-identifier tuple: one row per
    distinct QI combination with its individual count ``class_size``.
    NULL quasi-identifier values form their own class (SQL GROUP BY
    semantics in both engines)."""
    if not qi_cols:
        raise ValueError("k_anonymity_classes needs at least one quasi-identifier")
    return df.groupBy(*qi_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("class_size")
    )


def k_anonymity_histogram(df: DataFrame, qi_cols: Sequence[str]) -> DataFrame:
    """Class-size distribution: (class_size, n_classes, n_individuals),
    ascending by class_size.  ``min(class_size)`` over this frame is the
    k the dataset actually achieves for these quasi-identifiers."""
    classes = k_anonymity_classes(df, qi_cols)
    return (
        classes.groupBy("class_size")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_classes"),
            F.sum("class_size").cast("bigint").alias("n_individuals"),
        )
        .orderBy("class_size")
    )


def small_cell_release(
    df: DataFrame,
    qi_cols: Sequence[str],
    k: int = 10,
    pooled_label: str = SUPPRESSED,
) -> DataFrame:
    """The releasable count table with small-cell suppression.

    Classes with ``class_size >= k`` release their quasi-identifier
    values and exact count; every smaller class has ALL its QI values
    replaced by ``pooled_label`` and is merged into a single pooled row.
    Output per released row: the QI columns (as strings), plus

    - ``n_individuals``   — total individuals in the row's classes,
    - ``n_classes``       — classes merged into the row (1 unless pooled),
    - ``min_class_size``  — smallest merged class (for the released rows
      this is the row's own count; on the pooled row it is the true
      k-anonymity floor the suppression removed).

    Totals reconcile: sum(n_individuals) over the release equals the
    input row count, so downstream consumers can verify nothing was
    silently dropped — suppression pools, it never deletes.
    """
    if k < 1:
        raise ValueError(f"suppression threshold must be >= 1, got {k}")
    classes = k_anonymity_classes(df, qi_cols)
    keep = F.col("class_size") >= k
    censored = classes.select(
        *[
            F.when(keep, F.col(c).cast("string"))
            .otherwise(F.lit(pooled_label))
            .alias(c)
            for c in qi_cols
        ],
        "class_size",
    )
    return censored.groupBy(*qi_cols).agg(
        F.sum("class_size").cast("bigint").alias("n_individuals"),
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.min("class_size").cast("bigint").alias("min_class_size"),
    )
