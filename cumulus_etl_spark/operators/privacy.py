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
  reconcile while no small cell is disclosed.  Optionally adds a
  Laplace-noised count column (``epsilon``) for differential privacy
  on the released cells.
- ``l_diversity``          — per-class distinct-count of a sensitive
  column (the l-diversity audit: a class can be k-anonymous yet leak
  its sensitive value when every member shares it).

Scale shape: one hash aggregate over the quasi-identifier columns —
map-side combine collapses each partition to its distinct QI tuples, so
the shuffle is bounded by the QI-space cardinality, not the row count.
Everything after that operates on |classes| rows (tiny by construction:
a release with 10^9 distinct cells is not a release).  No UDFs, no
collects — both stages are whole-stage-codegen aggregates.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
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


def laplace_noise(key: Column, epsilon: float, sensitivity: float = 1.0,
                  seed: str = "dp") -> Column:
    """Deterministic Laplace(b = sensitivity/epsilon) noise keyed by a
    PRF of (seed, key) — the same md5-uniform construction as the A-ES
    reservoir (streaming/reservoir.py): the noise is a pure function of
    the cell identity, so a re-run releases the SAME noised counts
    instead of averaging the noise away across replays (repeated fresh
    draws on the same cell compose their epsilons; a keyed PRF releases
    one draw, once).  Inverse-CDF sampling: u ~ Uniform(-1/2, 1/2) from
    the first 15 md5 hex digits (60 uniform bits, offset half a step so
    u never hits the +-1/2 endpoints), noise = -b * sign(u) * ln(1-2|u|).
    """
    if epsilon <= 0:
        raise ValueError(f"epsilon must be > 0, got {epsilon}")
    h = F.conv(F.substring(F.md5(F.concat_ws("\x1f", F.lit(seed), key)), 1, 15), 16, 10)
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(16**15)) - F.lit(0.5)
    b = sensitivity / epsilon
    return -F.lit(b) * F.signum(u) * F.log(F.lit(1.0) - 2.0 * F.abs(u))


def small_cell_release(
    df: DataFrame,
    qi_cols: Sequence[str],
    k: int = 10,
    pooled_label: str = SUPPRESSED,
    epsilon: float | None = None,
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

    With ``epsilon`` set, an ``n_noised`` column is appended: the cell
    count plus deterministic Laplace(1/epsilon) noise (``laplace_noise``
    keyed by the cell's QI tuple), rounded and floored at 0 — the
    epsilon-DP count release for the cells that survive suppression.
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
    out = censored.groupBy(*qi_cols).agg(
        F.sum("class_size").cast("bigint").alias("n_individuals"),
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.min("class_size").cast("bigint").alias("min_class_size"),
    )
    if epsilon is not None:
        cell_key = F.concat_ws("\x1f", *[F.coalesce(F.col(c), F.lit("\x00")) for c in qi_cols])
        noised = F.col("n_individuals") + laplace_noise(cell_key, epsilon)
        out = out.withColumn(
            "n_noised", F.greatest(F.round(noised).cast("bigint"), F.lit(0))
        )
    return out


def l_diversity(
    df: DataFrame, qi_cols: Sequence[str], sensitive_col: str
) -> DataFrame:
    """Per-equivalence-class distinct-count of ``sensitive_col``: one row
    per QI class with its ``class_size`` and ``l`` (number of distinct
    sensitive values among its members).  ``min(l)`` over the frame is
    the l-diversity the release achieves — a class with l=1 discloses
    its members' sensitive value even when k-anonymous.  Same scale
    shape as the class count: one hash aggregate, QI-space-bounded."""
    if not qi_cols:
        raise ValueError("l_diversity needs at least one quasi-identifier")
    return df.groupBy(*qi_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("class_size"),
        F.count_distinct(F.col(sensitive_col)).cast("bigint").alias("l"),
    )
