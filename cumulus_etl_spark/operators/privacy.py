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
  Laplace-noised count column (``epsilon`` + a caller-secret
  ``dp_seed``) for differential privacy on the released cells.
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
                  seed: str | None = None) -> Column:
    """Deterministic Laplace(b = sensitivity/epsilon) noise keyed by a
    PRF of (seed, key) — the same md5-uniform construction as the A-ES
    reservoir (streaming/reservoir.py): the noise is a pure function of
    (seed, cell identity), so a re-run releases the SAME noised counts
    instead of averaging the noise away across replays (repeated fresh
    draws on the same cell compose their epsilons; a keyed PRF releases
    one draw, once).

    ``seed`` is REQUIRED and must be a SECRET the releasing site keeps
    out of the published artifact: a keyed-PRF noise stream is only
    (computationally) differentially private while the key is unknown
    to the adversary — with a public or default seed anyone holding
    this open-source code could recompute the noise from the published
    QI tuple and subtract it, recovering the exact counts.  There is
    deliberately no default.

    Inverse-CDF sampling: u ~ Uniform(-1/2, 1/2) from the first 15 md5
    hex digits (60 uniform bits, offset half a step so u never hits the
    +-1/2 endpoints), noise = -b * sign(u) * ln(1-2|u|).
    """
    if epsilon <= 0:
        raise ValueError(f"epsilon must be > 0, got {epsilon}")
    if not seed:
        raise ValueError(
            "laplace_noise requires a caller-supplied secret seed: keyed "
            "deterministic noise is only DP while the PRF key is secret "
            "(a default seed would let anyone recompute and subtract the "
            "noise from the published cells)"
        )
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
    dp_seed: str | None = None,
    include_exact: bool = False,
) -> DataFrame:
    """The releasable count table with small-cell suppression.

    Classes with ``class_size >= k`` release their quasi-identifier
    values and exact count; every smaller class is merged into a single
    pooled row whose QI values display as ``pooled_label``.  Pooling is
    decided by an explicit ``pooled`` flag carried through the second
    aggregate — NOT by comparing display strings — so a kept class
    whose value happens to stringify to ``pooled_label`` stays its own
    released row (``pooled = false`` disambiguates it), and two
    distinct native QI values with identical string casts stay separate
    cells: the merge key is (pooled, native QI values), the string cast
    happens only in the final projection.

    Output per released row: the QI columns (as strings), plus

    - ``n_individuals``   — total individuals in the row's classes,
    - ``n_classes``       — classes merged into the row (1 unless pooled),
    - ``min_class_size``  — smallest merged class (for the released rows
      this is the row's own count; on the pooled row it is the true
      k-anonymity floor the suppression removed),
    - ``pooled``          — true on the merged small-cell row.

    Totals reconcile: sum(n_individuals) over the release equals the
    input row count, so downstream consumers can verify nothing was
    silently dropped — suppression pools, it never deletes.

    With ``epsilon`` set, a ``dp_seed`` is REQUIRED (the secret PRF key
    — see ``laplace_noise`` for why a default would void the DP claim)
    and the release becomes the epsilon-DP count table: QI columns +
    ``pooled`` + ``n_noised`` (the cell count plus deterministic
    Laplace(1/epsilon) noise keyed by (dp_seed, published QI tuple),
    rounded and floored at 0).  The exact ``n_individuals`` /
    ``n_classes`` / ``min_class_size`` columns are EXCLUDED from the DP
    release by default — publishing the exact count next to the noised
    one voids the noise; pass ``include_exact=True`` only for
    side-by-side auditing that never leaves the site.
    """
    if k < 1:
        raise ValueError(f"suppression threshold must be >= 1, got {k}")
    if epsilon is not None and not dp_seed:
        raise ValueError(
            "small_cell_release with epsilon requires dp_seed (the secret "
            "PRF key); without a secret the noised counts are reversible"
        )
    classes = k_anonymity_classes(df, qi_cols)
    pooled = F.col("class_size") < k
    # Merge key = (pooled, native QI masked to NULL on the pooled side):
    # all small classes share one key; kept classes keep their native
    # values (types intact) so no string-cast collision can merge them.
    grouped = classes.groupBy(
        pooled.alias("pooled"),
        *[F.when(~pooled, F.col(c)).alias(c) for c in qi_cols],
    ).agg(
        F.sum("class_size").cast("bigint").alias("n_individuals"),
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.min("class_size").cast("bigint").alias("min_class_size"),
    )
    out = grouped.select(
        *[
            F.when(F.col("pooled"), F.lit(pooled_label))
            .otherwise(F.col(c).cast("string"))
            .alias(c)
            for c in qi_cols
        ],
        "n_individuals",
        "n_classes",
        "min_class_size",
        "pooled",
    )
    if epsilon is not None:
        cell_key = F.concat_ws(
            "\x1f", *[F.coalesce(F.col(c), F.lit("\x00")) for c in qi_cols]
        )
        noised = F.col("n_individuals") + laplace_noise(cell_key, epsilon, seed=dp_seed)
        out = out.withColumn(
            "n_noised", F.greatest(F.round(noised).cast("bigint"), F.lit(0))
        )
        if not include_exact:
            out = out.drop("n_individuals", "n_classes", "min_class_size")
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
