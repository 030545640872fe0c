"""Scalar expression helpers for the de-id engine.

All are pure Catalyst Column expressions — no UDFs — so they stay inside
whole-stage codegen and can be pushed into any projection. Each mirrors a
behavior of the reference (file:line cited per function).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Low-population 3-digit ZIP prefixes that must be fully zeroed (HIPAA safe
# harbor). Ref: cumulus_etl/deid/scrubber.py:391-410 (frozen set of 14).
RESTRICTED_ZIP_PREFIXES = (
    "036", "059", "102", "203", "205", "369", "556",
    "692", "821", "823", "878", "879", "884", "893",
)


def anon_id(real_id: Column | str, salt: Column | str) -> Column:
    """Deterministic pseudonym: SHA-256 over salt||id.

    Ref: cumulus_etl/deid/codebook.py:204-217 uses HMAC-SHA256(salt, id);
    we use salted SHA-256 which has the same determinism/irreversibility
    contract and is a single JVM-side expression (no key-schedule UDF). The
    salt is broadcast as a literal/column, so the whole de-id projection is
    stateless and embarrassingly parallel — no codebook lookups on the hot
    path (mappings become an audit side-output, see deid/codebook.py here).
    """
    rid = F.col(real_id) if isinstance(real_id, str) else real_id
    s = F.lit(salt) if isinstance(salt, str) else salt
    return F.sha2(F.concat(s, rid.cast("string")), 256)


def anon_ref(ref: Column | str, salt: Column | str) -> Column:
    """Rewrite a FHIR-style ``Type/id`` reference to ``Type/anon_id``.

    Ref: cumulus_etl/deid/scrubber.py:377-389 + fhir/fhir_utils.py:26-72.
    Contained refs (``#id``) pass through untouched; absolute URLs and
    malformed refs are nulled (the reference drops them).
    """
    r = F.col(ref) if isinstance(ref, str) else ref
    parts = F.split(r, "/")
    is_relative = (F.size(parts) == 2) & ~r.startswith("http")
    return (
        F.when(r.startswith("#"), r)
        .when(is_relative, F.concat(parts[0], F.lit("/"), anon_id(parts[1], salt)))
        .otherwise(F.lit(None).cast("string"))
    )


def year_only(date_str: Column | str) -> Column:
    """Generalize a date(/time) string to its year: first 4 chars.

    Ref: cumulus_etl/deid/scrubber.py:258-259 (birthDate → year).
    """
    c = F.col(date_str) if isinstance(date_str, str) else date_str
    return F.substring(c, 1, 4)


def zip_generalize(zip_code: Column | str) -> Column:
    """HIPAA zip generalization: keep 3-digit prefix, zero remaining digits
    (non-digit chars kept — non-US zips pass through); fully zero the 14
    restricted low-population prefixes.

    Ref: cumulus_etl/deid/scrubber.py:391-420 (same semantics, as one
    codegen-friendly expression instead of a per-row method).
    """
    z = F.col(zip_code) if isinstance(zip_code, str) else zip_code
    prefix = F.substring(z, 1, 3)
    suffix = F.translate(F.substring(z, 4, 1_000_000), "123456789", "000000000")
    return F.concat(
        F.when(prefix.isin(*RESTRICTED_ZIP_PREFIXES), F.lit("000")).otherwise(prefix),
        suffix,
    )


def nullif_empty(c: Column | str) -> Column:
    """Trim whitespace and convert empty strings to null.

    Ref: cumulus_etl/deid/scrubber.py:237-243 (strip + drop empties).
    """
    col = F.col(c) if isinstance(c, str) else c
    return F.nullif(F.trim(col), F.lit(""))
