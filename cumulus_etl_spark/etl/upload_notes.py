"""Chart-review (upload-notes) support operators: SURVEY §2.5 J3/J5,
§2.7 O2/O4/O5.

The reference assembles chart-review bundles for Label Studio: resolve
note authors via PractitionerRole→Practitioner lookups
(fhir/fhir_utils.py:206-293, a nested-loop scan), group notes by
encounter and merge their text with recomputed span offsets
(upload_notes/cli.py:50-74,205-262), order charts by date with
first-appearance stability (:176-202), and pick display names by use
priority (fhir_utils.py:184-203).

Spark-first: the lookups are broadcast left joins, the grouping is
``groupBy(encounter).agg(sort_array(collect_list(struct)))``, offsets
come from a prefix-sum window — no driver-side assembly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# O5: HumanName.use priority — official > usual > anything > nickname-ish
_USE_PRIORITY = {"official": 0, "usual": 1}


def pick_human_name(names: Column) -> Column:
    """Pick the best HumanName from an array by use priority and render
    ``given... family`` (ref fhir_utils.py:184-203)."""
    prio = lambda n: (  # noqa: E731
        F.when(n["use"] == "official", F.lit(0))
        .when(n["use"] == "usual", F.lit(1))
        .otherwise(F.lit(2))
    )
    best = F.element_at(
        F.array_sort(
            F.transform(names, lambda n: F.struct(prio(n).alias("p"), n.alias("n"))),
            # comparator on priority only; stable for ties
            lambda a, b: F.when(a["p"] < b["p"], -1).when(a["p"] > b["p"], 1).otherwise(0),
        ),
        1,
    )["n"]
    # nullif: concat_ws of a null given array yields "" which would
    # otherwise leave a leading space in the outer join
    rendered = F.concat_ws(
        " ", F.nullif(F.concat_ws(" ", best["given"]), F.lit("")), best["family"]
    )
    return F.when(names.isNotNull() & (F.size(names) > 0), F.nullif(rendered, F.lit("")))


def enrich_with_practitioners(
    notes: DataFrame, practitioner_roles: DataFrame, practitioners: DataFrame
) -> DataFrame:
    """J3: resolve note author display names + specialties.

    notes.author[0].reference may point at a PractitionerRole (hop through
    it) or directly at a Practitioner. Two broadcast left joins replace
    the reference's per-note nested-loop scans.
    """
    author_ref = F.element_at(F.col("author"), 1)["reference"]
    n = notes.withColumn("__author_ref", author_ref)

    roles = practitioner_roles.select(
        F.concat(F.lit("PractitionerRole/"), F.col("id")).alias("__role_ref"),
        F.col("practitioner")["reference"].alias("__role_prac_ref"),
        F.transform(F.col("specialty"), lambda s: s["text"]).alias("author_specialties"),
    )
    pracs = practitioners.select(
        F.concat(F.lit("Practitioner/"), F.col("id")).alias("__prac_ref"),
        pick_human_name(F.col("name")).alias("author_display"),
    )
    out = (
        n.join(F.broadcast(roles), n["__author_ref"] == roles["__role_ref"], "left")
        .withColumn("__prac_lookup", F.coalesce("__role_prac_ref", "__author_ref"))
        .join(F.broadcast(pracs), F.col("__prac_lookup") == pracs["__prac_ref"], "left")
    )
    return out.drop("__author_ref", "__role_ref", "__role_prac_ref", "__prac_lookup", "__prac_ref")


def group_notes_by_encounter(
    notes: DataFrame,
    id_col: str = "id",
    text_col: str = "note_text",
    date_col: str = "date",
) -> DataFrame:
    """J5: one chart per encounter — notes merged in date order with
    per-note [offset_start, offset_end) into the merged text.

    Fallback grouping key is the note's own reference (a note without an
    encounter becomes its own chart), matching upload_notes/cli.py:50-74.
    Offsets come from a prefix-sum window over (chart, date) — the merged
    text is then one concat_ws; no quadratic string building.
    """
    sep = "\n\n"
    enc_ref = F.element_at(F.col("context.encounter"), 1)["reference"]
    own_ref = F.concat(F.lit("DocumentReference/"), F.col(id_col))
    keyed = notes.withColumn("chart_id", F.coalesce(enc_ref, own_ref)).filter(
        F.col(text_col).isNotNull()
    )
    w = (
        Window.partitionBy("chart_id")
        .orderBy(F.col(date_col).asc_nulls_last(), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    sized = keyed.withColumn(
        "offset_start",
        F.coalesce(F.sum(F.length(F.col(text_col)) + F.lit(len(sep))).over(w), F.lit(0)),
    ).withColumn("offset_end", F.col("offset_start") + F.length(F.col(text_col)))
    return (
        sized.groupBy("chart_id")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("offset_start"),
                        F.col("offset_end"),
                        F.col(id_col).alias("note_id"),
                        F.col(date_col).alias("note_date"),
                        F.col(text_col).alias("note_text"),
                    )
                )
            ).alias("notes"),
            F.min(F.col(date_col)).alias("chart_date"),
        )
        .withColumn("chart_text", F.concat_ws(sep, F.transform("notes", lambda n: n["note_text"])))
    )


def order_charts(charts: DataFrame) -> DataFrame:
    """O4: stable chart ordering — by earliest note date (nulls last),
    then chart id for total order."""
    return charts.orderBy(F.col("chart_date").asc_nulls_last(), F.col("chart_id"))
