"""The de-id scrubber: rule config → pure Catalyst projection.

The reference walks each resource dict interpretively, per row, per key
(cumulus_etl/deid/scrubber.py:110-306). Spark-first, the walk happens ONCE
at plan-build time over the DataFrame *schema*: the rules compile into a
nested ``select`` of struct-rebuild expressions (``F.struct`` /
``F.transform`` for arrays-of-structs), so scrubbing executes entirely
inside whole-stage codegen — zero Python per row (philter is the one
optional pandas_udf).

Semantics covered (SURVEY §2.3): P1 allow-list projection, P2 masks,
P3/P7 anon-id, P4 anon-ref, P5 year, P6 zip, P8 philter, P9 check-system,
P10 extension allow-list + modifier-extension veto (at any nesting depth,
threaded up through array ``exists`` and applied as a filter on the
ORIGINAL frame before the projection drops the fields), P11
resource-level filter, P12 trim/empty-drop.

Masked values become nulls plus the FHIR primitive-extension sibling
``_<field>`` carrying a ``data-absent-reason: masked`` extension when a
value was actually present (ref scrubber.py:178-182,320-335). Remaining
divergences: a failed ``check-system`` gate nulls the code without the
extension, and empty structs are kept as all-null structs rather than
removed keys (columnar schemas are fixed; NDJSON output drops nulls at
write time, which yields the same serialized form).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DataType, StringType, StructType

from cumulus_etl_spark.deid.philter import philter_mask
from cumulus_etl_spark.deid.rules import (
    ALLOWED_EXTENSION_URLS,
    ALLOWED_MODIFIER_EXTENSION_URLS,
    NODE_RULES,
    resolve_node,
)
from cumulus_etl_spark.functions import anon_id, anon_ref, nullif_empty, year_only, zip_generalize

# Epic site-specific code systems may carry free-text (possibly PHI) codes;
# a code under one is trusted only if purely numeric (ref scrubber.py:421-467).
EPIC_SYSTEM_PREFIX = "urn:oid:1.2.840.114350."

DATA_ABSENT_URL = "http://hl7.org/fhir/StructureDefinition/data-absent-reason"


def _data_absent_marker(orig: Column, dtype: DataType) -> Column:
    """FHIR primitive extension for a masked field: the ``_<field>`` sibling
    ``{"extension": [{"url": …/data-absent-reason, "valueCode": "masked"}]}``,
    present only where a value actually existed (empty strings count as
    absent, matching the reference's strip-then-skip order)."""
    present = orig.isNotNull()
    if isinstance(dtype, StringType):
        present = nullif_empty(orig).isNotNull()
    ext = F.array(
        F.struct(F.lit(DATA_ABSENT_URL).alias("url"), F.lit("masked").alias("valueCode"))
    )
    return F.when(present, F.struct(ext.alias("extension")))


def _rules_can_veto(dtype: DataType, rules: dict[str, object]) -> bool:
    """Schema-only walk: does any reachable field carry a modifier-extension
    veto? Decides whether to emit exists() veto conditions for arrays."""
    if isinstance(dtype, ArrayType):
        return _rules_can_veto(dtype.elementType, rules)
    if not isinstance(dtype, StructType):
        return False
    for sf in dtype.fields:
        spec = rules.get(sf.name)
        if spec is None:
            continue
        if spec in ("ModifierExtension", "Contained"):
            return True  # contained elements can carry vetoing modifiers
        if isinstance(spec, dict):
            child = {**resolve_node("BackboneElement"), **spec}
            if _rules_can_veto(sf.dataType, child):
                return True
        elif isinstance(spec, str) and spec[:1].isupper() and spec != "Extension":
            node_name = spec.split(";", 1)[0]  # strip conditional part
            if _rules_can_veto(sf.dataType, resolve_node(node_name)):
                return True
    return False


@dataclass
class Scrubber:
    """Compiles scrub rules against a DataFrame schema.

    ``nlp_mode`` keeps note text (``mask-note`` fields survive and philter
    is skipped on them) — parity with the NLP pipeline's scrubber settings
    (etl/pipeline.py:213-215).
    """

    salt: str
    philter_enabled: bool = False
    # opt-in Title-case-bigram bare-name masking (philter.BARE_NAME_PATTERN);
    # conservative but still heuristic, so off unless the operator asks
    philter_bare_names: bool = False
    nlp_mode: bool = False
    allowed_extensions: frozenset[str] = field(default_factory=lambda: ALLOWED_EXTENSION_URLS)
    allowed_modifier_extensions: frozenset[str] = field(
        default_factory=lambda: ALLOWED_MODIFIER_EXTENSION_URLS
    )

    # ---- public API ----

    def scrub(self, df: DataFrame, resource_type: str) -> DataFrame:
        """Project ``df`` down to the de-identified allow-listed shape.

        Rows carrying unknown *modifier* extensions (at any depth) are
        dropped entirely — ignoring a modifier would change meaning.
        """
        if resource_type not in NODE_RULES:
            raise ValueError(f"no scrub rules for resource type {resource_type!r}")
        rules = resolve_node(resource_type)
        exprs: list[Column] = []
        vetoes: list[Column] = []
        for sf in df.schema.fields:
            spec = rules.get(sf.name)
            if spec is None:
                continue  # allow-list: unlisted fields are dropped
            expr, veto = self._field_expr(F.col(sf.name), sf.dataType, sf.name, spec)
            if expr is not None:
                exprs.append(expr.alias(sf.name))
            if veto is not None:
                vetoes.append(veto)
            if self._is_masked(spec):
                exprs.append(
                    _data_absent_marker(F.col(sf.name), sf.dataType).alias(f"_{sf.name}")
                )
        # Veto conditions reference fields (modifierExtension at any depth)
        # that the projection drops, so the filter runs against the ORIGINAL
        # frame, before the select. Catalyst pushes the filter into the scan
        # either way; ordering here is a correctness constraint, not a cost.
        if vetoes:
            keep = ~vetoes[0]
            for v in vetoes[1:]:
                keep = keep & ~v
            # coalesce: a null veto condition (e.g. null array) means "no veto"
            df = df.filter(F.coalesce(keep, F.lit(True)))
        return df.select(*exprs)

    def dropped_extension_report(self, df: DataFrame, resource_type: str) -> DataFrame:
        """A1: counts of dropped extension URLs, as a real aggregation
        (``groupBy(url).count()``) instead of driver-side dicts
        (ref scrubber.py:343-349)."""
        if "extension" not in df.columns:
            return df.sparkSession.createDataFrame([], "resource_type string, url string, n bigint")
        return (
            df.select(F.explode("extension").alias("ext"))
            .filter(~F.col("ext.url").isin(*self.allowed_extensions))
            .groupBy(F.col("ext.url").alias("url"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.lit(resource_type).alias("resource_type"), "url", "n")
        )

    # ---- compiler ----

    def _is_masked(self, spec: object) -> bool:
        """Does this rule null the value out (⇒ synthesize ``_<field>``)?"""
        return spec == "mask" or (spec == "mask-note" and not self.nlp_mode)

    def _field_expr(
        self, col: Column, dtype: DataType, name: str, spec: object, parent: Column | None = None
    ) -> tuple[Column | None, Column | None]:
        """Returns (rewritten expression | None-to-drop, veto condition | None)."""
        if spec == "ModifierExtension":
            # Unknown modifier extension → veto the resource; the field
            # itself is dropped from output (nothing allowed survives).
            allowed = list(self.allowed_modifier_extensions)
            if allowed:
                unknown = F.exists(col, lambda x: ~x["url"].isin(*allowed))
            else:
                unknown = F.size(col) > 0
            return None, F.coalesce(unknown, F.lit(False))
        if spec == "Extension":
            return self._extension_expr(col, dtype), None
        if spec == "Contained":
            return self._contained_expr(col, dtype)
        if isinstance(spec, str) and spec[:1].islower():
            return self._leaf_expr(col, dtype, spec, parent=parent), None
        if isinstance(spec, str) and ";" in spec:
            # conditional node config, e.g. "Identifier;system=url1;system=url2"
            # (ref scrubber.py node conditions): keep the node only when the
            # named sibling field matches one of the allowed values.
            node_name, *pairs = spec.split(";")
            fields = {p.split("=", 1)[0] for p in pairs}
            if len(fields) != 1:
                raise ValueError(f"conditional node rule mixes fields: {spec!r}")
            cond_field = fields.pop()
            values = [p.split("=", 1)[1] for p in pairs]
            return self._conditional_node_expr(
                col, dtype, resolve_node(node_name), cond_field, values
            )
        # node recursion (named node or inline dict of child rules)
        child_rules = resolve_node(spec) if isinstance(spec, str) else dict(spec)
        if isinstance(spec, dict):
            # inline backbone rules implicitly extend BackboneElement
            base = resolve_node("BackboneElement")
            child_rules = {**base, **child_rules}
        return self._node_expr(col, dtype, child_rules)

    def _node_expr(
        self, col: Column, dtype: DataType, rules: dict[str, object]
    ) -> tuple[Column | None, Column | None]:
        if isinstance(dtype, ArrayType):
            elem_type = dtype.elementType
            if not isinstance(elem_type, StructType):
                # e.g. category: array<string> declared "val"
                return F.transform(col, lambda x: nullif_empty(x)) if isinstance(
                    elem_type, StringType
                ) else col, None
            # Veto inside arrays: exists(arr, elem-veto) — checked first via
            # a schema-only walk so we don't emit a needless exists().
            rebuilt = F.transform(col, lambda x: self._struct_expr(x, elem_type, rules)[0])
            veto = None
            if _rules_can_veto(elem_type, rules):
                veto = F.exists(col, lambda x: self._struct_expr(x, elem_type, rules)[1])
            return rebuilt, veto
        if isinstance(dtype, StructType):
            expr, veto = self._struct_expr(col, dtype, rules)
            return F.when(col.isNotNull(), expr), veto
        raise ValueError(f"node rules applied to non-struct type {dtype.simpleString()}")

    def _conditional_node_expr(
        self,
        col: Column,
        dtype: DataType,
        rules: dict[str, object],
        cond_field: str,
        values: list[str],
    ) -> tuple[Column | None, Column | None]:
        """Node kept only where ``cond_field`` ∈ ``values`` (null → drop).
        Arrays filter elements; structs gate the whole value."""
        if isinstance(dtype, ArrayType) and isinstance(dtype.elementType, StructType):
            kept = F.filter(col, lambda x: x[cond_field].isin(*values))
            elem_type = dtype.elementType
            rebuilt = F.transform(kept, lambda x: self._struct_expr(x, elem_type, rules)[0])
            veto = None
            if _rules_can_veto(elem_type, rules):
                veto = F.exists(kept, lambda x: self._struct_expr(x, elem_type, rules)[1])
            return F.when(F.size(rebuilt) > 0, rebuilt), veto
        if isinstance(dtype, StructType):
            expr, veto = self._struct_expr(col, dtype, rules)
            gate = F.coalesce(col[cond_field].isin(*values), F.lit(False))
            if veto is not None:
                veto = veto & gate
            return F.when(col.isNotNull() & gate, expr), veto
        raise ValueError(
            f"conditional node rules applied to non-struct type {dtype.simpleString()}"
        )

    def _struct_expr(
        self, col: Column, dtype: StructType, rules: dict[str, object]
    ) -> tuple[Column, Column | None]:
        parts: list[Column] = []
        vetoes: list[Column] = []
        for sf in dtype.fields:
            spec = rules.get(sf.name)
            if spec is None:
                continue
            expr, veto = self._field_expr(col[sf.name], sf.dataType, sf.name, spec, parent=col)
            if expr is not None:
                parts.append(expr.alias(sf.name))
            if veto is not None:
                vetoes.append(veto)
            if self._is_masked(spec):
                parts.append(
                    _data_absent_marker(col[sf.name], sf.dataType).alias(f"_{sf.name}")
                )
        if not parts:
            parts = [F.lit(None).cast("string").alias("__empty__")]
        veto_out: Column | None = None
        for v in vetoes:
            veto_out = v if veto_out is None else (veto_out | v)
        return F.struct(*parts), veto_out

    # Resource types whose full rules apply inside `contained` (matches
    # the union CONTAINED schema, schemas/fhir.py). Any other contained
    # type falls back to base Resource fields only — exactly the
    # reference's behavior for types it has no config for
    # (ref scrubber.py:124-127 "just use basic resource type then").
    CONTAINED_TYPES = ("Medication", "Organization", "Patient")

    def _contained_expr(
        self, col: Column, dtype: DataType
    ) -> tuple[Column | None, Column | None]:
        """DomainResource.contained: heterogeneous array scrubbed with
        per-resourceType gating over ONE shared struct shape (a CASE per
        field, not per branch, so every branch yields the same type).

        - base Resource fields (resourceType, anon'd id, meta, …) always
          survive; contained ids hash VERBATIM (a '#careplan' id hashes
          including the '#'), matching the reference's codebook calls
        - a field kept by some branch is null'd unless the element's
          resourceType is one of its keepers
        - an unknown *modifier* extension on a contained element of an
          understood type vetoes the whole outer resource (the
          reference's SkipResource propagates out of contained scrubs);
          unknown-type elements just lose their modifiers like every
          other unlisted field
        """
        if not isinstance(dtype, ArrayType) or not isinstance(
            dtype.elementType, StructType
        ):
            return None, None
        elem = dtype.elementType
        branches = {t: resolve_node(t) for t in self.CONTAINED_TYPES}
        always = resolve_node("Resource")

        plans: list[tuple[str, DataType, object, list[str] | None]] = []
        for sf in elem.fields:
            if sf.name in always:
                plans.append((sf.name, sf.dataType, always[sf.name], None))
                continue
            if sf.name == "modifierExtension":
                continue  # veto handling below; never emitted
            keepers = sorted(t for t, r in branches.items() if sf.name in r)
            if not keepers:
                continue
            plans.append((sf.name, sf.dataType, branches[keepers[0]][sf.name], keepers))

        def build(x: Column) -> Column:
            parts = []
            for name, ftype, spec, keepers in plans:
                expr, _ = self._field_expr(x[name], ftype, name, spec, parent=x)
                if expr is None:
                    continue
                if keepers is not None:
                    expr = F.when(x["resourceType"].isin(keepers), expr)
                parts.append(expr.alias(name))
            return F.struct(*parts)

        rebuilt = F.when(col.isNotNull(), F.transform(col, build))

        allowed = list(self.allowed_modifier_extensions)

        def mod_veto(x: Column) -> Column:
            mods = x["modifierExtension"]
            if allowed:
                unknown = F.exists(mods, lambda m: ~m["url"].isin(*allowed))
            else:
                unknown = F.size(mods) > 0
            understood = x["resourceType"].isin(list(self.CONTAINED_TYPES))
            return F.coalesce(understood & unknown, F.lit(False))

        veto = F.coalesce(F.exists(col, mod_veto), F.lit(False))
        return rebuilt, veto

    def _extension_expr(self, col: Column, dtype: DataType) -> Column:
        """P10: keep only allow-listed extension URLs, preserving payloads."""
        if not isinstance(dtype, ArrayType):
            return F.lit(None).cast(dtype)
        if not self.allowed_extensions:
            return F.lit(None).cast(dtype)
        kept = F.filter(col, lambda x: x["url"].isin(*self.allowed_extensions))
        return F.when(F.size(kept) > 0, kept)

    def _leaf_expr(
        self, col: Column, dtype: DataType, action: str, parent: Column | None
    ) -> Column | None:
        if action.startswith("check-system;"):
            # Trust gate on the sibling `system` value; `parent` is the
            # enclosing Coding struct (wired by _struct_expr caller below).
            sub = action.split(";", 1)[1]
            inner = self._leaf_expr(col, dtype, sub, parent=None)
            if parent is None:
                return inner
            system = parent["system"]
            code = parent["code"]
            unsafe = system.startswith(EPIC_SYSTEM_PREFIX) & ~F.coalesce(
                code.rlike(r"^[0-9.]+$"), F.lit(False)
            )
            return F.when(~F.coalesce(unsafe, F.lit(False)), inner)
        if action == "val":
            if isinstance(dtype, StringType):
                return nullif_empty(col)
            if isinstance(dtype, ArrayType) and isinstance(dtype.elementType, StringType):
                return F.transform(col, lambda x: nullif_empty(x))
            return col
        if action == "mask":
            return F.lit(None).cast(dtype)
        if action == "mask-note":
            if self.nlp_mode:
                return nullif_empty(col) if isinstance(dtype, StringType) else col
            return F.lit(None).cast(dtype)
        if action == "anon-id":
            return anon_id(col, self.salt)
        if action == "anon-ref":
            return anon_ref(col, self.salt)
        if action == "year":
            return year_only(col)
        if action == "zip":
            return zip_generalize(col)
        if action == "philter":
            if self.philter_enabled and not self.nlp_mode:
                return philter_mask(
                    nullif_empty(col), bare_names=self.philter_bare_names
                )
            return nullif_empty(col)
        raise ValueError(f"unknown scrub action {action!r}")
