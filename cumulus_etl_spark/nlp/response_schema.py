"""Response-model → StructType compiler (SURVEY §2.9 U7).

The reference converts pydantic response models to pyarrow schemas
recursively, rewriting span fields to ``list<list<int32>[2]>``
(etl/tasks/nlp_task.py:353-394,454-482). Pydantic isn't a dependency
here; the model is a plain dict spec (what a tasks.toml would carry):

    {"symptoms": [{"text": "str", "cui": "str", "spans": "spans"}],
     "severity": "int", "notes": "str?"}

- scalar types: str/int/float/bool (trailing ``?`` is cosmetic — every
  field is nullable, matching the reference's arrow schemas)
- ``"spans"``: the span list type (array<array<int>> with 2-element
  inner lists, the U5 anchor output shape)
- dict → nested struct; [spec] → array of spec
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DataType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SPANS_TYPE = ArrayType(ArrayType(IntegerType()))

_SCALARS: dict[str, DataType] = {
    "str": StringType(),
    "int": LongType(),
    "int32": IntegerType(),
    "float": DoubleType(),
    "bool": BooleanType(),
    "spans": SPANS_TYPE,
}


_JSON_SCHEMA_SCALARS: dict[str, DataType] = {
    "string": StringType(),
    "integer": LongType(),
    "number": DoubleType(),
    "boolean": BooleanType(),
    "null": StringType(),  # lone null type: a field that's always absent
}

_JSON_SCHEMA_MARKERS = ("properties", "anyOf", "$ref", "enum", "$defs")


def _is_json_schema(spec: dict) -> bool:
    """Distinguish pydantic-emitted JSON Schema from the compact dict
    spec. The two vocabularies are disjoint: JSON Schema's ``type``
    values ("object", "string", …) never collide with compact scalar
    names ("str", "int", …)."""
    if any(k in spec for k in _JSON_SCHEMA_MARKERS):
        return True
    return spec.get("type") in _JSON_SCHEMA_SCALARS or spec.get("type") in (
        "object",
        "array",
    )


def _compile_json_schema(spec: dict, defs: dict, field_name: str | None = None) -> DataType:
    """Pydantic-generated JSON Schema → Spark type (the real studies'
    response-schema files: etl/studies/*/\\*.json). Handles $ref/$defs,
    anyOf-with-null (pydantic ``X | None``), enums (string-valued →
    string, numeric → long), and the reference's span rewrite: any
    field named ``spans`` becomes list<list<int>> regardless of the
    declared item type (ref nlp_task.py:470-475 rewrites textual spans
    to index pairs at any depth)."""
    if field_name == "spans":
        return SPANS_TYPE
    if "$ref" in spec:
        name = spec["$ref"].rsplit("/", 1)[-1]
        if name not in defs:
            raise ValueError(f"unresolved $ref {spec['$ref']!r}")
        return _compile_json_schema(defs[name], defs)
    if "anyOf" in spec:
        options = [o for o in spec["anyOf"] if o.get("type") != "null"]
        if not options:
            return StringType()
        return _compile_json_schema(options[0], defs)
    if "enum" in spec:
        values = spec["enum"]
        if values and all(isinstance(v, bool) for v in values):
            return BooleanType()
        if values and all(isinstance(v, int) and not isinstance(v, bool) for v in values):
            return LongType()
        return StringType()
    t = spec.get("type")
    if t == "object":
        return StructType(
            [
                StructField(name, _compile_json_schema(sub, defs, field_name=name), nullable=True)
                for name, sub in spec.get("properties", {}).items()
            ]
        )
    if t == "array":
        return ArrayType(_compile_json_schema(spec.get("items", {"type": "string"}), defs))
    if t in _JSON_SCHEMA_SCALARS:
        return _JSON_SCHEMA_SCALARS[t]
    raise ValueError(f"unsupported JSON-schema node: {spec!r}")


def compile_response_schema(spec) -> DataType:
    """Recursively compile a response spec into a Spark DataType.

    Accepts BOTH spec formats: the compact dict form documented above,
    and real pydantic-generated JSON Schema (what the reference's study
    tasks.toml files point at)."""
    if isinstance(spec, str):
        key = spec.rstrip("?")
        if key not in _SCALARS:
            raise ValueError(f"unknown scalar type {spec!r}")
        return _SCALARS[key]
    if isinstance(spec, list):
        if len(spec) != 1:
            raise ValueError("array spec must have exactly one element")
        return ArrayType(compile_response_schema(spec[0]))
    if isinstance(spec, dict):
        if _is_json_schema(spec):
            return _compile_json_schema(spec, spec.get("$defs", {}))
        return StructType(
            [
                StructField(name, compile_response_schema(sub), nullable=True)
                for name, sub in spec.items()
            ]
        )
    raise ValueError(f"unsupported spec node: {spec!r}")
