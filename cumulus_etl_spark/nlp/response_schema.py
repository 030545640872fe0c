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


def compile_response_schema(spec) -> DataType:
    """Recursively compile a response spec into a Spark DataType."""
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
        return StructType(
            [
                StructField(name, compile_response_schema(sub), nullable=True)
                for name, sub in spec.items()
            ]
        )
    raise ValueError(f"unsupported spec node: {spec!r}")
