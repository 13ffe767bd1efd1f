"""Declared-schema cast kernel — CastDataToType re-expressed for Spark.

Reference: types/helpers/json_schema.go:52-143 casts each block input to
its declared JSON-schema type (string/integer/number/boolean/null, arrays
recursively via ``items``, objects recursively via ``properties``;
``format:"file"`` strings become bytes), and types/dataclasses/block.go:
287-296 falls back to the string representation when a cast fails.

Two kernels, same semantics:

- :func:`cast_data_to_type` — driver-side Python values (static block
  input, request input): runs at submit time.
- :func:`cast_column_to_type` — a pure column expression for bound data:
  ``try_cast`` per scalar type (failed cast → NULL, folded to the schema
  ``default`` via coalesce), ``transform`` for arrays, ``struct`` rebuild
  for objects. JVM-side, codegen — at 100 TB the cast is free inside the
  scan projection.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCALAR_SPARK_TYPES = {
    "string": "string",
    "integer": "long",
    "number": "double",
    "boolean": "boolean",
}


class SchemaCastError(ValueError):
    pass


def cast_data_to_type(data: Any, schema: dict) -> Any:
    """Python-value cast per the declared schema (json_schema.go:52-143).

    Unknown/failed casts raise :class:`SchemaCastError`; callers wanting the
    reference's failed-cast→string fallback (block.go:287-296) catch it and
    keep ``str(data)``.
    """
    t = schema.get("type")
    if isinstance(t, list):  # e.g. ["string", "null"]
        t = next((x for x in t if x != "null"), "null")
    if t == "string":
        if schema.get("format") == "file":
            if isinstance(data, (bytes, bytearray)):
                return bytes(data)
            if isinstance(data, str):
                return data.encode()  # json_schema.go:69-72
            raise SchemaCastError(f"cannot cast {type(data).__name__} to file")
        if isinstance(data, (bytes, bytearray)):
            return bytes(data).decode()
        if isinstance(data, str):
            return data
        raise SchemaCastError("data is not a valid string")
    if t == "integer":
        try:
            return int(float(data))  # json numbers arrive as float64 (:92)
        except (TypeError, ValueError) as e:
            raise SchemaCastError(str(e)) from e
    if t == "number":
        try:
            return float(data)
        except (TypeError, ValueError) as e:
            raise SchemaCastError(str(e)) from e
    if t == "boolean":
        if isinstance(data, bool):
            return data
        raise SchemaCastError("data is not a boolean")
    if t == "null":
        return None
    if t == "array":
        items = schema.get("items")
        if not isinstance(items, dict):
            raise SchemaCastError("array type must have items defined")
        if not isinstance(data, (list, tuple)):
            raise SchemaCastError("data must be an array")
        return [cast_data_to_type(x, items) for x in data]
    if t == "object":
        props = schema.get("properties")
        if not isinstance(data, dict) or not isinstance(props, dict):
            raise SchemaCastError("data must be an object with declared properties")
        return {k: cast_data_to_type(v, props[k]) for k, v in data.items() if k in props}
    raise SchemaCastError(f"unsupported type for casting: {t!r}")


def cast_with_fallback(data: Any, schema: dict) -> Any:
    """Failed-cast→string-representation fallback (block.go:287-296)."""
    try:
        return cast_data_to_type(data, schema)
    except SchemaCastError:
        return str(data)


def cast_column_to_type(col: Column, schema: dict) -> Column:
    """Column-expression cast per the declared schema.

    Scalars use ``try_cast`` (invalid → NULL) coalesced with the schema
    ``default`` when one is declared; arrays recurse via ``transform`` on a
    JSON-parsed array; objects rebuild a struct of the declared properties.
    The input column is assumed string-typed (stage payloads); JSON-encoded
    arrays/objects are parsed with an explicit schema so Catalyst prunes
    undeclared fields at parse time.
    """
    t = schema.get("type")
    if isinstance(t, list):
        t = next((x for x in t if x != "null"), "null")
    if t in _SCALAR_SPARK_TYPES:
        out = col.try_cast(_SCALAR_SPARK_TYPES[t])
        if "default" in schema:
            out = F.coalesce(out, F.lit(schema["default"]))
        return out
    if t == "array":
        items = schema.get("items")
        if not isinstance(items, dict):
            raise SchemaCastError("array type must have items defined")
        parsed = F.from_json(col, "array<string>")
        return F.transform(parsed, lambda x: cast_column_to_type(x, items))
    if t == "object":
        props = schema.get("properties")
        if not isinstance(props, dict):
            raise SchemaCastError("object type must have properties defined")
        parsed = F.from_json(
            col, "map<string,string>"
        )  # declared props only, pruned below
        return F.struct(
            *[
                cast_column_to_type(parsed[k], p).alias(k)
                for k, p in props.items()
            ]
        )
    raise SchemaCastError(f"unsupported type for casting: {t!r}")
