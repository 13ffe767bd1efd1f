"""Scalar string operators, re-expressed as Spark column expressions.

Reference parity (all citations into /root/reference):

- ``wrap_text``      — types/blocks/block_wrap_text.go:49-76
- ``text_replace``   — types/blocks/block_text_replace.go:49-81
- ``join_strings``   — types/blocks/block_join_strings.go:48-77
- ``format_string_from_object`` — types/blocks/block_format_string_from_object.go:44-152
- ``stop_condition`` — types/blocks/block_stop_pipeline.go:48-67 +
  types/helpers/condition.go:18-35

These run JVM-side inside whole-stage codegen; at 100 TB they are pure
map-stage work with zero shuffle.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column
from pyspark.sql import functions as F


def _ltrim_spaces(col: Column) -> Column:
    """Go's ``strings.TrimLeft(s, " ")`` — strips *spaces only*, not all
    whitespace (block_wrap_text.go:67-71). Spark's ``ltrim(col)`` trims
    spaces only, which matches exactly."""
    return F.ltrim(col)


def wrap_text(text: Column, prefix: Column | str = "", suffix: Column | str = "") -> Column:
    """``prefix + text + suffix`` with each part TrimLeft(" ")-ed.

    Reference: block_wrap_text.go:63-75 (each of prefix/text/suffix is
    trimmed of leading spaces before concatenation).
    """
    prefix = F.lit(prefix) if isinstance(prefix, str) else prefix
    suffix = F.lit(suffix) if isinstance(suffix, str) else suffix
    return F.concat(
        _ltrim_spaces(prefix),
        _ltrim_spaces(text),
        _ltrim_spaces(suffix),
    )


def text_replace(
    text: Column,
    old: Column | str,
    new: Column | str,
    prefix: Column | str = "",
    suffix: Column | str = "",
) -> Column:
    """ReplaceAll(text, old, prefix+new+suffix), with text/new/prefix/suffix
    TrimLeft(" ")-ed first (``old`` is NOT trimmed).

    Reference: block_text_replace.go:63-79. Uses Spark's literal
    ``F.replace`` (no regex), matching Go ``strings.ReplaceAll``.
    """
    old = F.lit(old) if isinstance(old, str) else old
    new = F.lit(new) if isinstance(new, str) else new
    prefix = F.lit(prefix) if isinstance(prefix, str) else prefix
    suffix = F.lit(suffix) if isinstance(suffix, str) else suffix
    replacement = F.concat(_ltrim_spaces(prefix), _ltrim_spaces(new), _ltrim_spaces(suffix))
    return F.replace(_ltrim_spaces(text), old, replacement)


def join_strings(strings: Column, separator: str = " ") -> Column:
    """``strings.Join(arr, sep)`` with the single-element shortcut.

    Reference: block_join_strings.go:48-77 (:67-71 returns the lone element
    untouched when len==1 — semantically identical to array_join, kept as an
    explicit CASE to preserve the contract).
    """
    return F.when(F.size(strings) == 1, F.element_at(strings, 1)).otherwise(
        F.array_join(strings, separator)
    )


def format_string_from_object(template: str, mapping: Mapping[str, Column]) -> Column:
    """Render a ``"{var}"`` template against named columns.

    Reference: block_format_string_from_object.go:44-152 — ``{name}``
    placeholders are substituted from the input object; array values are
    joined with ``", "`` (:78-85). This compile-time variant splits the
    template literally and emits a single ``concat`` — constant parts are
    folded by Catalyst, no UDF.

    Only string/rendered columns should be passed; callers cast/array_join
    beforehand (see :func:`render_value`).
    """
    parts: list[Column] = []
    rest = template
    while True:
        i = rest.find("{")
        if i < 0:
            if rest:
                parts.append(F.lit(rest))
            break
        j = rest.find("}", i)
        if j < 0:
            raise ValueError(f"unclosed brace in template: {template!r}")
        if rest[:i]:
            parts.append(F.lit(rest[:i]))
        name = rest[i + 1 : j]
        if name not in mapping:
            raise KeyError(f"template variable {name!r} not provided")
        parts.append(mapping[name])
        rest = rest[j + 1 :]
    if not parts:
        return F.lit("")
    return F.concat(*parts)


def render_value(col: Column, is_array: bool = False) -> Column:
    """Render a value for templating: arrays joined with ", "
    (block_format_string_from_object.go:78-85), scalars cast to string."""
    if is_array:
        return F.array_join(col.cast("array<string>"), ", ")
    return col.cast("string")


#: condition.go:18-35 — the six comparators supported by stop_pipeline.
_COMPARATORS = {"==", "!=", ">", "<", ">=", "<="}


def stop_condition(data: Column, op: str, value: Column | str | float | int) -> Column:
    """Boolean column for ``stop_pipeline``'s comparison.

    Reference: block_stop_pipeline.go:48-67; comparator kernel
    types/helpers/condition.go:18-35 (string, float64 and int comparisons —
    Spark's binary comparison on identically-typed columns matches).
    """
    if op not in _COMPARATORS:
        raise ValueError(f"unsupported comparator {op!r}; must be one of {sorted(_COMPARATORS)}")
    value = F.lit(value) if not isinstance(value, Column) else value
    if op == "==":
        return data == value
    if op == "!=":
        return data != value
    if op == ">":
        return data > value
    if op == "<":
        return data < value
    if op == ">=":
        return data >= value
    return data <= value
