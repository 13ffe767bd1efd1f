"""Per-operator golden tests for the scalar string blocks (reference test
strategy tier 1, SURVEY §5: test/unit/block_*_test.go)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipelines_worker_spark.functions.strings import (
    format_string_from_object,
    join_strings,
    stop_condition,
    text_replace,
    wrap_text,
)


def one(spark, col):
    return spark.range(1).select(col.alias("v")).first().v


def test_wrap_text_trims_leading_spaces_only(spark):
    # block_wrap_text.go:67-71: TrimLeft(" ") on each part; trailing spaces kept
    out = one(spark, wrap_text(F.lit("  body  "), F.lit(" <p> "), F.lit("  </p>")))
    assert out == "<p> body  </p>"


def test_wrap_text_defaults_empty(spark):
    assert one(spark, wrap_text(F.lit("x"))) == "x"


def test_text_replace_wraps_replacement(spark):
    # block_text_replace.go:65-76: new is wrapped with prefix/suffix, all TrimLeft'ed
    out = one(spark, text_replace(F.lit(" a data b data"), "data", " D", " [", " ]"))
    assert out == "a [D] b [D]"


def test_text_replace_literal_not_regex(spark):
    out = one(spark, text_replace(F.lit("a.c adc"), "a.c", "X"))
    assert out == "X adc"


def test_join_strings_multi_and_single(spark):
    assert one(spark, join_strings(F.array(F.lit("a"), F.lit("b")), "-")) == "a-b"
    # single-element shortcut (join_strings.go:67-71)
    assert one(spark, join_strings(F.array(F.lit("solo")), "-")) == "solo"


def test_format_string_basic_and_arrays(spark):
    col = format_string_from_object(
        "x={a}, y={b}!", {"a": F.lit("1"), "b": F.array_join(F.array(F.lit("p"), F.lit("q")), ", ")}
    )
    assert one(spark, col) == "x=1, y=p, q!"


def test_format_string_unclosed_brace_raises():
    # block_format_string_from_object.go:53-102 errors on unclosed brace
    with pytest.raises(ValueError):
        format_string_from_object("bad {x", {"x": F.lit("1")})


def test_format_string_missing_var_raises():
    with pytest.raises(KeyError):
        format_string_from_object("{missing}", {})


@pytest.mark.parametrize(
    "op,expected",
    [("==", False), ("!=", True), (">", True), ("<", False), (">=", True), ("<=", False)],
)
def test_stop_condition_comparators(spark, op, expected):
    # condition.go:18-35: all six comparators
    assert one(spark, stop_condition(F.lit(5.0), op, 3.0)) is expected


def test_stop_condition_rejects_unknown_op():
    with pytest.raises(ValueError):
        stop_condition(F.lit(1), "~=", 2)
