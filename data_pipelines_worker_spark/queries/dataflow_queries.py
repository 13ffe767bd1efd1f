"""Correctness queries for the reference's operators + dataflow algebra.

Each query exercises one SURVEY §2 inventory row on the driver's synthetic
tables, with a DuckDB oracle (SURVEY §2.4). ``documents.text`` stands in for
the transcription segments (the reference's canonical nested fixture);
``events.props`` is the JSON column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.json_path import json_path_array, json_path_scalar
from ..functions.strings import (
    format_string_from_object,
    join_strings,
    stop_condition,
    text_replace,
    wrap_text,
)
from ..operators import dataflow
from ..session import load_table
from . import register


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


# --- scalar string blocks (reference §2.1 #7-#10) -------------------------


@register(
    "wrap_text",
    """
    SELECT doc_id, '<<' || ltrim(text, ' ') || '>>' AS wrapped
    FROM documents
    """,
)
def q_wrap_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    # prefix/suffix carry leading spaces on purpose: TrimLeft(" ") semantics
    # (block_wrap_text.go:67-71) must strip them.
    return _docs(spark, sf_dir).select(
        "doc_id", wrap_text(F.col("text"), "  <<", " >>").alias("wrapped")
    )


@register(
    "text_replace",
    """
    SELECT doc_id, replace(text, 'data', '[DATA]') AS replaced
    FROM documents
    """,
)
def q_text_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).select(
        "doc_id", text_replace(F.col("text"), "data", " DATA", " [", " ]").alias("replaced")
    )


@register(
    "format_string",
    """
    SELECT c_custkey,
           'Customer ' || c_name || ' (' || CAST(c_custkey AS VARCHAR)
             || ') segment=' || c_mktsegment AS line
    FROM customer
    """,
)
def q_format_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    line = format_string_from_object(
        "Customer {name} ({id}) segment={seg}",
        {
            "name": F.col("c_name"),
            "id": F.col("c_custkey").cast("string"),
            "seg": F.col("c_mktsegment"),
        },
    )
    return cust.select("c_custkey", line.alias("line"))


@register(
    "join_strings",
    """
    SELECT doc_id, replace(text, ' ', '-') AS joined
    FROM documents
    """,
)
def q_join_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    # split + join_strings round-trip with a different separator; exercises
    # the single-element shortcut branch too (block_join_strings.go:67-71).
    return _docs(spark, sf_dir).select(
        "doc_id", join_strings(F.split("text", " ", -1), "-").alias("joined")
    )


@register(
    "stop_pipeline_comparators",
    """
    SELECT event_id,
           value =  100.0 AS c_eq, value != 100.0 AS c_ne,
           value >  100.0 AS c_gt, value <  100.0 AS c_lt,
           value >= 100.0 AS c_ge, value <= 100.0 AS c_le
    FROM events
    """,
)
def q_stop_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    v = F.col("value")
    return ev.select(
        "event_id",
        stop_condition(v, "==", 100.0).alias("c_eq"),
        stop_condition(v, "!=", 100.0).alias("c_ne"),
        stop_condition(v, ">", 100.0).alias("c_gt"),
        stop_condition(v, "<", 100.0).alias("c_lt"),
        stop_condition(v, ">=", 100.0).alias("c_ge"),
        stop_condition(v, "<=", 100.0).alias("c_le"),
    )


# --- dataflow algebra (SURVEY §2.2) ---------------------------------------


@register(
    "jsonpath_scalar",
    """
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
    """,
)
def q_jsonpath_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _events(spark, sf_dir).select(
        "event_id", json_path_scalar("props", "$.k").cast("long").alias("k")
    )


@register(
    "jsonpath_wildcard_fanout",
    """
    SELECT doc_id,
           CAST(generate_subscripts(words, 1) - 1 AS BIGINT) AS input_index,
           unnest(words) AS seg
    FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
    """,
)
def q_jsonpath_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Build a transcription-shaped JSON doc, then extract $.segments[*] the
    # way the compiler does: get_json_object → from_json → posexplode.
    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.to_json(F.struct(F.col("doc_id"), F.split("text", " ", -1).alias("segments"))).alias("j"),
    )
    segs = docs.select("doc_id", json_path_array("j", "$.segments[*]").alias("segments"))
    return dataflow.fan_out(segs, "segments", "seg").select(
        "doc_id", F.col("input_index").cast("long").alias("input_index"), "seg"
    )


@register(
    "gather_join_strings",
    """
    SELECT doc_id, string_agg(word, ' ' ORDER BY pos) AS joined
    FROM (
      SELECT doc_id, generate_subscripts(words, 1) - 1 AS pos, unnest(words) AS word
      FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
    )
    WHERE length(word) > 3
    GROUP BY doc_id
    """,
)
def q_gather_join_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    # scan → explode → filter → gather(ordered) → join: the full spine of
    # «explode $.segments[*].text → ... → array_input gather → join_strings»
    # (config/pipelines/openai-yt-short-generation.json:98,237).
    words = dataflow.fan_out(
        _docs(spark, sf_dir).select("doc_id", F.split("text", " ", -1).alias("words")),
        "words",
        "word",
    ).where(F.length("word") > 3)
    gathered = dataflow.gather(words, ["doc_id"], "word", out_name="arr")
    return gathered.select("doc_id", join_strings(F.col("arr"), " ").alias("joined"))


@register(
    "zip_merge_positional",
    """
    SELECT doc_id, CAST(pos AS BIGINT) AS pos, word,
           CAST(length(word) AS BIGINT) AS wlen
    FROM (
      SELECT doc_id, generate_subscripts(words, 1) - 1 AS pos, unnest(words) AS word
      FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
    )
    """,
)
def q_zip_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Two independently fanned-out origins zipped on position — MergeMaps'
    # aligned case (block.go:404-500).
    base = _docs(spark, sf_dir).select("doc_id", F.split("text", " ", -1).alias("words"))
    left = dataflow.fan_out(base, "words", "word", index_name="pos").select("doc_id", "pos", "word")
    right = dataflow.fan_out(
        base.select("doc_id", F.transform("words", lambda w: F.length(w).cast("long")).alias("lens")),
        "lens",
        "wlen",
        index_name="pos",
    ).select("doc_id", "pos", "wlen")
    return dataflow.zip_merge(left, right, on=["doc_id"], index_col="pos").select(
        "doc_id", F.col("pos").cast("long").alias("pos"), "word", "wlen"
    )


@register(
    "coalesce_priority",
    """
    SELECT event_id,
           coalesce(nullif(event_type, 'click'),
                    json_extract_string(props, '$.k'),
                    'dflt') AS resolved
    FROM events
    """,
)
def q_coalesce_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    # request input > input_config-derived > static default
    # (pipeline.go:281-305).
    ev = _events(spark, sf_dir)
    return ev.select(
        "event_id",
        dataflow.coalesce_priority(
            F.nullif(F.col("event_type"), F.lit("click")),
            json_path_scalar("props", "$.k"),
            F.lit("dflt"),
        ).alias("resolved"),
    )


@register(
    "index_targeting",
    """
    SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_quantity
    FROM lineitem WHERE l_linenumber = 3
    """,
)
def q_index_targeting(spark: SparkSession, sf_dir: str) -> DataFrame:
    # target_index resume (pipeline.go:358-377): predicate pushed into the
    # parquet scan — `.explain` shows PushedFilters: [EqualTo(l_linenumber,3)].
    li = load_table(spark, sf_dir, "lineitem")
    return dataflow.target_index(li, 3, index_col="l_linenumber").select(
        "l_orderkey", F.col("l_linenumber").cast("long").alias("l_linenumber"), "l_quantity"
    )


@register(
    "json_auto_detect",
    """
    SELECT event_id, regexp_matches(ltrim(props, ' '), '^[\\[{"]') AS is_json
    FROM events
    """,
)
def q_json_auto_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    # HandleResultValue (block.go:502-519): buffer starting { [ " is JSON.
    return _events(spark, sf_dir).select(
        "event_id", dataflow.json_auto_detect(F.col("props")).alias("is_json")
    )


@register(
    "ass_time_format",
    """
    SELECT event_id,
           printf('%02d:%02d:%02d.%02d',
                  CAST(floor(value / 3600) AS BIGINT),
                  CAST(floor((value % 3600) / 60) AS BIGINT),
                  CAST(floor(value % 60) AS BIGINT),
                  CAST(floor((value - floor(value)) * 100) AS BIGINT)) AS ass_time
    FROM events
    """,
)
def q_ass_time_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    # subtitles_from_transcription's HH:MM:SS.cc formatter
    # (block_subtitles_from_transcription.go:191-196 '%02d:%02d:%02d.%02d',
    # same format as functions/subtitles.py ass_time), with events.value as
    # the seconds column. Pure column math — stays in codegen.
    v = F.col("value")
    line = F.format_string(
        "%02d:%02d:%02d.%02d",
        F.floor(v / 3600).cast("long"),
        F.floor((v % 3600) / 60).cast("long"),
        F.floor(v % 60).cast("long"),
        F.floor((v - F.floor(v)) * 100).cast("long"),
    )
    # NULL seconds → NULL line: Java format_string prints boxed nulls as
    # the literal "null" while DuckDB printf propagates NULL — guard
    return _events(spark, sf_dir).select(
        "event_id", F.when(v.isNotNull(), line).alias("ass_time")
    )


@register(
    "schema_cast",
    """
    SELECT event_id,
           TRY_CAST(CAST(event_id AS VARCHAR) AS BIGINT) AS as_int,
           TRY_CAST(event_type AS BIGINT) AS bad_int,
           COALESCE(TRY_CAST(event_type AS BIGINT), 7) AS def_int,
           TRY_CAST(CAST(event_id AS VARCHAR) AS DOUBLE) AS as_num,
           TRY_CAST(CASE WHEN value > 100 THEN 'true' ELSE 'false' END AS BOOLEAN)
             AS as_bool
    FROM events
    """,
)
def q_schema_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared-schema cast kernel (functions/schema_cast.py, mirroring
    CastDataToType json_schema.go:52-143): try_cast per scalar type —
    invalid input → NULL, folded to the schema default when declared.
    DuckDB TRY_CAST has identical invalid→NULL semantics, so the kernel is
    hash-match checkable."""
    from ..functions.schema_cast import cast_column_to_type

    ev = _events(spark, sf_dir)
    s = F.col("event_id").cast("string")
    b = F.when(F.col("value") > 100, F.lit("true")).otherwise(F.lit("false"))
    return ev.select(
        "event_id",
        cast_column_to_type(s, {"type": "integer"}).alias("as_int"),
        cast_column_to_type(F.col("event_type"), {"type": "integer"}).alias("bad_int"),
        cast_column_to_type(
            F.col("event_type"), {"type": "integer", "default": 7}
        ).alias("def_int"),
        cast_column_to_type(s, {"type": "number"}).alias("as_num"),
        cast_column_to_type(b, {"type": "boolean"}).alias("as_bool"),
    )
