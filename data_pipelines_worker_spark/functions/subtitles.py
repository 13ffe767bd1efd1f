"""``subtitles_from_transcription`` as pure column expressions (SURVEY §2.1
#22): OpenAI verbose-transcription JSON → ASS subtitle text, no UDF — the
whole build stays inside whole-stage codegen.

Reference: block_subtitles_from_transcription.go —
- transcription struct :50-58 (the §1.4 nested document),
- ASS header template :129-146,
- ``Dialogue: 0,<start>,<end>,<style>,,0,0,0,,<text>`` event lines :150-156,
- time format ``%02d:%02d:%02d.%02d`` (centiseconds) :190-196,
- style defaults config/config.yaml:330-347, merged with per-call overrides
  (MergeStructs, :209-212),
- ``srt`` output is unimplemented in the reference too (:239-240).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: OpenAI verbose_json transcription document (§1.4; fixture
#: test/functional/pipeline_test.go:349).
TRANSCRIPTION_SCHEMA = T.StructType(
    [
        T.StructField("task", T.StringType()),
        T.StructField("language", T.StringType()),
        T.StructField("duration", T.DoubleType()),
        T.StructField(
            "segments",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("id", T.LongType()),
                        T.StructField("seek", T.LongType()),
                        T.StructField("start", T.DoubleType()),
                        T.StructField("end", T.DoubleType()),
                        T.StructField("text", T.StringType()),
                        T.StructField("tokens", T.ArrayType(T.LongType())),
                        T.StructField("temperature", T.DoubleType()),
                        T.StructField("avg_logprob", T.DoubleType()),
                        T.StructField("compression_ratio", T.DoubleType()),
                        T.StructField("no_speech_prob", T.DoubleType()),
                    ]
                )
            ),
        ),
        T.StructField("text", T.StringType()),
    ]
)

#: config/config.yaml:330-347 defaults for the 15 ASS style params.
ASS_STYLE_DEFAULTS: dict[str, object] = {
    "name": "Default",
    "font_name": "Arial",
    "font_size": 30,
    "primary_colour": "&H00FFFFFF",
    "secondary_colour": "&H00000000",
    "back_colour": "&H00000000",
    "bold": -1,
    "italic": 0,
    "border_style": 1,
    "outline": 1.0,
    "shadow": 0.0,
    "alignment": 2,
    "margin_l": 10,
    "margin_r": 10,
    "margin_v": 10,
}


def ass_time(seconds: Column) -> Column:
    """``%02d:%02d:%02d.%02d`` — hours:minutes:seconds.centiseconds
    (formatOpenAITranscriptionSegmentTime, go :190-196)."""
    return F.format_string(
        "%02d:%02d:%02d.%02d",
        F.floor(seconds / 3600).cast("long"),
        F.floor((seconds % 3600) / 60).cast("long"),
        F.floor(seconds % 60).cast("long"),
        F.floor((seconds - F.floor(seconds)) * 100).cast("long"),
    )


def ass_header(**style_overrides) -> str:
    """Plan-time constant: the [Script Info]+[Styles]+[Events] preamble
    (go :129-146). Style params are block *config*, not data — resolved at
    compile time (MergeStructs semantics: overrides beat defaults)."""
    unknown = set(style_overrides) - set(ASS_STYLE_DEFAULTS)
    if unknown:
        raise ValueError(f"unknown style params: {sorted(unknown)}")
    s = {**ASS_STYLE_DEFAULTS, **style_overrides}
    return (
        "[Script Info]\n"
        "Title: Transcription Subtitles\n"
        "Original Script: ChatGPT\n"
        "ScriptType: v4.00+\n"
        "Collisions: Normal\n"
        "PlayDepth: 0\n"
        "\n"
        "[Styles]\n"
        "Format: Name, Fontname, Fontsize, PrimaryColour, SecondaryColour, "
        "BackColour, Bold, Italic, BorderStyle, Outline, Shadow, Alignment, "
        "MarginL, MarginR, MarginV\n"
        f"Style: {s['name']},{s['font_name']},{s['font_size']},"
        f"{s['primary_colour']},{s['secondary_colour']},{s['back_colour']},"
        f"{s['bold']},{s['italic']},{s['border_style']},"
        f"{s['outline']:.1f},{s['shadow']:.1f},{s['alignment']},"
        f"{s['margin_l']},{s['margin_r']},{s['margin_v']}\n"
        "\n"
        "[Events]\n"
        "Format: Marked, Start, End, Style, Name, MarginL, MarginR, MarginV, "
        "Effect, Text"
    )


def subtitles_from_transcription(
    transcription_json: Column,
    output_format: str = "ass",
    **style_overrides,
) -> Column:
    """verbose-JSON string column → complete ASS document column.

    ``from_json`` → ``transform(segments, …)`` → ``array_join`` — Catalyst
    prunes the untouched transcription fields after the parse, and the
    whole expression compiles into one codegen stage (no Python).
    """
    if output_format == "srt":
        raise NotImplementedError("srt output (unimplemented in reference, :239-240)")
    if output_format != "ass":
        raise ValueError("output_format must be ass|srt")
    style_name = str(
        {**ASS_STYLE_DEFAULTS, **style_overrides}.get("name", "Default")
    )
    doc = F.from_json(transcription_json, TRANSCRIPTION_SCHEMA)
    lines = F.transform(
        doc["segments"],
        lambda s: F.format_string(
            "\nDialogue: 0,%s,%s,%s,,0,0,0,,%s",
            ass_time(s["start"]),
            ass_time(s["end"]),
            F.lit(style_name),
            s["text"],
        ),
    )
    return F.concat(
        F.lit(ass_header(**style_overrides)),
        F.coalesce(F.array_join(lines, ""), F.lit("")),
    )
