"""subtitles_from_transcription unit tests (reference golden behavior:
block_subtitles_from_transcription.go:129-196, fixture shape
test/functional/pipeline_test.go:349)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from data_pipelines_worker_spark.functions import subtitles as S

BEATLES = {
    "task": "transcribe",
    "language": "english",
    "duration": 12.5,
    "segments": [
        {"id": 0, "seek": 0, "start": 0.0, "end": 6.28, "text": " Yesterday"},
        {"id": 1, "seek": 0, "start": 6.28, "end": 3723.456, "text": " far away"},
    ],
    "text": "Yesterday far away",
}


def _build(spark, doc: dict, **style) -> str:
    df = spark.createDataFrame([(json.dumps(doc),)], "j string")
    return df.select(
        S.subtitles_from_transcription(F.col("j"), **style).alias("ass")
    ).first()[0]


def test_full_document(spark):
    ass = _build(spark, BEATLES)
    header, _, events = ass.partition("\nDialogue")
    assert header.startswith("[Script Info]\nTitle: Transcription Subtitles")
    assert (
        "Style: Default,Arial,30,&H00FFFFFF,&H00000000,&H00000000,"
        "-1,0,1,1.0,0.0,2,10,10,10" in header
    )
    lines = ("Dialogue" + events).split("\n")
    # time format %02d:%02d:%02d.%02d incl. hour rollover (go :190-196)
    assert lines[0] == "Dialogue: 0,00:00:00.00,00:00:06.28,Default,,0,0,0,, Yesterday"
    assert lines[1] == "Dialogue: 0,00:00:06.28,01:02:03.45,Default,,0,0,0,, far away"


def test_style_overrides(spark):
    ass = _build(spark, BEATLES, name="Karaoke", font_size=48, outline=2.5)
    assert "Style: Karaoke,Arial,48," in ass
    assert ",2.5,0.0," in ass
    assert "Dialogue: 0,00:00:00.00,00:00:06.28,Karaoke,," in ass
    with pytest.raises(ValueError, match="unknown style"):
        S.ass_header(font="Comic Sans")


def test_empty_and_missing_segments(spark):
    assert _build(spark, {"segments": [], "text": ""}) == S.ass_header()
    assert _build(spark, {"text": "no segments key"}) == S.ass_header()


def test_srt_unimplemented():
    # parity: srt is stubbed in the reference too (:239-240)
    with pytest.raises(NotImplementedError):
        S.subtitles_from_transcription(F.lit("{}"), output_format="srt")
    with pytest.raises(ValueError):
        S.subtitles_from_transcription(F.lit("{}"), output_format="vtt")


def test_plan_is_udf_free(spark):
    df = spark.createDataFrame([(json.dumps(BEATLES),)], "j string")
    plan = df.select(
        S.subtitles_from_transcription(F.col("j")).alias("ass")
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
