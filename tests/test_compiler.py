"""Engine-semantics tests for the pipeline compiler/runner — mirrors the
reference functional suite (test/functional/pipeline_test.go: fan-out :318,
resume :541, TargetIndex :1044, stop/moderation :1849+, multipart :3120)."""

from __future__ import annotations

import json

import pytest

from data_pipelines_worker_spark.plans.compiler import (
    BlockSpec,
    InputBinding,
    PipelineRunner,
    PipelineSpec,
)

TRANSCRIPTION = json.dumps(
    {
        "task": "transcribe",
        "language": "english",
        "duration": 12.5,
        "segments": [
            {"id": 0, "start": 0.0, "end": 4.0, "text": "all the lonely people"},
            {"id": 1, "start": 4.0, "end": 8.0, "text": "where do they all come from"},
            {"id": 2, "start": 8.0, "end": 12.5, "text": "ah look at all the lonely people"},
        ],
        "text": "all the lonely people ...",
    }
)


def spine_spec() -> PipelineSpec:
    return PipelineSpec(
        slug="yt-short-spine",
        blocks=[
            BlockSpec(id="upload_file", slug="transcription", input={}),
            BlockSpec(
                id="wrap_text",
                slug="wrap",
                input={"prefix": "- ", "suffix": "!"},
                bindings=[
                    InputBinding(
                        param="text",
                        origin="transcription",
                        json_path="$.segments[*].text",
                    )
                ],
                fan_out=True,
            ),
            BlockSpec(
                id="join_strings",
                slug="join",
                input={"separator": " "},
                bindings=[InputBinding(param="strings", origin="wrap", array_input=True)],
            ),
        ],
    )


@pytest.fixture
def runner(spark, tmp_path):
    return PipelineRunner(spark, str(tmp_path / "stages"))


def test_e2e_fanout_wrap_gather(runner):
    res = runner.run(
        spine_spec(), request_input={"transcription": {"file": TRANSCRIPTION}}
    )
    assert res.stopped_at is None
    rows = res.output.collect()
    assert len(rows) == 1
    assert rows[0].payload_str == (
        "- all the lonely people! - where do they all come from! "
        "- ah look at all the lonely people!"
    )
    assert res.statuses == {"transcription": "completed", "wrap": "completed", "join": "completed"}


def test_fanout_preserves_semantic_index(runner):
    res = runner.run(
        spine_spec(), request_input={"transcription": {"file": TRANSCRIPTION}}
    )
    from data_pipelines_worker_spark.sources import stage_store

    wrap = stage_store.read_stage(
        runner.spark, runner.store_root, "yt-short-spine", res.processing_id, "wrap"
    )
    rows = {r.input_index: r.payload_str for r in wrap.collect()}
    assert rows[0] == "- all the lonely people!"
    assert rows[2] == "- ah look at all the lonely people!"


def test_resume_rehydrates_from_store(runner):
    full = runner.run(
        spine_spec(), request_input={"transcription": {"file": TRANSCRIPTION}}
    )
    expected = full.output.first().payload_str  # materialize before overwrite
    resumed = runner.run(
        spine_spec(),
        processing_id=full.processing_id,
        start_slug="join",
    )
    assert resumed.statuses["transcription"] == "loaded"
    assert resumed.statuses["wrap"] == "loaded"
    assert resumed.statuses["join"] == "completed"
    assert resumed.output.first().payload_str == expected


def test_target_index_partial_recompute(runner):
    full = runner.run(
        spine_spec(), request_input={"transcription": {"file": TRANSCRIPTION}}
    )
    expected = full.output.first().payload_str  # materialize before overwrite
    # regenerate only fan-out index 1 of the wrap stage, then downstream
    res = runner.run(
        spine_spec(),
        processing_id=full.processing_id,
        start_slug="wrap",
        target_index=1,
    )
    assert res.output.first().payload_str == expected


def test_stop_pipeline_condition(runner):
    def spec(value: str) -> PipelineSpec:
        return PipelineSpec(
            slug="stoppable",
            blocks=[
                BlockSpec(id="upload_file", slug="up", input={"file": value}),
                BlockSpec(
                    id="stop_pipeline",
                    slug="gate",
                    input={"condition": ">", "value": 10},
                    bindings=[InputBinding(param="data", origin="up")],
                ),
                BlockSpec(
                    id="wrap_text",
                    slug="after",
                    input={"prefix": "<", "suffix": ">"},
                    bindings=[InputBinding(param="text", origin="up")],
                ),
            ],
        )

    stopped = runner.run(spec("15"))
    assert stopped.stopped_at == "gate"
    assert stopped.statuses["after"] == "skipped"
    passed = runner.run(spec("5"))
    assert passed.stopped_at is None
    assert passed.output.first().payload_str == "<5>"


def test_request_list_fanout(runner):
    spec = PipelineSpec(
        slug="multi-upload",
        blocks=[
            BlockSpec(id="upload_file", slug="up", fan_out=True),
            BlockSpec(
                id="join_strings",
                slug="join",
                input={"separator": "+"},
                bindings=[InputBinding(param="strings", origin="up", array_input=True)],
            ),
        ],
    )
    res = runner.run(spec, request_input={"up": {"file": ["a", "b", "c"]}})
    assert res.output.first().payload_str == "a+b+c"


def test_spec_from_json_reference_shape(runner):
    doc = {
        "slug": "from-json",
        "title": "From-JSON compile test",
        "description": "Wrap every transcription segment in brackets.",
        "blocks": [
            {
                "id": "upload_file",
                "slug": "up",
                "description": "Ingest the transcription document payload.",
                "input": {},
            },
            {
                "id": "wrap_text",
                "slug": "w",
                "description": "Bracket-wrap each transcription segment text.",
                "input": {"prefix": "[", "suffix": "]"},
                "input_config": {
                    "type": "array",
                    "property": {
                        "text": {"origin": "up", "json_path": "$.segments[*].text"}
                    },
                },
            },
        ],
    }
    spec = PipelineSpec.from_json(doc)
    res = runner.run(spec, request_input={"up": {"file": TRANSCRIPTION}})
    assert [r.payload_str for r in res.output.orderBy("input_index").collect()] == [
        "[all the lonely people]",
        "[where do they all come from]",
        "[ah look at all the lonely people]",
    ]


def test_concurrent_processings_are_isolated(spark, tmp_path):
    # two runs of the same pipeline share a store root but never cross
    # paths: stage parquet and status live under distinct processing ids
    # (reference: per-processing registry, pipeline_block_data_registry.go)
    from data_pipelines_worker_spark.plans.compiler import (
        BlockSpec,
        InputBinding,
        PipelineRunner,
        PipelineSpec,
    )
    from data_pipelines_worker_spark.sources import run_log, stage_store

    spec = PipelineSpec(
        slug="iso",
        blocks=[
            BlockSpec(id="upload_file", slug="up", fan_out=True),
            BlockSpec(
                id="wrap_text",
                slug="w",
                input={"prefix": "<", "suffix": ">"},
                bindings=[InputBinding(param="text", origin="up")],
            ),
        ],
    )
    runner = PipelineRunner(spark, str(tmp_path))
    r1 = runner.run(spec, request_input={"up": {"file": ["alpha", "beta"]}})
    r2 = runner.run(spec, request_input={"up": {"file": ["gamma"]}})
    assert r1.processing_id != r2.processing_id
    out1 = stage_store.read_stage(
        spark, str(tmp_path), "iso", r1.processing_id, "w"
    ).collect()
    out2 = stage_store.read_stage(
        spark, str(tmp_path), "iso", r2.processing_id, "w"
    ).collect()
    assert sorted(r.payload_str for r in out1) == ["<alpha>", "<beta>"]
    assert [r.payload_str for r in out2] == ["<gamma>"]
    assert set(run_log.list_processings(str(tmp_path), "iso")) == {
        r1.processing_id,
        r2.processing_id,
    }


def test_failing_index_aborts_run_and_persists_status(spark, tmp_path):
    # reference parity (pipeline_test.go:1588 fail-at-index): a corrupt
    # payload at one fan-out index fails the stage; the run raises, and the
    # deferred status snapshot (SavePipelineLog, pipeline.go:207-214)
    # still records every block's last state
    from data_pipelines_worker_spark.operators import media as M
    from data_pipelines_worker_spark.plans.compiler import (
        BlockSpec,
        InputBinding,
        PipelineRunner,
        PipelineSpec,
    )
    from data_pipelines_worker_spark.sources import run_log

    spec = PipelineSpec(
        slug="failing",
        blocks=[
            BlockSpec(id="upload_file", slug="up", fan_out=True),
            BlockSpec(
                id="image_resize",
                slug="small",
                input={"width": 4, "height": 4},
                bindings=[InputBinding(param="image", origin="up", binary=True)],
            ),
        ],
    )
    runner = PipelineRunner(spark, str(tmp_path))
    good = M.fimg_encode(8, 8, bytes(64))
    with pytest.raises(Exception):
        runner.run(
            spec,
            request_input={"up": {"file": [good, b"\xff\xd8corrupt", good]}},
        )
    # upload completed and is resumable; the failing block never reported
    # completed
    procs = run_log.list_processings(str(tmp_path), "failing")
    assert len(procs) == 1
    statuses = {
        r.block_slug: r.status
        for r in run_log.read_statuses(spark, str(tmp_path), "failing").collect()
    }
    assert statuses.get("up") == "completed"
    assert statuses.get("small") != "completed"
