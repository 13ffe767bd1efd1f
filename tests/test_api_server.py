"""REST shim tests: API-surface parity with api/server.go:261-303 —
async start, status polling, resume with target_index, detail views."""

from __future__ import annotations

import json
import time
import urllib.request

import pytest

from data_pipelines_worker_spark.api.server import PipelineService, serve
from data_pipelines_worker_spark.plans.compiler import (
    BlockSpec,
    InputBinding,
    PipelineRunner,
    PipelineSpec,
)


def _spec() -> PipelineSpec:
    return PipelineSpec(
        slug="wrap-join",
        blocks=[
            BlockSpec(id="upload_file", slug="src", fan_out=True),
            BlockSpec(
                id="wrap_text",
                slug="wrap",
                input={"prefix": "[", "suffix": "]"},
                bindings=[InputBinding(param="text", origin="src")],
            ),
            BlockSpec(
                id="join_strings",
                slug="join",
                input={"separator": "+"},
                bindings=[InputBinding(param="strings", origin="wrap", array_input=True)],
            ),
        ],
    )


@pytest.fixture()
def api(spark, tmp_path):
    runner = PipelineRunner(spark, str(tmp_path / "stages"))
    service = PipelineService(runner, {"wrap-join": _spec()})
    srv = serve(service)
    base = f"http://127.0.0.1:{srv.server_port}"
    yield base, service
    srv.shutdown()


def _get(base, path):
    with urllib.request.urlopen(base + path, timeout=30) as r:
        return json.loads(r.read())


def _post(base, path, payload):
    req = urllib.request.Request(
        base + path,
        json.dumps(payload).encode(),
        {"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=30) as r:
        return r.status, json.loads(r.read())


def _await_done(base, service, pid, slug="wrap-join", timeout=60.0):
    assert service.wait(pid, timeout)
    deadline = time.time() + timeout
    while time.time() < deadline:
        procs = _get(base, f"/pipelines/{slug}/processings?processing_id={pid}")[
            "processings"
        ]
        if procs and not procs[0]["running"]:
            return procs[0]
        time.sleep(0.2)
    raise TimeoutError


def test_read_endpoints(api):
    base, _ = api
    assert _get(base, "/health") == {"status": "ok"}
    blocks = _get(base, "/blocks")["blocks"]
    for expected in (
        "wrap_text", "join_strings", "image_resize", "audio_chunk",
        "openai_chat_completion", "fetch_moderation_tg", "http_request",
    ):
        assert expected in blocks
    assert _get(base, "/pipelines")["pipelines"][0]["slug"] == "wrap-join"
    spec = _get(base, "/pipelines/wrap-join")
    assert [b["slug"] for b in spec["blocks"]] == ["src", "wrap", "join"]
    assert _get(base, "/workers")["workers"][0]["id"] == "spark-driver"


def test_start_async_and_poll(api):
    base, service = api
    status, resp = _post(
        base,
        "/pipelines/wrap-join/start",
        {"input": {"src": {"file": ["x", "y"]}}},
    )
    assert status == 202  # id immediately, execution async (pipeline.go:640)
    proc = _await_done(base, service, resp["processing_id"])
    assert proc["error"] is None
    assert [b["status"] for b in proc["blocks"]] == ["completed"] * 3
    assert [b["block_slug"] for b in proc["blocks"]] == ["src", "wrap", "join"]


def test_resume_with_target_index(api):
    base, service = api
    _, resp = _post(
        base,
        "/pipelines/wrap-join/start",
        {"input": {"src": {"file": ["x", "y", "z"]}}},
    )
    pid = resp["processing_id"]
    _await_done(base, service, pid)

    # targeted recompute of index 1 from 'wrap' onward (resume handler
    # shape: api/handlers/pipelines.go:195-236 + TargetIndex semantics)
    status, resp = _post(
        base,
        "/pipelines/wrap-join/resume",
        {
            "pipeline": {"processing_id": pid},
            "block": {"slug": "wrap", "target_index": 1},
            "input": {},
        },
    )
    assert status == 202 and resp["processing_id"] == pid
    proc = _await_done(base, service, pid)
    assert proc["error"] is None

    from data_pipelines_worker_spark.sources import stage_store

    out = stage_store.read_stage(
        service.runner.spark,
        service.runner.store_root,
        "wrap-join",
        pid,
        "join",
    )
    assert out.first().payload_str == "[x]+[y]+[z]"


def test_resume_requires_processing_and_block(api):
    base, _ = api
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base, "/pipelines/wrap-join/resume", {"input": {}})
    assert e.value.code == 400


def test_unknown_pipeline_404(api):
    base, _ = api
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(base, "/pipelines/nope")
    assert e.value.code == 404
