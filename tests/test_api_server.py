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


# --- multipart/form-data start (api/schemas/pipelines.go:79-151) -----------


def _multipart_body(fields: dict, files: dict) -> tuple[bytes, str]:
    boundary = "testboundary42"
    out = []
    for name, value in fields.items():
        for v in value if isinstance(value, list) else [value]:
            out += [
                f"--{boundary}\r\n"
                f'Content-Disposition: form-data; name="{name}"\r\n\r\n'.encode(),
                v.encode() if isinstance(v, str) else v,
                b"\r\n",
            ]
    for name, (filename, payload) in files.items():
        out += [
            f"--{boundary}\r\n"
            f'Content-Disposition: form-data; name="{name}"; filename="{filename}"\r\n'
            f"Content-Type: application/octet-stream\r\n\r\n".encode(),
            payload,
            b"\r\n",
        ]
    out.append(f"--{boundary}--\r\n".encode())
    return b"".join(out), f"multipart/form-data; boundary={boundary}"


def _post_multipart(base, path, fields, files):
    body, ctype = _multipart_body(fields, files)
    req = urllib.request.Request(
        base + path, body, {"Content-Type": ctype}, method="POST"
    )
    with urllib.request.urlopen(req, timeout=30) as r:
        return r.status, json.loads(r.read())


def _png_spec() -> PipelineSpec:
    return PipelineSpec(
        slug="png-upload",
        blocks=[
            BlockSpec(id="upload_file", slug="up"),
            BlockSpec(
                id="image_resize",
                slug="small",
                input={"width": 40, "height": 30, "keep_aspect_ratio": False},
                bindings=[InputBinding(param="image", origin="up", binary=True)],
            ),
        ],
    )


@pytest.fixture()
def png_api(spark, tmp_path):
    runner = PipelineRunner(spark, str(tmp_path / "stages"))
    service = PipelineService(runner, {"png-upload": _png_spec()})
    srv = serve(service)
    yield f"http://127.0.0.1:{srv.server_port}", service
    srv.shutdown()


def test_multipart_file_upload_runs_pipeline(png_api):
    # a real PNG POSTed as a multipart file part reaches upload_file as
    # raw bytes and flows through the compiled pipeline (mirrors reference
    # functional test TestPipelineMultipartFormDataFile + main_test.go:
    # 308-347 field naming)
    from data_pipelines_worker_spark.operators import png_codec as P
    from tests.test_png_codec import grid_png

    base, service = png_api
    status, resp = _post_multipart(
        base,
        "/pipelines/png-upload/start",
        {"pipeline.slug": "png-upload", "block.slug": "up"},
        {"block.input.file": ("in.png", grid_png(120, 80))},
    )
    assert status == 202
    pid = resp["processing_id"]
    assert service.wait(pid, 120.0)
    assert service._errors.get(pid) is None

    from data_pipelines_worker_spark.sources import stage_store

    out = stage_store.read_stage(
        service.runner.spark, service.runner.store_root, "png-upload", pid, "small"
    ).collect()
    assert len(out) == 1 and out[0].mime == "image/png"
    assert P.png_decode(bytes(out[0].payload_bin)).shape[:2] == (30, 40)


def test_multipart_array_fields_fan_out(api):
    # block.input.field[] values gather into an array (pipelines.go:117-124)
    base, service = api
    status, resp = _post_multipart(
        base,
        "/pipelines/wrap-join/start",
        {
            "pipeline.slug": "wrap-join",
            "block.slug": "src",
            "block.input.file[]": ["x", "y"],  # repeated key → array
        },
        {},
    )
    assert status == 202
    pid = resp["processing_id"]
    assert service.wait(pid, 120.0)
    assert service._errors.get(pid) is None

    from data_pipelines_worker_spark.sources import stage_store

    out = stage_store.read_stage(
        service.runner.spark, service.runner.store_root, "wrap-join", pid, "join"
    )
    assert out.first().payload_str == "[x]+[y]"


def test_multipart_missing_block_slug_400(api):
    base, _ = api
    with pytest.raises(urllib.error.HTTPError) as e:
        _post_multipart(base, "/pipelines/wrap-join/start", {"pipeline.slug": "x"}, {})
    assert e.value.code == 400


def test_multipart_over_10mib_rejected(api):
    base, _ = api
    big = b"A" * (10 * 1024 * 1024 + 1024)
    with pytest.raises(urllib.error.HTTPError) as e:
        _post_multipart(
            base,
            "/pipelines/wrap-join/start",
            {"pipeline.slug": "wrap-join", "block.slug": "src"},
            {"block.input.file": ("big.bin", big)},
        )
    assert e.value.code == 400


# --- live moderation decision stream (VERDICT r2 #8) -----------------------


def test_decision_stream_unblocks_waiting_moderation(spark, tmp_path):
    # a decision file appended mid-run unblocks a processing parked in
    # waiting_moderation: streaming JSON source → foreachBatch fold →
    # auto-resume (the reference's GetUpdates poll loop, as a stream)
    import os

    from tests.test_moderation_flow import _spec as moderated_spec

    decisions_dir = tmp_path / "decisions"
    decisions_dir.mkdir()
    runner = PipelineRunner(spark, str(tmp_path / "stages"))
    service = PipelineService(
        runner, {"moderated": moderated_spec()}, decisions_dir=str(decisions_dir)
    )
    try:
        req = {"src": {"file": ["a", "b"]}}
        pid = service.start("moderated", request_input=req)
        assert service.wait(pid, 120.0)
        assert "pending" in (service._errors.get(pid) or "")

        events = [
            {"block_slug": "gate", "input_index": i, "action": "approve",
             "event_time": 100 + i, "event_id": i, "regenerate_block_slug": None}
            for i in range(2)
        ]
        tmp = decisions_dir / ".approve.json.tmp"
        tmp.write_text("\n".join(json.dumps(e) for e in events))
        os.rename(tmp, decisions_dir / "approve.json")  # atomic appearance

        deadline = time.time() + 120
        while time.time() < deadline:
            if service.wait(pid, 1.0) and pid not in service._pending:
                if service._errors.get(pid) is None:
                    break
            time.sleep(0.5)
        assert service._errors.get(pid) is None
        assert pid not in service._pending

        from data_pipelines_worker_spark.sources import stage_store

        out = stage_store.read_stage(
            spark, runner.store_root, "moderated", pid, "join"
        )
        assert out.first().payload_str == "<a> <b>"
    finally:
        service.stop_decision_stream()


def test_parked_resume_preserves_start_slug(spark, tmp_path):
    # a processing parked while RESUMING mid-pipeline must restart from
    # its start_slug when a decision lands — not replay from block 0
    # (regression: the parked context used to drop start_slug/target_index)
    import os

    from tests.test_moderation_flow import _spec as moderated_spec

    decisions_dir = tmp_path / "decisions"
    decisions_dir.mkdir()
    runner = PipelineRunner(spark, str(tmp_path / "stages"))
    service = PipelineService(
        runner, {"moderated": moderated_spec()}, decisions_dir=str(decisions_dir)
    )
    try:
        req = {"src": {"file": ["a", "b"]}}
        pid = service.start("moderated", request_input=req)
        assert service.wait(pid, 120.0)
        assert "pending" in (service._errors.get(pid) or "")

        # mid-pipeline resume of the parked processing: earlier stages are
        # rehydrated from the store; it parks again at the gate, now with
        # start_slug recorded
        pid2 = service.start(
            "moderated", request_input=req, processing_id=pid, start_slug="review"
        )
        assert pid2 == pid
        assert service.wait(pid, 120.0)
        assert service._pending[pid][2] == "review"

        from data_pipelines_worker_spark.sources import stage_store

        src_dir = stage_store.stage_path(runner.store_root, "moderated", pid, "src")
        before = max(
            os.path.getmtime(os.path.join(src_dir, f)) for f in os.listdir(src_dir)
        )

        events = [
            {"block_slug": "gate", "input_index": i, "action": "approve",
             "event_time": 100 + i, "event_id": i, "regenerate_block_slug": None}
            for i in range(2)
        ]
        tmp = decisions_dir / ".approve.json.tmp"
        tmp.write_text("\n".join(json.dumps(e) for e in events))
        os.rename(tmp, decisions_dir / "approve.json")

        deadline = time.time() + 120
        while time.time() < deadline:
            if service.wait(pid, 1.0) and pid not in service._pending:
                if service._errors.get(pid) is None:
                    break
            time.sleep(0.5)
        assert service._errors.get(pid) is None

        out = stage_store.read_stage(
            spark, runner.store_root, "moderated", pid, "join"
        )
        assert out.first().payload_str == "<a> <b>"
        # the pre-start_slug stage was rehydrated, never rewritten
        after = max(
            os.path.getmtime(os.path.join(src_dir, f)) for f in os.listdir(src_dir)
        )
        assert after == before, "restart replayed blocks before start_slug"
    finally:
        service.stop_decision_stream()


def test_restart_failure_cap_and_deferred_retry(spark, tmp_path):
    # ADVICE r3: a permanently-failing restart must reach a terminal error
    # after MAX_RESTART_FAILURES instead of re-parking forever, and a
    # transiently-failing one must retry on its own timer rather than
    # waiting for another decision batch.
    runner = PipelineRunner(spark, str(tmp_path / "stages"))
    service = PipelineService(runner, {})  # no pipelines: start() KeyErrors
    service.RESTART_BACKOFF_BASE_S = 0.05

    parked = ("pid1", "ghost-slug", None, None, None)
    service._try_restart(parked)  # attempt 1: re-parked + timer scheduled
    assert "pid1" in service._pending
    assert "attempt 1" in service._errors["pid1"]

    # let the deferred retries run: attempts 2 and 3 fire from timers;
    # attempt 3 hits the cap and goes terminal. Deadlines are generous
    # (r12: 10 s starved once under full-suite CPU contention — the
    # timers share the GIL with 32 Spark worker threads; the test's
    # correctness signal is the terminal state, not the latency)
    deadline = time.time() + 60
    while time.time() < deadline and "pid1" in service._pending:
        time.sleep(0.05)
    # drain: the final timer may still be about to run _try_restart
    deadline = time.time() + 60
    while time.time() < deadline and "permanently" not in service._errors["pid1"]:
        time.sleep(0.05)
    assert "pid1" not in service._pending
    assert "permanently" in service._errors["pid1"]
    assert service._restart_failures["pid1"] == service.MAX_RESTART_FAILURES

    # transient failure: register the pipeline after the first failure —
    # the deferred timer retry must restart the run with no decision batch
    service2 = PipelineService(runner, {})
    service2.RESTART_BACKOFF_BASE_S = 0.2
    service2._try_restart(("pid2", "wrap-join", {"src": {"file": ["x"]}}, None, None))
    assert "pid2" in service2._pending
    service2.pipelines["wrap-join"] = _spec()
    deadline = time.time() + 60
    while time.time() < deadline and "pid2" in service2._pending:
        time.sleep(0.05)
    assert "pid2" not in service2._pending
    assert service2.wait("pid2", 60.0)
    assert service2._restart_failures.get("pid2") is None


def test_wait_tolerates_registered_but_unstarted_thread(spark, tmp_path):
    # start() registers the worker thread in _threads BEFORE t.start() so
    # wait() never misses a just-launched run; wait() must survive hitting
    # that window (join() on an unstarted thread raises RuntimeError —
    # observed once under full-suite CPU contention, r12).
    import threading

    runner = PipelineRunner(spark, str(tmp_path / "stages"))
    service = PipelineService(runner, {})
    unstarted = threading.Thread(target=lambda: None, daemon=True)
    service._threads["pidX"] = unstarted
    # bounded wait inside the window: times out cleanly, no exception
    assert service.wait("pidX", 0.05) is False
    # once the thread starts and finishes, wait() reports completion
    unstarted.start()
    assert service.wait("pidX", 5.0) is True
