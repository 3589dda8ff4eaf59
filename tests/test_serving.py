"""Micro-batching HTTP serving daemon: batcher semantics + HTTP contract.

The batcher is engine-agnostic, so most tests drive it with a recording
fake; one end-to-end case runs a real tiny OCRInference behind the server
and asserts the HTTP decode equals the direct predict_serving call.
"""

import base64
import json
import threading
import time
import urllib.error
import urllib.request

import numpy as np
import pytest

from rcnn_ocr_tpu.serving import (
    MicroBatcher,
    OCRServer,
    QueueFullError,
    serving_predict_fn,
)


class RecordingEngine:
    """predict(list)->list echoing a per-image tag; records batch tags."""

    def __init__(self, delay_s: float = 0.0, fail_on=None, gate=None):
        self.batches = []  # list of tag-lists, one per engine call
        self.delay_s = delay_s
        self.fail_on = fail_on or set()
        self.gate = gate  # threading.Event: block until set

    def predict(self, images):
        tags = [int(np.asarray(img).ravel()[0]) for img in images]
        self.batches.append(tags)
        if self.gate is not None:
            assert self.gate.wait(30)
        if self.delay_s:
            time.sleep(self.delay_s)
        out = []
        for tag in tags:
            if tag in self.fail_on:
                raise ValueError(f"bad image {tag}")
            out.append(f"t{tag}")
        return out


def _imgs(tags):
    return [np.full((4, 4, 3), t, np.uint8) for t in tags]


def test_batcher_roundtrip_and_order():
    eng = RecordingEngine()
    b = MicroBatcher(eng.predict, max_batch=8, max_wait_ms=0)
    try:
        assert b.submit(_imgs([3, 1, 2])) == ["t3", "t1", "t2"]
        assert b.submit([]) == []
        assert b.served == 3
    finally:
        b.close()


def test_batcher_coalesces_across_requests():
    """Concurrent submitters share one engine call when the window allows."""
    eng = RecordingEngine(delay_s=0.02)
    b = MicroBatcher(eng.predict, max_batch=64, max_wait_ms=200)
    results = {}

    def worker(tag):
        results[tag] = b.submit(_imgs([tag]))[0]

    try:
        threads = [threading.Thread(target=worker, args=(t,)) for t in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert results == {t: f"t{t}" for t in range(6)}
        # 6 one-image requests must NOT have become 6 engine calls
        assert len(eng.batches) < 6
        assert sum(len(b) for b in eng.batches) == 6
    finally:
        b.close()


def test_batcher_slices_oversized_requests():
    eng = RecordingEngine()
    b = MicroBatcher(eng.predict, max_batch=4, max_wait_ms=0)
    try:
        tags = list(range(10))
        assert b.submit(_imgs(tags)) == [f"t{t}" for t in tags]
        assert max(len(b) for b in eng.batches) <= 4
        assert sum(len(b) for b in eng.batches) == 10
    finally:
        b.close()


def test_batcher_delivers_engine_errors():
    eng = RecordingEngine(fail_on={7})
    b = MicroBatcher(eng.predict, max_batch=8, max_wait_ms=0)
    try:
        with pytest.raises(ValueError, match="bad image 7"):
            b.submit(_imgs([7]))
        # the dispatcher survives the failure
        assert b.submit(_imgs([1])) == ["t1"]
    finally:
        b.close()


def test_batcher_close_unblocks_submitters():
    eng = RecordingEngine()
    b = MicroBatcher(eng.predict, max_batch=8, max_wait_ms=0)
    b.close()
    with pytest.raises(RuntimeError):
        b.submit(_imgs([1]))


def _post(url, data, ctype):
    req = urllib.request.Request(
        url, data=data, headers={"Content-Type": ctype}, method="POST"
    )
    with urllib.request.urlopen(req, timeout=30) as resp:
        return resp.status, json.loads(resp.read())


def _png_bytes(img):
    import cv2

    ok, buf = cv2.imencode(".png", cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    assert ok
    return buf.tobytes()


@pytest.fixture()
def http_server():
    """Server over a fake engine on an ephemeral port."""
    eng = RecordingEngine()
    server = OCRServer(
        eng.predict, host="127.0.0.1", port=0, max_batch=8, max_wait_ms=0
    )
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    host, port = server.address[:2]
    yield f"http://{host}:{port}", eng
    server.close()
    thread.join(timeout=10)


def test_http_contract(http_server):
    base, eng = http_server
    # healthz
    with urllib.request.urlopen(base + "/healthz", timeout=10) as resp:
        health = json.loads(resp.read())
    assert health["status"] == "ok"

    # raw-bytes body -> one text
    img = np.full((6, 9, 3), 42, np.uint8)
    status, out = _post(base + "/predict", _png_bytes(img), "image/png")
    assert status == 200 and out == {"texts": ["t42"]}

    # JSON base64 batch
    imgs = [np.full((5, 7, 3), t, np.uint8) for t in (9, 11)]
    payload = json.dumps(
        {"images": [base64.b64encode(_png_bytes(i)).decode() for i in imgs]}
    ).encode()
    status, out = _post(base + "/predict", payload, "application/json")
    assert status == 200 and out == {"texts": ["t9", "t11"]}

    # bad image bytes -> 400, not a crash
    try:
        _post(base + "/predict", b"not an image", "image/png")
        raise AssertionError("expected HTTP 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400

    # unknown path -> 404
    try:
        _post(base + "/nope", b"", "image/png")
        raise AssertionError("expected HTTP 404")
    except urllib.error.HTTPError as e:
        assert e.code == 404

    # rolling serving stats appear once requests have been served
    with urllib.request.urlopen(base + "/healthz", timeout=10) as resp:
        health = json.loads(resp.read())
    assert health["served"] == 3 and health["uptime_s"] >= 0
    assert set(health["latency_ms"]) == {"p50", "p95", "p99"}
    assert health["latency_ms"]["p99"] >= health["latency_ms"]["p50"] >= 0
    assert health["batch_size"]["batches"] >= 1
    assert 1 <= health["batch_size"]["mean"] <= health["batch_size"]["max"] <= 8


def test_http_end_to_end_real_engine(tmp_path):
    """Tiny real OCRInference behind the daemon: HTTP decode == direct
    predict_serving on the same images."""
    import jax.numpy as jnp

    from rcnn_ocr_tpu.inference import OCRInference
    from rcnn_ocr_tpu.models import RCNN
    from rcnn_ocr_tpu.training import checkpoint as ckpt_io
    from rcnn_ocr_tpu.training.optim import build_optimizer
    from rcnn_ocr_tpu.training.train_step import create_train_state

    import jax

    tokens = ["<PAD>", "<SOS>", "<EOS>", " "] + list("abc")
    model = RCNN(
        num_classes=len(tokens), hidden_size=16, width_mult=0.0625,
        lstm_layers=1, with_ctc_head=True, dtype=jnp.float32,
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 32, 64, 3)),
        text=jnp.zeros((1, 5), jnp.int32), batch_max_length=4,
        method=model.init_all,
    )
    state = create_train_state(model, variables, build_optimizer("Adam", 1e-3))
    charset_path = tmp_path / "cs.txt"
    charset_path.write_text("\n".join(tokens) + "\n", encoding="utf-8")
    ckpt = str(tmp_path / "w.msgpack")
    ckpt_io.save_weights(ckpt, state)

    ocr = OCRInference(
        ckpt, str(charset_path), img_h=32, img_w=64, dtype=jnp.float32,
        verbose=False,
    )
    predict = serving_predict_fn(
        ocr, method="ctc_greedy", batch_size=2, canvas=(32, 64), max_length=4
    )
    server = OCRServer(
        predict, host="127.0.0.1", port=0, max_batch=2, max_wait_ms=0
    )
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        host, port = server.address[:2]
        base = f"http://{host}:{port}"
        rng = np.random.default_rng(4)
        imgs = [
            rng.integers(0, 256, (24, 30 + 11 * i, 3)).astype(np.uint8)
            for i in range(3)
        ]
        expect = ocr.predict_serving(
            imgs, method="ctc_greedy", batch_size=2, canvas=(32, 64),
            max_length=4,
        )
        payload = json.dumps(
            {"images": [base64.b64encode(_png_bytes(i)).decode() for i in imgs]}
        ).encode()
        status, out = _post(base + "/predict", payload, "application/json")
        assert status == 200
        # PNG encode/decode is lossless -> exact decode parity
        assert out["texts"] == expect
    finally:
        server.close()
        thread.join(timeout=10)

    # the same engine behind a --confidence daemon on the CTC method
    # (r5: the headline serving path carries the confidence contract)
    predict_c = serving_predict_fn(
        ocr, method="ctc_greedy", batch_size=2, canvas=(32, 64), max_length=4,
        return_confidence=True,
    )
    server_c = OCRServer(
        predict_c, host="127.0.0.1", port=0, max_batch=2, max_wait_ms=0,
        confidence=True,
    )
    thread_c = threading.Thread(target=server_c.serve_forever, daemon=True)
    thread_c.start()
    try:
        host, port = server_c.address[:2]
        expect_c = ocr.predict_serving(
            imgs, method="ctc_greedy", batch_size=2, canvas=(32, 64),
            max_length=4, return_confidence=True,
        )
        status, out = _post(
            f"http://{host}:{port}/predict", payload, "application/json"
        )
        assert status == 200
        assert out["texts"] == [t for t, _ in expect_c]
        assert len(out["confidences"]) == len(imgs)
        for got, (_, want) in zip(out["confidences"], expect_c):
            assert abs(got - want) < 1e-6 and 0.0 <= got <= 1.0
    finally:
        server_c.close()
        thread_c.join(timeout=10)


def test_batcher_queue_full_backpressure():
    """Beyond max_queued the batcher sheds load instead of accumulating."""
    gate = threading.Event()
    eng = RecordingEngine(gate=gate)
    b = MicroBatcher(eng.predict, max_batch=2, max_wait_ms=0, max_queued=4)
    try:
        t1 = threading.Thread(target=lambda: b.submit(_imgs([1, 2])))
        t1.start()
        # wait until the first batch is in-flight (inside the gated engine)
        deadline = time.monotonic() + 10
        while not eng.batches and time.monotonic() < deadline:
            time.sleep(0.005)
        assert eng.batches, "first batch never reached the engine"
        t2 = threading.Thread(target=lambda: b.submit(_imgs([3, 4, 5, 6])))
        t2.start()
        deadline = time.monotonic() + 10
        while b.pending() < 4 and time.monotonic() < deadline:
            time.sleep(0.005)
        with pytest.raises(QueueFullError):
            b.submit(_imgs([7]))
        gate.set()
        t1.join(10)
        t2.join(10)
        assert not t1.is_alive() and not t2.is_alive()
    finally:
        gate.set()
        b.close()


def test_batcher_timeout_abandons_queued_spans():
    """A submitter that timed out must not have its spans decoded later."""
    gate = threading.Event()
    eng = RecordingEngine(gate=gate)
    b = MicroBatcher(eng.predict, max_batch=2, max_wait_ms=0)
    try:
        t1 = threading.Thread(target=lambda: b.submit(_imgs([1])))
        t1.start()
        deadline = time.monotonic() + 10
        while not eng.batches and time.monotonic() < deadline:
            time.sleep(0.005)
        # queued behind the gated batch; times out and is abandoned
        with pytest.raises(TimeoutError):
            b.submit(_imgs([9]), timeout=0.05)
        gate.set()
        t1.join(10)
        assert b.submit(_imgs([2])) == ["t2"]
        decoded = [t for tags in eng.batches for t in tags]
        assert 9 not in decoded  # the abandoned span was dropped, not run
    finally:
        gate.set()
        b.close()


def test_server_close_without_serve_does_not_deadlock():
    eng = RecordingEngine()
    server = OCRServer(eng.predict, host="127.0.0.1", port=0)
    done = threading.Event()

    def closer():
        server.close()
        done.set()

    t = threading.Thread(target=closer, daemon=True)
    t.start()
    assert done.wait(10), "close() deadlocked on a never-started server"


def test_http_keepalive_survives_404_with_body(http_server):
    """An error reply must still drain the request body, or the unread
    bytes desync the persistent connection (the next request's parser
    reads them as a request line)."""
    import http.client

    base, _ = http_server
    host, port = base.replace("http://", "").split(":")
    conn = http.client.HTTPConnection(host, int(port), timeout=10)
    try:
        conn.request(
            "POST", "/nope", body=b"X" * 4096,
            headers={"Content-Type": "image/png"},
        )
        resp = conn.getresponse()
        assert resp.status == 404
        resp.read()
        # same socket must still speak HTTP
        conn.request("GET", "/healthz")
        resp = conn.getresponse()
        assert resp.status == 200
        assert json.loads(resp.read())["status"] == "ok"
    finally:
        conn.close()


def test_http_body_size_cap():
    eng = RecordingEngine()
    server = OCRServer(
        eng.predict, host="127.0.0.1", port=0, max_body_bytes=1024
    )
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        host, port = server.address[:2]
        try:
            _post(
                f"http://{host}:{port}/predict", b"Y" * 2048, "image/png"
            )
            raise AssertionError("expected HTTP 413")
        except urllib.error.HTTPError as e:
            assert e.code == 413
        assert eng.batches == []  # nothing reached the engine
    finally:
        server.close()
        thread.join(timeout=10)


def test_serving_predict_fn_ctc_long(tmp_path):
    """method='ctc_long' routes the daemon to the stitched long-line
    decode — unbounded-width requests without a canvas."""
    import jax
    import jax.numpy as jnp

    from rcnn_ocr_tpu.inference import OCRInference
    from rcnn_ocr_tpu.models import RCNN
    from rcnn_ocr_tpu.training import checkpoint as ckpt_io
    from rcnn_ocr_tpu.training.optim import build_optimizer
    from rcnn_ocr_tpu.training.train_step import create_train_state

    tokens = ["<PAD>", "<SOS>", "<EOS>", "<BLANK>", "a", "b"]
    model = RCNN(
        num_classes=len(tokens), hidden_size=16, width_mult=0.25,
        with_ctc_head=True, dtype=jnp.float32,
    )
    import jax

    variables = model.init(
        {"params": jax.random.PRNGKey(6)}, jnp.zeros((1, 32, 64, 3)),
        text=jnp.zeros((1, 5), jnp.int32), batch_max_length=4,
        method=model.init_all,
    )
    state = create_train_state(model, variables, build_optimizer("Adam", 1e-3))
    charset_path = tmp_path / "cs.txt"
    charset_path.write_text("\n".join(tokens) + "\n", encoding="utf-8")
    ckpt = str(tmp_path / "w.msgpack")
    ckpt_io.save_weights(ckpt, state)
    ocr = OCRInference(
        ckpt, str(charset_path), img_h=32, img_w=64, dtype=jnp.float32,
        verbose=False,
    )
    predict = serving_predict_fn(ocr, method="ctc_long", batch_size=2)
    rng = np.random.default_rng(7)
    wide = rng.integers(0, 256, (32, 300, 3)).astype(np.uint8)  # multi-tile
    narrow = rng.integers(0, 256, (20, 30, 3)).astype(np.uint8)
    out = predict([narrow, wide])
    assert out == ocr.predict_ctc_long([narrow, wide], batch_size=2)
    assert all(isinstance(t, str) for t in out)

    # the beam variant routes through the same stitcher with method="beam"
    predict_beam = serving_predict_fn(
        ocr, method="ctc_long_beam", batch_size=2, beam_width=4
    )
    out_beam = predict_beam([narrow, wide])
    assert out_beam == ocr.predict_ctc_long(
        [narrow, wide], batch_size=2, method="beam", beam_width=4
    )

    # the tiling knobs reach the stitcher (round-4 review: the daemon CLI
    # could not steer tile_w/overlap/snap on live long methods)
    predict_tiled = serving_predict_fn(
        ocr, method="ctc_long", batch_size=2,
        tile_w=64, overlap=16, snap="blank",
    )
    assert predict_tiled([narrow, wide]) == ocr.predict_ctc_long(
        [narrow, wide], tile_w=64, overlap=16, batch_size=2, snap="blank"
    )


def test_serving_predict_fn_rejects_misplaced_tiling_knobs():
    """tile_w/overlap only steer the *_long routes and snap only the CTC
    stitcher — a daemon started with them elsewhere must fail loudly, not
    pin a silently-unused value."""

    class _Engine:  # never called — validation happens first
        pass

    with pytest.raises(ValueError, match="tile_w"):
        serving_predict_fn(_Engine(), method="ctc_greedy", tile_w=128)
    with pytest.raises(ValueError, match="tile_w"):
        serving_predict_fn(_Engine(), method="attention_beam", overlap=16)
    with pytest.raises(ValueError, match="snap"):
        serving_predict_fn(_Engine(), method="attention_long", snap="blank")
    with pytest.raises(ValueError, match="snap"):
        serving_predict_fn(_Engine(), method="hybrid_long", snap="blank")


def test_serving_predict_fn_ctc_long_rejects_fusion_knobs():
    """The stitched long-line decode collapses on the host (no fusion /
    rank-normalization hooks): starting a daemon with lm_weight or
    length_penalty and a ctc_long method must fail loudly, not silently
    drop the knobs (ADVICE r3)."""

    class _Engine:  # never called — validation happens first
        pass

    with pytest.raises(ValueError, match="lm_weight"):
        serving_predict_fn(_Engine(), method="ctc_long_beam", lm_weight=0.4)
    with pytest.raises(ValueError, match="length_penalty"):
        serving_predict_fn(_Engine(), method="ctc_long", length_penalty=0.6)


def test_graceful_shutdown_drains_inflight_requests():
    """SIGTERM mid-request (VERDICT r3 weak #2): the in-flight request gets
    its completed 200 response, new submissions get a retryable 503,
    /healthz reports 'draining', and serve_forever returns so the process
    can exit 0 — the daemon counterpart of the trainer's SIGTERM
    preemption."""
    import signal

    from rcnn_ocr_tpu.serving import install_graceful_shutdown

    gate = threading.Event()
    eng = RecordingEngine(gate=gate)
    server = OCRServer(
        eng.predict, host="127.0.0.1", port=0, max_batch=8, max_wait_ms=0
    )
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    host, port = server.address[:2]
    base = f"http://{host}:{port}"
    old_handler = signal.getsignal(signal.SIGTERM)
    try:
        install_graceful_shutdown(server, signals=(signal.SIGTERM,))

        inflight = {}

        def request_a():
            try:
                inflight["result"] = _post(
                    base + "/predict", _png_bytes(_imgs([7])[0]), "image/png"
                )
            except BaseException as e:  # pragma: no cover - failure detail
                inflight["error"] = e

        t_a = threading.Thread(target=request_a, daemon=True)
        t_a.start()
        deadline = time.monotonic() + 30
        while not eng.batches and time.monotonic() < deadline:
            time.sleep(0.01)
        assert eng.batches, "request A never reached the engine"

        # SIGTERM while A is in flight (engine gated)
        signal.raise_signal(signal.SIGTERM)
        deadline = time.monotonic() + 30
        while time.monotonic() < deadline:
            with urllib.request.urlopen(base + "/healthz", timeout=10) as r:
                if json.loads(r.read())["status"] == "draining":
                    break
            time.sleep(0.01)
        else:
            pytest.fail("healthz never reported draining")

        # new submissions are shed with a retryable 503
        with pytest.raises(urllib.error.HTTPError) as exc:
            _post(base + "/predict", _png_bytes(_imgs([9])[0]), "image/png")
        assert exc.value.code == 503
        assert "draining" in json.loads(exc.value.read())["error"]

        # release the engine: A must receive its COMPLETED response
        gate.set()
        t_a.join(timeout=30)
        assert "error" not in inflight, inflight.get("error")
        status, payload = inflight["result"]
        assert status == 200
        assert payload == {"texts": ["t7"]}

        # and the serve loop exits (process would exit 0)
        thread.join(timeout=30)
        assert not thread.is_alive()
    finally:
        signal.signal(signal.SIGTERM, old_handler)
        gate.set()
        server.close()


def test_graceful_shutdown_second_signal_forces_exit(monkeypatch):
    """A second SIGTERM/SIGINT during a wedged drain is the operator's
    escape hatch: it must force-exit with 128+signum instead of being
    swallowed by the already-draining handler (round-4 review)."""
    import os
    import signal

    from rcnn_ocr_tpu.serving import install_graceful_shutdown

    exits = []
    monkeypatch.setattr(os, "_exit", lambda code: exits.append(code))

    drain_started = threading.Event()

    class _WedgedServer:
        def shutdown_gracefully(self):
            drain_started.set()
            time.sleep(60)  # a drain that never finishes

    old_handler = signal.getsignal(signal.SIGTERM)
    try:
        install_graceful_shutdown(_WedgedServer(), signals=(signal.SIGTERM,))
        signal.raise_signal(signal.SIGTERM)  # first: starts the drain
        assert drain_started.wait(timeout=10)
        assert exits == []
        signal.raise_signal(signal.SIGTERM)  # second: escape hatch
        assert exits == [128 + signal.SIGTERM]
    finally:
        signal.signal(signal.SIGTERM, old_handler)


def test_metrics_endpoint_prometheus_format(http_server):
    """GET /metrics exposes the /healthz data as a Prometheus scrape
    target: counters for served images / engine batches / responses by
    status, gauges for queue depth and draining, and the rolling latency
    window as a summary."""
    base, eng = http_server
    img = np.full((6, 9, 3), 3, np.uint8)
    status, out = _post(base + "/predict", _png_bytes(img), "image/png")
    assert status == 200

    with urllib.request.urlopen(base + "/metrics", timeout=10) as resp:
        assert resp.headers["Content-Type"].startswith("text/plain")
        text = resp.read().decode()
    assert "# TYPE ocr_served_images_total counter" in text
    assert "ocr_served_images_total 1" in text
    assert "ocr_engine_batches_total 1" in text
    assert "ocr_engine_batch_errors_total 0" in text
    assert "ocr_pending_images 0" in text
    assert "ocr_draining 0" in text
    assert 'ocr_request_latency_seconds{quantile="0.99"}' in text
    assert 'ocr_http_responses_total{code="200"}' in text

    # counters are monotonic across scrapes and /metrics counts itself
    _post(base + "/predict", _png_bytes(img), "image/png")
    with urllib.request.urlopen(base + "/metrics", timeout=10) as resp:
        text2 = resp.read().decode()
    assert "ocr_served_images_total 2" in text2
    import re

    m = re.search(r'ocr_http_responses_total\{code="200"\} (\d+)', text2)
    assert m and int(m.group(1)) >= 3  # 2 predicts + first /metrics


def test_attention_long_daemon_fails_fast_on_unaligned_width():
    """An align-merge attention_long daemon over an engine whose img_w is
    not frame-aligned must refuse at server START (one loud error), not
    500 every request; merge='text' works at the same width."""
    class _Eng:
        img_w = 100  # not a multiple of TIME_DOWNSAMPLE=8

    with pytest.raises(ValueError, match="multiple"):
        serving_predict_fn(_Eng(), method="attention_long", merge="align")
    # text merge tolerates the width — building the fn succeeds
    fn = serving_predict_fn(_Eng(), method="attention_long", merge="text")
    assert callable(fn)


def test_serve_loadtest_tool(http_server):
    """tools/serve_loadtest.py drives a live daemon concurrently and
    reconciles client-side counts with the server's /metrics deltas."""
    import sys as _sys

    _sys.path.insert(0, "/root/repo/tools")
    try:
        import serve_loadtest as lt
    finally:
        _sys.path.remove("/root/repo/tools")

    base, eng = http_server
    img = np.full((6, 9, 3), 42, np.uint8)
    result = lt.run_loadtest(base, _png_bytes(img), n_requests=12,
                             concurrency=4)
    assert result["ok"] == 12 and result["errors"] == 0
    assert result["server"]["images_served"] == 12
    assert 1 <= result["server"]["engine_batches"] <= 12
    assert result["server"]["engine_errors"] == 0
    assert result["latency_ms"]["p99"] >= result["latency_ms"]["p50"] > 0
    assert result["rps"] > 0


def test_burst_concurrency_no_connection_resets():
    """64 simultaneous clients must all be served — the stdlib default
    listen backlog (request_queue_size=5) RST-dropped ~10% of such a
    burst on hardware (PERF.md round 4); OCRServer now defaults to a
    deep backlog so the micro-batcher does the queueing, not the kernel."""
    eng = RecordingEngine()
    server = OCRServer(
        eng.predict, host="127.0.0.1", port=0, max_batch=16, max_wait_ms=5
    )
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        host, port = server.address[:2]
        base = f"http://{host}:{port}"
        body = _png_bytes(np.full((6, 9, 3), 7, np.uint8))
        errors: list = []
        done: list = []
        lock = threading.Lock()

        def client():
            try:
                status, out = _post(base + "/predict", body, "image/png")
                with lock:
                    done.append(status)
            except Exception as e:
                with lock:
                    errors.append(repr(e))

        clients = [
            threading.Thread(target=client, daemon=True) for _ in range(64)
        ]
        for c in clients:
            c.start()
        for c in clients:
            c.join(timeout=60)
        assert not errors, errors[:5]
        assert len(done) == 64 and all(s == 200 for s in done)
        assert server.batcher.served == 64
    finally:
        server.close()
        thread.join(timeout=10)


def test_batcher_swap_predict_fn():
    """Hot swap: the next batch runs the new engine, the swap counter
    shows in stats, and no queued request is dropped."""
    b = MicroBatcher(lambda imgs: [f"old{i}" for i in range(len(imgs))],
                     max_batch=4, max_wait_ms=0)
    try:
        assert b.submit(_imgs([1])) == ["old0"]
        assert "engine_swaps" not in b.stats()
        b.swap_predict_fn(lambda imgs: [f"new{i}" for i in range(len(imgs))])
        assert b.submit(_imgs([2])) == ["new0"]
        assert b.stats()["engine_swaps"] == 1
    finally:
        b.close()


def test_install_hot_reload_sighup_swaps_engine():
    """SIGHUP = zero-downtime upgrade: the daemon rebuilds the engine on a
    helper thread and swaps it between batches; a FAILED build keeps the
    old engine serving (a bad artifact push must not take the daemon
    down).  /metrics counts the swaps."""
    import signal

    from rcnn_ocr_tpu.serving import install_hot_reload

    eng = RecordingEngine()
    server = OCRServer(
        eng.predict, host="127.0.0.1", port=0, max_batch=8, max_wait_ms=0
    )
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    host, port = server.address[:2]
    base = f"http://{host}:{port}"

    builds = []

    def build_ok():
        builds.append("ok")
        return lambda imgs: ["reloaded"] * len(imgs)

    old_handler = signal.getsignal(signal.SIGHUP)
    try:
        install_hot_reload(server, build_ok)
        img = _imgs([3])[0]
        status, out = _post(base + "/predict", _png_bytes(img), "image/png")
        assert status == 200 and out["texts"] == ["t3"]

        signal.raise_signal(signal.SIGHUP)
        deadline = time.monotonic() + 10
        while time.monotonic() < deadline and not builds:
            time.sleep(0.01)
        # wait until the swap is visible through HTTP
        while time.monotonic() < deadline:
            status, out = _post(
                base + "/predict", _png_bytes(img), "image/png"
            )
            if out["texts"] == ["reloaded"]:
                break
            time.sleep(0.01)
        assert out["texts"] == ["reloaded"]

        # a failing build leaves the reloaded engine in place
        def build_bad():
            raise RuntimeError("corrupt artifact")

        install_hot_reload(server, build_bad)
        signal.raise_signal(signal.SIGHUP)
        time.sleep(0.3)
        status, out = _post(base + "/predict", _png_bytes(img), "image/png")
        assert status == 200 and out["texts"] == ["reloaded"]

        with urllib.request.urlopen(base + "/metrics", timeout=10) as resp:
            metrics = resp.read().decode()
        assert "ocr_engine_swaps_total 1" in metrics
    finally:
        signal.signal(signal.SIGHUP, old_handler)
        server.close()
        thread.join(timeout=10)


def test_ocr_client_predict_health_metrics():
    """The client SDK round-trips against a live daemon: batch predict
    (paths + arrays + raw bytes in one call), health, metrics."""
    from rcnn_ocr_tpu.client import OCRClient

    eng = RecordingEngine()
    server = OCRServer(
        eng.predict, host="127.0.0.1", port=0, max_batch=8, max_wait_ms=0
    )
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        host, port = server.address[:2]
        client = OCRClient(f"http://{host}:{port}", timeout_s=30)
        assert client.wait_ready(timeout_s=30)["status"] == "ok"

        import os
        import tempfile

        import cv2

        imgs = _imgs([1, 2, 3])
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "img.png")
            cv2.imwrite(path, imgs[0])
            out = client.predict([path, imgs[1], _png_bytes(imgs[2])])
        assert out == ["t1", "t2", "t3"]
        assert client.health()["served"] == 3
        assert "ocr_served_images_total 3" in client.metrics()
        assert client.predict([]) == []
    finally:
        server.close()
        thread.join(timeout=10)


def test_ocr_client_retries_503_and_raises_permanent():
    """503 (draining/queue-full) is the daemon's retryable status: the
    client backs off and retries until the server recovers; 400s raise
    immediately without retries."""
    from rcnn_ocr_tpu.client import OCRClient, OCRClientError

    eng = RecordingEngine()
    server = OCRServer(
        eng.predict, host="127.0.0.1", port=0, max_batch=8, max_wait_ms=0
    )
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        host, port = server.address[:2]
        client = OCRClient(
            f"http://{host}:{port}", timeout_s=30,
            max_retries=10, backoff_s=0.05,
        )
        # flip the server to draining; a background timer recovers it
        server._draining = True

        def recover():
            time.sleep(0.4)
            server._draining = False

        threading.Thread(target=recover, daemon=True).start()
        assert client.predict(_imgs([4])) == ["t4"]  # retried through 503s

        # permanent failure: garbage body -> 400, no retry
        t0 = time.monotonic()
        with pytest.raises(OCRClientError) as ei:
            client.predict([b"not an image"])
        assert ei.value.status == 400
        assert time.monotonic() - t0 < 5  # no backoff ladder on 400

        # retries exhausted -> raises with the last status
        server._draining = True
        fast = OCRClient(
            f"http://{host}:{port}", timeout_s=30,
            max_retries=1, backoff_s=0.01,
        )
        with pytest.raises(OCRClientError) as ei:
            fast.predict(_imgs([5]))
        assert ei.value.status == 503
    finally:
        server._draining = False
        server.close()
        thread.join(timeout=10)


def test_batcher_swap_resizes_max_batch():
    """A hot swap can carry the new engine's device batch: the dispatcher
    cuts the new size from the next batch on, and a default-derived
    max_queued rescales (an explicit one is the operator's and stays)."""
    b = MicroBatcher(lambda imgs: ["x"] * len(imgs), max_batch=8, max_wait_ms=0)
    try:
        assert (b.max_batch, b.max_queued) == (8, 128)
        b.swap_predict_fn(lambda imgs: ["y"] * len(imgs), max_batch=2)
        assert (b.max_batch, b.max_queued) == (2, 32)
        assert b.submit(_imgs([1, 2, 3, 4, 5])) == ["y"] * 5  # sliced at 2
    finally:
        b.close()

    b2 = MicroBatcher(
        lambda imgs: ["x"] * len(imgs),
        max_batch=8, max_wait_ms=0, max_queued=100,
    )
    try:
        b2.swap_predict_fn(lambda imgs: ["y"] * len(imgs), max_batch=4)
        assert (b2.max_batch, b2.max_queued) == (4, 100)
    finally:
        b2.close()


def test_install_hot_reload_tuple_build_resizes_batcher():
    """A build returning (fn, max_batch) re-sizes the batcher on swap
    (tools/serve.py returns the re-exported artifact's batch size)."""
    import signal

    from rcnn_ocr_tpu.serving import install_hot_reload

    eng = RecordingEngine()
    server = OCRServer(
        eng.predict, host="127.0.0.1", port=0, max_batch=8, max_wait_ms=0
    )
    old_handler = signal.getsignal(signal.SIGHUP)
    try:
        install_hot_reload(
            server, lambda: (lambda imgs: ["swapped"] * len(imgs), 2)
        )
        signal.raise_signal(signal.SIGHUP)
        deadline = time.monotonic() + 10
        while time.monotonic() < deadline and server.batcher.max_batch != 2:
            time.sleep(0.01)
        assert server.batcher.max_batch == 2
        assert server.batcher.submit(_imgs([1])) == ["swapped"]
    finally:
        signal.signal(signal.SIGHUP, old_handler)
        server.close()


def test_daemon_confidence_responses_and_client():
    """--confidence daemons return per-text confidences; the client SDK
    surfaces them as (text, conf) pairs and fails loudly against a daemon
    that was not started with confidences."""
    from rcnn_ocr_tpu.client import OCRClient, OCRClientError

    def predict_conf(images):
        return [(f"t{int(np.asarray(im).ravel()[0])}", 0.5) for im in images]

    server = OCRServer(
        predict_conf, host="127.0.0.1", port=0, max_batch=8,
        max_wait_ms=0, confidence=True,
    )
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        host, port = server.address[:2]
        base = f"http://{host}:{port}"
        img = _imgs([7])[0]
        status, out = _post(base + "/predict", _png_bytes(img), "image/png")
        assert status == 200
        assert out == {"texts": ["t7"], "confidences": [0.5]}

        client = OCRClient(base, timeout_s=30)
        assert client.predict(_imgs([3, 4]), confidence=True) == [
            ("t3", 0.5), ("t4", 0.5)
        ]
        # plain predict still works (texts only)
        assert client.predict(_imgs([5])) == ["t5"]
    finally:
        server.close()
        thread.join(timeout=10)

    # a confidence-less daemon + confidence=True client -> loud error
    eng = RecordingEngine()
    server2 = OCRServer(
        eng.predict, host="127.0.0.1", port=0, max_batch=8, max_wait_ms=0
    )
    thread2 = threading.Thread(target=server2.serve_forever, daemon=True)
    thread2.start()
    try:
        host, port = server2.address[:2]
        client = OCRClient(f"http://{host}:{port}", timeout_s=30)
        with pytest.raises(OCRClientError, match="confidence"):
            client.predict(_imgs([1]), confidence=True)
    finally:
        server2.close()
        thread2.join(timeout=10)


def test_serving_predict_fn_confidence_validation():
    """return_confidence is refused at construction ONLY for the tiled
    attention merge (no step-aligned confidence); every other method now
    carries a confidence contract (r5: the CTC paths gained theirs)."""

    class _Engine:
        pass

    with pytest.raises(ValueError, match="return_confidence"):
        serving_predict_fn(_Engine(), method="attention_long",
                           return_confidence=True)
    with pytest.raises(ValueError, match="return_confidence"):
        serving_predict_fn(_Engine(), method="attention_long_beam",
                           return_confidence=True)
    # ctc methods construct fine (the engine call itself is deferred)
    for ok in ("ctc_greedy", "ctc_long"):
        assert callable(
            serving_predict_fn(_Engine(), method=ok, return_confidence=True)
        )
