"""Serving host (``refinedet_tpu/serve/server.py``).

The batching engine and HTTP protocol are exercised against a fake
inference function (fast, deterministic — the contract is "tuple of
arrays with leading dim B"), plus one integration test running a real
exported artifact end to end through the wire format.
"""

import io
import json
import sys
import threading
import time
import urllib.request
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent))

from refinedet_tpu.serve.server import (BatchingEngine, Server,  # noqa: E402
                                        client_detect)

SHAPE = (8, 8, 3)


def _mark_image(i):
    """An image whose content identifies request i."""
    return np.full(SHAPE, float(i), np.float32)


class FakeInfer:
    """Records call batch sizes; returns (per-image mean, batch echo)."""

    def __init__(self, delay=0.0, fail=False):
        self.calls = []
        self.delay = delay
        self.fail = fail

    def __call__(self, images):
        self.calls.append(images.shape[0])
        if self.fail:
            raise RuntimeError("device on fire")
        if self.delay:
            time.sleep(self.delay)
        mean = images.mean(axis=(1, 2, 3))
        return mean, np.broadcast_to(mean[:, None], (len(mean), 4)).copy()


def test_each_request_gets_its_own_result():
    fake = FakeInfer()
    with BatchingEngine(fake, SHAPE, max_batch=4, max_delay_ms=1) as eng:
        futs = [eng.submit(_mark_image(i)) for i in range(10)]
        for i, f in enumerate(futs):
            mean, echo = f.result(timeout=10)
            assert mean == pytest.approx(float(i))
            assert echo.shape == (4,)
            assert echo[0] == pytest.approx(float(i))


def test_concurrent_requests_get_batched():
    """With a slow device, concurrent submitters coalesce: strictly fewer
    device calls than requests."""
    fake = FakeInfer(delay=0.05)
    n = 16
    results = {}
    with BatchingEngine(fake, SHAPE, max_batch=8, max_delay_ms=20) as eng:
        def worker(i):
            results[i] = eng(_mark_image(i))[0]

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(n)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        stats = eng.stats()
    assert len(results) == n
    for i, mean in results.items():
        assert mean == pytest.approx(float(i))
    assert stats["requests"] == n
    assert stats["batches"] < n  # coalescing happened
    assert sum(fake.calls) >= n  # padding only adds rows


def test_batches_padded_to_bucket_sizes():
    fake = FakeInfer(delay=0.02)
    with BatchingEngine(fake, SHAPE, max_batch=8, max_delay_ms=30) as eng:
        futs = [eng.submit(_mark_image(i)) for i in range(3)]
        for f in futs:
            f.result(timeout=10)
    # every device call saw a bucket size (1, 2, 4, or 8), never 3
    assert set(fake.calls) <= {1, 2, 4, 8}


def test_inference_error_reaches_all_waiters_and_engine_survives():
    fake = FakeInfer(fail=True)
    with BatchingEngine(fake, SHAPE, max_batch=4, max_delay_ms=5) as eng:
        futs = [eng.submit(_mark_image(i)) for i in range(3)]
        for f in futs:
            with pytest.raises(RuntimeError, match="device on fire"):
                f.result(timeout=10)
        fake.fail = False
        mean, _ = eng(_mark_image(7))
        assert mean == pytest.approx(7.0)
        assert eng.stats()["errors"] >= 1


def test_bad_shape_rejected_in_caller():
    with BatchingEngine(FakeInfer(), SHAPE, max_batch=2) as eng:
        with pytest.raises(ValueError, match="expected image shape"):
            eng.submit(np.zeros((4, 4, 3), np.float32))


def test_bucket_validation():
    with pytest.raises(ValueError, match="largest bucket"):
        BatchingEngine(FakeInfer(), SHAPE, max_batch=8, buckets=(1, 2))
    with pytest.raises(ValueError, match="max_batch"):
        BatchingEngine(FakeInfer(), SHAPE, max_batch=0)


@pytest.fixture()
def http_server():
    engine = BatchingEngine(FakeInfer(), SHAPE, max_batch=4, max_delay_ms=1)
    meta = {"input_size": 8, "num_classes": 2}
    with Server(engine, meta, port=0) as srv:
        yield srv


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}",
                                timeout=10) as r:
        return r.status, json.loads(r.read())


def test_http_endpoints(http_server):
    port = http_server.port
    assert _get(port, "/healthz") == (200, {"ok": True})
    status, meta = _get(port, "/meta")
    assert status == 200 and meta["input_size"] == 8
    status, stats = _get(port, "/stats")
    assert status == 200 and "latency_ms" in stats
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(port, "/nope")
    assert e.value.code == 404


def test_http_detect_raw_and_client(http_server):
    port = http_server.port
    mean, echo = client_detect("127.0.0.1", port, _mark_image(3))
    assert mean == pytest.approx(3.0)
    assert echo.shape == (4,)
    stats = _get(port, "/stats")[1]
    assert stats["requests"] >= 1


def test_http_detect_npy_content_type(http_server):
    port = http_server.port
    buf = io.BytesIO()
    np.save(buf, _mark_image(5))
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/detect", data=buf.getvalue(),
        headers={"Content-Type": "application/x-npy"})
    with urllib.request.urlopen(req, timeout=10) as r:
        npz = np.load(io.BytesIO(r.read()), allow_pickle=False)
    assert npz["out0"] == pytest.approx(5.0)


def test_http_detect_wrong_length_400(http_server):
    port = http_server.port
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/detect", data=b"\x00" * 17)
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=10)
    assert e.value.code == 400
    assert "expected" in json.loads(e.value.read())["error"]


def test_integration_real_artifact(tmp_path):
    """Full chain: export a real model -> load artifact -> batching engine
    -> HTTP wire format -> outputs match the live model."""
    import jax.numpy as jnp

    from refinedet_tpu.models import build_refinedet
    from refinedet_tpu.serve import load_serving, save_serving

    import jax

    model = build_refinedet("test", 320, 2)
    variables = model.init(jax.random.PRNGKey(0))
    path = str(tmp_path / "m.rdtpu")
    save_serving(model, variables, path, platforms=("cpu",))
    serving = load_serving(path)

    engine = BatchingEngine(serving, (320, 320, 3), max_batch=2,
                            max_delay_ms=5)
    rng = np.random.RandomState(0)
    img = rng.randn(320, 320, 3).astype(np.float32)
    with Server(engine, serving.meta, port=0) as srv:
        boxes, scores = client_detect("127.0.0.1", srv.port, img,
                                      timeout=600)
    want_b, want_s = model.apply(variables, jnp.asarray(img[None]))
    np.testing.assert_array_equal(boxes, np.asarray(want_b)[0])
    np.testing.assert_array_equal(scores, np.asarray(want_s)[0])


# -- hardening (round-3 verdict item #5) -------------------------------------


def test_submit_before_start_and_after_stop_raise():
    """A Future can never hang on a dispatcher that isn't running."""
    eng = BatchingEngine(FakeInfer(), SHAPE, max_batch=2)
    with pytest.raises(RuntimeError, match="not running"):
        eng.submit(_mark_image(0))
    eng.start()
    eng.submit(_mark_image(1)).result(timeout=10)
    eng.stop()
    with pytest.raises(RuntimeError, match="not running"):
        eng.submit(_mark_image(2))


def test_overload_sheds_load_with_engine_error():
    """A bounded queue + slow device: excess submits raise
    EngineOverloadedError instead of growing an unbounded backlog."""
    from refinedet_tpu.serve.server import EngineOverloadedError

    fake = FakeInfer(delay=0.3)
    with BatchingEngine(fake, SHAPE, max_batch=1, max_delay_ms=0,
                        max_queue=2, buckets=(1,)) as eng:
        futs, rejected = [], 0
        for i in range(30):
            try:
                futs.append(eng.submit(_mark_image(i)))
            except EngineOverloadedError:
                rejected += 1
        assert rejected > 0
        assert futs, "some requests must have been accepted"
        for f in futs:  # accepted requests all complete
            f.result(timeout=30)
        assert eng.stats()["rejected"] == rejected


def test_http_overload_returns_503():
    fake = FakeInfer(delay=0.5)
    engine = BatchingEngine(fake, SHAPE, max_batch=1, max_delay_ms=0,
                            max_queue=1, buckets=(1,))
    with Server(engine, {}, port=0) as srv:
        body = _mark_image(0).astype("<f4").tobytes()
        codes = []

        def post():
            req = urllib.request.Request(
                f"http://127.0.0.1:{srv.port}/detect", data=body)
            try:
                with urllib.request.urlopen(req, timeout=30) as r:
                    codes.append(r.status)
            except urllib.error.HTTPError as e:
                codes.append(e.code)

        threads = [threading.Thread(target=post) for _ in range(12)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
    assert codes.count(200) >= 1
    assert codes.count(503) >= 1, codes
    assert set(codes) <= {200, 503}


def test_http_oversized_body_413_without_buffering():
    """A huge Content-Length claim is rejected before any allocation."""
    engine = BatchingEngine(FakeInfer(), SHAPE, max_batch=2)
    with Server(engine, {}, port=0) as srv:
        import http.client
        conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=10)
        conn.putrequest("POST", "/detect")
        conn.putheader("Content-Length", str(50 * 1024 * 1024 * 1024))
        conn.endheaders()
        resp = conn.getresponse()
        assert resp.status == 413
        assert "exceeds limit" in json.loads(resp.read())["error"]
        conn.close()


def test_stop_fails_straggler_futures_instead_of_hanging():
    """Requests still queued when the engine stops get an exception, not
    an unresolved Future."""
    fake = FakeInfer(delay=0.5)
    eng = BatchingEngine(fake, SHAPE, max_batch=1, max_delay_ms=0,
                         max_queue=8, buckets=(1,)).start()
    futs = [eng.submit(_mark_image(i)) for i in range(5)]
    eng.stop()
    outcomes = []
    for f in futs:
        try:
            f.result(timeout=10)
            outcomes.append("ok")
        except RuntimeError:
            outcomes.append("failed")
    assert "ok" in outcomes or "failed" in outcomes
    assert all(o in ("ok", "failed") for o in outcomes)


def test_http_connect_burst_no_resets():
    """64 simultaneous connects must all be served. The stdlib default
    listen backlog of 5 RSTs part of such a burst on loopback (measured
    ~11% ECONNRESET before _ServingHTTPServer raised request_queue_size);
    overload shedding must come from the engine's 503 path, never the
    kernel's accept queue."""
    from refinedet_tpu.serve.server import _ServingHTTPServer

    assert _ServingHTTPServer.request_queue_size >= 64
    engine = BatchingEngine(FakeInfer(delay=0.01), SHAPE, max_batch=32,
                            max_delay_ms=2)
    body = _mark_image(3).astype("<f4").tobytes()
    start = threading.Barrier(64)
    outcomes = []
    lock = threading.Lock()

    def post():
        start.wait(timeout=30)
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/detect", data=body)
        try:
            with urllib.request.urlopen(req, timeout=60) as r:
                out = r.status
        except Exception as e:  # noqa: BLE001 — recorded for the assert
            out = repr(e)
        with lock:
            outcomes.append(out)

    with Server(engine, {}, port=0) as srv:
        threads = [threading.Thread(target=post) for _ in range(64)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
    assert outcomes.count(200) == 64, outcomes


def test_uint8_engine_and_wire_roundtrip():
    """uint8-wire engine: submit/pad/batch in uint8, HTTP raw bodies are
    1 byte/px (4x less upload than f32), client_detect(dtype="u1")
    round-trips."""
    seen_dtypes = []

    def infer(images):
        seen_dtypes.append(images.dtype)
        # echo per-image mean like FakeInfer, computed in f32
        mean = images.astype(np.float32).mean(axis=(1, 2, 3))
        return (mean,)

    eng = BatchingEngine(infer, SHAPE, max_batch=4, max_delay_ms=1,
                         input_dtype="uint8")
    with eng:
        img = np.full(SHAPE, 9, np.uint8)
        (mean,) = eng.submit(img).result(timeout=10)
        assert mean == pytest.approx(9.0)
        with Server(eng, {"input_dtype": "uint8"}, port=0) as srv:
            # raw wire: exactly h*w*c bytes (uint8), not 4x that
            body = img.tobytes()
            assert len(body) == int(np.prod(SHAPE))
            req = urllib.request.Request(
                f"http://127.0.0.1:{srv.port}/detect", data=body)
            with urllib.request.urlopen(req, timeout=30) as resp:
                npz = np.load(io.BytesIO(resp.read()), allow_pickle=False)
            assert npz["out0"] == pytest.approx(9.0)
            # an f32-length body must be rejected on the uint8 wire
            req = urllib.request.Request(
                f"http://127.0.0.1:{srv.port}/detect",
                data=img.astype("<f4").tobytes())
            try:
                urllib.request.urlopen(req, timeout=30)
                assert False, "expected 400"
            except urllib.error.HTTPError as e:
                assert e.code == 400
            # stdlib client with the uint8 wire dtype
            (mean,) = client_detect("127.0.0.1", srv.port, img, dtype="u1")
            assert mean == pytest.approx(9.0)
    assert all(d == np.uint8 for d in seen_dtypes)
