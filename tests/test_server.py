"""Dynamic-batching serving layer (engine/server.py, cli/serve.py).

Covers the batcher contract (coalescing, bucket padding, error delivery,
per-request result routing) with a fake predictor, then the full HTTP
path over a real HeatmapPredictor on a tiny model.
"""

import io
import json
import threading
import time
from http.client import HTTPConnection

import numpy as np
import pytest

from tpupose.engine.server import MicroBatcher, PoseServer

HW = (16, 16)


def _fake_predictor(record):
    """Identity-ish predictor: keypoint 0 encodes the image's first pixel
    so per-request routing is checkable after batching."""

    def predict(images, centers, scales):
        record.append(images.shape[0])
        B = images.shape[0]
        coords = np.zeros((B, 4, 2), np.float32)
        coords[:, 0, 0] = images[:, 0, 0, 0]  # first-pixel fingerprint
        coords[:, 0, 1] = centers[:, 0]
        scores = np.full((B, 4), 0.9, np.float32)
        return coords, scores

    return predict


def test_batcher_coalesces_and_routes():
    record = []
    mb = MicroBatcher(_fake_predictor(record), HW, max_batch=8,
                      window_ms=60.0)
    try:
        results = {}

        def call(i):
            img = np.full((*HW, 3), i, np.uint8)
            coords, scores = mb.submit(img, (i * 10.0, 0.0), (16.0, 16.0))
            results[i] = (coords, scores)

        threads = [threading.Thread(target=call, args=(i,)) for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

        # every request got ITS OWN image's result back
        for i in range(6):
            coords, scores = results[i]
            assert coords.shape == (4, 2) and scores.shape == (4,)
            assert coords[0, 0] == i and coords[0, 1] == i * 10.0
        # coalescing: 6 concurrent requests took far fewer than 6 batches
        st = mb.stats()
        assert st["requests"] == 6
        assert st["batches"] < 6
        assert sum(k * v for k, v in st["batch_hist"].items()) == 6
        # bucket padding: every device batch is a power-of-two bucket
        assert all(b in (1, 2, 4, 8) for b in record)
    finally:
        mb.close()


def test_batcher_bucket_and_validation():
    record = []
    mb = MicroBatcher(_fake_predictor(record), HW, max_batch=5,
                      window_ms=1.0)
    try:
        assert mb.buckets == [1, 2, 4, 5]
        with pytest.raises(ValueError):
            mb.submit(np.zeros((8, 8, 3), np.uint8), (0, 0), (1, 1))
    finally:
        mb.close()


def test_batcher_delivers_errors():
    def boom(images, centers, scales):
        raise RuntimeError("device fell over")

    mb = MicroBatcher(boom, HW, max_batch=2, window_ms=1.0)
    try:
        with pytest.raises(RuntimeError, match="device fell over"):
            mb.submit(np.zeros((*HW, 3), np.uint8), (0, 0), (1, 1))
        # the loop survives a failing batch: next request still errors
        # cleanly rather than timing out
        with pytest.raises(RuntimeError):
            mb.submit(np.zeros((*HW, 3), np.uint8), (0, 0), (1, 1))
    finally:
        mb.close()


@pytest.fixture(scope="module")
def tiny_server():
    import jax
    import jax.numpy as jnp
    import optax

    from tpupose.engine.predictor import HeatmapPredictor
    from tpupose.engine.train_state import create_train_state
    from tpupose.models.simple_baseline import SimpleBaseline

    H, W = 32, 32
    model = SimpleBaseline(backbone="resnet18", num_keypoints=4,
                           deconv_channels=(32,), dtype=jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, H, W, 3), jnp.float32),
                               optax.sgd(0.0))
    predictor = HeatmapPredictor(state, (16, 16), decode="argmax",
                                 flip_test=False)
    server = PoseServer(predictor, (H, W), port=0, max_batch=4,
                        window_ms=10.0, model_name="tiny")
    server.start_background()
    yield server
    server.shutdown()


def _post(port, body, ctype):
    conn = HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("POST", "/predict", body=body,
                 headers={"Content-Type": ctype})
    r = conn.getresponse()
    out = (r.status, json.loads(r.read().decode()))
    conn.close()
    return out


@pytest.mark.slow
def test_http_predict_npy(tiny_server):
    img = np.random.randint(0, 255, (32, 32, 3), np.uint8)
    buf = io.BytesIO()
    np.save(buf, img)
    status, obj = _post(tiny_server.port, buf.getvalue(),
                        "application/octet-stream")
    assert status == 200
    kp = np.asarray(obj["keypoints"], np.float32)
    assert kp.shape == (4, 3)
    # coords land inside the 32x32 source frame (one 2-px bin of slack:
    # random weights may peak at the heatmap border)
    assert (kp[:, 0] >= -2.5).all() and (kp[:, 0] <= 34.5).all()


@pytest.mark.slow
def test_http_predict_jpeg_rescales_to_source(tiny_server):
    from PIL import Image

    # a 64x48 source: keypoints must come back in SOURCE pixels, not crop
    pil = Image.fromarray(
        np.random.randint(0, 255, (48, 64, 3), np.uint8))
    buf = io.BytesIO()
    pil.save(buf, format="JPEG")
    status, obj = _post(tiny_server.port, buf.getvalue(), "image/jpeg")
    assert status == 200
    kp = np.asarray(obj["keypoints"], np.float32)
    assert kp.shape == (4, 3)
    # one heatmap bin spans 4 source px; random weights can peak at the
    # border, so allow a bin of slack outside the 64x48 frame
    assert (kp[:, 0] >= -4.5).all() and (kp[:, 0] <= 68.5).all()
    assert (kp[:, 1] >= -4.5).all() and (kp[:, 1] <= 52.5).all()


@pytest.mark.slow
def test_http_bad_payload_and_routes(tiny_server):
    status, obj = _post(tiny_server.port, b"not an image", "image/jpeg")
    assert status == 400 and "error" in obj

    conn = HTTPConnection("127.0.0.1", tiny_server.port, timeout=10)
    conn.request("GET", "/healthz")
    r = conn.getresponse()
    health = json.loads(r.read().decode())
    assert r.status == 200 and health["ok"] and health["model"] == "tiny"
    conn.request("GET", "/stats")
    r = conn.getresponse()
    st = json.loads(r.read().decode())
    assert r.status == 200 and st["requests"] >= 2
    assert "p50" in st["latency_ms"]
    conn.request("GET", "/nope")
    r = conn.getresponse()
    assert r.status == 404
    r.read()
    conn.close()


@pytest.mark.slow
def test_http_server_faults_are_500_and_counted(tiny_server):
    """Server-side failures (batcher timeout, device faults) must surface
    as 500, not 400 (round-2 ADVICE #4), and /stats must count failed
    requests too."""
    img = np.random.randint(0, 255, (32, 32, 3), np.uint8)
    buf = io.BytesIO()
    np.save(buf, img)
    batcher = tiny_server.batcher
    before = batcher.n_requests
    orig = batcher.submit

    def boom(*a, **k):
        batcher.n_requests += 1   # what a timed-out submit now does
        raise TimeoutError("prediction timed out")

    batcher.submit = boom
    try:
        status, obj = _post(tiny_server.port, buf.getvalue(),
                            "application/octet-stream")
    finally:
        batcher.submit = orig
    assert status == 500 and "TimeoutError" in obj["error"]
    assert batcher.n_requests == before + 1


def test_batcher_counts_timed_out_requests():
    """MicroBatcher.submit itself counts a request that times out."""
    from tpupose.engine.server import MicroBatcher

    HW2 = (8, 8)

    def never(images, centers, scales):
        time.sleep(0.5)
        B = images.shape[0]
        return np.zeros((B, 4, 2), np.float32), np.zeros((B, 4), np.float32)

    mb = MicroBatcher(never, HW2, max_batch=2, window_ms=1.0)
    try:
        with pytest.raises(TimeoutError):
            mb.submit(np.zeros((*HW2, 3), np.uint8), (0, 0), (1, 1),
                      timeout=0.05)
        assert mb.n_requests == 1
    finally:
        mb.close()


@pytest.mark.slow
def test_http_concurrent_requests_batch(tiny_server):
    img = np.random.randint(0, 255, (32, 32, 3), np.uint8)
    buf = io.BytesIO()
    np.save(buf, img)
    body = buf.getvalue()
    before = tiny_server.batcher.stats()["batches"]
    results = []

    def call():
        results.append(_post(tiny_server.port, body,
                             "application/octet-stream")[0])

    threads = [threading.Thread(target=call) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results == [200] * 8
    after = tiny_server.batcher.stats()["batches"]
    # 8 concurrent posts coalesced into fewer than 8 device calls
    assert after - before < 8
