"""Serving runtime: real HTTP round-trips against StylizeServer on
localhost (sessions, frame POSTs with persistent state, damage brush,
MJPEG control stream, stats)."""

import io
import json
import urllib.request

import numpy as np
import pytest

import jax

from vsnca_tpu.config import NCAConfig
from vsnca_tpu.infer.server import StylizeServer
from vsnca_tpu.models.dynca import dynca_init


def _jpeg_bytes(h, w, seed=0):
    from PIL import Image

    rng = np.random.RandomState(seed)
    img = Image.fromarray((rng.rand(h, w, 3) * 255).astype(np.uint8))
    buf = io.BytesIO()
    img.save(buf, "JPEG")
    return buf.getvalue()


def _post(url, data=b"", ctype="application/octet-stream"):
    req = urllib.request.Request(url, data=data, method="POST")
    req.add_header("Content-Type", ctype)
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.read(), r.headers.get("Content-Type")


@pytest.fixture(scope="module")
def server():
    cfg = NCAConfig(c_in=6, fc_dim=16, conditioning="pos_emb",
                    padding_mode="circular")
    params = dynca_init(jax.random.PRNGKey(0), cfg)
    srv = StylizeServer(params, cfg, port=0, default_size=32, step_n=4).start()
    yield srv
    srv.stop()


def test_session_frame_roundtrip(server):
    base = f"http://127.0.0.1:{server.port}"
    body, _ = _post(f"{base}/session",
                    json.dumps({"size": 32, "step_n": 4}).encode(),
                    "application/json")
    sid = json.loads(body)["session"]

    out1, ctype = _post(f"{base}/frame/{sid}", _jpeg_bytes(32, 32, 1))
    assert ctype == "image/jpeg" and out1[:2] == b"\xff\xd8"
    # persistent state: same content frame gives a DIFFERENT output next call
    out2, _ = _post(f"{base}/frame/{sid}", _jpeg_bytes(32, 32, 1))
    assert out1 != out2

    with urllib.request.urlopen(f"{base}/stats", timeout=30) as r:
        stats = json.loads(r.read())
    assert stats["sessions"][sid]["frames"] == 2

    _post(f"{base}/damage/{sid}?x=16&y=16&r=6")
    _post(f"{base}/reset/{sid}")


def test_mjpeg_control_stream(server):
    base = f"http://127.0.0.1:{server.port}"
    body, _ = _post(f"{base}/session",
                    json.dumps({"size": 32, "step_n": 4}).encode(),
                    "application/json")
    sid = json.loads(body)["session"]
    with urllib.request.urlopen(f"{base}/stream/{sid}?frames=3",
                                timeout=120) as r:
        assert "multipart/x-mixed-replace" in r.headers.get("Content-Type")
        data = r.read()
    assert data.count(b"--vsnca") == 3
    assert data.count(b"\xff\xd8") == 3  # three JPEG SOI markers


def test_unknown_session_404(server):
    base = f"http://127.0.0.1:{server.port}"
    try:
        _post(f"{base}/frame/deadbeef", _jpeg_bytes(32, 32))
        assert False, "expected HTTPError"
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_stream_unknown_session_is_clean_404(server):
    """A bad session id must 404 BEFORE multipart headers are committed
    (the generator used to raise after the 200 was already sent)."""
    base = f"http://127.0.0.1:{server.port}"
    try:
        urllib.request.urlopen(f"{base}/stream/nope?frames=2", timeout=30)
        assert False, "expected HTTPError"
    except urllib.error.HTTPError as e:
        assert e.code == 404
        assert "json" in e.headers.get("Content-Type", "")


def test_damage_missing_params_400(server):
    base = f"http://127.0.0.1:{server.port}"
    body, _ = _post(f"{base}/session", json.dumps({"size": 32}).encode(),
                    "application/json")
    sid = json.loads(body)["session"]
    try:
        _post(f"{base}/damage/{sid}")
        assert False, "expected HTTPError"
    except urllib.error.HTTPError as e:
        assert e.code == 400
