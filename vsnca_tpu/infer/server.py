"""HTTP serving runtime for live NCA stylization.

The reference's only deployment path is the in-browser WebGL runtime
(docs/dynca.js); this module is the TPU-side production analogue: a small
threaded HTTP server that owns persistent ``VideoStylizer`` sessions (the
NCA state lives on-device between requests — the same persistent-state
semantics as save_video, video_utils.py:50-83) and serves:

- ``POST /session``                 → create a session (JSON config body:
  size, step_n, seed), returns {"session": id}
- ``POST /frame/<id>``              → body: JPEG/PNG content frame; returns
  the stylized frame as JPEG (state persists across calls)
- ``POST /damage/<id>?x=&y=&r=``    → circular damage brush (regeneration)
- ``POST /reset/<id>``              → reseed the session state
- ``GET  /stream/<id>?frames=N``    → multipart/x-mixed-replace MJPEG of N
  self-conditioned steps (control-video style, video_utils.py:101-120)
- ``GET  /stats``                   → sessions + per-session frame counters

Concurrency: requests are served by a thread pool, but all device work
funnels through a single lock — one chip, one compiled program per
resolution; the batched multi-stream path (``infer.benchmark
.benchmark_serving``) shows how to fuse concurrent streams into one
dispatch when throughput matters more than isolation.
"""

from __future__ import annotations

import io
import json
import threading
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Optional
from urllib.parse import parse_qs, urlparse

import numpy as np

import jax.numpy as jnp

from vsnca_tpu.config import NCAConfig
from vsnca_tpu.infer.stylize import VideoStylizer


def _decode_image(data: bytes, size) -> np.ndarray:
    """JPEG/PNG bytes → [1, H, W, 3] float32 in [-1, 1] at the session size."""
    from PIL import Image

    img = Image.open(io.BytesIO(data)).convert("RGB")
    if img.size != (size[1], size[0]):
        img = img.resize((size[1], size[0]), Image.BILINEAR)
    arr = np.asarray(img, np.float32) / 255.0 * 2.0 - 1.0
    return arr[None]


def _encode_jpeg(frame01: np.ndarray, quality: int = 90) -> bytes:
    """[H, W, 3] float in [0, 1] → JPEG bytes."""
    from PIL import Image

    img = Image.fromarray(
        np.clip(np.asarray(frame01) * 255.0, 0, 255).astype(np.uint8)
    )
    buf = io.BytesIO()
    img.save(buf, "JPEG", quality=quality)
    return buf.getvalue()


class _Session:
    def __init__(self, stylizer: VideoStylizer):
        self.stylizer = stylizer
        self.frames = 0


class StylizeServer:
    """Owns the sessions and the device lock; wraps ThreadingHTTPServer."""

    def __init__(self, params: dict, nca_cfg: NCAConfig, host="127.0.0.1",
                 port: int = 0, default_size: int = 128, step_n: int = 24):
        self.params = params
        self.cfg = nca_cfg
        self.default_size = default_size
        self.step_n = step_n
        self.sessions: Dict[str, _Session] = {}
        self.device_lock = threading.Lock()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _json(self, code: int, obj):
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _bytes(self, code: int, body: bytes, ctype: str):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _body(self) -> bytes:
                n = int(self.headers.get("Content-Length", 0))
                return self.rfile.read(n) if n else b""

            def do_POST(self):
                url = urlparse(self.path)
                parts = [p for p in url.path.split("/") if p]
                try:
                    if parts == ["session"]:
                        raw = self._body()
                        spec = json.loads(raw) if raw else {}
                        sid = outer.create_session(
                            size=int(spec.get("size", outer.default_size)),
                            step_n=int(spec.get("step_n", outer.step_n)),
                            seed=int(spec.get("seed", 0)),
                        )
                        return self._json(200, {"session": sid})
                    if len(parts) == 2 and parts[0] == "frame":
                        out = outer.step_frame(parts[1], self._body())
                        return self._bytes(200, out, "image/jpeg")
                    if len(parts) == 2 and parts[0] == "damage":
                        if parts[1] not in outer.sessions:
                            return self._json(404, {"error": "no such session"})
                        q = parse_qs(url.query)
                        if "x" not in q or "y" not in q:
                            return self._json(
                                400, {"error": "x and y query params required"}
                            )
                        outer.damage(
                            parts[1], int(q["x"][0]), int(q["y"][0]),
                            int(q.get("r", ["8"])[0]),
                        )
                        return self._json(200, {"ok": True})
                    if len(parts) == 2 and parts[0] == "reset":
                        outer.reset(parts[1])
                        return self._json(200, {"ok": True})
                    return self._json(404, {"error": "unknown endpoint"})
                except KeyError:
                    return self._json(404, {"error": "no such session"})
                except Exception as e:  # pragma: no cover - defensive
                    return self._json(500, {"error": repr(e)})

            def do_GET(self):
                url = urlparse(self.path)
                parts = [p for p in url.path.split("/") if p]
                if parts == ["stats"]:
                    return self._json(200, outer.stats())
                if len(parts) == 2 and parts[0] == "stream":
                    q = parse_qs(url.query)
                    n = int(q.get("frames", ["30"])[0])
                    # resolve the session BEFORE committing the 200 +
                    # multipart headers — the generator raises lazily
                    if parts[1] not in outer.sessions:
                        return self._json(404, {"error": "no such session"})
                    try:
                        self.send_response(200)
                        self.send_header(
                            "Content-Type",
                            "multipart/x-mixed-replace; boundary=vsnca",
                        )
                        self.end_headers()
                        for jpg in outer.iter_control_stream(parts[1], n):
                            self.wfile.write(
                                b"--vsnca\r\nContent-Type: image/jpeg\r\n"
                                + f"Content-Length: {len(jpg)}\r\n\r\n".encode()
                            )
                            self.wfile.write(jpg)
                            self.wfile.write(b"\r\n")
                        return
                    except KeyError:
                        return self._json(404, {"error": "no such session"})
                return self._json(404, {"error": "unknown endpoint"})

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self.httpd.server_address[1]
        self._thread: Optional[threading.Thread] = None

    # ------------------------------------------------------------- API
    def create_session(self, size: int, step_n: int, seed: int = 0) -> str:
        import jax

        styl = VideoStylizer(
            self.params, self.cfg, size, step_n=step_n,
            key=jax.random.PRNGKey(seed),
        )
        sid = uuid.uuid4().hex[:8]
        self.sessions[sid] = _Session(styl)
        return sid

    def step_frame(self, sid: str, img_bytes: bytes) -> bytes:
        sess = self.sessions[sid]
        frame = _decode_image(img_bytes, sess.stylizer.size)
        with self.device_lock:
            out = sess.stylizer.step_frame(jnp.asarray(frame))
        sess.frames += 1
        return _encode_jpeg(np.asarray(out[0]))

    def damage(self, sid: str, x: int, y: int, r: int):
        sess = self.sessions[sid]
        with self.device_lock:
            sess.stylizer.damage(x, y, r)

    def reset(self, sid: str):
        sess = self.sessions[sid]
        with self.device_lock:
            sess.stylizer.reset()

    def iter_control_stream(self, sid: str, n_frames: int):
        """Self-conditioned stream: feed the previous output back as the
        content frame (the black/style control-video idea)."""
        sess = self.sessions[sid]
        h, w = sess.stylizer.size
        frame = np.zeros((1, h, w, 3), np.float32) - 1.0
        for _ in range(n_frames):
            with self.device_lock:
                out = sess.stylizer.step_frame(jnp.asarray(frame))
            sess.frames += 1
            out_np = np.asarray(out[0])
            frame = (out_np * 2.0 - 1.0)[None]
            yield _encode_jpeg(out_np)

    def stats(self):
        # snapshot: handler threads may insert sessions mid-iteration
        items = list(self.sessions.items())
        return {
            "sessions": {
                sid: {
                    "frames": s.frames,
                    "size": list(s.stylizer.size),
                    "step_n": s.stylizer.step_n,
                }
                for sid, s in items
            }
        }

    # --------------------------------------------------------- lifecycle
    def start(self):
        self._thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def stop(self):
        self.httpd.shutdown()
        self.httpd.server_close()
        if self._thread:
            self._thread.join(timeout=5)


def main():  # pragma: no cover - manual entry point
    import argparse

    import jax

    from vsnca_tpu.export.checkpoint import load_checkpoint
    from vsnca_tpu.models.dynca import dynca_init

    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--port", type=int, default=8788)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--step-n", type=int, default=24)
    ap.add_argument("--c-in", type=int, default=12)
    ap.add_argument("--fc-dim", type=int, default=96)
    ap.add_argument("--conditioning", default="edges",
                    choices=["none", "pos_emb", "edges"])
    args = ap.parse_args()

    cond = None if args.conditioning == "none" else args.conditioning
    cfg = NCAConfig(c_in=args.c_in, fc_dim=args.fc_dim, conditioning=cond,
                    padding_mode="circular")
    if args.checkpoint:
        params = load_checkpoint(args.checkpoint)["params"]
    else:
        print("WARNING: no checkpoint — serving a randomly initialized NCA")
        params = dynca_init(jax.random.PRNGKey(0), cfg)
    srv = StylizeServer(params, cfg, port=args.port,
                        default_size=args.size, step_n=args.step_n).start()
    print(f"serving on http://127.0.0.1:{srv.port} "
          f"(POST /session, /frame/<id>; GET /stream/<id>)")
    try:
        srv._thread.join()
    except KeyboardInterrupt:
        srv.stop()


if __name__ == "__main__":
    main()
