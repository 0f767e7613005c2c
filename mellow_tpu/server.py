"""Minimal HTTP serving front over the BatchingEngine.

The reference has no serving story at all; this adds a stdlib-only HTTP
API so Mellow can be deployed as a service: concurrent POSTs are
coalesced into bucketed device batches by `serving.BatchingEngine`
(host threads block on futures; device work batches).

Endpoints:
  GET  /healthz            -> {"status": "ok", ...}
  GET  /metrics            -> the metrics registry snapshot (JSON)
  POST /generate           -> {"text": ...}
      body: {"audio1": path, "audio2": path, "prompt": str,
             "max_len"?: int, "top_p"?: float, "temperature"?: float,
             "sample"?: bool}
      Audio may also be sent inline as {"audio1_b64": base64-wav-bytes}
      (written to a temp file server-side).

Run: python -m mellow_tpu.server --port 8080        (real checkpoints via
MELLOW_TPU_PARAMS, like everywhere else).
"""

from __future__ import annotations

import base64
import json
import os
import tempfile
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from mellow_tpu.serving import BatchingEngine
from mellow_tpu.utils.metrics import GLOBAL as metrics


class MellowServer:
    def __init__(self, wrapper, max_batch_size: int = 32, max_wait_ms: float = 20.0):
        self.engine = BatchingEngine(
            wrapper, max_batch_size=max_batch_size, max_wait_ms=max_wait_ms
        )
        self._tmpdir = tempfile.mkdtemp(prefix="mellow_srv_")

    # ------------------------------------------------------------------

    def _resolve_audio(self, body: dict, key: str) -> str:
        if key in body:
            path = body[key]
            if not os.path.exists(path):
                raise FileNotFoundError(f"{key}: no such file {path!r}")
            return path
        b64 = body.get(f"{key}_b64")
        if b64 is None:
            raise KeyError(f"missing {key} or {key}_b64")
        raw = base64.b64decode(b64)
        fd, path = tempfile.mkstemp(suffix=".wav", dir=self._tmpdir)
        with os.fdopen(fd, "wb") as f:
            f.write(raw)
        return path

    def handle_generate(self, body: dict) -> dict:
        a1 = self._resolve_audio(body, "audio1")
        a2 = self._resolve_audio(body, "audio2")
        prompt = body["prompt"]
        fut = self.engine.submit(
            a1, a2, prompt,
            max_len=int(body.get("max_len", 300)),
            top_p=float(body.get("top_p", 0.8)),
            temperature=float(body.get("temperature", 1.0)),
            sample=bool(body.get("sample", False)),
        )
        return {"text": fut.result()}

    def shutdown(self):
        self.engine.shutdown()

    # ------------------------------------------------------------------

    def make_http_server(self, host: str = "127.0.0.1", port: int = 8080):
        app = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):  # quiet; metrics cover it
                pass

            def _send(self, code: int, payload: dict):
                data = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self):
                if self.path == "/healthz":
                    self._send(200, {"status": "ok"})
                elif self.path == "/metrics":
                    self._send(200, metrics.summary())
                else:
                    self._send(404, {"error": f"no route {self.path}"})

            def do_POST(self):
                if self.path != "/generate":
                    self._send(404, {"error": f"no route {self.path}"})
                    return
                try:
                    n = int(self.headers.get("Content-Length", "0"))
                    body = json.loads(self.rfile.read(n) or b"{}")
                    with metrics.timer("http_generate"):
                        out = app.handle_generate(body)
                    self._send(200, out)
                except (KeyError, FileNotFoundError, ValueError) as e:
                    self._send(400, {"error": str(e)})
                except Exception as e:  # noqa: BLE001 — surface to client
                    self._send(500, {"error": f"{type(e).__name__}: {e}"})

        return ThreadingHTTPServer((host, port), Handler)


def serve(wrapper, host: str = "127.0.0.1", port: int = 8080) -> None:
    """Blocking entrypoint."""
    srv = MellowServer(wrapper)
    httpd = srv.make_http_server(host, port)
    print(f"mellow_tpu server on http://{host}:{port}")
    try:
        httpd.serve_forever()
    finally:
        srv.shutdown()


def _main():
    import argparse

    from mellow_tpu.wrapper import MellowWrapper

    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--config", default="v0")
    ap.add_argument("--model", default="v0")
    ap.add_argument("--weight-dtype", default=None, choices=[None, "int8"])
    args = ap.parse_args()
    wrapper = MellowWrapper(
        args.config, args.model, 0, weight_dtype=args.weight_dtype
    )
    serve(wrapper, args.host, args.port)


if __name__ == "__main__":
    _main()
