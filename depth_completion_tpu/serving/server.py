"""Stdlib HTTP front end for the serving engine.

Wire format (numpy-native, no extra deps):

- ``POST /v1/complete`` — body: an ``.npz`` archive with arrays ``image``
  ([H,W,3] RGB 0..255) and ``sparse`` ([H,W] or [H,W,1] metric depth,
  0 = missing). Optional query params: ``session=<id>`` (temporal latent
  carry for video streams). Response: ``.npy`` of the dense depth
  ([H,W,1] float32), with ``X-DCT-Latency-S`` and ``X-DCT-Batch-Size``
  headers.
- ``GET /healthz`` — 200 ``{"status": "ok", "warm": true|false}``.
- ``GET /v1/stats`` — batching/latency counters as JSON.
- ``POST /v1/session/<id>/reset`` — drop a session's carry latent.

The HTTP threads only enqueue; all device work happens on the engine's
single compute thread (see engine.py). ThreadingHTTPServer gives
concurrent request intake, which is what makes micro-batching fill.
"""

from __future__ import annotations

import io
import json
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

from depth_completion_tpu.serving.engine import (
    OverloadedError,
    ServeRequest,
    ServingEngine,
)


def _npy_bytes(arr: np.ndarray) -> bytes:
    buf = io.BytesIO()
    np.save(buf, arr)
    return buf.getvalue()


class _Handler(BaseHTTPRequestHandler):
    engine: ServingEngine  # set by make_server
    request_timeout_s: float = 600.0

    # quiet: route access logs through our logger at debug level
    def log_message(self, fmt: str, *args: object) -> None:
        from depth_completion_tpu.logger import logger

        logger.debug("http: " + fmt % args)

    def _json(self, code: int, payload: dict) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self) -> None:  # noqa: N802 (http.server API)
        path = urlparse(self.path).path
        if path == "/healthz":
            self._json(200, {"status": "ok", "warm": self.engine.warm})
        elif path == "/v1/stats":
            self._json(200, self.engine.stats())
        else:
            self._json(404, {"error": f"unknown path {path}"})

    def do_POST(self) -> None:  # noqa: N802
        parsed = urlparse(self.path)
        path = parsed.path
        if path.startswith("/v1/session/") and path.endswith("/reset"):
            sid = path[len("/v1/session/") : -len("/reset")]
            existed = self.engine.reset_session(sid)
            self._json(200, {"session": sid, "dropped": existed})
            return
        if path != "/v1/complete":
            self._json(404, {"error": f"unknown path {path}"})
            return

        try:
            length = int(self.headers.get("Content-Length", "0"))
            with np.load(io.BytesIO(self.rfile.read(length))) as npz:
                image = npz["image"]
                sparse = npz["sparse"]
        except Exception as exc:
            self._json(400, {"error": f"bad npz payload: {exc}"})
            return

        q = parse_qs(parsed.query)
        session = q.get("session", [None])[0]

        t0 = time.monotonic()
        try:
            req = self.engine.submit(
                ServeRequest(image=image, sparse=sparse, session=session)
            )
            dense = req.wait(timeout=self.request_timeout_s)
        except (ValueError, TimeoutError, OverloadedError) as exc:
            # invalid input (e.g. the reference's empty-sparse contract,
            # pipeline.py:88-97), a timed-out wait, or an overloaded server.
            # Timeout is 504 (the work may still complete; retry-now is
            # wrong) vs 503 for load shedding (retry against another
            # replica is right).
            if isinstance(exc, TimeoutError):
                req.cancel()  # don't burn device time on an answer nobody reads
                code = 504
            elif isinstance(exc, ValueError):
                code = 422
            else:
                code = 503
            self._json(code, {"error": str(exc)})
            return
        except Exception as exc:  # engine/device failure re-raised by wait()
            # without this the handler thread dies mid-response and the
            # client sees a bare connection reset instead of a status
            self._json(500, {"error": f"{type(exc).__name__}: {exc}"})
            return

        body = _npy_bytes(np.asarray(dense, np.float32))
        self.send_response(200)
        self.send_header("Content-Type", "application/x-npy")
        self.send_header("Content-Length", str(len(body)))
        self.send_header("X-DCT-Latency-S", f"{time.monotonic() - t0:.4f}")
        self.send_header("X-DCT-Batch-Size", str(req._batch_size))
        self.end_headers()
        self.wfile.write(body)


def make_server(
    engine: ServingEngine,
    host: str = "127.0.0.1",
    port: int = 8571,
    request_timeout_s: float = 600.0,
) -> ThreadingHTTPServer:
    """Build (but do not start) the HTTP server; call serve_forever() or
    run it in a thread. Port 0 picks a free port (see server_address)."""
    handler = type(
        "BoundHandler",
        (_Handler,),
        {"engine": engine, "request_timeout_s": request_timeout_s},
    )
    return ThreadingHTTPServer((host, port), handler)
