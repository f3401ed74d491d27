"""Minimal HTTP serving endpoint (stdlib-only).

POST /transcribe with a WAV (or any decodable) body, optional
``?language=`` query -> JSON {"language", "text"}. Requests arriving
within ``batch_window_ms`` are coalesced into ONE batched TPU dispatch
(the engine's transcribe_batch), which is where TPU serving throughput
comes from. GET /healthz for liveness.

This is deliberately dependency-free; production deployments would front
it with a real ASGI stack, but the batching core is here.
"""

from __future__ import annotations

import json
import logging
import queue
import tempfile
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from ..audio.load import load_audio
from .engine import AsrEngine

logger = logging.getLogger(__name__)


class _Request:
    def __init__(self, samples, language):
        self.samples = samples
        self.language = language
        self.event = threading.Event()
        self.result = None
        self.error = None


class BatchingWorker(threading.Thread):
    """Coalesces concurrent requests into batched engine dispatches."""

    def __init__(self, engine: AsrEngine, batch_window_ms: float = 20.0,
                 max_batch: int = 8):
        super().__init__(daemon=True)
        self.engine = engine
        self.queue: "queue.Queue[_Request]" = queue.Queue()
        self.batch_window = batch_window_ms / 1000.0
        self.max_batch = max_batch
        self._stop = threading.Event()

    def submit(self, req: _Request):
        self.queue.put(req)

    def stop(self):
        self._stop.set()

    def run(self):
        while not self._stop.is_set():
            try:
                first = self.queue.get(timeout=0.1)
            except queue.Empty:
                continue
            batch = [first]
            deadline = threading.Event()
            deadline.wait(self.batch_window)
            while len(batch) < self.max_batch:
                try:
                    batch.append(self.queue.get_nowait())
                except queue.Empty:
                    break
            try:
                results = self.engine.transcribe_batch(
                    [r.samples for r in batch],
                    [r.language for r in batch],
                )
                for r, res in zip(batch, results):
                    r.result = res
            except Exception as e:  # noqa: BLE001
                for r in batch:
                    r.error = e
            for r in batch:
                r.event.set()


def make_handler(worker: BatchingWorker):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            logger.debug(fmt, *args)

        def do_GET(self):
            if urlparse(self.path).path == "/healthz":
                self._json(200, {"status": "ok"})
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            parsed = urlparse(self.path)
            if parsed.path != "/transcribe":
                self._json(404, {"error": "not found"})
                return
            language = parse_qs(parsed.query).get("language", [None])[0]
            length = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(length)
            try:
                with tempfile.NamedTemporaryFile(suffix=".wav") as f:
                    f.write(body)
                    f.flush()
                    samples = load_audio(f.name, 16000)
                req = _Request(samples, language)
                worker.submit(req)
                req.event.wait()
                if req.error is not None:
                    raise req.error
                self._json(200, {
                    "language": req.result.language,
                    "text": req.result.text,
                })
            except Exception as e:  # noqa: BLE001
                self._json(400, {"error": str(e)})

        def _json(self, code, obj):
            data = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

    return Handler


def serve(engine: AsrEngine, host: str = "0.0.0.0", port: int = 8080,
          batch_window_ms: float = 20.0, max_batch: int = 8):
    """Run the batching HTTP server (blocking)."""
    worker = BatchingWorker(engine, batch_window_ms, max_batch)
    worker.start()
    server = ThreadingHTTPServer((host, port), make_handler(worker))
    logger.info("serving on %s:%d", host, port)
    try:
        server.serve_forever()
    finally:
        worker.stop()


def main(argv=None):
    import sys

    from ..cli import setup_logging

    setup_logging()
    argv = sys.argv[1:] if argv is None else argv
    if not argv:
        print("Usage: python -m qwen3_asr_rs_tpu.runtime.server "
              "<model_path> [port]", file=sys.stderr)
        return 1
    engine = AsrEngine(argv[0])
    serve(engine, port=int(argv[1]) if len(argv) > 1 else 8080)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
