"""Liveness + metrics HTTP surface for replay loops.

The analog of the reference's paired actix-web servers (metrics server +
health server spawned next to the worker loop, extractor_transformer/
src/main.rs:317-355): a k8s-style probe target that answers while the loop
runs, from a stdlib ThreadingHTTPServer on a daemon thread — no extra
dependencies, no Spark involvement (the loop pushes tiny per-batch counter
dicts; nothing here touches a DataFrame, so a slow scrape can never stall a
micro-batch).

Endpoints:

- ``GET /healthz`` — 200 ``{"live": true, ...}`` while batches keep
  arriving; 503 with the same body once ``last_batch_age_sec`` exceeds
  ``stale_after_sec`` (the liveness contract: a wedged loop stops
  heartbeating and the orchestrator restarts it). Before the first batch
  the server reports live from construction time (startup grace).
- ``GET /metrics`` — JSON totals + the last ``tail`` per-batch metric
  dicts (the same dicts ``ReplayResult.batch_metrics`` accumulates, which
  the table also persists per-snapshot — ``metrics_history()`` is the
  queryable long-term view; this is the live view).

Usage::

    mon = ReplayMonitor(port=0)            # 0 → ephemeral, mon.port resolves
    mon.start()
    replay(ev, tab, monitor=mon)           # loops push batch metrics
    ...
    mon.stop()

Single-writer like the loops themselves; ``record_batch`` is nonetheless
lock-guarded so a monitor shared by replay+fanout threads stays consistent.
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class ReplayMonitor:
    def __init__(
        self,
        port: int = 0,
        host: str = "127.0.0.1",
        stale_after_sec: float = 300.0,
        tail: int = 50,
    ):
        self.host = host
        self.port = port
        self.stale_after_sec = stale_after_sec
        self.tail = tail
        self._lock = threading.Lock()
        self._last_seen = time.time()
        self._batches: list[dict] = []
        self._totals = {
            "batches_applied": 0,
            "batches_skipped": 0,
            "rows_seen": 0,
            "started_at": self._last_seen,
        }
        self._server: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    # ---------------------------------------------------------- loop side
    def record_batch(self, bm: dict) -> None:
        """Push one batch's metrics dict (the replay loops call this after
        every merge attempt, committed or skipped)."""
        with self._lock:
            self._last_seen = time.time()
            self._batches.append(dict(bm))
            del self._batches[: -self.tail]
            if bm.get("status") == "committed":
                self._totals["batches_applied"] += 1
                self._totals["rows_seen"] += int(bm.get("rows", 0) or 0)
            else:
                self._totals["batches_skipped"] += 1

    def heartbeat(self) -> None:
        """Mark the loop alive without a batch (idle tail-follow polls)."""
        with self._lock:
            self._last_seen = time.time()

    # ---------------------------------------------------------- HTTP side
    def _health(self) -> tuple[int, dict]:
        with self._lock:
            age = time.time() - self._last_seen
            live = age <= self.stale_after_sec
            body = {
                "live": live,
                "last_batch_age_sec": round(age, 3),
                "stale_after_sec": self.stale_after_sec,
                "batches_applied": self._totals["batches_applied"],
            }
        return (200 if live else 503), body

    def _metrics(self) -> tuple[int, dict]:
        with self._lock:
            totals = dict(self._totals)
            totals["uptime_sec"] = round(time.time() - totals["started_at"], 3)
            body = {"totals": totals, "batches": list(self._batches)}
        return 200, body

    def start(self) -> "ReplayMonitor":
        monitor = self

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802 (stdlib naming)
                route = self.path.split("?", 1)[0].rstrip("/") or "/"
                if route == "/healthz":
                    code, body = monitor._health()
                elif route == "/metrics":
                    code, body = monitor._metrics()
                else:
                    code, body = 404, {"error": f"no route {route}"}
                payload = json.dumps(body).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

            def log_message(self, *a):  # quiet: probes hit every few seconds
                pass

        self._server = ThreadingHTTPServer((self.host, self.port), Handler)
        self.port = self._server.server_address[1]  # resolve port=0
        self._thread = threading.Thread(
            target=self._server.serve_forever, name="replay-monitor", daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._server = None
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None

    def __enter__(self) -> "ReplayMonitor":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()
