"""Live health/metrics HTTP endpoint for long-running ingest.

Reference parity: the Cassandra connector task serves ping / buildinfo /
metrics / health over HTTP while streaming (CAS/CassandraConnectorTask.java:
115-128,141-150, backed by the Dropwizard registries of
CommitLogProcessorMetrics.java:21-65). This engine's analog is a tiny
stdlib ThreadingHTTPServer running beside ``tail()`` — an operator can poll
it mid-run without touching the lake or the manifest store:

- ``GET /ping``       -> "pong"
- ``GET /buildinfo``  -> {"engine": ..., "version": ...}
- ``GET /health``     -> {"status": "ok", "manifest_version": ...,
                          "snapshot_complete": ..., "epochs": ...,
                          "uptime_s": ...}
- ``GET /metrics``    -> Prometheus-style text: manifest version,
                          per-partition watermarks, last-epoch and
                          cumulative event counters.

The server reads an immutable snapshot dict swapped in whole by the
engine after each epoch (``update()``) — request threads never walk live
engine state, so no locking discipline leaks into the apply path.
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, Optional

ENGINE_NAME = "debezium-incubator-ray"
ENGINE_VERSION = "0.3"


class HealthServer:
    """Background HTTP(S) server over an atomically-swapped status
    snapshot.

    TLS (reference parity: cassandra/network/SslConfig.java +
    SslContextFactory.java build an SslContext from configured cert/key
    paths for the connector's network surface): pass ``ssl_certfile`` +
    ``ssl_keyfile`` (PEM) to serve every endpoint over https — the
    listening socket is wrapped server-side with a TLS 1.2+
    ``ssl.SSLContext`` before the accept loop starts, so no plaintext
    request is ever answered on a TLS-configured server."""

    def __init__(self, port: int = 0, host: str = "127.0.0.1",
                 ssl_certfile: Optional[str] = None,
                 ssl_keyfile: Optional[str] = None):
        self._snapshot: Dict[str, Any] = {"status": "starting"}
        self._t0 = time.time()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # no stderr chatter per request
                pass

            def _send(self, body: str, ctype: str):
                data = body.encode()
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self):
                snap = outer._snapshot  # one volatile read — whole dict
                if self.path == "/ping":
                    self._send("pong", "text/plain")
                elif self.path == "/buildinfo":
                    self._send(
                        json.dumps(
                            {"engine": ENGINE_NAME, "version": ENGINE_VERSION}
                        ),
                        "application/json",
                    )
                elif self.path == "/health":
                    body = {
                        "status": snap.get("status", "ok"),
                        "uptime_s": round(time.time() - outer._t0, 3),
                    }
                    for k in ("manifest_version", "snapshot_complete",
                              "epochs", "last_epoch"):
                        if k in snap:
                            body[k] = snap[k]
                    self._send(json.dumps(body), "application/json")
                elif self.path == "/metrics":
                    self._send(outer._render_metrics(snap), "text/plain")
                else:
                    self.send_response(404)
                    self.end_headers()

        self.tls = bool(ssl_certfile)
        ctx = None
        if ssl_certfile:
            import ssl

            if not ssl_keyfile:
                raise ValueError(
                    "ssl_certfile requires ssl_keyfile (PEM private key)"
                )
            # build + validate the context BEFORE binding the port, so a
            # bad cert/key never leaks a bound listening socket
            ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
            ctx.minimum_version = ssl.TLSVersion.TLSv1_2
            ctx.load_cert_chain(certfile=ssl_certfile, keyfile=ssl_keyfile)
        self._httpd = ThreadingHTTPServer((host, port), Handler)
        if ctx is not None:
            # handshake deferred to the per-connection handler THREAD: a
            # stalled peer that never sends ClientHello must not wedge
            # the single accept loop (and with it every /ping /health
            # probe); python's http.server performs the handshake on the
            # first read of the connection
            self._httpd.socket = ctx.wrap_socket(
                self._httpd.socket, server_side=True,
                do_handshake_on_connect=False,
            )
        self.port = self._httpd.server_address[1]
        self._thread: Optional[threading.Thread] = None

    @staticmethod
    def _render_metrics(snap: Dict[str, Any]) -> str:
        lines = []

        def emit(name, value, labels=""):
            lines.append(f"cdc_{name}{labels} {value}")

        emit("manifest_version", snap.get("manifest_version", -1))
        emit("snapshot_complete", int(bool(snap.get("snapshot_complete"))))
        emit("epochs_total", snap.get("epochs", 0))
        # read = deliveries consumed; applied = events that actually merged
        # (a transactional epoch can read more than it applies — conflating
        # them would mask a stalled transactional head)
        emit("events_read_total", snap.get("events_total", 0))
        emit("events_applied_total", snap.get("applied_total", 0))
        emit("segments_done_total", snap.get("segments_done", 0))
        emit("segments_quarantined_total", snap.get("segments_error", 0))
        for p, wm in sorted(snap.get("watermarks", {}).items()):
            emit("partition_watermark", wm, f'{{partition="{p}"}}')
        last = snap.get("last_epoch") or {}
        for k in ("events", "applied", "done", "quarantined"):
            if k in last:
                emit(f"last_epoch_{k}", last[k])
        if "seconds" in last:
            emit("last_epoch_seconds", last["seconds"])
        return "\n".join(lines) + "\n"

    # -- lifecycle -----------------------------------------------------
    def start(self) -> "HealthServer":
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, name="cdc-health", daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None

    def update(self, snapshot: Dict[str, Any]) -> None:
        """Swap in a fresh status dict (atomic by assignment)."""
        self._snapshot = dict(snapshot)


def engine_snapshot(manifest, epochs: int, events_total: int,
                    applied_total: int = 0,
                    last_epoch: Optional[Dict[str, Any]] = None,
                    status: str = "ok") -> Dict[str, Any]:
    """Status snapshot from a Manifest — shared by tail() and tests."""
    doc = manifest.doc
    return {
        "status": status,
        "manifest_version": doc.get("version", -1),
        "snapshot_complete": doc.get("snapshot_complete", False),
        "epochs": epochs,
        "events_total": events_total,
        "applied_total": applied_total,
        "segments_done": len(doc.get("segments_done", [])),
        "segments_error": len(doc.get("segments_error", {})),
        "watermarks": {
            p: ent.get("watermark", -1)
            for p, ent in doc.get("partitions", {}).items()
        },
        "last_epoch": {
            k: last_epoch[k]
            for k in ("events", "applied", "done", "quarantined", "seconds")
            if last_epoch and k in last_epoch
        } if last_epoch else None,
    }
