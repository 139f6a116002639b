"""B5 — Prometheus metrics exposition, dependency-free (SURVEY §2.13).

The reference's observability stack is a Prometheus server scraping
node/postgres exporters at ``/metrics`` every 15 s
(``observability_deployment/prometheus.yml:2-30``). The *deployment*
(docker, the Prometheus server itself) stays out of engine scope; what
belongs to the engine is the exporter side — OUR metrics, exposed in
the Prometheus text exposition format (v0.0.4) over a plain HTTP
endpoint the reference's scrape config could point at unchanged. No
client library needed: the format is line-oriented text and the server
is stdlib ``http.server``.

- :func:`prometheus_text` — render (name, labels, value) samples with
  HELP/TYPE headers, label-value escaping, deterministic ordering;
- :func:`benchmark_samples` — the benchmark grid's long-format rows
  (``FAISS/PlainDemo/pipeline.py:135-175`` schema) as samples;
- :func:`store_samples` — SnapshotStore health gauges (version,
  compaction failures/seconds — the auto-compaction observability
  counters crud.py already keeps);
- :class:`MetricsServer` — a background ``/metrics`` endpoint bound to
  an ephemeral port, suitable for tests and local scrapes.
"""

from __future__ import annotations

import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

_NAME_RE = re.compile(r"^[a-zA-Z_:][a-zA-Z0-9_:]*$")
CONTENT_TYPE = "text/plain; version=0.0.4; charset=utf-8"


def _escape_label(v: str) -> str:
    return str(v).replace("\\", "\\\\").replace("\n", "\\n").replace('"', '\\"')


def prometheus_text(
    samples: list[tuple[str, dict, float]],
    help_text: dict[str, str] | None = None,
    types: dict[str, str] | None = None,
) -> str:
    """Render samples as Prometheus exposition text. Samples sharing a
    metric name are grouped under one HELP/TYPE header; ordering is
    deterministic (name, then label string) so the output is testable
    byte-for-byte."""
    help_text, types = help_text or {}, types or {}
    by_name: dict[str, list[tuple[str, float]]] = {}
    for name, labels, value in samples:
        if not _NAME_RE.match(name):
            raise ValueError(f"invalid metric name {name!r}")
        for k in labels:
            if not _NAME_RE.match(k):
                raise ValueError(f"invalid label name {k!r}")
        lab = ",".join(
            f'{k}="{_escape_label(v)}"' for k, v in sorted(labels.items())
        )
        by_name.setdefault(name, []).append((lab, float(value)))
    out: list[str] = []
    for name in sorted(by_name):
        if name in help_text:
            out.append(f"# HELP {name} {help_text[name]}")
        out.append(f"# TYPE {name} {types.get(name, 'gauge')}")
        for lab, value in sorted(by_name[name]):
            # repr() keeps full float precision (shortest round-trip
            # form, like Go's strconv in official exporters): '%g'
            # truncates to 6 significant digits, so a counter past ~1e6
            # goes scientific and small increments vanish, breaking
            # rate() on slow-growing counters (r7 ADVICE)
            v = repr(float(value))
            out.append(f"{name}{{{lab}}} {v}" if lab else f"{name} {v}")
    return "\n".join(out) + "\n"


def benchmark_samples(rows) -> list[tuple[str, dict, float]]:
    """Long-format benchmark metrics rows (model_name, operation_type,
    operation_size, execution_time, cpu_usage, memory_usage) as
    exposition samples — one series per (model, operation, size)."""
    samples = []
    for r in rows:
        get = r.get if hasattr(r, "get") else r.asDict().get
        labels = {
            "model": get("model_name"),
            "operation": get("operation_type"),
            "size": str(get("operation_size")),
        }
        samples.append(
            ("deployment_benchmark_execution_seconds", labels, get("execution_time"))
        )
        samples.append(("deployment_benchmark_cpu_percent", labels, get("cpu_usage")))
        samples.append(
            ("deployment_benchmark_memory_mb", labels, get("memory_usage"))
        )
    return samples


BENCH_HELP = {
    "deployment_benchmark_execution_seconds": "Grid operation wall time",
    "deployment_benchmark_cpu_percent": "Driver CPU delta during the operation",
    "deployment_benchmark_memory_mb": "Driver RSS delta during the operation",
}


def store_samples(store, include_count: bool = False) -> list[tuple[str, dict, float]]:
    """SnapshotStore health gauges — all O(1)/O(manifest), no scans:

    - ``deployment_store_rows``: exact live rows from the pointer's
      commit-time count (``tracked_rows()``), ON BY DEFAULT since r8 —
      the write job observes its own count, so a scrape never scans.
      Omitted (not faked) while a mor store's count is unknown between
      a delete/upsert and the next compact.
    - ``deployment_store_segment_rows`` / ``_tombstone_rows``: physical
      manifest sums — compaction-pressure telemetry for mor stores.

    ``include_count=True`` additionally forces the exact ``count()``
    scan into ``deployment_store_rows`` when tracking is unknown — for
    callers that accept a scan per scrape."""
    labels = {"store": store.root, "mode": store.mode}
    samples = [
        ("deployment_store_version", labels, store.current_version()),
        ("deployment_store_compaction_failures_total", labels, store.compaction_failures),
        ("deployment_store_auto_compaction_seconds_total", labels, store.auto_compaction_seconds),
    ]
    tracked = store.tracked_rows()
    if tracked is None and include_count:
        tracked = store.count()
    if tracked is not None:
        samples.append(("deployment_store_rows", labels, tracked))
    if store.mode == "mor":
        # compaction-pressure telemetry only makes sense for mor: a cow
        # snapshot is one file set (segment_rows would just duplicate
        # the rows gauge, tombstone_rows is constant 0 — series noise)
        seg_rows, tomb_rows = store.manifest_file_rows()
        if seg_rows is not None:
            samples.append(("deployment_store_segment_rows", labels, seg_rows))
        if tomb_rows is not None:
            samples.append(("deployment_store_tombstone_rows", labels, tomb_rows))
    return samples


STORE_TYPES = {
    "deployment_store_compaction_failures_total": "counter",
    "deployment_store_auto_compaction_seconds_total": "counter",
}


class MetricsServer:
    """Background ``/metrics`` endpoint: ``sample_fn()`` is called per
    scrape and its samples rendered. Bind port 0 for an ephemeral port
    (read it back from ``.port``)."""

    def __init__(self, sample_fn, port: int = 0, help_text=None, types=None):
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802 (http.server API)
                if self.path != "/metrics":
                    self.send_response(404)
                    self.end_headers()
                    return
                try:
                    body = prometheus_text(
                        outer.sample_fn(), outer.help_text, outer.types
                    ).encode()
                except Exception as exc:  # scrape must not kill the server
                    self.send_response(500)
                    self.end_headers()
                    self.wfile.write(str(exc).encode())
                    return
                self.send_response(200)
                self.send_header("Content-Type", CONTENT_TYPE)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):  # quiet
                pass

        self.sample_fn = sample_fn
        self.help_text, self.types = help_text, types
        self._httpd = ThreadingHTTPServer(("127.0.0.1", port), Handler)
        self.port = self._httpd.server_address[1]
        self._thread: threading.Thread | None = None

    def start(self) -> "MetricsServer":
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread:
            self._thread.join(timeout=10)
