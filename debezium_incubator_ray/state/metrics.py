"""Metric registry — live gauges + counters for the engine (T6).

Reference parity: the connector registers Dropwizard gauges/counters on a
process-wide registry —

- snapshot metrics (SnapshotProcessorMetrics.java:30-36): total-table-count,
  remaining-table-count, snapshot-completed, snapshot-running,
  snapshot-aborted, row-scanned, snapshot-duration-in-seconds;
- commit-log metrics (CommitLogProcessorMetrics.java:22-44):
  commitlog-filename, commitlog-position, number-of-processed-mutations,
  number-of-unrecoverable-errors.

Here gauges are callables evaluated at snapshot() time — most derive from
the manifest, so they reflect durable state and survive restarts; counters
are in-process monotonic values (the reference's Counter semantics: reset
when the process restarts). ``snapshot()`` returns a plain dict, the
engine's "endpoint" — cheap enough to poll per epoch and serializable as-is.
"""

from __future__ import annotations

from typing import Any, Callable, Dict


class Counter:
    __slots__ = ("value",)

    def __init__(self) -> None:
        self.value = 0

    def inc(self, n: int = 1) -> None:
        self.value += n


class MetricRegistry:
    def __init__(self) -> None:
        self._gauges: Dict[str, Callable[[], Any]] = {}
        self._counters: Dict[str, Counter] = {}

    def register_gauge(self, name: str, fn: Callable[[], Any]) -> None:
        self._gauges[name] = fn

    def counter(self, name: str) -> Counter:
        if name not in self._counters:
            self._counters[name] = Counter()
        return self._counters[name]

    def remove(self, name: str) -> None:
        self._gauges.pop(name, None)
        self._counters.pop(name, None)

    def snapshot(self) -> Dict[str, Any]:
        out: Dict[str, Any] = {}
        for name, fn in self._gauges.items():
            try:
                out[name] = fn()
            except Exception as ex:  # noqa: BLE001 — a broken gauge is data
                out[name] = f"ERROR {type(ex).__name__}: {ex}"
        for name, c in self._counters.items():
            out[name] = c.value
        return out
