"""Offset-flush policy — how often the manifest is persisted to the store.

Reference parity: OffsetFlushPolicy.java:19-51. ``Always`` flushes on every
commit; ``Periodic(interval, max_events)`` flushes when the elapsed time
since the last flush reaches the interval OR the events processed since the
last flush reach ``max_events`` (the reference's
``timeSinceLastFlush >= offsetFlushInterval || numOfRecords >= maxSize``).

In this engine a "flush" persists the manifest CURRENT pointer
(state/manifest.py persist()); commits between flushes are in-memory only.
Crash-safety: copy-on-write never deletes data files the last persisted
manifest references, so a crash simply replays the un-flushed epochs —
idempotently, because their segments are still absent from the persisted
``segments_done`` and their effects from the persisted watermarks.
"""

from __future__ import annotations


class OffsetFlushPolicy:
    def should_flush(self, seconds_since_flush: float, events_since_flush: int) -> bool:
        raise NotImplementedError

    @staticmethod
    def always() -> "OffsetFlushPolicy":
        return AlwaysFlushPolicy()

    @staticmethod
    def periodic(interval_s: float, max_events: int) -> "OffsetFlushPolicy":
        return PeriodicFlushPolicy(interval_s, max_events)


class AlwaysFlushPolicy(OffsetFlushPolicy):
    def should_flush(self, seconds_since_flush: float, events_since_flush: int) -> bool:
        return True


class PeriodicFlushPolicy(OffsetFlushPolicy):
    def __init__(self, interval_s: float, max_events: int):
        self.interval_s = interval_s
        self.max_events = max_events

    def should_flush(self, seconds_since_flush: float, events_since_flush: int) -> bool:
        return (
            seconds_since_flush >= self.interval_s
            or events_since_flush >= self.max_events
        )
