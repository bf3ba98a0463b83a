"""Multi-table lake registry + user-extension hooks.

Reference parity:
- table discovery / registry (S6): `getCdcEnabledTableMetadataList()`
  (CassandraClient.java:76-87) → a driver-side dict of table → CdcEngine;
- output routing (P14): topic name `prefix.keyspace.table` sanitized to
  [a-zA-Z0-9._-] and cached (CassandraTopicSelector.java:32-110) → one lake
  directory per sanitized table name;
- CommitLogTransfer hook (user-extension surface): post-process a segment
  after it is fully applied (archive/delete; default BlackHole deletes —
  CommitLogTransfer.java:14-36, CommitLogPostProcessor.java:38-55) → the
  ``on_segment_done(path, ok)`` callback invoked after the manifest commit
  that covers the segment.
"""

from __future__ import annotations

import os
import re
from typing import Callable, Dict, Optional

import pyarrow as pa

from debezium_incubator_ray.config import EngineConfig
from debezium_incubator_ray.pipelines.cdc import CdcEngine

_SANITIZE_RE = re.compile(r"[^a-zA-Z0-9._-]")


def sanitize_table_name(name: str, prefix: str = "") -> str:
    """`prefix.keyspace.table` sanitized like CassandraTopicSelector
    (invalid chars → '_')."""
    full = f"{prefix}.{name}" if prefix else name
    return _SANITIZE_RE.sub("_", full)


class Lake:
    """A directory of CDC-ingested tables: one CdcEngine per table, shared
    root, shared config defaults."""

    def __init__(
        self,
        root: str,
        prefix: str = "",
        on_segment_done: Optional[Callable[[str, bool], None]] = None,
    ):
        self.root = root
        self.prefix = prefix
        self.engines: Dict[str, CdcEngine] = {}
        self.on_segment_done = on_segment_done
        os.makedirs(root, exist_ok=True)
        # re-attach to existing tables (discovery on restart)
        for d in sorted(os.listdir(root)):
            lake_dir = os.path.join(root, d)
            if os.path.isdir(os.path.join(lake_dir, "_manifest")):
                self.engines[d] = CdcEngine(lake_dir)

    def table_names(self):
        return sorted(self.engines)

    def create_table(
        self,
        name: str,
        payload_schema: pa.Schema,
        config: Optional[EngineConfig] = None,
    ) -> CdcEngine:
        safe = sanitize_table_name(name, self.prefix)
        if safe in self.engines:
            return self.engines[safe]
        cfg = config or EngineConfig()
        cfg.table = safe
        eng = CdcEngine(
            os.path.join(self.root, safe), cfg, payload_schema=payload_schema
        )
        self.engines[safe] = eng
        return eng

    def __getitem__(self, name: str) -> CdcEngine:
        return self.engines[sanitize_table_name(name, self.prefix)]

    def apply_epoch(self, name: str, binlog_dir: str, **kw) -> dict:
        eng = self[name]
        before = set(eng.manifest.doc["segments_done"])
        stats = eng.apply_epoch(binlog_dir, **kw)
        if self.on_segment_done is not None:
            for seg in eng.manifest.doc["segments_done"]:
                if seg not in before:
                    self.on_segment_done(os.path.join(binlog_dir, seg), True)
        return stats
