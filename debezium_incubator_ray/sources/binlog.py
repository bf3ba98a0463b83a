"""Binlog/WAL-tail source: segment discovery + epoch planning.

Reference parity: commit-log directory processing — initial backlog scan
sorted by the segment's embedded timestamp, then watch for new segments
(CommitLogProcessor.java:75-113 + CommitLogUtil.java:75-103 comparator;
AbstractDirectoryWatcher.java:40-53). Ray-Data-first: the "watch" is a
driver-side listing diff against the manifest's ``segments_done`` set per
micro-batch epoch; each new segment becomes (part of) a ``read_parquet``
task — reads are pruned at the source, never re-read and re-filtered.
"""

from __future__ import annotations

import json
import os
import re
from typing import Dict, List, Optional, Sequence, Tuple

from debezium_incubator_ray.schema import SchemaChange

_SEG_RE = re.compile(r"p=(\d+)[/\\]seg-(\d+)\.parquet$")


def list_segments(binlog_dir: str) -> List[str]:
    """All segment files, sorted by (partition, segment index) — the
    commit-log filename sort (O1)."""
    out: List[Tuple[int, int, str]] = []
    for root, dirs, names in os.walk(binlog_dir):
        # underscore dirs are engine-internal (_relocation archive/error);
        # never re-list a relocated segment as fresh
        dirs[:] = [d for d in dirs if not d.startswith("_")]
        for name in names:
            if not name.endswith(".parquet"):
                continue
            rel = os.path.relpath(os.path.join(root, name), binlog_dir)
            m = _SEG_RE.search(rel.replace(os.sep, "/"))
            if m:
                out.append((int(m.group(1)), int(m.group(2)), rel))
    out.sort()
    return [rel for _p, _k, rel in out]


def plan_epoch(
    binlog_dir: str,
    segments_done: Sequence[str],
    max_segments: Optional[int] = None,
    latest_only: bool = False,
) -> List[str]:
    """New (not-yet-applied) segments for this epoch, oldest first.

    ``latest_only``: keep only the newest segment per partition — the
    reference's test-only latest-commit-log mode
    (CommitLogProcessor.java:115-134, config :237-238).
    """
    done = set(segments_done)
    fresh = [s for s in list_segments(binlog_dir) if s not in done]
    if latest_only:
        by_part = {}
        for s in fresh:
            m = _SEG_RE.search(s.replace(os.sep, "/"))
            by_part[int(m.group(1))] = s  # sorted input → last wins
        fresh = [by_part[p] for p in sorted(by_part)]
    if max_segments is not None:
        fresh = fresh[:max_segments]
    return fresh


def group_by_partition(segments: Sequence[str]) -> Optional[Dict[int, List[str]]]:
    """Group segment relpaths by their binlog partition (the ``p=<p>/``
    directory). Returns None if any segment doesn't follow the layout —
    callers must then treat the binlog as unpartitioned (exchange path)."""
    out: Dict[int, List[str]] = {}
    for s in segments:
        m = _SEG_RE.search(s.replace(os.sep, "/"))
        if not m:
            return None
        out.setdefault(int(m.group(1)), []).append(s)
    return out


def binlog_partition_count(binlog_dir: str) -> Optional[int]:
    """Number of ``p=<p>`` partition dirs in the binlog layout (max+1), or
    None when the directory doesn't follow the partitioned layout."""
    ps = []
    try:
        for name in os.listdir(binlog_dir):
            if name.startswith("p=") and name[2:].isdigit():
                ps.append(int(name[2:]))
    except FileNotFoundError:
        return None
    return (max(ps) + 1) if ps else None


def validate_segment(path: str) -> Optional[str]:
    """Cheap corruption probe (parquet footer read). Returns an error string
    for a bad segment, None when readable — the per-segment quarantine
    check (reference: failed segments move to error/ and processing
    continues, QueueProcessor.java:85-106, CommitLogProcessor.java:103-112)."""
    import pyarrow.parquet as pq

    try:
        pq.ParquetFile(path)
        return None
    except Exception as ex:  # noqa: BLE001 — any unreadable segment quarantines
        return f"{type(ex).__name__}: {ex}"


def append_schema_changes(binlog_dir: str, entries: List[dict]) -> None:
    """EXTERNAL-writer API for the schema-change control channel: append
    entries (structured or ``{"ddl": ..., "at_lsn": ...}``) to the
    binlog's ``_schema_changes.json`` with an atomic tmp+rename replace.
    This is the supported way for a SECOND process to evolve the schema
    while a ``tail()`` streams — the tail polls the control channel
    every epoch (the reference's external schema registry model:
    CAS/SchemaProcessor.java:24-27 re-reads the schema source on a
    timer) and commits the change itself, so the manifest keeps exactly
    ONE writer. The read-modify-write runs under an exclusive flock on
    a sidecar lockfile, so concurrent appenders serialize (no lost
    update); already-applied (change, column, at_lsn) triples are
    deduped at apply, so replays are safe too."""
    import fcntl
    import uuid

    path = os.path.join(binlog_dir, "_schema_changes.json")
    lock_fd = os.open(path + ".lock", os.O_CREAT | os.O_RDWR, 0o644)
    try:
        fcntl.flock(lock_fd, fcntl.LOCK_EX)  # blocking: appends are rare
        existing = []
        if os.path.exists(path):
            with open(path) as f:
                existing = json.load(f)
        tmp = f"{path}.{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as f:
            json.dump(existing + list(entries), f)
        os.replace(tmp, path)
    finally:
        os.close(lock_fd)  # closing releases the flock


def load_schema_changes(binlog_dir: str) -> List[SchemaChange]:
    """DDL-like control events shipped alongside the binlog. Two entry
    shapes coexist:

    - structured: ``{"change": "add_column", "column": ..., ...}``;
    - raw DDL text: ``{"ddl": "ALTER TABLE t ADD (...)", "at_lsn": N}`` —
      parsed by ddl.parse_ddl into the same SchemaChange stream (the
      reference's ANTLR path, OracleDdlParser.java:44-110 →
      AlterTableParserListener.java:76-133).
    """
    path = os.path.join(binlog_dir, "_schema_changes.json")
    if not os.path.exists(path):
        return []
    with open(path) as f:
        entries = json.load(f)
    out: List[SchemaChange] = []
    for d in entries:
        if "ddl" in d:
            from debezium_incubator_ray.ddl import parse_statement

            parsed = parse_statement(d["ddl"], at_lsn=d.get("at_lsn", 0))
            if parsed[0] != "alter":
                # CREATE/DROP TABLE are table-LIFECYCLE ops — handled by
                # Lake.process_ddl_segment (the per-table engine only
                # consumes column changes for its own schema history)
                continue
            out.extend(parsed[2])
        else:
            out.append(SchemaChange.from_json(d))
    return out
