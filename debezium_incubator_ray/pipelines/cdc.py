"""CdcEngine — the public API: snapshot → streaming epochs → lake.

Re-expresses the reference's connector lifecycle (Kafka Connect SourceTask
start/poll/commit, OracleConnectorTask.java:58-133; Cassandra agent processor
group, CassandraConnectorTask.java:130-229) as a Ray Data pipeline per epoch:

    read_parquet(new segments)                      # stateless read tasks
      .map_batches(NormalizeEnvelope)               # vectorized, zero-copy
      .groupby(_p).map_groups(PartitionApplier)     # THE shuffle + stateful
                                                    # actor-pool merge
    driver: atomic manifest swap                    # exactly-once commit

Snapshot-then-stream handoff mirrors the SCN-pinned flashback snapshot
(OracleSnapshotChangeEventSource.java:110-139,228-231): snapshot rows are
op='r' events at the snapshot LSN; streaming applies only lsn > watermark.

The engine never calls ray.init()/shutdown() — the caller owns the session.
No stage materializes the event stream on the driver: only P metadata rows
(one per touched partition) fan in per epoch.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time
import weakref
from typing import Any, Dict, List, Optional, Union

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data

from debezium_incubator_ray import schema as S
from debezium_incubator_ray.config import EngineConfig
from debezium_incubator_ray.hashing import partition_ids
from debezium_incubator_ray.sources import binlog as binlog_src
from debezium_incubator_ray.stages.apply import PartitionApplier
from debezium_incubator_ray.stages.normalize import NormalizeEnvelope
from debezium_incubator_ray.state.manifest import Manifest


class ConcurrentWriterError(RuntimeError):
    """A second writer tried to lock the same lake (the reference rejects
    this with an exclusive offset-file lock, FileOffsetWriter.java:152-172)."""


class SchemaCompatibilityError(RuntimeError):
    """A DDL event on the binlog violates the lake's configured
    schema_compatibility level (the schema-registry BACKWARD/ADDITIVE
    gate enforced at the sink). Raised BEFORE any data from the epoch is
    applied, so the lake state is untouched."""


class CdcEngine:
    def __init__(
        self,
        lake_dir: str,
        config: Optional[EngineConfig] = None,
        payload_schema: Optional[pa.Schema] = None,
        manifest_store=None,
    ):
        # manifest_store: optional ManifestStore for the tiny control plane
        # (state/store.py) — e.g. ObjectStoreStore on a real cluster, where
        # concurrent engine writers are REJECTED at the conditional put
        # instead of last-write-wins; None = LocalFsStore under the lake
        self.cfg = config or EngineConfig()
        self.lake_dir = lake_dir
        self._manifest_store = manifest_store
        if Manifest.exists(lake_dir, store=manifest_store):
            self.manifest = Manifest.load(lake_dir, store=manifest_store)
            # the manifest is authoritative for table identity + partitioning
            # on resume: a config drift here would route keys to partitions
            # the applier doesn't track (and break exactly-once routing)
            doc = self.manifest.doc
            self.cfg.table = doc["table"]
            self.cfg.key = doc["key"]
            self.cfg.num_partitions = doc["num_partitions"]
            self.cfg.partitioner = doc.get("partitioner", self.cfg.partitioner)
            self.cfg.tombstones = doc.get("tombstones", True)
            self.cfg.sink_mode = doc.get("sink_mode", "cow")
            self.cfg.merge_mode = doc.get("merge_mode", "lww")
            self.cfg.counter_cols = tuple(doc.get("counter_cols") or [])
            self.cfg.key_cols = doc.get("key_cols")
            mf_stats = list(doc.get("stats_columns") or [])
            if not self.cfg.stats_columns:
                self.cfg.stats_columns = tuple(mf_stats)
            elif list(self.cfg.stats_columns) != mf_stats:
                # enabling/changing zone maps on an existing table: the
                # policy update rides the next commit; runs written before
                # it simply have no stats (scan reads them — correct)
                doc["stats_columns"] = list(self.cfg.stats_columns)
            mf_bloom = int(doc.get("bloom_filter_bits") or 0)
            if not self.cfg.bloom_filter_bits:
                self.cfg.bloom_filter_bits = mf_bloom
            elif self.cfg.bloom_filter_bits != mf_bloom:
                # enabling/resizing blooms on an existing table: runs
                # written before the change have no sidecar (lookup reads
                # them — correct); new writes carry the new size
                doc["bloom_filter_bits"] = int(self.cfg.bloom_filter_bits)
            if self.cfg.mor_compact_deltas is None:
                # table policy, restored on resume (an explicit config
                # value on reopen still wins)
                self.cfg.mor_compact_deltas = doc.get("mor_compact_deltas")
        else:
            if payload_schema is None:
                raise ValueError("payload_schema required to create a new lake")
            if self.cfg.key_cols:
                # composite PK: the engine routes/sorts on the derived
                # internal _key column (see EngineConfig.key_cols)
                from debezium_incubator_ray.envelope import COMPOSITE_KEY

                self.cfg.key = COMPOSITE_KEY
                missing = [
                    c for c in self.cfg.key_cols if payload_schema.get_field_index(c) < 0
                ]
                if missing:
                    raise ValueError(f"key_cols not in payload schema: {missing}")
            # field blacklist (FieldFilterSelector.java:28-50) shapes the lake
            # schema itself: blacklisted fields never reach the sink. Key
            # columns (single OR every composite component) are protected —
            # dropping one would orphan routing
            if self.cfg.field_blacklist:
                protected = set(self.cfg.key_cols or [self.cfg.key])
                drop = {f for f in self.cfg.field_blacklist if f not in protected}
                payload_schema = pa.schema(
                    [f for f in payload_schema if f.name not in drop]
                )
            if self.cfg.merge_mode == "partial" and not self.cfg.tombstones:
                # a retained tombstone row stores plain values and cannot
                # represent "cell not touched" — per-cell merge needs
                # compacted deletes. (sink_mode="mor" IS supported: delta
                # runs store the patch rows with their cell masks and the
                # read path folds them in version order — the SSTable
                # cell-merge model.)
                raise ValueError(
                    "merge_mode='partial' requires tombstones=True"
                )
            if self.cfg.counter_cols:
                if self.cfg.merge_mode != "partial":
                    raise ValueError(
                        "counter_cols requires merge_mode='partial' (the "
                        "increment stream must carry cell masks)"
                    )
                protected = set(self.cfg.key_cols or [self.cfg.key])
                def _counter_ok(t: pa.DataType) -> bool:
                    # 64-bit only: epoch sums accumulate in int64/float64
                    # and cast back checked — a narrow int column would
                    # make a legal increment stream overflow mid-apply
                    return t in (pa.int64(), pa.uint64()) or pa.types.is_floating(t)

                bad = [
                    c for c in self.cfg.counter_cols
                    if c in protected
                    or payload_schema.get_field_index(c) < 0
                    or not _counter_ok(payload_schema.field(c).type)
                ]
                if bad:
                    raise ValueError(
                        f"counter_cols must be non-key int64/float payload "
                        f"columns; invalid: {bad}"
                    )
            self.manifest = Manifest.create(
                lake_dir,
                self.cfg.table,
                self.cfg.key,
                self.cfg.num_partitions,
                S.schema_to_b64(payload_schema),
                partitioner=self.cfg.partitioner,
                tombstones=self.cfg.tombstones,
                sink_mode=self.cfg.sink_mode,
                key_cols=list(self.cfg.key_cols) if self.cfg.key_cols else None,
                mor_compact_deltas=self.cfg.mor_compact_deltas,
                stats_columns=list(self.cfg.stats_columns),
                merge_mode=self.cfg.merge_mode,
                counter_cols=list(self.cfg.counter_cols),
                bloom_filter_bits=self.cfg.bloom_filter_bits,
                store=manifest_store,
            )

        self._lock_fd: Optional[int] = None

        # offset-flush policy (OffsetFlushPolicy.java:19-51): Always persists
        # every commit; Periodic batches control-plane writes across epochs
        from debezium_incubator_ray.state.flush import OffsetFlushPolicy

        if self.cfg.offset_flush == "periodic":
            self._flush_policy = OffsetFlushPolicy.periodic(
                self.cfg.offset_flush_interval_s, self.cfg.offset_flush_max_events
            )
        else:
            self._flush_policy = OffsetFlushPolicy.always()
        self._last_flush_t = time.monotonic()
        self._events_since_flush = 0

        # metric registry (T6): gauge names mirror the reference's Dropwizard
        # registry — snapshot gauges SnapshotProcessorMetrics.java:30-36,
        # commit-log gauges/counters CommitLogProcessorMetrics.java:22-44.
        # Gauges derive from the manifest (durable, restart-safe); counters
        # are in-process monotonic, like the reference's. Gauge closures hold
        # a weakref, not self — a self->registry->closure->self cycle would
        # defer __del__ (and the writer-lock release) to a gc pass.
        from debezium_incubator_ray.state.metrics import MetricRegistry

        self._metrics = MetricRegistry()
        self._snapshot_running = False
        self._snapshot_seconds = 0.0
        self._rows_scanned: Dict[str, int] = {}
        self._last_segment: Optional[str] = None
        w = weakref.proxy(self)
        g = self._metrics.register_gauge
        g("snapshot-completed", lambda: w.manifest.doc["snapshot_complete"])
        g("snapshot-running", lambda: w._snapshot_running)
        g("snapshot-aborted", lambda: False)
        g("snapshot-duration-in-seconds", lambda: w._snapshot_seconds)
        g("total-table-count", lambda: 1)  # one engine drives one table; Lake aggregates
        g(
            "remaining-table-count",
            lambda: 0 if w.manifest.doc["snapshot_complete"] else 1,
        )
        g("row-scanned", lambda: dict(w._rows_scanned))
        g("commitlog-filename", lambda: w._last_segment)
        g("commitlog-position", lambda: w._commitlog_position())
        g("manifest-version", lambda: w.manifest.version)
        g("processed-low-watermark", lambda: w.processed_low_watermark())

    def _channel_ids(self) -> List[str]:
        """Named fan-in offset channels present in the manifest."""
        out: set = set()
        for e in self.manifest.doc["partitions"].values():
            out.update(e.get("watermarks", {}))
        return sorted(out)

    def _commitlog_position(self):
        """Max applied LSN — scalar for single-source lakes; a per-channel
        dict for fan-in lakes (channel LSN domains are unrelated, so one
        cross-domain max would be meaningless)."""
        parts = self.manifest.doc["partitions"].values()
        chans = self._channel_ids()
        if not chans:
            return max((e["watermark"] for e in parts), default=-1)
        out = {
            s: max((e.get("watermarks", {}).get(s, -1) for e in parts),
                   default=-1)
            for s in chans
        }
        scalar = max((e["watermark"] for e in parts), default=-1)
        if scalar >= 0:
            out[""] = scalar
        return out

    def processed_low_watermark(self, source: str = "") -> int:
        """The MIN applied LSN across partitions — everything at or below
        it is durably in the lake on every partition. The source may trim
        segments whose max LSN is <= this (the reference pushes the same
        position back to XStream so the DB can purge,
        OracleStreamingChangeEventSource.java:92-127
        setProcessedLowWatermark); pair with ``on_segment_done`` for
        archive-after-apply. ``source`` selects a fan-in offset channel —
        each upstream shard trims against ITS OWN low watermark, computed
        over the partitions that shard has TOUCHED (a shard whose keys
        never route to some partitions would otherwise be pinned at -1
        forever). Meaningful after the shard's first full drain (every
        partition it routes to has an entry by then); as with the scalar
        signal, only trim segments already in the shard's done set."""
        from debezium_incubator_ray.stages.apply import channel_watermark

        parts = self.manifest.doc["partitions"].values()
        if source:
            touched = [
                e["watermarks"][source]
                for e in parts
                if source in e.get("watermarks", {})
            ]
            return min(touched) if touched else -1
        return min((channel_watermark(e, "") for e in parts), default=-1)

    def metrics(self) -> Dict[str, Any]:
        """Live metric snapshot (the engine's "endpoint"): gauges evaluated
        now + in-process counters. Cheap; poll per epoch. Historical,
        durable per-commit stats live in the lineage table
        (``manifest.lineage_table()``)."""
        return self._metrics.snapshot()

    def health(self) -> Dict[str, Any]:
        """Liveness/readiness summary — the reference's health-check
        surface (CassandraConnectorTaskHealthCheck.java:25-46: healthy =
        processor group running AND source queryable, message = a map of
        check-name -> bool). Here: healthy = persisted manifest CURRENT
        resolvable AND every committed run file present on the store.
        Cheap (existence probes only); poll alongside :meth:`metrics`."""
        checks: Dict[str, bool] = {}
        try:
            cur = self.manifest.store.read("CURRENT")
            checks["manifest-current"] = cur.strip().isdigit()
        except Exception:
            checks["manifest-current"] = False
        try:
            missing = [
                f for f in self.manifest.all_files()
                if not os.path.exists(os.path.join(self.lake_dir, f))
            ]
            checks["lake-files"] = not missing
        except Exception:
            checks["lake-files"] = False
        checks["snapshot-complete"] = bool(
            self.manifest.doc.get("snapshot_complete")
        )
        healthy = checks["manifest-current"] and checks["lake-files"]
        return {"healthy": healthy, "checks": checks}

    def _transfer_segments(
        self, binlog_dir: str, done_rel: List[str], error_rel: List[str]
    ) -> None:
        """Relocate segment files this lake is finished with
        (CommitLogTransfer.java:15-35; QueueProcessor.java:29-30 archive/
        error folders; BlackHoleCommitLogTransfer.java:14-24 deletes).
        Called strictly after the manifest flush that recorded the
        segments, so a crash between flush and move only re-skips them."""
        mode = self.cfg.segment_transfer
        if mode == "none":
            return
        base = self.cfg.relocation_dir or os.path.join(
            binlog_dir, "_relocation"
        )
        for rels, folder in ((done_rel, "archive"), (error_rel, "error")):
            for rel in rels:
                src = os.path.join(binlog_dir, rel)
                if not os.path.isfile(src):
                    continue
                if mode == "delete":
                    os.remove(src)
                else:
                    dst = os.path.join(base, folder, rel)
                    os.makedirs(os.path.dirname(dst), exist_ok=True)
                    shutil.move(src, dst)

    # ------------------------------------------------------------------
    # offset flush (manifest persistence)
    def _maybe_flush(self, events: int, force: bool = False) -> None:
        self._events_since_flush += events
        if force or self._flush_policy.should_flush(
            time.monotonic() - self._last_flush_t, self._events_since_flush
        ):
            self.flush()

    def flush(self) -> None:
        """Persist the current in-memory manifest version (no-op if clean)."""
        if self.manifest.dirty:
            self.manifest.persist()
        self._last_flush_t = time.monotonic()
        self._events_since_flush = 0

    # ------------------------------------------------------------------
    # single-writer guard (T2: FileOffsetWriter exclusive lock semantics).
    # Acquired lazily at first mutation so concurrent READERS never block.
    def _acquire_lock(self) -> None:
        if self._lock_fd is not None:
            return
        import fcntl

        path = os.path.join(self.lake_dir, "_manifest", "LOCK")
        fd = os.open(path, os.O_CREAT | os.O_RDWR, 0o644)
        try:
            fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
        except (BlockingIOError, OSError):
            os.close(fd)
            raise ConcurrentWriterError(
                f"another CdcEngine holds the writer lock for {self.lake_dir}"
            )
        os.write(fd, str(os.getpid()).encode())
        self._lock_fd = fd
        # we are now the only writer: clear staging orphans from any
        # crashed predecessor (their files were never committed)
        import shutil

        shutil.rmtree(os.path.join(self.lake_dir, "_staging"), ignore_errors=True)

    def close(self) -> None:
        if self._lock_fd is not None:
            try:
                self.flush()  # periodic mode: don't strand in-memory commits
            finally:
                try:
                    os.close(self._lock_fd)
                finally:
                    self._lock_fd = None

    def __del__(self):  # release on gc so tests / sequential engines work
        try:
            self.close()
        except Exception:
            pass  # interpreter teardown: builtins may already be gone

    # ------------------------------------------------------------------
    # snapshot phase (S3/S4, T5)
    def snapshot(
        self,
        source: Union[str, pa.Table, "ray.data.Dataset", None],
        snapshot_lsn: int = 0,
        row_filter=None,
    ) -> Dict[str, Any]:
        """Bulk-load the source table as op='r' events at ``snapshot_lsn``.

        Mode semantics mirror getSnapshottingTask
        (OracleSnapshotChangeEventSource.java:55-69) + snapshot modes
        (CassandraConnectorConfig.java:74-81): INITIAL skips if already
        complete, NEVER always skips, ALWAYS redoes. An empty source still
        marks completion (SnapshotProcessor.java:193-197).

        ``row_filter`` is Debezium's snapshot.select.statement.overrides as
        a vectorized predicate: a callable ``(pa.Table) -> BooleanArray``
        applied to each RAW source batch (before redaction transforms) —
        rows failing it never enter the lake. Filtered-out rows can still
        arrive later via stream events newer than the snapshot position.

        After a data snapshot, EVERY partition's watermark is floored at
        ``snapshot_lsn`` (not only partitions that received rows): the
        snapshot IS the table state at that position, so streaming resumes
        strictly after it table-wide — Debezium's snapshot→streaming
        handoff contract. A partition with no (surviving) snapshot rows
        provably had no live keys at the position, so pre-position stream
        events it would have replayed cannot change the final state.
        """
        self._acquire_lock()
        mode = self.cfg.snapshot_mode.upper()
        if mode == "NEVER" or (mode == "INITIAL" and self.manifest.doc["snapshot_complete"]):
            return {"skipped": True}
        if mode == "INITIAL_SCHEMA_ONLY":
            # Oracle's schema-only snapshot (OracleConnectorConfig
            # SnapshotMode.INITIAL_SCHEMA_ONLY): capture structure, load no
            # data — mark completion so streaming starts from the current
            # position; the lake begins empty
            self.manifest = self.manifest.commit(
                {},
                lineage=self._lineage("snapshot_schema_only", {}, 0, 0.0),
                snapshot={"complete": True, "lsn": snapshot_lsn},
            )
            self.flush()
            return {"skipped": True, "schema_only": True}
        if mode == "ALWAYS" and self.manifest.doc["snapshot_complete"]:
            # a redo with snapshot_lsn <= any applied watermark would be a
            # silent no-op (every row filtered as a duplicate) — the redo
            # must carry a strictly newer LSN to be real
            wms = [
                e["watermark"] for e in self.manifest.doc["partitions"].values()
            ] + [
                w
                for e in self.manifest.doc["partitions"].values()
                for w in e.get("watermarks", {}).values()
            ]  # a redo must outrank EVERY channel, not just the scalar
            top = max(wms) if wms else -1
            if snapshot_lsn <= top:
                raise ValueError(
                    f"snapshot_mode=ALWAYS redo with snapshot_lsn="
                    f"{snapshot_lsn} <= existing watermark {top}: every row "
                    "would be dropped as a duplicate and the lake never "
                    "refreshed — pass a snapshot_lsn above all watermarks"
                )
        if isinstance(source, str):
            ds = ray.data.read_parquet(source)
        elif isinstance(source, pa.Table):
            ds = ray.data.from_arrow(source)
        elif source is None:
            ds = None
        else:
            ds = source

        key, part_mode, P = self.cfg.key, self.cfg.partitioner, self.cfg.num_partitions
        key_cols = list(self.cfg.key_cols) if self.cfg.key_cols else None
        target_b64 = self.manifest.doc["schemas"][-1]["schema"]
        defaults = dict(self.manifest.doc["defaults"])

        from debezium_incubator_ray.stages.normalize import (
            apply_column_transforms, compile_column_transforms,
        )

        xforms = compile_column_transforms(
            self.cfg.column_transforms, set(key_cols or [key])
        )

        def to_events(batch: pa.Table) -> pa.Table:
            # align to the lake schema (drops blacklisted fields, backfills
            # evolved columns) before tagging as op='r' snapshot events
            from debezium_incubator_ray.envelope import composite_key

            if row_filter is not None:
                batch = batch.filter(row_filter(batch))
            batch = S.upgrade_table(batch, S.schema_from_b64(target_b64), defaults)
            n = batch.num_rows
            cols = {name: batch[name] for name in batch.column_names}
            if xforms:
                apply_column_transforms(cols, xforms)
            if key_cols:
                cols[key] = composite_key(batch, key_cols)
            cols["op"] = pa.array(["r"] * n, type=pa.string())
            cols[S.LSN] = pa.array([snapshot_lsn] * n, type=pa.int64())
            cols[S.PART] = pa.array(
                partition_ids(cols[key], P, part_mode), type=pa.int32()
            )
            return pa.table(cols)

        stats: Dict[str, Any] = {"skipped": False, "events": 0}
        self._snapshot_running = True
        t_snap0 = time.perf_counter()
        if ds is not None:
            # a from_arrow / single-file source arrives as one block; split it
            # so the snapshot load parallelizes across the cluster. Lazy
            # sources (read_parquet) raise on num_blocks() — they are
            # already file-parallel, leave them alone.
            nb = self.cfg.shuffle_blocks or min(self.cfg.num_partitions, 32)
            try:
                known = ds.num_blocks()
            except Exception:
                known = None
            if known is not None and known < nb:
                ds = ds.repartition(nb)
            flat = ds.map_batches(
                to_events, batch_format="pyarrow", zero_copy_batch=True,
                batch_size=self.cfg.read_batch_size,
            )
            commits = self._apply_shuffle(flat)
            stats["events"] = sum(c["events_in"] for c in commits)
            updates = self._partition_updates(commits)
            # table-wide handoff: floor every partition at the snapshot
            # position (mark-if-greater in manifest.commit keeps any
            # already-higher watermark)
            for p in range(self.cfg.num_partitions):
                updates.setdefault(p, {}).setdefault("watermark", snapshot_lsn)
        else:
            updates = {}
        # snapshot completion is structural: always persisted immediately
        self.manifest = self.manifest.commit(
            updates,
            lineage=self._lineage("snapshot", updates, stats["events"], 0.0),
            snapshot={"complete": True, "lsn": snapshot_lsn},
        )
        self.flush()
        self._snapshot_running = False
        self._snapshot_seconds = time.perf_counter() - t_snap0
        self._rows_scanned[self.cfg.table] = (
            self._rows_scanned.get(self.cfg.table, 0) + stats["events"]
        )
        return stats

    def snapshot_incremental(
        self,
        chunk_source,
        binlog_dir: Optional[str] = None,
        chunk_rows: int = 100_000,
    ) -> Dict[str, Any]:
        """Watermark-based INCREMENTAL snapshot: key-ordered chunks of the
        live source table are merged into the lake while streaming
        continues — Debezium's DDD-3 read-repair backfill (signal-driven
        incremental snapshots), re-expressed in this engine's LSN algebra.

        ``chunk_source(last_key, chunk_rows)`` must behave like the source
        database: return the CURRENT state of rows with key > last_key
        (key-ascending, at most chunk_rows), or None/empty when exhausted.

        Protocol per chunk:
          1. drain the binlog (stream position == partition watermarks);
          2. stamp the chunk read at read_lsn = max watermark — every event
             committed before the read has lsn <= read_lsn, so plain LWW
             gives Debezium's window semantics: the chunk row beats stale
             lake rows, any later stream event beats the chunk row;
          3. merge the chunk WITHOUT the watermark replay-filter (its LSN
             legitimately trails lagging partitions' watermarks) and
             WITHOUT advancing watermarks (chunks are read-repair, not
             stream progress);
          4. commit chunk files + the cursor (``inc_snapshot.last_key``)
             in one atomic manifest swap — a crash resumes from the last
             committed chunk; uncommitted chunk files stay invisible.

        Like the reference's incremental snapshot, rows deleted before
        the backfill started are repaired only if their delete event
        streams; a chunk cannot prove absence.
        """
        self._acquire_lock()
        if self.cfg.key_cols:
            raise NotImplementedError(
                "snapshot_incremental over a composite-PK table: the chunk "
                "cursor contract (key > last_key, key-ascending) is defined "
                "on the single key column — run a full snapshot instead"
            )
        if self._channel_ids():
            raise NotImplementedError(
                "snapshot_incremental on a fan-in lake: the chunk read_lsn "
                "(max watermark) is undefined across sources with unrelated "
                "LSN domains — backfill each upstream shard independently"
            )
        if self.cfg.merge_mode == "partial":
            raise NotImplementedError(
                "snapshot_incremental on a merge_mode='partial' lake: the "
                "per-cell merge applies patches unconditionally (epoch rows "
                "are guaranteed newer than the lake by the watermark), so a "
                "read-repair chunk whose LSN trails a lake row would "
                "clobber newer cells — run a full snapshot instead"
            )
        state = dict(
            self.manifest.doc.get("inc_snapshot")
            or {"last_key": None, "complete": False}
        )
        if state.get("complete"):
            return {"skipped": True, "chunks": 0, "rows": 0}
        t0 = time.perf_counter()
        key, part_mode, P = self.cfg.key, self.cfg.partitioner, self.cfg.num_partitions
        from debezium_incubator_ray.stages.normalize import (
            apply_column_transforms, compile_column_transforms,
        )

        inc_xforms = compile_column_transforms(self.cfg.column_transforms, {key})
        chunks = rows = 0
        self._snapshot_running = True
        try:
            while True:
                if binlog_dir is not None:
                    self.run(binlog_dir)
                read_lsn = max(
                    [e["watermark"] for e in self.manifest.doc["partitions"].values()]
                    + [self.manifest.doc.get("snapshot_lsn", -1), 0]
                )
                chunk = chunk_source(state["last_key"], chunk_rows)
                if chunk is None or chunk.num_rows == 0:
                    self.manifest = self.manifest.commit(
                        {},
                        lineage=self._lineage("inc_snapshot_done", {}, rows,
                                              time.perf_counter() - t0),
                        extra_state={"inc_snapshot": {**state, "complete": True}},
                    )
                    self.flush()
                    break
                chunk = chunk.sort_by([(key, "ascending")])
                target_b64 = self.manifest.doc["schemas"][-1]["schema"]
                defaults = dict(self.manifest.doc["defaults"])

                def to_events(batch: pa.Table, _lsn=read_lsn) -> pa.Table:
                    batch = S.upgrade_table(
                        batch, S.schema_from_b64(target_b64), defaults
                    )
                    n = batch.num_rows
                    cols = {name: batch[name] for name in batch.column_names}
                    if inc_xforms:
                        apply_column_transforms(cols, inc_xforms)
                    cols["op"] = pa.array(["r"] * n, type=pa.string())
                    cols[S.LSN] = pa.array([_lsn] * n, type=pa.int64())
                    cols[S.PART] = pa.array(
                        partition_ids(batch[key], P, part_mode), type=pa.int32()
                    )
                    return pa.table(cols)

                ds = ray.data.from_arrow(chunk)
                nb = self.cfg.shuffle_blocks or min(P, 32)
                if chunk.num_rows >= nb * 8192:
                    ds = ds.repartition(nb)
                flat = ds.map_batches(
                    to_events, batch_format="pyarrow", zero_copy_batch=True,
                    batch_size=self.cfg.read_batch_size,
                )
                commits = self._apply_shuffle(flat, watermark_filter=False)
                updates = self._partition_updates(commits)
                state = {
                    "last_key": chunk[key][-1].as_py(),
                    "complete": False,
                    "read_lsn": read_lsn,
                }
                self.manifest = self.manifest.commit(
                    updates,
                    lineage=self._lineage(
                        "inc_snapshot_chunk", updates, chunk.num_rows, 0.0
                    ),
                    extra_state={"inc_snapshot": state},
                )
                self.flush()
                chunks += 1
                rows += chunk.num_rows
                self._rows_scanned[self.cfg.table] = (
                    self._rows_scanned.get(self.cfg.table, 0) + chunk.num_rows
                )
        finally:
            self._snapshot_running = False
        return {
            "skipped": False, "chunks": chunks, "rows": rows,
            "seconds": time.perf_counter() - t0,
        }

    # ------------------------------------------------------------------
    # streaming phase: one micro-batch epoch
    def apply_epoch(
        self, binlog_dir: str, max_segments: Optional[int] = None,
        source: str = "",
    ) -> Dict[str, Any]:
        """One micro-batch epoch over ``binlog_dir``. ``source`` names an
        independent offset CHANNEL (sharded fan-in): its segments-done set,
        quarantine set and per-partition watermarks are tracked separately
        from every other channel, because different upstream shards carry
        unrelated LSN domains. Fan-in correctness requires disjoint key
        spaces across channels (see run_fan_in)."""
        self._acquire_lock()
        t0 = time.perf_counter()
        if source:
            done = list(
                self.manifest.doc.get("segments_done_by_source", {}).get(
                    source, []
                )
            ) + list(
                self.manifest.doc.get("segments_error_by_source", {}).get(
                    source, {}
                )
            )
        else:
            done = list(self.manifest.doc["segments_done"]) + list(
                self.manifest.doc.get("segments_error", {})
            )
        segs = binlog_src.plan_epoch(
            binlog_dir, done, max_segments, latest_only=self.cfg.latest_only
        )
        skipped_old: List[str] = []
        if self.cfg.latest_only and segs:
            # the skipped older segments are marked done too — the
            # reference's latest-commit-log mode never revisits them
            all_fresh = binlog_src.plan_epoch(binlog_dir, done, None)
            skipped_old = [s for s in all_fresh if s not in set(segs)]
        groups = binlog_src.group_by_partition(segs)
        binlog_p = binlog_src.binlog_partition_count(binlog_dir)
        aligned = (
            self.cfg.aligned_binlog != "never"
            and groups is not None
            and binlog_p == self.cfg.num_partitions
        )
        # per-segment quarantine: a corrupt segment is recorded + skipped
        # instead of failing the whole epoch. On the aligned path the probe
        # happens INSIDE the parallel tasks (the applier reports quarantined
        # segments in its commit record); only the exchange path pays a
        # driver-side footer probe, since its read_parquet would otherwise
        # fail the whole epoch.
        quarantined: Dict[str, str] = {}
        if not aligned:
            ok_segs: List[str] = []
            for s in segs:
                err = binlog_src.validate_segment(os.path.join(binlog_dir, s))
                if err is None:
                    ok_segs.append(s)
                else:
                    quarantined[s] = err
            segs = ok_segs
            groups = binlog_src.group_by_partition(segs)
        schema_update = self._pending_schema_update(binlog_dir)
        if not segs:
            # heartbeat: empty epochs still advance the manifest (the
            # reference's heartbeat records keep offsets moving,
            # OracleConnectorConfig.java:108-109)
            self.manifest = self.manifest.commit(
                {}, lineage=self._lineage("heartbeat", {}, 0, time.perf_counter() - t0),
                schema_update=schema_update,
                segments_error=quarantined or None,
                persist=schema_update is not None,  # schema history: durable
                source=source,
            )
            xfer = bool(quarantined) and self.cfg.segment_transfer != "none"
            self._maybe_flush(0, force=schema_update is not None or xfer)
            if quarantined:
                self._metrics.counter("number-of-unrecoverable-errors").inc(
                    len(quarantined)
                )
            self._transfer_segments(binlog_dir, [], list(quarantined))
            return {"segments": 0, "events": 0, "quarantined": len(quarantined)}

        if schema_update is not None:
            # activate pending schema version before normalization so the
            # whole epoch is upgraded to one target schema (SURVEY §7.3)
            self.manifest = self.manifest.commit({}, schema_update=schema_update)

        deferred: List[str] = []
        if aligned:
            commits = self._apply_aligned(binlog_dir, groups, source=source)
            for c in commits:
                quarantined.update(json.loads(c["quarantined_json"]))
                deferred.extend(json.loads(c.get("deferred_json") or "[]"))
        else:
            if self.cfg.transactional:
                raise ValueError(
                    "transactional=True requires a partition-aligned binlog "
                    "(the transaction gate defers whole SEGMENTS per "
                    "partition; the exchange path re-shuffles rows across "
                    "partitions and cannot defer segments soundly)"
                )
            if max_segments is not None and binlog_p != self.cfg.num_partitions:
                # watermark soundness (see ADVICE): the per-lake-partition
                # replay-dedup watermark requires non-decreasing LSNs per
                # lake partition ACROSS epochs. A partial epoch over a
                # binlog whose partitioning differs from the lake's drains
                # binlog partitions sequentially and can advance a lake
                # watermark past LSNs still unapplied in another binlog
                # partition — silent permanent loss. Full drains (one
                # epoch, no max_segments) are always sound.
                raise ValueError(
                    "apply_epoch(max_segments=...) over a binlog whose "
                    f"partition count ({binlog_p}) differs from the lake's "
                    f"({self.cfg.num_partitions}) would break per-partition "
                    "LSN monotonicity and silently drop events. Drain the "
                    "binlog in one epoch, or repartition it to match."
                )
            commits = self._apply_exchange_epoch(binlog_dir, segs, source=source)
        updates = self._partition_updates(commits)
        # delivered-event count: the aligned path reports raw pre-normalize
        # rows in its commit records (it already read the segments); the
        # exchange path falls back to footer counts (the combiner makes
        # commit-record rows an undercount there)
        if aligned:
            events = sum(c["delivered"] for c in commits)
        else:
            events = sum(
                pq.ParquetFile(os.path.join(binlog_dir, s)).metadata.num_rows
                for s in segs
            )
        # transactional mode: segments holding deferred (incomplete-tx) rows
        # are NOT done — they redeliver until the transaction completes, and
        # the watermark (advanced only over applied rows) dedups the rest
        undone = set(quarantined) | set(deferred)
        done_now = [s for s in segs if s not in undone] + skipped_old
        self.manifest = self.manifest.commit(
            updates,
            segments_done=done_now,
            lineage=self._lineage("epoch", updates, events, time.perf_counter() - t0),
            segments_error=quarantined or None,
            persist=False,  # _maybe_flush decides (offset-flush policy)
            source=source,
        )
        self._maybe_flush(events, force=self.cfg.segment_transfer != "none")
        self._metrics.counter("number-of-processed-mutations").inc(events)
        if quarantined:
            self._metrics.counter("number-of-unrecoverable-errors").inc(
                len(quarantined)
            )
        applied_now = [s for s in segs if s not in quarantined]
        if applied_now:
            self._last_segment = applied_now[-1]
        self._transfer_segments(binlog_dir, done_now, list(quarantined))
        folded = self._maybe_auto_compact()
        return {
            "segments": len(segs),
            "events": events,
            "applied": sum(c["events_applied"] for c in commits),
            "seconds": time.perf_counter() - t0,
            "quarantined": len(quarantined),
            "deferred": len(deferred),
            "done": len(done_now),
            "aligned": aligned,
            "compacted": folded,
        }

    def _norm_kwargs(self) -> Dict[str, Any]:
        return dict(
            schema_b64=self.manifest.doc["schemas"][-1]["schema"],
            key=self.cfg.key,
            key_cols=self.cfg.key_cols,
            num_partitions=self.cfg.num_partitions,
            partitioner=self.cfg.partitioner,
            defaults=self.manifest.doc["defaults"],
            field_blacklist=tuple(self.cfg.field_blacklist),
            table_include_regex=self.cfg.table_include_regex,
            default_at=self._default_at(),
            emit_set_mask=self.cfg.merge_mode == "partial",
            constraints=tuple(self.cfg.constraints),
            column_transforms=tuple(self.cfg.column_transforms),
            truncate_events=self.cfg.truncate_events,
        )

    def _default_at(self) -> Dict[str, int]:
        """Activation LSN per defaulted column (drives 'backfill only
        pre-evolution rows' in normalize — a post-evolution explicit NULL
        stays NULL)."""
        out: Dict[str, int] = {}
        ren = self.manifest.doc["defaults"].get(S.RENAMES_KEY) or {}
        for s in self.manifest.doc["schemas"]:
            for ch in s.get("changes", []):
                if ch.get("change") == "add_column":
                    # the history records the ORIGINAL name; a later
                    # rename moves the activation to the current name
                    out[ren.get(ch["column"], ch["column"])] = ch["at_lsn"]
        return out

    def _apply_exchange_epoch(
        self, binlog_dir: str, segs: List[str], source: str = ""
    ) -> List[Dict]:
        """The general path: read all segments → normalize → combiner →
        hash-partition exchange → stateful merge. Used when the binlog is
        not partition-aligned with the lake.

        Read, normalize and the in-batch LWW combiner run FUSED inside
        one task per segment group: Ray Data does not fuse ReadParquet
        with downstream map_batches in this version (separate operators
        let the streaming executor place each map on any node, shipping
        the raw decoded blocks — the heaviest bytes of the epoch —
        across the cluster; measured as the dominant cost of the objref
        epoch on the simulated 2-node cluster). Fusing pins each
        segment's bytes to exactly one task, so the only data that moves
        afterwards is the combined normalized block entering the
        exchange. Corrupt segments never reach this stage — the epoch
        driver footer-probes and quarantines them first."""
        key = self.cfg.key
        merge_partial = self.cfg.merge_mode == "partial"
        nk = self._norm_kwargs()
        read_batch = self.cfg.read_batch_size

        def read_norm_combine(batch: pa.Table) -> pa.Table:
            # ONE fused-reader kernel serves this Dataset flavor and the
            # objref raw task (stages/exchange.py read_normalize_combine)
            from debezium_incubator_ray.stages.exchange import (
                read_normalize_combine,
            )
            from debezium_incubator_ray.stages.normalize import (
                NormalizeEnvelope,
            )

            out = read_normalize_combine(
                batch["path"].to_pylist(), NormalizeEnvelope(**nk), key,
                merge_partial, read_batch,
            )
            return out if out is not None else pa.table({})

        salt_n = 0 if merge_partial else self._salt_decision()
        if self.cfg.exchange == "objref" and salt_n <= 1:
            # fully-fused flavor: read+normalize+combine+split in one raw
            # task; no intermediate Dataset at all
            return self._apply_shuffle_objref_paths(
                binlog_dir, segs, source=source
            )
        paths = [os.path.join(binlog_dir, s) for s in segs]
        items = [{"path": p} for p in paths]
        nb = max(1, min(len(items), (self.cfg.apply_concurrency or 16) * 4))
        flat = ray.data.from_items(
            items, override_num_blocks=nb
        ).map_batches(
            read_norm_combine, batch_format="pyarrow", zero_copy_batch=True,
        )
        if salt_n > 1:
            flat = self._salted_prereduce(flat, salt_n)
        return self._apply_shuffle(flat, source=source)

    def _salt_decision(self) -> int:
        """Salt-bucket count for THIS epoch: the manual override
        (salt_buckets > 1) always wins; otherwise auto-engage when the
        last committed epoch's lineage skew_ratio crossed
        salt_auto_threshold (north-rule skew handling as a feedback loop
        — lineage already measures rows-per-partition max/mean every
        commit). Records the decision on self._last_salt for the epoch's
        lineage row."""
        if self.cfg.salt_buckets > 1:
            self._last_salt = {"engaged": True, "buckets":
                               self.cfg.salt_buckets, "mode": "manual"}
            return self.cfg.salt_buckets
        thr = self.cfg.salt_auto_threshold
        prev_skew = None
        if thr is not None:
            for ent in reversed(self.manifest.doc.get("lineage", [])):
                # EPOCH lineage only: snapshot/compaction row counts
                # measure bulk-load layout, not hot-key event skew
                if ent.get("kind") == "epoch" and \
                        ent.get("partitions_touched", 0) > 0 and \
                        "skew_ratio" in ent:
                    prev_skew = ent["skew_ratio"]
                    break
        if prev_skew is not None and prev_skew >= thr:
            self._last_salt = {
                "engaged": True, "buckets": self.cfg.salt_auto_buckets,
                "mode": "auto", "prev_skew_ratio": round(prev_skew, 3),
            }
            return self.cfg.salt_auto_buckets
        self._last_salt = {"engaged": False, "mode": "auto",
                           "prev_skew_ratio": round(prev_skew, 3)
                           if prev_skew is not None else None}
        return 0

    def _global_pending_txs(
        self, binlog_dir: str, segs: List[str], source: str = ""
    ):
        """Epoch-global incomplete-transaction set (sorted int64 ids) via
        a distributed column-pruned pre-pass over the epoch's segments
        (stages/apply.py make_tx_meta_partial — only (source, tx_id,
        tx_events) leave storage; per-segment-complete transactions fold
        away inside the tasks, so the driver merge is segment-boundary-
        sized). Returns None when the segments carry no tx columns —
        the applier's per-partition path then raises its usual clear
        error. Global completeness is what lets a PK-update (rekey)
        transaction — d(old key) + c(new key) in DIFFERENT partitions —
        complete and apply atomically in one epoch commit
        (OracleConnectorIT.java:~420-456's key-change sequence)."""
        from debezium_incubator_ray.stages.apply import (
            channel_watermark, make_tx_meta_partial, merge_tx_partials,
        )

        if not segs:
            return None
        # footer precheck: without tx columns the pre-pass cannot run;
        # fall back so the applier raises its descriptive ValueError
        sch = None
        for s in segs:
            try:
                sch = pq.read_schema(os.path.join(binlog_dir, s))
                break
            except Exception:  # noqa: BLE001 — corrupt: applier quarantines
                continue
        if sch is None or "tx_id" not in sch.names \
                or "tx_events" not in sch.names:
            return None
        P = self.cfg.num_partitions
        wm = np.array(
            [channel_watermark(self.manifest.doc["partitions"][str(p)],
                               source)
             for p in range(P)],
            dtype=np.int64,
        )
        items = [{"path": s} for s in segs]
        nb = max(1, min(len(items), self.cfg.apply_concurrency or 16))
        rows = ray.data.from_items(
            items, override_num_blocks=nb
        ).map_batches(
            make_tx_meta_partial(binlog_dir, wm), batch_format="pyarrow",
        ).take_all()
        return merge_tx_partials(rows)

    def _apply_aligned(
        self, binlog_dir: str, groups: Dict[int, List[str]], source: str = ""
    ) -> List[Dict]:
        """Partition-aligned fast path: the binlog's p=<p> dirs map 1:1 to
        lake partitions, so the epoch needs NO exchange — one task per
        partition reads exactly its segments, normalizes, validates routing
        and merges (stages/apply.py AlignedSegmentApplier)."""
        from debezium_incubator_ray.stages.apply import AlignedSegmentApplier

        items = [
            {S.PART: p, "paths_json": json.dumps(groups[p])}
            for p in sorted(groups)
        ]
        ds = ray.data.from_items(items, override_num_blocks=len(items))
        # task pool, not an actor pool: each partition is exactly one batch,
        # so there is no per-actor state to amortize — and an autoscaling
        # actor pool's ramp-up (1 → c actors) wastes most of a short stage's
        # window at high parallelism (measured: the apply phase scaled 1.65x
        # from 2→8 CPUs as an actor pool). Plain tasks schedule elastically
        # from the first block; per-task ctor cost is ms (b64 schema parse).
        ctor = dict(
            manifest_doc=self.manifest.doc,
            lake_dir=self.lake_dir,
            binlog_dir=binlog_dir,
            norm_kwargs=self._norm_kwargs(),
            target_rows_per_file=self.cfg.target_rows_per_file,
            transactional=self.cfg.transactional,
            source=source,
        )
        if self.cfg.transactional:
            # transaction completeness is a GLOBAL property of the epoch
            # (a PK-update tx spans the two partitions its old and new
            # key hash to); the per-partition tasks only compute cutoffs
            # against this broadcast pending set
            segs = [s for p in sorted(groups) for s in groups[p]]
            pending = self._global_pending_txs(binlog_dir, segs, source)
            if pending is not None:
                ctor["pending_tx"] = pending

        def apply_one(batch: pa.Table) -> pa.Table:
            return AlignedSegmentApplier(**ctor)(batch)

        applied = ds.map_batches(
            apply_one,
            batch_format="pyarrow",
            num_cpus=self.cfg.apply_num_cpus,
        )
        return applied.take_all()

    def run(
        self, binlog_dir: str, max_segments_per_epoch: Optional[int] = None,
        source: str = "",
    ) -> List[Dict]:
        """Drain the binlog: epochs until no new segments (one-shot tail).

        Transactional mode can leave segments deferred (incomplete
        transactions at the stream head): the drain stops when an epoch
        makes NO progress — the caller re-runs when new segments complete
        those transactions. This IS tail() with zero polling."""
        return self.tail(
            binlog_dir, poll_interval_s=0.0, idle_polls=1,
            max_segments_per_epoch=max_segments_per_epoch, source=source,
        )

    def run_fan_in(self, binlogs: Dict[str, str]) -> Dict[str, List[Dict]]:
        """Sharded fan-in: several upstream binlogs (e.g. one per upstream
        database shard) feeding ONE lake table, each under its own named
        offset channel (per-source segments-done, quarantine and
        per-partition watermarks — independent LSN domains can never drop
        each other's events; cf. the multi-connector topologies the
        reference runs one task per source for, CassandraConnectorTask /
        OracleConnectorTask).

        REQUIRED invariant (the caller's contract, as upstream sharding
        guarantees in practice): key spaces are DISJOINT across sources —
        the engine has no cross-source LSN order, so two sources writing
        the same key would LWW-compare offsets from unrelated domains.
        Partition state (sorted runs) is shared; only offset tracking is
        per channel. Re-running any subset of sources is exactly-once per
        channel."""
        return {
            sid: self.run(d, source=sid) for sid, d in sorted(binlogs.items())
        }

    def tail(
        self,
        binlog_dir: str,
        poll_interval_s: float = 1.0,
        idle_polls: Optional[int] = None,
        max_epochs: Optional[int] = None,
        max_segments_per_epoch: Optional[int] = None,
        source: str = "",
        health_port: Optional[int] = None,
        health_host: str = "127.0.0.1",
        health_ssl: Optional[tuple] = None,
        stop=None,
        on_epoch=None,
    ) -> List[Dict]:
        """The directory-watcher lifecycle (AbstractDirectoryWatcher.java:
        40-53): drain, then poll for new segments, applying as they land.
        Stops after ``idle_polls`` consecutive no-progress epochs (None =
        only on ``max_epochs``) — production runs pass None and cancel
        externally; tests pass small numbers. Progress = anything that
        changes the next epoch's plan or the lake: rows applied, segments
        marked done, or segments quarantined. A pure heartbeat or a
        deferred-only transactional head makes no progress.

        ``health_port`` (0 = pick a free port) serves live /ping
        /buildinfo /health /metrics over HTTP for the duration of the
        tail — manifest version, per-partition watermarks, last-epoch
        counters (state/health.py; parity:
        CAS/CassandraConnectorTask.java:115-128,141-150). The bound port
        is exposed as ``self.health_server.port``.

        ``stop`` (a threading.Event) is the external-cancel hook for
        production tails running with ``idle_polls=None``: checked after
        every epoch and instead of sleeping out an idle poll — the tail
        finishes the in-flight epoch, flushes, and returns.

        ``on_epoch`` (a callable taking the epoch stats dict) runs after
        every PROGRESSING epoch — the hook that keeps derived state
        (e.g. a ``join_view`` refresh, a metrics push) continuously
        maintained while tailing; a no-progress poll does not fire it.
        It runs on the tail thread: a slow hook delays the next poll,
        and an exception aborts the tail (fail-loud — silently losing a
        view refresh would desynchronize the derived state)."""
        out: List[Dict] = []
        idle = 0
        events_total = 0
        applied_total = 0
        self.health_server = None
        if health_port is not None:
            from debezium_incubator_ray.state.health import (
                HealthServer, engine_snapshot,
            )

            # health_host="0.0.0.0" lets cluster jobs (ray job submit)
            # poll the endpoint from outside the node; health_ssl =
            # (certfile, keyfile) serves it over TLS (SslConfig.java
            # parity — state/health.py)
            cert, key = health_ssl or (None, None)
            self.health_server = HealthServer(
                port=health_port, host=health_host,
                ssl_certfile=cert, ssl_keyfile=key,
            ).start()
            self.health_server.update(
                engine_snapshot(self.manifest, 0, 0, 0, status="tailing")
            )
        try:
            while True:
                st = self.apply_epoch(
                    binlog_dir, max_segments_per_epoch, source=source
                )
                out.append(st)
                events_total += st.get("events", 0)
                # 'events' counts deliveries READ this epoch; 'applied'
                # counts events that actually merged (a transactional epoch
                # can read more than it applies) — report both, separately
                applied_total += st.get("applied", st.get("events", 0))
                if self.health_server is not None:
                    self.health_server.update(engine_snapshot(
                        self.manifest, len(out), events_total, applied_total,
                        last_epoch=st, status="tailing",
                    ))
                progressed = (
                    st.get("applied", 0) > 0
                    or st.get("done", 0) > 0
                    or st.get("quarantined", 0) > 0
                )
                # the hook fires BEFORE the break checks so the final
                # epoch's derived state is not left stale
                if progressed and on_epoch is not None:
                    on_epoch(st)
                if max_epochs is not None and len(out) >= max_epochs:
                    break
                if stop is not None and stop.is_set():
                    break
                if progressed:
                    idle = 0
                    continue
                idle += 1
                if idle_polls is not None and idle >= idle_polls:
                    break
                if stop is not None:
                    if stop.wait(poll_interval_s):
                        break
                else:
                    time.sleep(poll_interval_s)
            self.flush()
        finally:
            if self.health_server is not None:
                self.health_server.stop()
        return out

    # ------------------------------------------------------------------
    # lake maintenance
    def compact(self, min_files: int = 2) -> Dict[str, Any]:
        """Merge each partition's sorted runs into target-sized files —
        state-preserving (the lake reads byte-identically before and after).

        CDC epochs accrete sub-target runs (every copy-on-write rewrite can
        split, high-frequency epochs multiply); compaction re-chunks each
        partition in one pass and lazily upgrades old-schema files to the
        current version. Partitions with fewer than ``min_files`` runs and
        no stale-schema files are skipped (their bytes don't move). Old
        files remain for time-travel until :meth:`vacuum`.

        Runs one Ray task per eligible partition (same shape as the aligned
        apply path); the commit is one atomic manifest swap with unchanged
        watermarks, so a crash mid-compaction leaves the lake untouched.
        """
        self._acquire_lock()
        t0 = time.perf_counter()
        cur_schema_ver = self.manifest.doc["schemas"][-1]["version"]
        todo: List[int] = []
        files_before = 0
        for p in range(self.manifest.num_partitions):
            files = self.manifest.files(p)
            deltas = self.manifest.deltas(p)
            files_before += len(files) + len(deltas)
            stale = any(
                f.get("schema_version", 1) != cur_schema_ver
                for f in files + deltas
            )
            # merge-on-read deltas always fold (that's what compaction is
            # FOR in mor mode — restore read-optimal base runs)
            if (files or deltas) and (
                len(files) >= min_files or stale or deltas
            ):
                todo.append(p)
        if not todo:
            return {
                "partitions_compacted": 0,
                "files_before": files_before,
                "files_after": files_before,
                "seconds": time.perf_counter() - t0,
            }
        self._compact_partitions(todo, t0)
        files_after = sum(
            len(self.manifest.files(p)) + len(self.manifest.deltas(p))
            for p in range(self.manifest.num_partitions)
        )
        return {
            "partitions_compacted": len(todo),
            "files_before": files_before,
            "files_after": files_after,
            "seconds": time.perf_counter() - t0,
        }

    def _compact_partitions(self, todo: List[int], t0: float) -> None:
        """Run the Compactor over ``todo`` partitions and commit the new
        run lists (one atomic manifest swap, watermarks unchanged)."""
        from debezium_incubator_ray.stages.apply import Compactor

        items = [{S.PART: p} for p in todo]
        ds = ray.data.from_items(items, override_num_blocks=len(items))
        ctor = dict(
            manifest_doc=self.manifest.doc,
            lake_dir=self.lake_dir,
            target_rows_per_file=self.cfg.target_rows_per_file,
        )

        def compact_one(batch: pa.Table) -> pa.Table:
            return Compactor(**ctor)(batch)

        commits = ds.map_batches(
            compact_one, batch_format="pyarrow", num_cpus=self.cfg.apply_num_cpus
        ).take_all()
        updates = self._partition_updates(commits)
        self.manifest = self.manifest.commit(
            updates,
            lineage=self._lineage(
                "compact", updates, 0, time.perf_counter() - t0
            ),
            persist=True,
        )

    def _maybe_auto_compact(self) -> int:
        """MoR auto-compaction: fold partitions whose outstanding delta-run
        count reached ``cfg.mor_compact_deltas``. Called after each epoch
        commit — bounds read amplification to O(threshold) delta merges per
        scan without the operator scheduling compactions by hand. Returns
        the number of partitions folded."""
        thr = self.cfg.mor_compact_deltas
        if self.cfg.sink_mode != "mor" or not thr:
            return 0
        todo = [
            p
            for p in range(self.manifest.num_partitions)
            if len(self.manifest.deltas(p)) >= thr
        ]
        if todo:
            self._compact_partitions(todo, time.perf_counter())
        return len(todo)

    def vacuum(self, keep_versions: int = 1) -> Dict[str, int]:
        """Expire time-travel history: keep only the newest
        ``keep_versions`` manifest versions and delete data files that no
        retained version references.

        Copy-on-write never deletes or overwrites data files, so every
        superseded run stays on disk for :meth:`read_lake`'s
        ``version=`` reads until vacuumed. The current version is always
        retained. (Driver-side listing: the walk is over this table's lake
        directory — bounded by run count, not data size; on an object
        store this becomes a prefix LIST.)
        """
        self._acquire_lock()
        self.flush()  # current in-memory state must be durable first
        ms = self.manifest
        vs = ms.versions()
        keep = set(vs[-max(1, keep_versions):]) | {ms.version}
        # the outbox cursor's version must stay readable or export_changes
        # can never diff forward again (a wedged outbox). To truly forget
        # (erasure), export first or clear the outbox state.
        cursor = (ms.doc.get("outbox") or {}).get("exported_version")
        if cursor is not None and cursor in vs:
            keep.add(cursor)
        referenced = set()
        for v in sorted(keep):
            raw = ms.store.read(f"v{v}.json")
            if raw is None:
                continue
            doc = json.loads(raw)
            for part in doc["partitions"].values():
                for f in part["files"] + part.get("deltas", []):
                    referenced.add(f["path"])
                    if f.get("bloom"):
                        referenced.add(f["path"] + ".bloom")
        removed_files = 0
        data_root = os.path.join(self.lake_dir, "data")
        for dirpath, _dirs, names in os.walk(data_root) if os.path.isdir(data_root) else []:
            for n in names:
                full = os.path.join(dirpath, n)
                rel = os.path.relpath(full, self.lake_dir)
                if rel not in referenced:
                    os.remove(full)
                    removed_files += 1
        removed_versions = 0
        for v in vs:
            if v not in keep:
                ms.store.delete(f"v{v}.json")
                removed_versions += 1
        return {
            "removed_files": removed_files,
            "removed_versions": removed_versions,
            "kept_versions": len(keep),
        }

    def clone(self, dst_dir: str) -> "CdcEngine":
        """Zero-copy lake branch: create an independent lake at
        ``dst_dir`` whose CURRENT version references HARDLINKS of this
        lake's data files — an O(files) metadata operation, no data
        bytes move (Iceberg-style snapshot branching; falls back to
        copy across devices). Copy-on-write makes it sound: neither
        lake ever mutates a data file, epochs on either side write new
        runs into their own directory, and one side's vacuum only
        unlinks its own directory entries (the inode survives while the
        other lake references it).

        The branch starts at this lake's exact stream position — same
        watermarks and segments_done — so re-delivering already-applied
        segments to the clone is a no-op and fresh segments apply
        normally. Time-travel history is NOT cloned (only the current
        version's files are linked); the clone's history starts at the
        branch point."""
        from debezium_incubator_ray.state.store import LocalFsStore

        self._acquire_lock()
        self.flush()
        if os.path.isdir(os.path.join(dst_dir, "_manifest")):
            raise ValueError(f"clone destination {dst_dir} is already a lake")
        os.makedirs(os.path.join(dst_dir, "data"), exist_ok=True)
        os.makedirs(os.path.join(dst_dir, "_manifest"), exist_ok=True)
        ms = self.manifest
        n_files = 0
        for rel in ms.all_files():
            src = os.path.join(self.lake_dir, rel)
            dst = os.path.join(dst_dir, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            # bloom sidecars branch with their runs (same inode-refcount
            # safety: neither lake ever rewrites a sidecar in place)
            pairs = [(src, dst)]
            if os.path.exists(src + ".bloom"):
                pairs.append((src + ".bloom", dst + ".bloom"))
            for s_, d_ in pairs:
                try:
                    os.link(s_, d_)
                except OSError:  # cross-device: degrade to a copy
                    shutil.copy2(s_, d_)
            n_files += 1
        doc = json.loads(json.dumps(ms.doc))
        doc["lineage"] = (doc["lineage"] + [{
            "kind": "clone",
            "from": self.lake_dir,
            "version": doc["version"],
        }])[-50:]
        m2 = Manifest(
            dst_dir, doc,
            store=LocalFsStore(os.path.join(dst_dir, "_manifest")),
        )
        m2._write()
        return CdcEngine(dst_dir)

    def reshard(self, new_num_partitions: int) -> Dict[str, Any]:
        """Re-partition the lake in place: P -> P' with the SAME
        partitioner mode — the online re-shard a growing (or shrinking)
        table needs when per-partition state outgrows a worker. The
        reference has no analog (single process, no partitions); this is
        pure scale surface.

        Two-stage exchange, one atomic manifest swap:
          1. one task per OLD partition folds its state (base runs ⊕
             MoR deltas, lazily schema-upgraded — the compact() read
             path), routes rows by the new partition id and stages one
             sorted run per (old, new) pair;
          2. one task per NEW partition concatenates its staged runs,
             key-sorts once and writes final target-sized runs.
        Until the final commit the lake reads byte-identically from the
        previous manifest version; a crash mid-reshard leaves only
        unreferenced staging files (removed by vacuum).

        Watermark contract: the new per-partition watermark (per offset
        channel) is the MIN of the old ones — everything at or below it
        is provably applied. Fresh segments only carry LSNs above their
        binlog partition's old watermark (segment-level dedup via
        segments_done is unchanged), so normal operation never
        redelivers; an operator-forced segment REPLAY may redeliver
        events between min and the old watermark, which re-apply
        idempotently under full-row LWW and per-cell LWW (same lsn ->
        same winner). COUNTER columns are additive — a replayed
        contribution double-counts — so counter lakes refuse to reshard.
        After resharding, epochs over a binlog laid out for the old P
        take the exchange path automatically (aligned detection compares
        against the manifest's num_partitions)."""
        import uuid as _uuid

        import numpy as np

        from collections import defaultdict

        from debezium_incubator_ray.stages.apply import read_partition_state

        self._acquire_lock()
        self.flush()
        t0 = time.perf_counter()
        ms = self.manifest
        old_p = ms.num_partitions
        new_p = int(new_num_partitions)
        if new_p < 1:
            raise ValueError(f"new_num_partitions must be >= 1, got {new_p}")
        if new_p == old_p:
            return {"num_partitions": old_p, "moved_rows": 0,
                    "seconds": round(time.perf_counter() - t0, 4)}
        doc = ms.doc
        parts = doc["partitions"]
        scalar_wms = [ent["watermark"] for ent in parts.values()]
        sources = sorted({
            s for ent in parts.values()
            for s in (ent.get("watermarks") or {})
        })
        if doc.get("counter_cols"):
            raise RuntimeError(
                "reshard refuses counter-column lakes: counter folds are "
                "additive, so a segment replay after the min-watermark "
                "reset would double-count contributions between the min "
                "and a partition's old watermark. Export + rebuild, or "
                "drop the counter columns first."
            )

        ctor = dict(
            manifest_doc=doc,
            lake_dir=self.lake_dir,
            target_rows_per_file=self.cfg.target_rows_per_file,
        )
        partitioner = doc.get("partitioner", "hash")
        stage_ver = doc["version"] + 1
        lake_dir = self.lake_dir

        def split_one(batch: pa.Table) -> pa.Table:
            inner = PartitionApplier(**ctor)
            qs_out: List[int] = []
            paths_out: List[str] = []
            rows_out: List[int] = []
            for p in batch[S.PART].to_pylist():
                ent = inner.doc["partitions"][str(p)]
                merged = read_partition_state(
                    ent, inner.lake_dir, inner.schema, inner.defaults,
                    inner.schema_version, inner.key,
                    keep_tombstones=inner.keep_tombstones,
                    counter_cols=inner.counter_cols,
                )
                if merged.num_rows == 0:
                    continue
                q = partition_ids(
                    merged[inner.key].combine_chunks(), new_p, partitioner
                )
                order = np.argsort(q, kind="stable")
                merged = merged.take(pa.array(order))
                qs = q[order]
                starts = np.flatnonzero(np.r_[True, qs[1:] != qs[:-1]])
                bounds = np.r_[starts, len(qs)]
                for i, s0 in enumerate(starts):
                    qq = int(qs[s0])
                    chunk = merged.slice(int(s0), int(bounds[i + 1] - s0))
                    rel = (
                        f"data/reshard-v{stage_ver:06d}/q={qq}/"
                        f"from-p{int(p)}-{_uuid.uuid4().hex}.parquet"
                    )
                    full = os.path.join(lake_dir, rel)
                    os.makedirs(os.path.dirname(full), exist_ok=True)
                    pq.write_table(chunk, full)
                    qs_out.append(qq)
                    paths_out.append(rel)
                    rows_out.append(chunk.num_rows)
            return pa.table({
                "q": pa.array(qs_out, pa.int64()),
                "path": pa.array(paths_out, pa.string()),
                "rows": pa.array(rows_out, pa.int64()),
            })

        staged = (
            ray.data.from_items(
                [{S.PART: p} for p in range(old_p)],
                override_num_blocks=old_p,
            )
            .map_batches(split_one, batch_format="pyarrow",
                         num_cpus=self.cfg.apply_num_cpus)
            .take_all()
        )  # metadata rows: <= old_P x new_P entries
        by_q: Dict[int, List[str]] = defaultdict(list)
        moved_rows = 0
        for r in staged:
            by_q[int(r["q"])].append(r["path"])
            moved_rows += int(r["rows"])

        def merge_one(batch: pa.Table) -> pa.Table:
            inner = PartitionApplier(**ctor)
            out_q: List[int] = []
            out_files: List[str] = []
            for i in range(batch.num_rows):
                q = int(batch["q"][i].as_py())
                paths = batch["paths"][i].as_py()
                tbls = [
                    pq.read_table(os.path.join(lake_dir, rel))
                    for rel in paths
                ]
                merged = pa.concat_tables(tbls).sort_by(
                    [(inner.key, "ascending")]
                )
                entries = inner._write_run(q, merged)
                out_q.append(q)
                out_files.append(json.dumps(entries))
            return pa.table({
                "q": pa.array(out_q, pa.int64()),
                "files_json": pa.array(out_files, pa.string()),
            })

        items = [
            {"q": q, "paths": ps} for q, ps in sorted(by_q.items())
        ]
        files_by_q: Dict[int, List[Dict]] = {}
        if items:
            merged_meta = (
                ray.data.from_items(
                    items, override_num_blocks=len(items)
                )
                .map_batches(merge_one, batch_format="pyarrow",
                             num_cpus=self.cfg.apply_num_cpus)
                .take_all()
            )
            for r in merged_meta:
                files_by_q[int(r["q"])] = json.loads(r["files_json"])

        min_scalar = min(scalar_wms) if scalar_wms else -1
        src_mins = {
            s: min(
                (ent.get("watermarks") or {}).get(s, -1)
                for ent in parts.values()
            )
            for s in sources
        }
        new_parts: Dict[str, Dict[str, Any]] = {}
        for q in range(new_p):
            e: Dict[str, Any] = {
                "watermark": min_scalar,
                "files": files_by_q.get(q, []),
            }
            if src_mins:
                e["watermarks"] = dict(src_mins)
            new_parts[str(q)] = e
        secs = time.perf_counter() - t0
        self.manifest = ms.commit(
            {},
            extra_state={
                "partitions": new_parts,
                "num_partitions": new_p,
            },
            lineage=self._lineage(
                "reshard",
                {int(q): {"files": files_by_q.get(int(q), []),
                          "watermark": min_scalar}
                 for q in range(new_p)},
                0,
                secs,
            ),
            persist=True,
        )
        self.cfg.num_partitions = new_p
        # staging files are unreferenced by every manifest version: drop
        # them now that the swap is durable (vacuum would also catch them)
        shutil.rmtree(
            os.path.join(lake_dir, "data", f"reshard-v{stage_ver:06d}"),
            ignore_errors=True,
        )
        return {
            "num_partitions": new_p,
            "moved_rows": moved_rows,
            "seconds": round(secs, 4),
        }

    def update_rows(self, predicate, updates: Dict[str, Any],
                    zone=None) -> Dict[str, Any]:
        """Predicate UPDATE (``UPDATE ... SET col = expr(row) WHERE
        pred(row)``) as state surgery: every partition sweeps its runs in
        one Ray task, rewriting only runs with matching rows — runs the
        predicate provably can't touch are carried untouched, and a
        ``zone=(column, lo, hi)`` bound against a ``stats_columns``
        zone map skips disjoint runs UNREAD. ``predicate`` is
        table -> bool mask; ``updates`` maps column -> (table -> new
        values), applied only where the mask holds (cast to the column's
        type).

        Semantics: UPDATE is not a stream event — ``_lsn`` keeps its
        value and watermarks don't move, so a later higher-LSN event
        legally overwrites the assignment; superseded files stay for
        time-travel until vacuum. The key column is immutable (routing +
        run-sort invariants) and per-cell-merge lakes refuse (a patch
        row's unset cells ignore value columns — the assignment would be
        silently lost on fold)."""
        if self.cfg.key in updates or (
            self.cfg.key_cols and set(updates) & set(self.cfg.key_cols)
        ):
            raise ValueError("update_rows cannot modify key columns")
        if self.manifest.doc.get("merge_mode", "lww") != "lww":
            raise RuntimeError(
                "update_rows requires merge_mode='lww': partial-merge "
                "patch rows ignore unset cells, so the assignment would "
                "be lost on fold"
            )
        self._acquire_lock()
        t0 = time.perf_counter()
        self.flush()
        from debezium_incubator_ray.stages.apply import RowUpdater

        items = [{S.PART: p} for p in range(self.cfg.num_partitions)]
        ds = ray.data.from_items(items, override_num_blocks=len(items))
        ctor = dict(
            manifest_doc=self.manifest.doc,
            lake_dir=self.lake_dir,
            predicate=predicate,
            updates=updates,
            zone=zone,
            target_rows_per_file=self.cfg.target_rows_per_file,
        )

        def update_one(batch: pa.Table) -> pa.Table:
            return RowUpdater(**ctor)(batch)

        commits = ds.map_batches(
            update_one, batch_format="pyarrow",
            num_cpus=self.cfg.apply_num_cpus,
        ).take_all()
        n_updated = sum(c["events_applied"] for c in commits)
        updates_m = self._partition_updates(commits)
        self.manifest = self.manifest.commit(
            updates_m,
            lineage=self._lineage(
                "update", updates_m, n_updated, time.perf_counter() - t0
            ),
            persist=True,
        )
        return {
            "updated_rows": n_updated,
            "partitions": self.cfg.num_partitions,
            "seconds": round(time.perf_counter() - t0, 4),
        }

    def merge_into(
        self,
        source,
        when_matched: str = "update",
        when_not_matched: str = "insert",
    ) -> Dict[str, Any]:
        """SQL ``MERGE INTO`` / Delta-style conditional upsert from an
        arbitrary dataset, expressed as ONE synthetic partition-aligned
        epoch so exactly-once, lineage, time travel and replay semantics
        all hold for merges exactly as they do for the change stream.

        ``source`` (ray Dataset or pyarrow Table) must carry the key
        column plus any subset of payload columns; each source row is
        classified against the LIVE lake state of its partition:

        - matched (key exists live): ``when_matched`` = "update" emits a
          full-row 'u' (absent payload columns become their default/NULL —
          LWW replaces the whole row; on a ``merge_mode='partial'`` lake
          only the provided columns patch), "delete" emits 'd', "skip"
          drops the row;
        - not matched: ``when_not_matched`` = "insert" emits 'c', "skip"
          drops the row.

        The merge is stamped at LSN = max(all partition watermarks,
        every channel) + 1 and applied on its own offset channel
        ("_merge"), so it wins the per-key LWW fold against everything
        applied so far, while stream events with higher — or EQUAL —
        LSNs still legally overwrite it later (the next undelivered
        stream event may carry exactly this LSN; equal-LSN ties resolve
        to the later-applied writer, see merge_lww). Duplicate keys in
        ``source`` raise (ANSI MERGE: a target row may be touched at
        most once).

        Distributed shape: the SOURCE (small side) shuffles once by
        key-hash into lake partitions; one task per touched partition
        probes live keys (key column only, pruned read), builds envelope
        segments, and the normal aligned apply does the copy-on-write
        merge. The lake itself never moves. Composite-PK lakes route and
        match on the internal ``_key`` encoding (source must carry every
        key component, non-null). Counter lakes refuse ('u' SUMS there —
        "update" would add, not replace).

        The reference reaches merged state only by replaying a change
        stream through the same envelope machinery
        (RecordMaker.java:36-58); this is that path, driven from a
        one-shot dataset.
        """
        if when_matched not in ("update", "delete", "skip"):
            raise ValueError(f"when_matched: {when_matched!r}")
        if when_not_matched not in ("insert", "skip"):
            raise ValueError(f"when_not_matched: {when_not_matched!r}")
        if when_matched == "skip" and when_not_matched == "skip":
            raise ValueError("merge_into with both actions 'skip' is a no-op")
        if self.cfg.counter_cols:
            raise RuntimeError(
                "merge_into on a counter lake would SUM updates instead of "
                "replacing rows; apply deltas through the stream instead"
            )
        from debezium_incubator_ray.envelope import build_envelopes, composite_key

        self._acquire_lock()
        t0 = time.perf_counter()
        self.flush()
        if isinstance(source, pa.Table):
            source = ray.data.from_arrow(source)
        key = self.cfg.key
        P = self.cfg.num_partitions
        # composite PK: route and match on the internal _key encoding
        # (the single definition in envelope.composite_key), exactly as
        # normalize/snapshot/lookup do
        kcols = list(self.cfg.key_cols) if self.cfg.key_cols else [key]
        schema = S.schema_from_b64(self.manifest.doc["schemas"][-1]["schema"])
        src_names = source.schema().names
        missing_k = [c for c in kcols if c not in src_names]
        if missing_k:
            raise ValueError(f"source lacks key column(s) {missing_k}")
        unknown = [c for c in src_names if c not in schema.names]
        if unknown:
            raise ValueError(f"source columns not in the lake schema: {unknown}")
        # payload columns the source provides, in lake-schema order —
        # absent columns are OMITTED from the envelope struct so normalize
        # backfills their defaults (or NULL), same as an old-writer event
        provided = [f.name for f in schema if f.name in set(src_names)]
        env_schema = pa.schema([schema.field(c) for c in provided])
        # the merge LSN: strictly above every applied LSN on every channel
        base_lsn = 0
        for p in range(P):
            ent = self.manifest.doc["partitions"][str(p)]
            base_lsn = max(base_lsn, ent["watermark"] + 1)
            for wm in ent.get("watermarks", {}).values():
                base_lsn = max(base_lsn, wm + 1)
        # per-partition segment numbering continues across merges (the
        # "_merge" channel's done AND error sets store relpaths; a reused
        # name would be treated as already consumed and silently skipped)
        done = list(
            self.manifest.doc.get("segments_done_by_source", {}).get(
                "_merge", []
            )
        ) + list(
            self.manifest.doc.get("segments_error_by_source", {}).get(
                "_merge", {}
            )
        )
        next_seg = {
            p: sum(1 for s in done if s.startswith(f"p={p}/")) for p in range(P)
        }
        # staging lives under the lake (shared storage on a multi-node
        # cluster — build_one tasks run on workers; a driver-local /tmp
        # would silently apply nothing there)
        os.makedirs(os.path.join(self.lake_dir, "_staging"), exist_ok=True)
        tmp = tempfile.mkdtemp(
            prefix="merge-", dir=os.path.join(self.lake_dir, "_staging")
        )
        doc = self.manifest.doc
        lake_dir = self.lake_dir
        defaults = doc["defaults"]
        schema_version = doc["schemas"][-1]["version"]
        table_name = self.cfg.table
        partitioner = self.cfg.partitioner

        def routing_key(t: pa.Table) -> pa.Array:
            if len(kcols) > 1:
                return composite_key(t, kcols)
            col = t[kcols[0]]
            return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col

        def add_part(t: pa.Table) -> pa.Table:
            from debezium_incubator_ray.hashing import partition_ids

            k = routing_key(t)
            if k.null_count:
                raise ValueError(
                    "merge_into source has NULL key component(s) — such "
                    "rows are unroutable"
                )
            return t.append_column(
                "_part", pa.array(partition_ids(k, P, partitioner))
            )

        def build_one(g: pa.Table) -> pa.Table:
            from debezium_incubator_ray.stages.apply import read_partition_state

            p = int(g["_part"][0].as_py())
            keys = routing_key(g)
            if pc.count_distinct(keys).as_py() != len(keys):
                raise ValueError(
                    "merge_into source holds duplicate keys (ANSI MERGE: "
                    "each target row may be touched at most once)"
                )
            live = read_partition_state(
                doc["partitions"][str(p)], lake_dir, schema, defaults,
                schema_version, key, columns=list(kcols),
            )
            # composite lakes persist the _key side column in every run —
            # reuse it instead of re-encoding all live component columns
            lkey = (
                live[key].combine_chunks()
                if key in live.column_names else routing_key(live)
            )
            matched = pc.is_in(keys, value_set=lkey)
            n_match = int(pc.sum(pc.cast(matched, pa.int64())).as_py() or 0)
            ops = np.where(
                matched.to_numpy(zero_copy_only=False),
                {"update": "u", "delete": "d", "skip": ""}[when_matched],
                {"insert": "c", "skip": ""}[when_not_matched],
            )
            keep = ops != ""
            out = {
                "_part": pa.array([p], pa.int32()),
                "matched": pa.array([n_match], pa.int64()),
                "updated": pa.array(
                    [n_match if when_matched == "update" else 0], pa.int64()
                ),
                "deleted": pa.array(
                    [n_match if when_matched == "delete" else 0], pa.int64()
                ),
                "inserted": pa.array(
                    [int(len(g)) - n_match
                     if when_not_matched == "insert" else 0],
                    pa.int64(),
                ),
                "skipped": pa.array([int((~keep).sum())], pa.int64()),
            }
            g = g.filter(pa.array(keep))
            ops = ops[keep]
            after = pa.table(
                {c: pc.cast(g[c].combine_chunks(), env_schema.field(c).type)
                 for c in provided},
                schema=env_schema,
            )
            # before image: key components only (deletes extract their key
            # from it; the true prior image is unknown to a one-shot merge)
            before = pa.table(
                {c: after[c] if c in set(kcols)
                 else pa.nulls(len(after), env_schema.field(c).type)
                 for c in provided},
                schema=env_schema,
            )
            env = build_envelopes(
                pa.array(ops, pa.string()), after, before,
                np.full(len(after), p, dtype=np.int32),
                np.full(len(after), base_lsn, dtype=np.int64),
                table_name,
            )
            pdir = os.path.join(tmp, f"p={p}")
            os.makedirs(pdir, exist_ok=True)
            pq.write_table(
                env, os.path.join(pdir, f"seg-{next_seg[p]:05d}.parquet")
            )
            return pa.table(out)

        try:
            counts = (
                source.map_batches(
                    add_part, batch_format="pyarrow", zero_copy_batch=True
                )
                .groupby("_part")
                .map_groups(build_one, batch_format="pyarrow")
                .take_all()
            )
            # alignment requires every p= dir present: empty segments for
            # partitions the source never touched
            touched = {int(c["_part"]) for c in counts}
            empty_env = build_envelopes(
                pa.array([], pa.string()),
                env_schema.empty_table(),
                env_schema.empty_table(),
                np.array([], dtype=np.int32),
                np.array([], dtype=np.int64),
                table_name,
            )
            for p in range(P):
                if p not in touched:
                    pdir = os.path.join(tmp, f"p={p}")
                    os.makedirs(pdir, exist_ok=True)
                    pq.write_table(
                        empty_env,
                        os.path.join(pdir, f"seg-{next_seg[p]:05d}.parquet"),
                    )
            res = self.apply_epoch(tmp, source="_merge")
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        return {
            "matched": sum(c["matched"] for c in counts),
            "updated": sum(c["updated"] for c in counts),
            "deleted": sum(c["deleted"] for c in counts),
            "inserted": sum(c["inserted"] for c in counts),
            "skipped": sum(c["skipped"] for c in counts),
            "lsn": base_lsn,
            "applied": res.get("applied", 0),
            "seconds": round(time.perf_counter() - t0, 4),
        }

    def erase_keys(self, keys, vacuum_history: bool = False) -> Dict[str, Any]:
        """Right-to-be-forgotten: remove the given keys' rows from the lake
        (base and merge-on-read delta runs), rewriting ONLY the runs whose
        key range intersects — O(affected runs), never O(lake). One Ray task
        per affected partition; one atomic manifest commit.

        Erasure is state surgery, not a delete event: watermarks don't
        move, nothing is tombstoned, and a later event with a higher LSN
        re-creates the key. Superseded files still hold the data for
        time-travel until vacuum — pass ``vacuum_history=True`` to expire
        history to the post-erasure version in the same call (the actual
        forget point)."""
        self._acquire_lock()
        t0 = time.perf_counter()
        self.flush()
        keys = self._resolve_keys(keys, self.manifest.current_schema())
        karr = pa.array(keys) if not isinstance(keys, (pa.Array, pa.ChunkedArray)) else keys
        parts = partition_ids(karr, self.cfg.num_partitions, self.cfg.partitioner)
        by_p: Dict[int, List[Any]] = {}
        for k, p in zip(karr.to_pylist(), parts):
            by_p.setdefault(int(p), []).append(k)
        if not by_p:
            return {"erased_rows": 0, "partitions": 0}
        from debezium_incubator_ray.stages.apply import KeyEraser

        items = [{S.PART: p} for p in sorted(by_p)]
        ds = ray.data.from_items(items, override_num_blocks=len(items))
        ctor = dict(
            manifest_doc=self.manifest.doc,
            lake_dir=self.lake_dir,
            keys_by_partition=by_p,
            target_rows_per_file=self.cfg.target_rows_per_file,
        )

        def erase_one(batch: pa.Table) -> pa.Table:
            return KeyEraser(**ctor)(batch)

        commits = ds.map_batches(
            erase_one, batch_format="pyarrow", num_cpus=self.cfg.apply_num_cpus
        ).take_all()
        erased = sum(c["events_applied"] for c in commits)
        updates = self._partition_updates(commits)
        self.manifest = self.manifest.commit(
            updates,
            lineage=self._lineage("erase", updates, erased, time.perf_counter() - t0),
            persist=True,
        )
        out = {"erased_rows": erased, "partitions": len(by_p)}
        if vacuum_history:
            out["vacuum"] = self.vacuum(keep_versions=1)
        return out

    def erase_key_range(
        self, lo, hi, vacuum_history: bool = False
    ) -> Dict[str, Any]:
        """Erase every live row with ``lo <= key <= hi`` — the Cassandra
        range-tombstone / partition-delete analog (a whole clustering
        range dies at once), expressed as state surgery like
        ``erase_keys``. The key hash-routes, so every partition sweeps its
        runs; the key-sorted run bounds make the sweep cheap: disjoint
        runs carry untouched, runs wholly inside the range drop UNREAD,
        only straddling runs are rewritten. Watermarks don't move; a later
        higher-LSN event legally re-creates a key; superseded files hold
        the data for time-travel until vacuum (``vacuum_history=True``
        chains it — the actual forget point)."""
        if self.cfg.key_cols:
            raise NotImplementedError(
                "erase_key_range on a composite-PK lake: the internal _key "
                "is a joined string whose lexicographic order does not "
                "match the component tuple order — erase by explicit key "
                "list (erase_keys) instead"
            )
        if not (lo <= hi):
            raise ValueError("erase_key_range requires lo <= hi")
        self._acquire_lock()
        t0 = time.perf_counter()
        self.flush()
        from debezium_incubator_ray.stages.apply import RangeEraser

        touched = [
            p for p in range(self.cfg.num_partitions)
            if self.manifest.doc["partitions"][str(p)]["files"]
            or self.manifest.doc["partitions"][str(p)].get("deltas")
        ]
        if not touched:
            return {"erased_rows": 0, "partitions": 0}
        items = [{S.PART: p} for p in touched]
        ds = ray.data.from_items(items, override_num_blocks=len(items))
        ctor = dict(
            manifest_doc=self.manifest.doc,
            lake_dir=self.lake_dir,
            lo=lo,
            hi=hi,
            target_rows_per_file=self.cfg.target_rows_per_file,
        )

        def erase_one(batch: pa.Table) -> pa.Table:
            return RangeEraser(**ctor)(batch)

        commits = ds.map_batches(
            erase_one, batch_format="pyarrow", num_cpus=self.cfg.apply_num_cpus
        ).take_all()
        erased = sum(c["events_applied"] for c in commits)
        updates = self._partition_updates(commits)
        self.manifest = self.manifest.commit(
            updates,
            lineage=self._lineage(
                "erase_range", updates, erased, time.perf_counter() - t0
            ),
            persist=True,
        )
        out = {"erased_rows": erased, "partitions": len(touched)}
        if vacuum_history:
            out["vacuum"] = self.vacuum(keep_versions=1)
        return out

    def purge_tombstones(
        self, upto_lsn: int, vacuum_history: bool = False
    ) -> Dict[str, Any]:
        """gc-grace purge on a tombstone-RETENTION lake (tombstones=False):
        drop marker rows with lsn <= ``upto_lsn`` — Cassandra's
        gc_grace_seconds contract: a tombstone lives only long enough for
        every downstream consumer to observe the deletion, then is
        garbage-collected so the lake stops paying for dead keys forever.
        Merge-on-read deltas fold first (a delta marker masks a live base
        row; purging it would resurrect that row). Watermarks don't move —
        the replay filter already drops any pre-horizon redelivery."""
        if self.cfg.tombstones:
            raise ValueError(
                "purge_tombstones applies to tombstone-retention lakes "
                "(tombstones=False); a compacting lake has no markers"
            )
        self._acquire_lock()
        t0 = time.perf_counter()
        self.flush()
        delta_ps = [
            p for p in range(self.cfg.num_partitions)
            if self.manifest.doc["partitions"][str(p)].get("deltas")
        ]
        if delta_ps:
            # fold ONLY the partitions holding deltas (soundness needs the
            # markers out of the overlay, not a full-lake re-chunk)
            self._compact_partitions(delta_ps, t0)
        from debezium_incubator_ray.stages.apply import TombstonePurger

        touched = [
            p for p in range(self.cfg.num_partitions)
            if self.manifest.doc["partitions"][str(p)]["files"]
        ]
        if not touched:
            return {"purged_rows": 0, "partitions": 0}
        items = [{S.PART: p} for p in touched]
        ds = ray.data.from_items(items, override_num_blocks=len(items))
        ctor = dict(
            manifest_doc=self.manifest.doc,
            lake_dir=self.lake_dir,
            upto_lsn=upto_lsn,
            target_rows_per_file=self.cfg.target_rows_per_file,
        )

        def purge_one(batch: pa.Table) -> pa.Table:
            return TombstonePurger(**ctor)(batch)

        commits = ds.map_batches(
            purge_one, batch_format="pyarrow", num_cpus=self.cfg.apply_num_cpus
        ).take_all()
        purged = sum(c["events_applied"] for c in commits)
        updates = self._partition_updates(commits)
        self.manifest = self.manifest.commit(
            updates,
            lineage=self._lineage(
                "purge_tombstones", updates, purged,
                time.perf_counter() - t0,
            ),
            persist=True,
        )
        out = {"purged_rows": purged, "partitions": len(touched)}
        if vacuum_history:
            out["vacuum"] = self.vacuum(keep_versions=1)
        return out

    def expire_rows(
        self, col: str, cutoff, vacuum_history: bool = False
    ) -> Dict[str, Any]:
        """Retention / TTL sweep: remove LIVE rows with ``col`` < ``cutoff``
        (strictly below; NULL never expires). State surgery like
        ``erase_keys`` — watermarks don't move, superseded files persist
        for time-travel until vacuum.

        With ``col`` in EngineConfig.stats_columns the zone maps do the
        heavy lifting: runs proven all-fresh carry over untouched, runs
        proven all-old drop UNREAD, and partitions with no possibly-old
        run are never dispatched — O(runs containing old rows), not
        O(lake). Merge-on-read deltas fold first (expiring a delta row
        would expose the stale base row it masks)."""
        from debezium_incubator_ray.stages.apply import RowExpirer, stats_value

        self._acquire_lock()
        t0 = time.perf_counter()
        self.flush()
        if any(
            self.manifest.deltas(p) for p in range(self.cfg.num_partitions)
        ):
            self.compact()
        cut_e = stats_value(cutoff)

        def may_have_old(p: int) -> bool:
            for f in self.manifest.files(p):
                st = (f.get("stats") or {}).get(col)
                if not st or st[0] is None or st[0] < cut_e:
                    return True  # unknown or possibly-old rows present
            return False

        targets = [
            p for p in range(self.cfg.num_partitions)
            if self.manifest.files(p) and may_have_old(p)
        ]
        if not targets:
            return {"expired_rows": 0, "partitions": 0}
        items = [{S.PART: p} for p in targets]
        ds = ray.data.from_items(items, override_num_blocks=len(items))
        ctor = dict(
            manifest_doc=self.manifest.doc,
            lake_dir=self.lake_dir,
            col=col,
            cutoff=cutoff,
            target_rows_per_file=self.cfg.target_rows_per_file,
        )

        def expire_one(batch: pa.Table) -> pa.Table:
            return RowExpirer(**ctor)(batch)

        commits = ds.map_batches(
            expire_one, batch_format="pyarrow", num_cpus=self.cfg.apply_num_cpus
        ).take_all()
        expired = sum(c["events_applied"] for c in commits)
        updates = self._partition_updates(commits)
        self.manifest = self.manifest.commit(
            updates,
            lineage=self._lineage("expire", updates, expired,
                                  time.perf_counter() - t0),
            persist=True,
        )
        out = {"expired_rows": expired, "partitions": len(targets)}
        if vacuum_history:
            out["vacuum"] = self.vacuum(keep_versions=1)
        return out

    def join_lake(
        self,
        other: "CdcEngine",
        join_type: str = "inner",
        left_suffix: str = "",
        right_suffix: str = "_r",
        left_version: Optional[int] = None,
        right_version: Optional[int] = None,
    ) -> "ray.data.Dataset":
        """Co-partitioned lake-to-lake join on the key: when two CDC lakes
        share the key, partitioner and partition count (the north-rule
        discipline — pick ONE partitioning and reuse it across stages),
        their partitions align 1:1 and the join needs NO shuffle at all:
        one task per partition reads both sides' merged state and joins
        locally. At 100 TB this is the difference between a metadata-only
        join plan and an all-to-all exchange of both tables.

        ``left_version`` / ``right_version`` pin a side to a RETAINED
        manifest version (the cross-lake point-in-time join: query both
        lakes at versions that correspond to one logical boundary —
        valid until ``vacuum`` expires those versions, exactly like
        ``lake_table(version=)``)."""
        from debezium_incubator_ray.state.manifest import Manifest

        m1 = (self.manifest if left_version is None
              else Manifest.load_version(self.lake_dir, left_version,
                                         store=self.manifest.store))
        m2 = (other.manifest if right_version is None
              else Manifest.load_version(other.lake_dir, right_version,
                                         store=other.manifest.store))
        if (
            m1.doc["key"] != m2.doc["key"]
            or m1.num_partitions != m2.num_partitions
            or m1.doc.get("partitioner") != m2.doc.get("partitioner")
        ):
            raise ValueError(
                "join_lake requires identical key, partitioner and "
                "partition count on both lakes (co-partitioning is what "
                "makes the join shuffle-free) — repartition one side or "
                "use a generic Dataset join"
            )
        from debezium_incubator_ray.pipelines.view import (
            read_live_state, side_spec,
        )

        key = self.cfg.key
        specs = [side_spec(self, m1), side_spec(other, m2)]

        def join_one(batch: pa.Table) -> pa.Table:
            outs = []
            for p in batch[S.PART].to_pylist():
                lt = read_live_state(specs[0], int(p))
                rt = read_live_state(specs[1], int(p))
                outs.append(
                    lt.join(
                        rt, keys=key, join_type=join_type,
                        left_suffix=left_suffix, right_suffix=right_suffix,
                    )
                )
            return pa.concat_tables(outs, promote_options="permissive")

        items = [{S.PART: p} for p in range(m1.num_partitions)]
        ds = ray.data.from_items(items, override_num_blocks=len(items))
        return ds.map_batches(
            join_one, batch_format="pyarrow", num_cpus=self.cfg.apply_num_cpus
        )

    def join_view(
        self,
        other: "CdcEngine",
        view_dir: str,
        join_type: str = "inner",
        left_suffix: str = "",
        right_suffix: str = "_r",
    ):
        """A persisted, incrementally-maintained form of ``join_lake``:
        ``JoinView.refresh()`` recomputes only partitions whose source
        state changed since the last refresh (pipelines/view.py)."""
        from debezium_incubator_ray.pipelines.view import JoinView

        return JoinView(
            view_dir, self, other, join_type=join_type,
            left_suffix=left_suffix, right_suffix=right_suffix,
        )

    def export_changes(
        self, out_dir: str, to_version: Optional[int] = None
    ) -> Dict[str, Any]:
        """Exactly-once outbox: export the change feed SINCE THE LAST EXPORT
        (manifest cursor ``outbox.exported_version``) as parquet under
        ``out_dir/changes-v{from}-v{to}/`` — the lake→downstream leg of the
        reference's Kafka emit (KafkaRecordEmitter.java:58-71, offsets
        marked only after ack; here "ack" = the export directory rename).

        Protocol: write to a temp dir, atomically rename to the
        version-range-named directory, THEN commit the cursor. A crash
        between rename and commit is recovered on the next call by adopting
        any existing export that starts at the cursor — no window is ever
        written twice and consumers can total-order exports by name. The
        first export diffs from the earliest retained manifest version
        (an empty v0 lake ⇒ a full 'c' bootstrap feed).

        Replay contract: fold the export directories IN NAME ORDER (keys
        are unique within a window; 'd' removes, 'c'/'u' upsert). A global
        LWW over concatenated windows is NOT sound — a 'd' row carries the
        superseded winner's LSN (the deleting event's own position was
        compacted away), so only the window order carries time."""
        import uuid as _uuid

        self._acquire_lock()
        self.flush()
        t0 = time.perf_counter()
        to_v = self.manifest.version if to_version is None else to_version
        state = dict(self.manifest.doc.get("outbox") or {})
        from_v = state.get("exported_version")
        if from_v is None:
            from_v = min(self.manifest.versions())
        os.makedirs(out_dir, exist_ok=True)
        # sweep temp dirs orphaned by a crash mid-write. Scoped to THIS
        # table's cursor window (our writer lock is per-lake — a shared
        # out_dir may hold another table's in-flight .tmp, which we must
        # not touch); the rename is the visibility point, so a .tmp dir is
        # never a committed export
        import shutil as _shutil

        for n in os.listdir(out_dir):
            if n.startswith(f"changes-v{from_v:06d}-v") and n.endswith(".tmp"):
                _shutil.rmtree(os.path.join(out_dir, n), ignore_errors=True)
        # crash recovery: an export starting at the cursor already exists →
        # its rename won the race; adopt it instead of re-diffing
        prefix = f"changes-v{from_v:06d}-v"
        existing = sorted(
            n for n in os.listdir(out_dir)
            if n.startswith(prefix) and not n.endswith(".tmp")
        )
        if existing:
            name = existing[-1]
            adopted_to = int(name.rsplit("-v", 1)[1])
            self.manifest = self.manifest.commit(
                {},
                lineage=self._lineage("export_adopt", {}, 0, 0.0),
                extra_state={"outbox": {"exported_version": adopted_to,
                                        "last_export": name}},
            )
            self.flush()
            return {"export": name, "rows": None, "adopted": True}
        if to_v <= from_v:
            return {"export": None, "rows": 0, "skipped": True}
        # data-aware skip: versions advance on non-data commits too (the
        # export cursor itself, heartbeats) — export only when some
        # partition's state actually moved WITHIN the requested window
        # (compare at to_v, not at the current head)
        doc_from = Manifest.load_version(
            self.lake_dir, from_v, store=self.manifest.store
        ).doc
        doc_to = (
            self.manifest.doc
            if to_v == self.manifest.version
            else Manifest.load_version(
                self.lake_dir, to_v, store=self.manifest.store
            ).doc
        )
        if doc_from["partitions"] == doc_to["partitions"]:
            return {"export": None, "rows": 0, "skipped": True}
        name = f"changes-v{from_v:06d}-v{to_v:06d}"
        final = os.path.join(out_dir, name)
        tmp = f"{final}.{_uuid.uuid4().hex}.tmp"
        os.makedirs(tmp, exist_ok=True)  # a zero-row window is a valid export
        ds = self.changes_between(from_v, to_v)
        ds.write_parquet(tmp)
        os.rename(tmp, final)  # the visibility point
        rows = sum(
            pq.ParquetFile(os.path.join(final, f)).metadata.num_rows
            for f in os.listdir(final)
            if f.endswith(".parquet")
        )
        self.manifest = self.manifest.commit(
            {},
            lineage=self._lineage("export", {}, rows, time.perf_counter() - t0),
            extra_state={"outbox": {"exported_version": to_v,
                                    "last_export": name}},
        )
        self.flush()
        return {"export": name, "rows": rows, "from": from_v, "to": to_v}

    # ------------------------------------------------------------------
    # internals
    def _apply_shuffle(
        self, flat: "ray.data.Dataset", watermark_filter: bool = True,
        source: str = "",
    ) -> List[Dict]:
        """hash-partitioned shuffle + stateful actor-pool merge; returns the
        tiny per-partition commit records (metadata only) on the driver."""
        if self.cfg.exchange == "staging":
            return self._apply_shuffle_staging(flat, watermark_filter, source)
        if self.cfg.exchange == "objref":
            return self._apply_shuffle_objref(flat, watermark_filter, source)
        # object-store exchange: Ray Data's sort-based groupby.
        # autoscaling actor pool (1, c): a fixed pool sized to every CPU
        # would starve the upstream read/sort tasks and deadlock the
        # streaming executor; (1, c) lets Ray balance the stages
        c = self.cfg.apply_concurrency or min(self.cfg.num_partitions, 16)
        nb = self.cfg.shuffle_blocks or min(self.cfg.num_partitions, 32)
        flat = flat.repartition(nb)
        applied = flat.groupby(S.PART).map_groups(
            PartitionApplier,
            fn_constructor_kwargs={
                "manifest_doc": self.manifest.doc,
                "lake_dir": self.lake_dir,
                "target_rows_per_file": self.cfg.target_rows_per_file,
                "watermark_filter": watermark_filter,
                "source": source,
            },
            batch_format="pyarrow",
            num_cpus=self.cfg.apply_num_cpus,
            concurrency=(1, c),
        )
        return applied.take_all()

    def _apply_shuffle_staging(
        self, flat: "ray.data.Dataset", watermark_filter: bool = True,
        source: str = "",
    ) -> List[Dict]:
        """Disk-backed external shuffle (stages/exchange.py): split blocks
        into per-partition staging parquet, then one applier call per
        partition over exactly the files the writer manifests listed."""
        import uuid as _uuid

        from debezium_incubator_ray.stages.exchange import StagedApplier, StagingWriter

        timing = os.environ.get("DBZRAY_TIMING")
        t0 = time.perf_counter()
        stage_dir = os.path.join(self.lake_dir, "_staging", _uuid.uuid4().hex)
        writer = StagingWriter(stage_dir, self.cfg.num_partitions)
        manifests = flat.map_batches(
            writer,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=self.cfg.staging_batch_size,
        ).take_all()  # tiny: (p, path, rows) rows only
        if timing:
            print(f"[dbzray] staging-write {time.perf_counter()-t0:.1f}s "
                  f"({len(manifests)} files)", flush=True)
        files_by_p: Dict[int, List[str]] = {}
        for m in manifests:
            files_by_p.setdefault(int(m[S.PART]), []).append(m["path"])
        try:
            if not files_by_p:
                return []
            items = ray.data.from_items(
                [{S.PART: p} for p in sorted(files_by_p)],
                override_num_blocks=len(files_by_p),
            )
            # task pool (see _apply_aligned): one batch per partition, no
            # state to amortize — tasks avoid the actor-pool ramp-up that
            # starved the high-parallelism leg of short stages
            ctor = dict(
                manifest_doc=self.manifest.doc,
                lake_dir=self.lake_dir,
                stage_dir=stage_dir,
                files_by_partition=files_by_p,
                target_rows_per_file=self.cfg.target_rows_per_file,
                watermark_filter=watermark_filter,
                source=source,
            )

            def staged_one(batch: pa.Table) -> pa.Table:
                return StagedApplier(**ctor)(batch)

            applied = items.map_batches(
                staged_one,
                batch_format="pyarrow",
                num_cpus=self.cfg.apply_num_cpus,
            )
            t1 = time.perf_counter()
            out = applied.take_all()
            if timing:
                print(f"[dbzray] apply-merge {time.perf_counter()-t1:.1f}s "
                      f"({len(out)} partitions)", flush=True)
            return out
        finally:
            import shutil

            shutil.rmtree(stage_dir, ignore_errors=True)

    def _apply_shuffle_objref(
        self, flat: "ray.data.Dataset", watermark_filter: bool = True,
        source: str = "",
    ) -> List[Dict]:
        """Locality-aware object-store exchange (stages/exchange.py): the
        multi-node path for clusters WITHOUT a shared staging filesystem.
        Stage 1 splits each normalized block into per-partition LZ4-IPC
        slices returned as separate driver-owned objects — the staged bytes
        stay in the object store of the node that produced them. Stage 2
        passes each partition's slice refs as task arguments, so Ray's
        locality-aware scheduler runs the applier where the bytes already
        are and the object store transfers only remote slices. Only the
        lake dir (the durable output) needs shared storage. The epoch's
        normalized blocks materialize in the (spillable) object store for
        the duration of the exchange — the same residency the "staging"
        mode puts on the shared filesystem."""
        from debezium_incubator_ray.stages.exchange import split_block

        timing = os.environ.get("DBZRAY_TIMING")
        t0 = time.perf_counter()
        P = self.cfg.num_partitions
        block_refs = flat.to_arrow_refs()
        if not block_refs:
            return []
        if timing:
            print(f"[dbzray] objref-normalize {time.perf_counter()-t0:.1f}s "
                  f"({len(block_refs)} blocks)", flush=True)
            t0 = time.perf_counter()
        split = split_block.options(num_returns=P + 1)
        outs = [split.remote(b, P) for b in block_refs]
        # task args pin the raw blocks until each split finishes; drop the
        # driver's refs now so they free as soon as splits complete
        del block_refs
        return self._objref_apply(outs, watermark_filter, source, timing, t0)

    def _apply_shuffle_objref_paths(
        self, binlog_dir: str, segs: List[str], source: str = "",
    ) -> List[Dict]:
        """FULLY-fused objref epoch: read → normalize → in-task LWW
        combine → per-partition split, all in ONE raw task per segment
        group (stages/exchange.py read_split_block). The epoch's raw
        decoded bytes never enter the object store — only the LZ4-IPC
        partition slices do — which removes the two inter-operator block
        hops the Dataset formulation pays (Ray Data neither fuses
        ReadParquet with maps nor expresses a multi-return split). The
        dataset flavor above remains for salted epochs and
        snapshot-style in-memory sources."""
        from debezium_incubator_ray.stages.exchange import read_split_block

        timing = os.environ.get("DBZRAY_TIMING")
        t0 = time.perf_counter()
        P = self.cfg.num_partitions
        paths = [os.path.join(binlog_dir, s) for s in segs]
        if not paths:
            return []
        nb = max(1, min(len(paths), (self.cfg.apply_concurrency or 16) * 4))
        groups = [list(g) for g in np.array_split(np.array(paths), nb)
                  if len(g)]
        split = read_split_block.options(num_returns=P + 1)
        nk = self._norm_kwargs()
        merge_partial = self.cfg.merge_mode == "partial"
        outs = [
            split.remote(g, nk, self.cfg.key, merge_partial,
                         self.cfg.read_batch_size, P)
            for g in groups
        ]
        return self._objref_apply(outs, True, source, timing, t0)

    def _objref_apply(
        self, outs, watermark_filter: bool, source: str, timing, t0,
    ) -> List[Dict]:
        """Shared tail of both objref flavors: collect the (counts, node)
        metas, group slice refs per partition, per-node combine, then one
        locality-scheduled apply task per partition."""
        from debezium_incubator_ray.stages.exchange import (
            apply_partition_slices, combine_slice_refs,
        )

        P = self.cfg.num_partitions
        # the (counts, node) metas are the only stage-1 output the driver
        # reads (KBs); the slice objects never leave the workers here
        metas = ray.get([o[0] for o in outs])
        if timing:
            print(f"[dbzray] objref-split {time.perf_counter()-t0:.1f}s "
                  f"({len(outs)} tasks)", flush=True)
        slices_by_p = {
            p: [outs[i][p + 1] for i in range(len(outs))
                if metas[i][0][p] > 0]
            for p in range(P)
        }
        nodes_by_p = {
            p: [metas[i][1] for i in range(len(outs))
                if metas[i][0][p] > 0]
            for p in range(P)
        }
        # splits are done (metas fetched): drop the unused empty-slice
        # refs so only the live LZ4 slices stay resident in the object
        # store through the apply stage
        del outs
        # multi-node: coalesce each node's slices per partition into one
        # object, so stage 2 fetches one object per producing node rather
        # than one per (block x partition) — the fine-grained fan-out's
        # per-object overhead was the measured 2-node plateau. No-op on a
        # single node.
        if self.cfg.exchange_combine:
            tc = time.perf_counter()
            slices_by_p = combine_slice_refs(slices_by_p, nodes_by_p)
            if timing:
                print(f"[dbzray] objref-combine "
                      f"{time.perf_counter()-tc:.1f}s", flush=True)
        ctor_ref = ray.put(dict(
            manifest_doc=self.manifest.doc,
            lake_dir=self.lake_dir,
            target_rows_per_file=self.cfg.target_rows_per_file,
            watermark_filter=watermark_filter,
            source=source,
        ))
        t1 = time.perf_counter()
        tasks = [
            apply_partition_slices
            .options(num_cpus=self.cfg.apply_num_cpus)
            .remote(ctor_ref, p, *refs)
            for p, refs in slices_by_p.items()
            if refs
        ]
        commit_tables = ray.get(tasks)
        if timing:
            print(f"[dbzray] objref-merge {time.perf_counter()-t1:.1f}s "
                  f"({len(tasks)} partitions)", flush=True)
        return [r for t in commit_tables for r in t.to_pylist()]

    def _salted_prereduce(
        self, flat: "ray.data.Dataset", salt_n: Optional[int] = None
    ) -> "ray.data.Dataset":
        """Optional second-phase salted LWW pre-reduce for skewed epochs:
        collapse per (partition, salt) before the final per-partition shuffle
        (north-rule hot-key splitting). The in-batch reduce inside
        lww_reduce already bounds hot-key fan-in per block; this stage adds a
        full combiner shuffle for extreme epochs. Engaged manually
        (salt_buckets) or by the lineage-skew feedback loop
        (_salt_decision)."""
        from debezium_incubator_ray.envelope import lww_reduce

        salt_n = salt_n or self.cfg.salt_buckets
        key = self.cfg.key

        def add_salt(t: pa.Table) -> pa.Table:
            salt = pc.cast(pc.bit_wise_and(t[S.LSN].combine_chunks(), salt_n - 1), pa.int32())
            return t.append_column("_salt", salt)

        def reduce_group(t: pa.Table) -> pa.Table:
            return lww_reduce(t, key).drop_columns(["_salt"])

        salted = flat.map_batches(add_salt, batch_format="pyarrow", zero_copy_batch=True)
        return salted.groupby([S.PART, "_salt"]).map_groups(
            reduce_group, batch_format="pyarrow"
        )

    @staticmethod
    def _partition_updates(commits: List[Dict]) -> Dict[int, Dict[str, Any]]:
        return {
            c[S.PART]: {
                "watermark": c["watermark"],
                "files": json.loads(c["files_json"]),
                "deltas": json.loads(c.get("deltas_json") or "[]"),
            }
            for c in commits
        }

    def _lineage(self, kind: str, updates: Dict, events: int, seconds: float) -> Dict:
        counts = {}
        for p, u in updates.items():
            # watermark-only entries (the snapshot handoff floor) carry no
            # file list — they contribute no rows
            counts[p] = sum(f["rows"] for f in u.get("files", []))
        n = max(1, len(counts))
        mx = max(counts.values()) if counts else 0
        mean = (sum(counts.values()) / n) if counts else 0
        out = {
            "kind": kind,
            "version": self.manifest.version + 1,
            "events": events,
            "partitions_touched": len(counts),
            "rows_per_partition_max": mx,
            "rows_per_partition_mean": mean,
            "skew_ratio": (mx / mean) if mean else 0.0,
            "seconds": round(seconds, 4),
            "watermarks": {str(p): u.get("watermark") for p, u in updates.items()},
        }
        # the salted-pre-reduce decision this epoch (exchange path only) —
        # operators can audit WHY an epoch salted from lineage alone
        last_salt = getattr(self, "_last_salt", None)
        if kind == "epoch" and last_salt is not None:
            out["salt"] = last_salt
            self._last_salt = None
        return out

    def _resolve_keys(self, keys, target: pa.Schema):
        """Composite component tuples → the internal joined key, through
        the SAME Arrow cast path normalize uses (Python str() renders
        bools/floats differently and would silently miss). Shared by every
        key-addressed entry point (lookup, erase_keys)."""
        if self.cfg.key_cols and keys is not None and len(keys) and isinstance(
            keys[0], (tuple, list)
        ):
            from debezium_incubator_ray.envelope import composite_key_arrays

            comps = [
                pa.array([k[i] for k in keys], type=target.field(kc).type)
                for i, kc in enumerate(self.cfg.key_cols)
            ]
            return composite_key_arrays(comps)
        return keys

    # ------------------------------------------------------------------
    # read side
    def _manifest_at(self, version: Optional[int]):
        """The manifest to read through: current, or a retained historical
        version (time-travel — CoW keeps superseded data files on disk
        until vacuum, so any retained v{n}.json is fully readable)."""
        if version is None or version == self.manifest.version:
            return self.manifest
        return Manifest.load_version(
            self.lake_dir, version, store=self.manifest.store
        )

    def read_lake(
        self,
        include_lsn: bool = False,
        version: Optional[int] = None,
        columns: Optional[List[str]] = None,
        _file_pred=None,
    ) -> "ray.data.Dataset":
        """The lake as a Dataset, unified to the current schema version.

        Files written under older schema versions are upgraded on read
        (default backfill / widening) — the lazy half of schema evolution.
        ``version=`` reads the lake as of that manifest commit (time-travel).
        ``columns=`` prunes at the parquet read (only the requested columns
        plus the internal sidecars leave storage — at 100 TB a 2-column
        scan must not decode the html payload).
        """
        m = self._manifest_at(version)
        target = m.current_schema()
        defaults = m.doc["defaults"]
        if columns is not None:
            missing = [c for c in columns if target.get_field_index(c) < 0]
            if missing:
                raise ValueError(f"columns not in lake schema: {missing}")
            target = pa.schema([target.field(c) for c in columns])
        if any(m.deltas(p) for p in range(m.num_partitions)):
            ds = self._read_lake_merged(m, include_lsn, columns=columns)
            if columns is None:
                return ds
            from debezium_incubator_ray.envelope import DELETED as _DEL

            keep = list(columns)
            if include_lsn:
                keep.append(S.LSN)
            if not m.doc.get("tombstones", True):
                keep.append(_DEL)
            return ds.map_batches(
                lambda t, k=tuple(keep): t.select(
                    [c for c in k if c in t.column_names]
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
        by_ver: Dict[int, List[str]] = {}
        for p in range(m.num_partitions):
            for f in m.files(p):
                # internal file predicate (zone-map pruning — scan())
                if _file_pred is not None and not _file_pred(f):
                    continue
                by_ver.setdefault(f.get("schema_version", 1), []).append(
                    os.path.join(self.lake_dir, f["path"])
                )
        if not by_ver:
            empty = S.upgrade_table(pa.table({}), target, defaults).select(target.names)
            return ray.data.from_arrow(empty)

        from debezium_incubator_ray.envelope import DELETED

        keep_tomb = not m.doc.get("tombstones", True)

        def upgrade(batch: pa.Table) -> pa.Table:
            side = {S.LSN: batch[S.LSN]}
            drop = [S.LSN]
            if DELETED in batch.column_names:
                side[DELETED] = batch[DELETED]
                drop.append(DELETED)
            out = S.upgrade_table(batch.drop_columns(drop), target, defaults)
            if include_lsn:
                out = out.append_column(S.LSN, side[S.LSN])
            if DELETED in side:
                out = out.append_column(DELETED, side[DELETED])
            return out

        # per-version projection: an evolved column absent from old files
        # is backfilled by upgrade(), so request only what each version HAS
        ver_b64 = {s["version"]: s["schema"] for s in m.doc["schemas"]}
        parts = []
        for ver, paths in sorted(by_ver.items()):
            read_cols = None
            if columns is not None:
                have = set(S.schema_from_b64(ver_b64[ver]).names)
                read_cols = [c for c in columns if c in have] + [S.LSN]
                if keep_tomb:
                    read_cols.append(DELETED)
            parts.append(
                ray.data.read_parquet(paths, columns=read_cols).map_batches(
                    upgrade, batch_format="pyarrow", zero_copy_batch=True
                )
            )
        ds = parts[0]
        for other in parts[1:]:
            ds = ds.union(other)
        return ds

    def _read_lake_merged(
        self, m, include_lsn: bool, columns: Optional[List[str]] = None
    ) -> "ray.data.Dataset":
        """Merge-on-read scan: one task per partition LWW-merges that
        partition's base runs ⊕ delta runs (stages/apply.py
        read_partition_state). Parallelism = partitions, no shuffle — the
        merge is partition-local by construction. Used whenever the manifest
        version being read has outstanding deltas."""
        from debezium_incubator_ray.envelope import DELETED
        from debezium_incubator_ray.stages.apply import read_partition_state

        target_b64 = S.schema_to_b64(m.current_schema())
        defaults = dict(m.doc["defaults"])
        schema_version = m.doc["schemas"][-1]["version"]
        key = self.cfg.key
        lake_dir = self.lake_dir
        keep_tombstones = not m.doc.get("tombstones", True)
        counter_cols = tuple(m.doc.get("counter_cols") or [])
        entries = {
            p: m.doc["partitions"][str(p)] for p in range(m.num_partitions)
        }

        def merge_one(batch: pa.Table) -> pa.Table:
            outs = []
            tgt = S.schema_from_b64(target_b64)
            for p in batch[S.PART].to_pylist():
                t = read_partition_state(
                    entries[int(p)], lake_dir, tgt, defaults,
                    schema_version, key, keep_tombstones=keep_tombstones,
                    columns=columns, counter_cols=counter_cols,
                )
                if not include_lsn and S.LSN in t.column_names:
                    t = t.drop_columns([S.LSN])
                outs.append(t)
            out = pa.concat_tables(outs, promote_options="permissive")
            # normalize column order across partitions for the union
            names = [n for n in tgt.names if n in out.column_names]
            names += [n for n in (S.LSN, DELETED) if n in out.column_names]
            return out.select(names)

        items = [{S.PART: p} for p in sorted(entries)]
        ds = ray.data.from_items(items, override_num_blocks=len(items))
        return ds.map_batches(
            merge_one, batch_format="pyarrow", num_cpus=self.cfg.apply_num_cpus
        )

    def scan(
        self,
        col: str,
        lo=None,
        hi=None,
        columns: Optional[List[str]] = None,
        version: Optional[int] = None,
    ) -> "ray.data.Dataset":
        """Range scan of the LIVE rows with zone-map pruning: runs whose
        recorded [min, max] for ``col`` (EngineConfig.stats_columns) cannot
        contain the [lo, hi] range are never opened — O(matching runs), not
        O(lake). Runs without stats for ``col`` are read (unknown is not
        excluded). Rows are then exactly filtered, so the result is correct
        whether or not pruning fired; tombstone-retention marker rows are
        excluded (scan is defined over live state). Merge-on-read deltas
        fall back to the merged scan + filter (deltas are small by
        construction; compact() restores full pruning). Built on the
        read_lake plumbing — one read path, one projection/upgrade rule.

        Scanning the KEY column needs no zone-map config: every run
        already records [min_key, max_key] (the sorted-run invariant),
        so key-range scans prune out of the box."""
        from debezium_incubator_ray.envelope import DELETED
        from debezium_incubator_ray.stages.apply import stats_value

        m = self._manifest_at(version)
        target = m.current_schema()
        is_key = col == self.cfg.key
        if not is_key and target.get_field_index(col) < 0:
            raise ValueError(f"scan column not in lake schema: {col}")
        lo_e = stats_value(lo) if lo is not None else None
        hi_e = stats_value(hi) if hi is not None else None

        def overlap(f: Dict) -> bool:
            if is_key:
                mn, mx = f["min_key"], f["max_key"]
            else:
                st = (f.get("stats") or {}).get(col)
                if not st:
                    return True  # no zone map -> must read
                mn, mx = st[0], st[1]  # st[2] (nulls) irrelevant to range
            if hi_e is not None and mn is not None and mn > hi_e:
                return False
            if lo_e is not None and mx is not None and mx < lo_e:
                return False
            return True

        has_deltas = any(m.deltas(p) for p in range(m.num_partitions))
        total = kept = 0
        if not has_deltas:
            for p in range(m.num_partitions):
                for f in m.files(p):
                    total += 1
                    kept += 1 if overlap(f) else 0
        self._last_scan_stats = {"runs_total": total, "runs_read": kept}

        want = None
        if columns is not None:
            want = list(columns) + ([col] if col not in columns else [])
        ds = self.read_lake(
            version=version,
            columns=want,
            _file_pred=None if has_deltas else overlap,
        )
        out_cols = columns  # None = all payload columns

        def finish(t: pa.Table) -> pa.Table:
            # live rows only: retention marker rows are not state
            if DELETED in t.column_names:
                t = t.filter(
                    pc.invert(pc.fill_null(t[DELETED], False))
                ).drop_columns([DELETED])
            c = t[col]
            mask = None
            if lo is not None:
                mask = pc.greater_equal(c, pa.scalar(lo))
            if hi is not None:
                m2 = pc.less_equal(c, pa.scalar(hi))
                mask = m2 if mask is None else pc.and_(mask, m2)
            if mask is not None:
                t = t.filter(mask)
            if out_cols is not None:
                t = t.select(out_cols)
            elif S.LSN in t.column_names:
                t = t.drop_columns([S.LSN])
            return t

        return ds.map_batches(
            finish, batch_format="pyarrow", zero_copy_batch=True
        )

    def lookup(self, keys, version: Optional[int] = None) -> pa.Table:
        """Point reads: the serving path. Each key routes to its partition
        (the lake's own hash), then only the sorted runs whose
        [min_key, max_key] range can contain it are opened — at scale a
        lookup touches O(keys) files, never the lake. Missing keys are
        simply absent from the result. Driver-side by design (a lookup's
        working set is the keys, not the data)."""
        m = self._manifest_at(version)
        target = m.current_schema()
        defaults = m.doc["defaults"]
        key = self.cfg.key
        keys = self._resolve_keys(keys, target)
        karr = pa.array(keys) if not isinstance(keys, (pa.Array, pa.ChunkedArray)) else keys
        parts = partition_ids(karr, m.num_partitions, self.cfg.partitioner)
        from debezium_incubator_ray.stages.apply import upgrade_run_table

        want_by_p: Dict[int, List[Any]] = {}
        for k, p in zip(karr.to_pylist(), parts):
            want_by_p.setdefault(int(p), []).append(k)
        from debezium_incubator_ray.envelope import DELETED, merge_lww

        def run_hits(files: List[Dict], want) -> List[pa.Table]:
            from debezium_incubator_ray.hashing import bloom_probe

            out = []
            for f in files:
                hit = [k for k in want if f["min_key"] <= k <= f["max_key"]]
                if not hit:
                    continue
                if f.get("bloom"):
                    # SSTable-style sidecar: skip the parquet read when
                    # every wanted key is definitely absent (a missing
                    # sidecar — e.g. pre-policy runs — just means no skip)
                    side = os.path.join(self.lake_dir, f["path"] + ".bloom")
                    if os.path.exists(side):
                        words = np.fromfile(side, dtype=np.uint64)
                        keep = bloom_probe(
                            words, pa.array(hit, karr.type),
                            int(f["bloom"][0]), int(f["bloom"][1]),
                        )
                        hit = [k for k, m in zip(hit, keep) if m]
                        if not hit:
                            continue
                t = pq.read_table(os.path.join(self.lake_dir, f["path"]))
                if f.get("schema_version", 1) != m.doc["schemas"][-1]["version"]:
                    t = upgrade_run_table(t, target, defaults)
                t = t.filter(pc.is_in(t[key], value_set=pa.array(hit, karr.type)))
                if t.num_rows:
                    out.append(t)
            return out

        tbls = []
        for p, want in want_by_p.items():
            base_hits = run_hits(m.files(p), want)
            delta_hits = run_hits(m.deltas(p), want)
            if not delta_hits:
                tbls.extend(base_hits)
                continue
            # merge-on-read point read: candidate rows from base and delta
            # runs LWW-merge exactly like a full scan would — O(hit files).
            # Newest delta FIRST, mirroring read_partition_state: at an
            # equal-LSN tie the later-applied writer must win on the point
            # read exactly as it does on the scan.
            base = (
                pa.concat_tables(base_hits, promote_options="permissive")
                if base_hits else None
            )
            d = pa.concat_tables(
                list(reversed(delta_hits)), promote_options="permissive"
            )
            op = pc.if_else(
                pc.fill_null(d[DELETED].combine_chunks(), False),
                pa.scalar("d"), pa.scalar("r"),
            )
            d = d.drop_columns([DELETED]).append_column("op", op)
            merged = merge_lww(
                base, d, key, keep_tombstones=not m.doc.get("tombstones", True)
            )
            if merged.num_rows:
                tbls.append(merged)
        if not tbls:
            t = S.upgrade_table(pa.table({}), target, defaults)
            return t.append_column(S.LSN, pa.array([], pa.int64()))
        out = pa.concat_tables(tbls, promote_options="permissive").sort_by(
            [(key, "ascending")]
        )
        from debezium_incubator_ray.envelope import COMPOSITE_KEY

        if self.cfg.key_cols and COMPOSITE_KEY in out.column_names:
            out = out.drop_columns([COMPOSITE_KEY])
        return out

    def lookup_prefix(self, components, version: Optional[int] = None) -> pa.Table:
        """Composite-PK PREFIX read — Cassandra's primary read pattern
        (all clustering rows of a partition key,
        SELECT ... WHERE pk = ?): every live row whose LEADING key
        components equal ``components``. The ``_key`` encoding is
        prefix-preserving (string-cast components joined with '|'), so
        the read targets only the sorted runs whose [min_key, max_key]
        intersects [prefix, prefix+maxchar] — O(matching runs) per
        partition, never the lake; rows scatter across partitions (hash
        of the FULL key routes), so every partition's run list is range-
        checked, but each check is metadata-only. Rows are exactly
        filtered afterwards, so numeric components never false-match on
        string ordering. A full-length component tuple delegates to
        :meth:`lookup`."""
        if not self.cfg.key_cols:
            raise ValueError(
                "lookup_prefix requires a composite-PK lake (key_cols); "
                "use lookup() for single-column keys"
            )
        comps = (
            list(components)
            if isinstance(components, (list, tuple)) else [components]
        )
        if not 1 <= len(comps) <= len(self.cfg.key_cols):
            raise ValueError(
                f"prefix length {len(comps)} not in 1..{len(self.cfg.key_cols)}"
            )
        if len(comps) == len(self.cfg.key_cols):
            return self.lookup([tuple(comps)], version=version)
        from debezium_incubator_ray.envelope import (
            COMPOSITE_KEY, DELETED, composite_key_arrays, merge_lww,
        )
        from debezium_incubator_ray.stages.apply import upgrade_run_table

        pfx = composite_key_arrays(
            [pa.array([c]) for c in comps]
        )[0].as_py() + "|"
        hi = pfx + "\U0010FFFF"
        m = self._manifest_at(version)
        target = m.current_schema()
        defaults = m.doc["defaults"]
        key = self.cfg.key

        def range_hits(files: List[Dict]) -> List[pa.Table]:
            out = []
            for f in files:
                if f["max_key"] < pfx or f["min_key"] > hi:
                    continue
                t = pq.read_table(os.path.join(self.lake_dir, f["path"]))
                if f.get("schema_version", 1) != m.doc["schemas"][-1]["version"]:
                    t = upgrade_run_table(t, target, defaults)
                t = t.filter(pc.starts_with(t[key], pattern=pfx))
                if t.num_rows:
                    out.append(t)
            return out

        tbls = []
        for p in range(m.num_partitions):
            base_hits = range_hits(m.files(p))
            delta_hits = range_hits(m.deltas(p))
            if not delta_hits:
                tbls.extend(base_hits)
                continue
            base = (
                pa.concat_tables(base_hits, promote_options="permissive")
                if base_hits else None
            )
            # newest delta first: equal-LSN ties go to the later writer,
            # same as lookup() and the scan path
            d = pa.concat_tables(
                list(reversed(delta_hits)), promote_options="permissive"
            )
            op = pc.if_else(
                pc.fill_null(d[DELETED].combine_chunks(), False),
                pa.scalar("d"), pa.scalar("r"),
            )
            d = d.drop_columns([DELETED]).append_column("op", op)
            merged = merge_lww(
                base, d, key, keep_tombstones=not m.doc.get("tombstones", True)
            )
            if merged.num_rows:
                tbls.append(merged)
        if not tbls:
            t = S.upgrade_table(pa.table({}), target, defaults)
            return t.append_column(S.LSN, pa.array([], pa.int64()))
        out = pa.concat_tables(tbls, promote_options="permissive").sort_by(
            [(key, "ascending")]
        )
        if COMPOSITE_KEY in out.column_names:
            out = out.drop_columns([COMPOSITE_KEY])
        return out

    def changes_between(
        self, v_old: int, v_new: Optional[int] = None
    ) -> "ray.data.Dataset":
        """Derive the change feed between two retained manifest versions —
        the lake→CDC inverse (an outbox over time travel): one row per key
        whose state differs, with op = 'c' (key absent at v_old), 'u'
        (winner LSN changed) or 'd' (key absent at v_new). For c/u rows
        the payload is the v_new state and ``_lsn`` its winner; for 'd'
        rows the payload is null and ``_lsn`` is the v_old winner (the
        version the delete removed).

        Winner identity IS the LSN (LWW), so the diff never compares
        payload bytes — only the key-sorted (key, lsn) sequences. One task
        per partition reads both versions' runs for that partition
        (co-located by construction — no shuffle)."""
        m_old = self._manifest_at(v_old)
        m_new = self._manifest_at(v_new)
        if m_old.num_partitions != m_new.num_partitions:
            raise ValueError("versions have different partition counts")
        target = m_new.current_schema()
        defaults = m_new.doc["defaults"]
        key = self.cfg.key
        lake_dir = self.lake_dir
        old_ents = {
            p: m_old.doc["partitions"][str(p)] for p in range(m_old.num_partitions)
        }
        new_ents = {
            p: m_new.doc["partitions"][str(p)] for p in range(m_new.num_partitions)
        }
        target_b64 = S.schema_to_b64(target)
        counter_cols = tuple(self.cfg.counter_cols)

        def read_version(ent: Dict) -> pa.Table:
            # merged live state at that version (mor deltas fold on read);
            # forcing schema_version=-1 upgrades every run to the NEW
            # target so both sides diff under one schema
            from debezium_incubator_ray.stages.apply import read_partition_state

            tgt = S.schema_from_b64(target_b64)
            return read_partition_state(
                ent, lake_dir, tgt, defaults, -1, key,
                counter_cols=counter_cols,
            )

        def diff_one(batch: pa.Table) -> pa.Table:
            import numpy as np

            outs = []
            for p in batch[S.PART].to_pylist():
                old = read_version(old_ents[int(p)])
                new = read_version(new_ents[int(p)])
                ko = old[key].combine_chunks().to_numpy(zero_copy_only=False)
                kn = new[key].combine_chunks().to_numpy(zero_copy_only=False)
                lo = old[S.LSN].combine_chunks().to_numpy(zero_copy_only=False)
                ln = new[S.LSN].combine_chunks().to_numpy(zero_copy_only=False)
                # both sides key-sorted and key-unique (sorted-run invariant)
                pos_on = np.searchsorted(kn, ko) if len(kn) else np.zeros(len(ko), np.int64)
                pos_on = np.minimum(pos_on, max(len(kn) - 1, 0))
                in_new = (kn[pos_on] == ko) if len(kn) else np.zeros(len(ko), bool)
                pos_no = np.searchsorted(ko, kn) if len(ko) else np.zeros(len(kn), np.int64)
                pos_no = np.minimum(pos_no, max(len(ko) - 1, 0))
                in_old = (ko[pos_no] == kn) if len(ko) else np.zeros(len(kn), bool)

                created = ~in_old
                updated = in_old & (lo[pos_no] != ln) if len(ko) else in_old
                deleted = ~in_new
                cu = new.filter(pa.array(created | updated))
                op_cu = np.where(created[created | updated], "c", "u")
                cu = cu.append_column("op", pa.array(op_cu, pa.string()))
                dd = old.filter(pa.array(deleted))
                if dd.num_rows:
                    null_payload = {
                        f.name: pa.nulls(dd.num_rows, f.type)
                        for f in target
                        if f.name != key
                    }
                    d_tbl = pa.table(
                        {
                            key: dd[key],
                            **null_payload,
                            S.LSN: dd[S.LSN],
                            "op": pa.array(["d"] * dd.num_rows),
                        }
                    ).select(cu.column_names)
                    outs.append(
                        pa.concat_tables(
                            [cu, d_tbl], promote_options="permissive"
                        )
                    )
                else:
                    outs.append(cu)
            return pa.concat_tables(outs) if outs else pa.table({})

        items = [{S.PART: p} for p in range(m_new.num_partitions)]
        ds = ray.data.from_items(items, override_num_blocks=len(items))
        return ds.map_batches(
            diff_one, batch_format="pyarrow", num_cpus=self.cfg.apply_num_cpus
        )

    def lake_table(
        self, include_lsn: bool = False, version: Optional[int] = None
    ) -> pa.Table:
        """Driver-side materialization for tests / small results only."""
        m = self._manifest_at(version)
        target = m.current_schema()
        defaults = m.doc["defaults"]
        from debezium_incubator_ray.envelope import DELETED
        from debezium_incubator_ray.stages.apply import read_partition_state

        keep_tombstones = not m.doc.get("tombstones", True)
        schema_version = m.doc["schemas"][-1]["version"]
        tbls = []
        for p in range(m.num_partitions):
            ent = m.doc["partitions"][str(p)]
            if not ent["files"] and not ent.get("deltas"):
                continue
            t = read_partition_state(
                ent, self.lake_dir, target, defaults, schema_version,
                self.cfg.key, keep_tombstones=keep_tombstones,
                counter_cols=tuple(self.cfg.counter_cols),
            )
            if not include_lsn and S.LSN in t.column_names:
                t = t.drop_columns([S.LSN])
            tbls.append(t)
        if not tbls:
            return S.upgrade_table(pa.table({}), target, defaults)
        out = pa.concat_tables(tbls, promote_options="permissive")
        # sort on the engine key (internal _key for composite PKs) BEFORE
        # the user-facing projection drops it
        out = out.sort_by([(self.cfg.key, "ascending")])
        names = [n for n in target.names if n in out.column_names]
        names += [n for n in (S.LSN, DELETED) if n in out.column_names]
        return out.select(names)

    def dead_letters(self, binlog_dir: str) -> "ray.data.Dataset":
        """The DEAD-LETTER VIEW for this lake's CHECK constraints: every
        c/u/r envelope in ``binlog_dir`` that the configured
        ``EngineConfig.constraints`` reject, with the first violated rule
        as ``reason`` — derived on demand from the binlog (no second copy
        of state, so exactly-once needs no extra machinery; re-running
        the view after new segments arrive re-derives it). Columns: the
        normalized payload + op + _lsn + reason.

        Scale shape: the same column-pruned segment read + stateless
        normalize map as the apply path, with the constraint mask
        INVERTED; violations stream out as a Dataset."""
        from debezium_incubator_ray.stages.normalize import (
            NormalizeEnvelope, violation_mask,
        )

        if not self.cfg.constraints:
            raise ValueError("dead_letters requires EngineConfig.constraints")
        segs = binlog_src.list_segments(binlog_dir)
        kw = self._norm_kwargs()
        kw["constraints"] = ()  # normalize everything; WE pick the bad rows
        norm = NormalizeEnvelope(**kw)
        rules = list(NormalizeEnvelope(**self._norm_kwargs()).constraints)

        def pick_bad(t: pa.Table) -> pa.Table:
            out = norm(t)
            if out.num_rows == 0:
                return out.append_column("reason",
                                         pa.array([], pa.string()))
            bad, reason = violation_mask(out, rules)
            out = out.append_column("reason", reason)
            return out.filter(bad)

        if not segs:
            return ray.data.from_items([])
        paths = [os.path.join(binlog_dir, s) for s in segs]
        return ray.data.read_parquet(paths).map_batches(
            pick_bad, batch_format="pyarrow", zero_copy_batch=True
        )

    def apply_schema_changes(self, changes) -> Optional[Dict[str, Any]]:
        """Apply structured SchemaChange ops OUT OF BAND (e.g. Lake.
        apply_ddl's ALTER TABLE branch): the same validation + history
        path an epoch's control file takes, committed durably as its own
        manifest version. Already-applied (change, column, at_lsn)
        triples are skipped — replaying the same DDL is a no-op. Returns
        the schema_update committed, or None if nothing was fresh.

        Concurrency contract: while a ``tail()`` streams, a SECOND
        process evolves the schema through the binlog control channel
        (sources/binlog.py append_schema_changes — the tail polls it
        every epoch, keeping ONE manifest writer; the reference's
        external-schema-registry model, CAS/SchemaProcessor.java:24-27).
        Calling this directly from a second same-node process is
        REJECTED by the writer lock; on an object-store control plane a
        stale caller loses the conditional put (ConcurrentCommitError)
        and this method recovers by reloading CURRENT and replaying the
        still-fresh changes on top — schema history is append-only and
        deduped, so the replay is idempotent."""
        from debezium_incubator_ray.state.store import ConcurrentCommitError

        changes = list(changes)
        # idempotent-replay fast path BEFORE the writer lock: re-running
        # already-applied DDL must stay a no-op even while another
        # process (e.g. a live tail) holds the lock
        if self._build_schema_update(changes) is None:
            return None
        self._acquire_lock()
        for _ in range(10):
            upd = self._build_schema_update(changes)
            if upd is None:
                return None
            try:
                self.manifest = self.manifest.commit({}, schema_update=upd)
                self.flush()
                return upd
            except ConcurrentCommitError:
                # lost the conditional put: reload the winner's state and
                # replay (what is already applied there folds away)
                self.manifest = Manifest.load(
                    self.lake_dir, store=self._manifest_store
                )
        raise ConcurrentCommitError(
            "apply_schema_changes lost the manifest conditional put 10 "
            "times in a row — a writer is committing continuously"
        )

    def _pending_schema_update(self, binlog_dir: str) -> Optional[Dict[str, Any]]:
        return self._build_schema_update(
            binlog_src.load_schema_changes(binlog_dir)
        )

    def _build_schema_update(self, changes) -> Optional[Dict[str, Any]]:
        if not changes:
            return None
        applied = set()
        for s in self.manifest.doc["schemas"]:
            for c in s.get("changes", []):
                applied.add((c["change"], c["column"], c["at_lsn"]))
        fresh = [
            c for c in changes if (c.change, c.column, c.at_lsn) not in applied
        ]
        if not fresh:
            return None
        schema = self.manifest.current_schema()
        defaults: Dict[str, Any] = dict(self.manifest.doc["defaults"])
        new_defaults: Dict[str, Any] = {}
        allowed = {
            # renames break every by-name consumer: "full" contract only
            "full": {"add_column", "widen_type", "drop_column",
                     "rename_column"},
            "backward": {"add_column", "widen_type"},
            "additive": {"add_column"},
        }[self.cfg.schema_compatibility]
        renames = dict(defaults.get(S.RENAMES_KEY) or {})
        any_rename = False
        key_names = set(self.cfg.key_cols or [self.cfg.key])
        for ch in sorted(fresh, key=lambda c: c.at_lsn):
            if ch.change not in allowed:
                raise SchemaCompatibilityError(
                    f"schema change {ch.change!r} on column {ch.column!r} "
                    f"(at_lsn={ch.at_lsn}) violates the lake's "
                    f"schema_compatibility={self.cfg.schema_compatibility!r}"
                    " contract; no data from this epoch was applied"
                )
            if ch.change == "add_column" and ch.column in renames:
                raise SchemaCompatibilityError(
                    f"add_column {ch.column!r}: the name was renamed away "
                    f"(-> {renames[ch.column]!r}) and is RETIRED — the "
                    "cumulative rename map would re-route the new column's "
                    "files and envelopes onto the renamed column"
                )
            if ch.change == "rename_column" and ch.column in key_names:
                raise SchemaCompatibilityError(
                    f"rename_column on the merge/routing key {ch.column!r}: "
                    "the key's identity anchors partitioning, run sort "
                    "order and watermark dedup — export + rebuild instead"
                )
            before = set(defaults)
            schema = S.apply_change(schema, defaults, ch)
            for k in set(defaults) - before:
                new_defaults[k] = defaults[k]
            if ch.change == "rename_column":
                # cumulative {historical -> current}: chase chains so every
                # generation of files/envelopes resolves in one hop
                for k, v in list(renames.items()):
                    if v == ch.column:
                        renames[k] = ch.to
                renames[ch.column] = ch.to
                if ch.column in new_defaults:
                    new_defaults[ch.to] = new_defaults.pop(ch.column)
                any_rename = True
        if any_rename:
            new_defaults[S.RENAMES_KEY] = renames
        upd = {
            "version": self.manifest.doc["schemas"][-1]["version"] + 1,
            "at_lsn": min(c.at_lsn for c in fresh),
            "schema": S.schema_to_b64(schema),
            "changes": [c.to_json() for c in fresh],
            "new_defaults": new_defaults,
        }
        if any_rename:
            # retire the old-name default entries (dict.update alone would
            # leave them to silently re-attach if the name ever returned)
            upd["retired_defaults"] = [
                c.column for c in fresh if c.change == "rename_column"
            ]
        return upd

def transaction_summary(binlog_dir: str) -> "ray.data.Dataset":
    """The Debezium TRANSACTION-METADATA TOPIC analog: one row per
    source transaction in a binlog — (tx_id, n_events, declared,
    first_lsn, last_lsn, complete) — so downstream consumers can gate on
    transaction boundaries without replaying the data stream themselves
    (Debezium's `provide.transaction.metadata` emits exactly this
    BEGIN/END envelope around the Oracle connector's XStream
    transactions).

    Scale shape: a pure metadata fold — per-block partials group each
    block to its distinct tx rows (count, min/max LSN, declared), one
    narrow groupby folds them; only the `source` struct and the two tx
    columns are ever read off storage (column-pruned at the reader)."""
    from ray.data.aggregate import Max, Min, Sum

    segs = binlog_src.list_segments(binlog_dir)
    if not segs:
        return ray.data.from_arrow(pa.table({
            "tx_id": pa.array([], pa.int64()),
            "n_events": pa.array([], pa.int64()),
            "declared": pa.array([], pa.int64()),
            "first_lsn": pa.array([], pa.int64()),
            "last_lsn": pa.array([], pa.int64()),
            "complete": pa.array([], pa.bool_()),
        }))
    paths = [os.path.join(binlog_dir, s) for s in segs]
    ds = ray.data.read_parquet(
        paths, columns=["source", "tx_id", "tx_events"]
    )

    def partial(t: pa.Table) -> pa.Table:
        lsn = t["source"].combine_chunks().field("lsn")
        g = pa.table({
            "tx_id": t["tx_id"],
            "lsn": lsn,
            "decl": pc.cast(t["tx_events"], pa.int64()),
        }).group_by("tx_id").aggregate(
            [("lsn", "count"), ("lsn", "min"), ("lsn", "max"),
             ("decl", "max")]
        )
        return pa.table({
            "tx_id": g["tx_id"],
            "n": pc.cast(g["lsn_count"], pa.int64()),
            "first": g["lsn_min"],
            "last": g["lsn_max"],
            "decl": g["decl_max"],
        })

    folded = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("tx_id")
        .aggregate(Sum("n", alias_name="n"), Min("first", alias_name="first"),
                   Max("last", alias_name="last"),
                   Max("decl", alias_name="decl"))
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "tx_id": t["tx_id"],
            "n_events": t["n"],
            "declared": t["decl"],
            "first_lsn": t["first"],
            "last_lsn": t["last"],
            "complete": pc.equal(t["n"], t["decl"]),
        })

    return folded.map_batches(finish, batch_format="pyarrow")
