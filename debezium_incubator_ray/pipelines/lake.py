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
        namer: Optional[Callable[[str], str]] = None,
    ):
        """``namer``: pluggable table→output-name function (the reference's
        TableTopicNamer functional interface,
        CassandraTopicSelector.java:43-46); the result is sanitized like a
        topic name either way. Default: ``prefix.name``."""
        self.root = root
        self.prefix = prefix
        self.namer = namer
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

    def _safe_name(self, name: str) -> str:
        if self.namer is not None:
            return _SANITIZE_RE.sub("_", self.namer(name))
        return sanitize_table_name(name, self.prefix)

    def create_table(
        self,
        name: str,
        payload_schema: pa.Schema,
        config: Optional[EngineConfig] = None,
    ) -> CdcEngine:
        safe = self._safe_name(name)
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
        return self.engines[self._safe_name(name)]

    def drop_table(self, name: str, delete_files: bool = False) -> None:
        """Schema-set reconciliation, deletion half (D3): detach a table
        from the registry (SchemaHolder.java:107-123 removes tables gone
        from cluster metadata). ``delete_files=True`` also removes the lake
        directory — otherwise the data stays on disk and a later restart
        re-attaches it."""
        safe = self._safe_name(name)
        eng = self.engines.pop(safe, None)
        if eng is not None:
            eng.close()
        if delete_files:
            import shutil

            shutil.rmtree(os.path.join(self.root, safe), ignore_errors=True)

    def apply_ddl(
        self,
        text: str,
        at_lsn: int = 0,
        config: Optional[EngineConfig] = None,
    ):
        """Apply ONE textual DDL statement to the registry — the full
        OracleDdlParser.java:44-110 listener surface over this engine's
        structured control plane:

        - CREATE TABLE → :meth:`create_table` with the parsed arrow
          schema; the parsed PRIMARY KEY becomes the engine key (single
          column) or composite ``key_cols``; parsed DEFAULT literals
          seed the lake's default map (CreateTableParserListener.java:28-49).
          A PK-less CREATE is rejected unless ``config`` names a key that
          exists in the parsed columns (the engine cannot merge without a
          key identity). Re-CREATE of an existing table is a pure
          attach — the new statement's schema/key/defaults are IGNORED
          (matching the reference's Tables registry keeping the first
          definition until a DROP);
        - DROP TABLE → :meth:`drop_table`; the Oracle ``PURGE`` trailer
          (skip the recycle bin) maps to ``delete_files=True``
          (DropTableParserListener.java:24-43);
        - ALTER TABLE → applied to the named table's engine through the
          same validated schema-history path an epoch's control file
          takes (CdcEngine.apply_schema_changes — durable manifest
          commit; replays are no-ops). The table must exist.

        Returns ("create", CdcEngine) | ("drop", name) | ("alter", name,
        [SchemaChange]).
        """
        import dataclasses as _dc

        from debezium_incubator_ray.ddl import parse_statement

        parsed = parse_statement(text, at_lsn=at_lsn)
        if parsed[0] == "create":
            tdef = parsed[1]
            if self._safe_name(tdef.name) in self.engines:
                # pure attach: the registry keeps the first definition
                return ("create", self[tdef.name])
            cfg = _dc.replace(config) if config is not None else EngineConfig()
            pk = [c.lower() for c in tdef.primary_key]
            col_names = {c[0] for c in tdef.columns}
            if len(pk) == 1:
                cfg.key = pk[0]
                cfg.key_cols = None
            elif len(pk) > 1:
                cfg.key_cols = pk
            else:
                # no PK in the DDL: the config must name a real column —
                # silently keying on a nonexistent default would fail (or
                # mis-key) at the first epoch
                key_cols = list(cfg.key_cols or [cfg.key])
                if config is None or not all(
                    k in col_names for k in key_cols
                ):
                    raise ValueError(
                        f"CREATE TABLE {tdef.name!r} has no PRIMARY KEY "
                        f"and no explicit engine key among its columns "
                        f"({sorted(col_names)}); declare a PK or pass a "
                        "config whose key/key_cols exist in the table"
                    )
            eng = self.create_table(tdef.name, tdef.arrow_schema(), cfg)
            lits = tdef.defaults()
            if lits:
                # persist DEFAULT literals through a real manifest commit
                # (an in-memory doc mutation would vanish on reload)
                eng.manifest = eng.manifest.commit(
                    {},
                    extra_state={
                        "defaults": {**eng.manifest.doc["defaults"], **lits}
                    },
                )
            return ("create", eng)
        if parsed[0] == "drop":
            name, opts = parsed[1], parsed[2]
            self.drop_table(name, delete_files=opts["purge"])
            return ("drop", name)
        _, table, changes = parsed
        if self._safe_name(table) not in self.engines:
            raise KeyError(f"ALTER TABLE {table!r}: no such table in lake")
        self[table].apply_schema_changes(changes)
        return ("alter", table, changes)

    def process_ddl_segment(
        self,
        binlog_dir: str,
        config: Optional[EngineConfig] = None,
    ) -> list:
        """Drive table-LIFECYCLE DDL from the binlog's control file: scan
        ``_schema_changes.json`` for raw-``ddl`` entries whose statement is
        CREATE/DROP TABLE and apply them to the registry in file order.
        Column-level ALTERs in the same file are left in place — each
        table's engine consumes them during its own epoch
        (sources/binlog.py load_schema_changes skips lifecycle entries
        symmetrically). Idempotent: re-creating an existing table is a
        no-op attach; dropping an unknown table is a no-op. Returns the
        ops applied, e.g. [("create", "t1"), ("drop", "t2")]."""
        import json as _json

        from debezium_incubator_ray.ddl import parse_statement

        path = os.path.join(binlog_dir, "_schema_changes.json")
        if not os.path.exists(path):
            return []
        with open(path) as f:
            entries = _json.load(f)
        applied = []
        for d in entries:
            if "ddl" not in d:
                continue
            parsed = parse_statement(d["ddl"], at_lsn=d.get("at_lsn", 0))
            if parsed[0] == "create":
                self.apply_ddl(d["ddl"], at_lsn=d.get("at_lsn", 0),
                               config=config)
                applied.append(("create", parsed[1].name))
            elif parsed[0] == "drop":
                self.apply_ddl(d["ddl"], at_lsn=d.get("at_lsn", 0))
                applied.append(("drop", parsed[1]))
        return applied

    def _demux_staging(self, paths, norm_kwargs, route_fn, engines) -> list:
        """Shared-staging-root demux exchange (the single-node default):
        DemuxStagingWriter files + DemuxApplier reads."""
        import uuid as _uuid

        import ray.data

        from debezium_incubator_ray import schema as S
        from debezium_incubator_ray.stages.exchange import (
            DemuxApplier,
            DemuxStagingWriter,
        )

        stage_dir = os.path.join(self.root, "_staging", _uuid.uuid4().hex)
        try:
            manifests = (
                ray.data.read_parquet(paths)
                .map_batches(
                    DemuxStagingWriter,
                    fn_constructor_kwargs={
                        "stage_dir": stage_dir,
                        "norm_kwargs_by_table": norm_kwargs,
                        "route_fn": route_fn,
                    },
                    batch_format="pyarrow",
                    zero_copy_batch=True,
                    concurrency=(1, 8),
                )
                .take_all()  # tiny (table, p, path, rows) rows
            )
            files_by_tp: dict = {}
            for m in manifests:
                files_by_tp.setdefault(f"{m['table']}|{int(m[S.PART])}", []).append(
                    m["path"]
                )
            if not files_by_tp:
                return []
            items = [
                {"table": k.split("|")[0], S.PART: int(k.split("|")[1])}
                for k in sorted(files_by_tp)
            ]
            return ray.data.from_items(
                items, override_num_blocks=len(items)
            ).map_batches(
                DemuxApplier,
                fn_constructor_kwargs={
                    "manifest_docs": {
                        t: e.manifest.doc for t, e in engines.items()
                    },
                    "lake_dirs": {t: e.lake_dir for t, e in engines.items()},
                    "stage_dir": stage_dir,
                    "files_by_tp": files_by_tp,
                    "target_rows_per_file": {
                        t: e.cfg.target_rows_per_file
                        for t, e in engines.items()
                    },
                },
                batch_format="pyarrow",
                concurrency=(1, 8),
            ).take_all()
        finally:
            import shutil

            shutil.rmtree(stage_dir, ignore_errors=True)

    def _demux_objref(self, paths, norm_kwargs, route_fn, engines) -> list:
        """Locality-aware object-store demux exchange (the multi-node
        path — no shared staging root; see stages/exchange.py): raw
        blocks split per (table, partition) into driver-owned LZ4-IPC
        slice objects that stay on the producing node; one apply task per
        touched (table, partition) with its slice refs as args."""
        import ray
        import ray.data

        import numpy as np

        from debezium_incubator_ray.stages.exchange import (
            apply_demux_slices,
            combine_slice_refs,
            read_split_block_demux,
        )

        layout = [
            (t, p)
            for t in sorted(norm_kwargs)
            for p in range(norm_kwargs[t]["num_partitions"])
        ]
        if not paths:
            return []
        nk_ref = ray.put(norm_kwargs)
        # fully-fused stage 1: read + route + normalize + split in one
        # task per segment group — raw bytes never enter the object store
        # (see the single-table objref exchange)
        nb = max(1, min(len(paths), 64))
        groups = [list(g) for g in np.array_split(np.array(paths), nb)
                  if len(g)]
        split = read_split_block_demux.options(num_returns=len(layout) + 1)
        rb = next(iter(engines.values())).cfg.read_batch_size
        outs = [split.remote(g, nk_ref, route_fn, layout, rb)
                for g in groups]
        metas = ray.get([o[0] for o in outs])
        refs_by_slot = {
            i: [outs[b][i + 1] for b in range(len(outs))
                if metas[b][0][i] > 0]
            for i in range(len(layout))
        }
        nodes_by_slot = {
            i: [metas[b][1] for b in range(len(outs))
                if metas[b][0][i] > 0]
            for i in range(len(layout))
        }
        # splits done: release the empty-slice refs so only the live LZ4
        # slices stay resident through the apply stage
        del outs
        # multi-node: per-node combine per slot (no-op on a single node;
        # see the single-table objref exchange)
        if next(iter(engines.values())).cfg.exchange_combine:
            refs_by_slot = combine_slice_refs(refs_by_slot, nodes_by_slot)
        ctor_ref = ray.put(dict(
            manifest_docs={t: e.manifest.doc for t, e in engines.items()},
            lake_dirs={t: e.lake_dir for t, e in engines.items()},
            target_rows_per_file={
                t: e.cfg.target_rows_per_file for t, e in engines.items()
            },
        ))
        tasks = [
            apply_demux_slices.remote(ctor_ref, tname, p,
                                      *refs_by_slot[i])
            for i, (tname, p) in enumerate(layout)
            if refs_by_slot[i]
        ]
        return [r for t in ray.get(tasks) for r in t.to_pylist()]

    def reconcile(self, latest_tables, delete_files: bool = False) -> list:
        """Schema-set reconciliation (D3), the full loop: given the
        CURRENT set of source tables, detach every registered table no
        longer present (SchemaHolder.java:107-111 removeDeletedTableSchemas
        — existing minus latest is removed from the schema map). New
        tables are NOT auto-created here — creation needs a payload schema
        and goes through :meth:`create_table`, same as the reference's
        separate table-discovery path. Returns the detached safe names."""
        latest = {self._safe_name(n) for n in latest_tables}
        gone = [n for n in self.table_names() if n not in latest]
        for n in gone:
            eng = self.engines.pop(n)
            eng.close()
            if delete_files:
                import shutil

                shutil.rmtree(os.path.join(self.root, n), ignore_errors=True)
        return gone

    def apply_epoch(self, name: str, binlog_dir: str, **kw) -> dict:
        eng = self[name]
        before = set(eng.manifest.doc["segments_done"])
        stats = eng.apply_epoch(binlog_dir, **kw)
        if self.on_segment_done is not None:
            for seg in eng.manifest.doc["segments_done"]:
                if seg not in before:
                    self.on_segment_done(os.path.join(binlog_dir, seg), True)
        return stats

    # ------------------------------------------------------------------
    # mixed-table demux: ONE binlog carrying N tables → N lake tables in a
    # single pipeline pass (reference: RecordMaker.java:36-58 routes each
    # record to CassandraTopicSelector.java:32-110's topic-per-table)
    def apply_epoch_demux(self, binlog_dir: str, route_fn=None,
                          exchange: Optional[str] = None) -> dict:
        """Single-pass routing epoch over a mixed binlog.

        Requires each participating engine's table name to equal the
        envelopes' ``source.table`` value (routing key) — AFTER the
        optional ``route_fn`` SMT has rewritten it (the outbox event
        router: stages.normalize.make_outbox_router routes by an
        aggregate-type payload column). Exactly-once: each
        table commits independently; a crash between table commits leaves
        the missing tables' segments pending, and re-application to the
        already-committed tables is a watermark no-op.

        ``exchange``: "staging" (default; shared staging root under the
        lake) or "objref" (locality-aware object-store staging — the
        multi-node path, stages/exchange.py). None derives from the
        engines: objref iff every participating engine is configured
        objref."""
        import json as _json

        from debezium_incubator_ray import schema as S
        from debezium_incubator_ray.sources import binlog as binlog_src

        engines = dict(self.engines)
        for eng in engines.values():
            eng._acquire_lock()
        pending = set()
        for eng in engines.values():
            done = list(eng.manifest.doc["segments_done"]) + list(
                eng.manifest.doc.get("segments_error", {})
            )
            pending.update(binlog_src.plan_epoch(binlog_dir, done, None))
        segs = sorted(pending)
        if not segs:
            for eng in engines.values():
                eng.manifest = eng.manifest.commit({})
            return {"segments": 0, "events": 0}

        norm_kwargs = {}
        for name, eng in engines.items():
            kw = eng._norm_kwargs()
            kw["table_include_regex"] = f"^{re.escape(name)}$"
            norm_kwargs[name] = kw

        mode = exchange or (
            "objref"
            if engines and all(
                e.cfg.exchange == "objref" for e in engines.values()
            )
            else "staging"
        )
        paths = [os.path.join(binlog_dir, s) for s in segs]
        if mode == "objref":
            applied = self._demux_objref(paths, norm_kwargs, route_fn,
                                         engines)
        else:
            applied = self._demux_staging(paths, norm_kwargs, route_fn,
                                          engines)

        total = 0
        for name, eng in engines.items():
            commits = [c for c in applied if c["table"] == name]
            updates = {
                c[S.PART]: {
                    "watermark": c["watermark"],
                    "files": _json.loads(c["files_json"]),
                }
                for c in commits
            }
            events_t = sum(c["events_applied"] for c in commits)
            total += events_t
            eng.manifest = eng.manifest.commit(
                updates,
                segments_done=segs,
                lineage=eng._lineage("demux-epoch", updates, events_t, 0.0),
            )
        return {"segments": len(segs), "events": total, "tables": len(engines)}
