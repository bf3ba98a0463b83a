"""Versioned lake manifest: the exactly-once commit point.

Reference parity: FileOffsetWriter.java:41-172 (mark-if-greater offsets,
flush-after-ack) + OracleOffsetContext.java:196-218 (resume from offset,
snapshot flags) + schema history (OracleDatabaseSchema.java:49-64), unified
into one atomically-swapped JSON document per lake table:

- per-partition max-LSN watermarks (the replay-dedup predicate, P9/D1),
- per-partition sorted-run file lists with min/max key stats (copy-on-write
  targeting: only runs whose key range intersects an epoch's keys are
  rewritten),
- schema versions with their activation LSNs (T3 schema history),
- snapshot completion flag + snapshot LSN (T5),
- segments already applied (prune re-delivered segments at the read),
- lineage of the last commit (T6: applied offset ranges, row counts, skew).

Commit protocol (exactly-once across retried Ray tasks): apply tasks write
data files under unique names and return only metadata; the driver writes
``v{n}.json`` then atomically renames ``CURRENT`` to point at it. A crash
anywhere leaves the previous manifest intact; orphan data files are invisible
and garbage-collectable. Mirrors mark-offset-only-after-ack
(KafkaRecordEmitter.java:58-71) with "ack" = Ray task completion.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional


class Manifest:
    def __init__(self, lake_dir: str, doc: Dict[str, Any], store=None):
        from debezium_incubator_ray.state.store import LocalFsStore

        self.lake_dir = lake_dir
        self.doc = doc
        self.store = store or LocalFsStore(os.path.join(lake_dir, "_manifest"))
        # lineage rows committed in memory but not yet persisted (periodic
        # offset-flush mode, OffsetFlushPolicy.java:19-51); written on flush
        self._pending_lineage: List[Dict[str, Any]] = []

    # -- construction -------------------------------------------------------
    @staticmethod
    def create(
        lake_dir: str,
        table: str,
        key: str,
        num_partitions: int,
        schema_b64: str,
        partitioner: str = "hash",
        tombstones: bool = True,
        sink_mode: str = "cow",
        key_cols=None,
        mor_compact_deltas=None,
        stats_columns=None,
        merge_mode="lww",
        counter_cols=None,
        bloom_filter_bits=0,
        store=None,
    ) -> "Manifest":
        from debezium_incubator_ray.hashing import HASH_IMPL

        os.makedirs(os.path.join(lake_dir, "data"), exist_ok=True)
        os.makedirs(os.path.join(lake_dir, "_manifest"), exist_ok=True)
        doc = {
            "version": 0,
            "table": table,
            "key": key,
            "partitioner": partitioner,
            # routing-hash implementation id: resuming with a different hash
            # would silently re-route keys to other partitions (duplicate
            # keys across partitions, events dropped by foreign watermarks),
            # so load() refuses a mismatch outright
            "hash_impl": HASH_IMPL,
            "num_partitions": num_partitions,
            "schemas": [{"version": 1, "at_lsn": -1, "schema": schema_b64, "changes": []}],
            "defaults": {},
            # delete semantics for this table (see EngineConfig.tombstones):
            # True = compact deletes away; False = retain _deleted markers
            "tombstones": tombstones,
            # sink write mode (see EngineConfig.sink_mode): "cow" rewrites
            # touched runs per epoch; "mor" appends delta runs, readers
            # merge, compact() folds
            "sink_mode": sink_mode,
            # merge semantics (see EngineConfig.merge_mode): "lww" full-row,
            # "partial" per-cell with set-mask envelopes
            "merge_mode": merge_mode,
            # additive counter columns (EngineConfig.counter_cols)
            "counter_cols": list(counter_cols or []),
            # mor auto-compaction threshold: a table policy — restart must
            # keep folding, or delta backlog (read amplification) grows
            # unbounded on the resumed run
            "mor_compact_deltas": mor_compact_deltas,
            # composite-PK component columns (key is then the derived
            # internal _key column); None for single-column keys
            "key_cols": key_cols,
            # zone-map columns: every run records min/max for these (see
            # EngineConfig.stats_columns; CdcEngine.scan prunes with them)
            "stats_columns": list(stats_columns or []),
            # per-run key Bloom sidecars (EngineConfig.bloom_filter_bits):
            # bits per key, 0 = off; lookup() skips definitely-missing runs
            "bloom_filter_bits": int(bloom_filter_bits or 0),
            "snapshot_complete": False,
            "snapshot_lsn": -1,
            "partitions": {
                str(p): {"watermark": -1, "files": []} for p in range(num_partitions)
            },
            "segments_done": [],
            # quarantined segments: {relpath: error}; skipped by plan_epoch,
            # surfaced for operators (reference: segment moved to error/,
            # QueueProcessor.java:85-106)
            "segments_error": {},
            "lineage": [],
        }
        m = Manifest(lake_dir, doc, store=store)
        m._write()
        return m

    @staticmethod
    def load(lake_dir: str, store=None) -> "Manifest":
        from debezium_incubator_ray.hashing import HASH_IMPL
        from debezium_incubator_ray.state.store import LocalFsStore

        store = store or LocalFsStore(os.path.join(lake_dir, "_manifest"))
        v = int(store.read("CURRENT").strip())
        doc = json.loads(store.read(f"v{v}.json"))
        recorded = doc.get("hash_impl", HASH_IMPL)
        if doc.get("partitioner", "hash") == "hash" and recorded != HASH_IMPL:
            raise RuntimeError(
                f"lake {lake_dir} was written with routing hash "
                f"'{recorded}' but this build uses '{HASH_IMPL}'; resuming "
                "would re-route keys across partitions (exactly-once "
                "violation). Rebuild the lake or run the matching build."
            )
        return Manifest(lake_dir, doc, store=store)

    @staticmethod
    def load_version(lake_dir: str, version: int, store=None) -> "Manifest":
        """Time-travel: load a specific retained manifest version. Valid as
        long as the version document exists and ``vacuum`` has not deleted
        the data files it references (CoW never overwrites them)."""
        from debezium_incubator_ray.state.store import LocalFsStore

        store = store or LocalFsStore(os.path.join(lake_dir, "_manifest"))
        raw = store.read(f"v{version}.json")
        if raw is None:
            raise FileNotFoundError(
                f"manifest version {version} not found in {lake_dir} "
                "(never persisted, or removed by vacuum)"
            )
        return Manifest(lake_dir, json.loads(raw), store=store)

    def versions(self) -> List[int]:
        """All retained (persisted) manifest versions, ascending."""
        out = []
        for name in self.store.list():
            if name.startswith("v") and name.endswith(".json"):
                try:
                    out.append(int(name[1:-5]))
                except ValueError:
                    pass
        return sorted(out)

    @staticmethod
    def exists(lake_dir: str, store=None) -> bool:
        if store is not None:
            return store.exists("CURRENT")
        return os.path.exists(os.path.join(lake_dir, "_manifest", "CURRENT"))

    # -- accessors -----------------------------------------------------------
    @property
    def version(self) -> int:
        return self.doc["version"]

    @property
    def num_partitions(self) -> int:
        return self.doc["num_partitions"]

    def watermark(self, p: int) -> int:
        return self.doc["partitions"][str(p)]["watermark"]

    def files(self, p: int) -> List[Dict]:
        return self.doc["partitions"][str(p)]["files"]

    def deltas(self, p: int) -> List[Dict]:
        """Merge-on-read delta runs for a partition (empty in CoW mode)."""
        return self.doc["partitions"][str(p)].get("deltas", [])

    def all_files(self) -> List[str]:
        out = []
        for p in self.doc["partitions"].values():
            out += [f["path"] for f in p["files"]]
            out += [f["path"] for f in p.get("deltas", [])]
        return out

    def current_schema(self):
        from debezium_incubator_ray.schema import schema_from_b64

        return schema_from_b64(self.doc["schemas"][-1]["schema"])

    # -- commit --------------------------------------------------------------
    def commit(
        self,
        partition_updates: Dict[int, Dict[str, Any]],
        segments_done: Optional[List[str]] = None,
        lineage: Optional[Dict[str, Any]] = None,
        schema_update: Optional[Dict[str, Any]] = None,
        snapshot: Optional[Dict[str, Any]] = None,
        segments_error: Optional[Dict[str, str]] = None,
        extra_state: Optional[Dict[str, Any]] = None,
        persist: bool = True,
        source: str = "",
    ) -> "Manifest":
        """Produce the next manifest version; atomically publish it when
        ``persist`` (the offset-flush point). With ``persist=False`` the new
        version is commit-in-memory only (Periodic flush policy,
        OffsetFlushPolicy.java:30-44): a crash loses nothing but progress —
        the previously-persisted version is still valid because CoW never
        deletes the data files it references."""
        doc = json.loads(json.dumps(self.doc))  # deep copy
        doc["version"] += 1
        for p, upd in partition_updates.items():
            ent = doc["partitions"][str(p)]
            if "watermark" in upd:
                if source:
                    # named offset channel (sharded fan-in): mark-if-greater
                    # against the SOURCE's own watermark — channels have
                    # independent LSN domains, never fold into the scalar
                    wms = ent.setdefault("watermarks", {})
                    wms[source] = max(wms.get(source, -1), upd["watermark"])
                else:
                    ent["watermark"] = max(ent["watermark"], upd["watermark"])
            if "files" in upd:
                ent["files"] = upd["files"]
            if "deltas" in upd:
                ent["deltas"] = upd["deltas"]
        if segments_done:
            if source:
                by_src = doc.setdefault("segments_done_by_source", {})
                prev = set(by_src.get(source, []))
                by_src[source] = sorted(prev | set(segments_done))
            else:
                done = set(doc["segments_done"])
                doc["segments_done"] = sorted(done | set(segments_done))
        if segments_error:
            if source:
                by_src = doc.setdefault("segments_error_by_source", {})
                by_src.setdefault(source, {}).update(segments_error)
            else:
                doc.setdefault("segments_error", {}).update(segments_error)
        if lineage is not None:
            doc["lineage"] = (doc["lineage"] + [lineage])[-50:]
        if schema_update is not None:
            doc["schemas"].append(schema_update)
            doc["defaults"].update(schema_update.get("new_defaults", {}))
            for k in schema_update.get("retired_defaults", []):
                doc["defaults"].pop(k, None)
        if snapshot is not None:
            doc["snapshot_complete"] = snapshot.get("complete", True)
            doc["snapshot_lsn"] = snapshot.get("lsn", doc["snapshot_lsn"])
        if extra_state:
            # progress documents for auxiliary protocols (e.g. the
            # incremental-snapshot chunk cursor) — committed atomically with
            # the data they describe
            doc.update(json.loads(json.dumps(extra_state)))
        nxt = Manifest(self.lake_dir, doc, store=self.store)
        nxt._pending_lineage = list(self._pending_lineage)
        if lineage is not None:
            nxt._pending_lineage.append(
                {"_version": doc["version"], **lineage}
            )
        if persist:
            nxt.persist()
        return nxt

    def persist(self) -> "Manifest":
        """Flush this in-memory version (and any pending lineage rows) to the
        store — the durability point. Idempotent."""
        self._write()
        for row in self._pending_lineage:
            self._append_lineage(row, version=row.pop("_version"))
        self._pending_lineage = []
        return self

    @property
    def dirty(self) -> bool:
        """True if in-memory state is ahead of the persisted CURRENT."""
        cur = self.store.read("CURRENT")
        return cur is None or int(cur.strip()) != self.doc["version"]

    def _append_lineage(self, lineage: Dict[str, Any], version: Optional[int] = None) -> None:
        """Per-commit lineage row → queryable `_lineage/` parquet table
        (T6: applied offset ranges, row counts, skew stats per commit —
        the reference exposes these as Dropwizard gauges,
        CommitLogProcessorMetrics.java:21-65)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        ldir = os.path.join(self.lake_dir, "_lineage")
        os.makedirs(ldir, exist_ok=True)
        v = self.doc["version"] if version is None else version
        row = {
            "version": v,
            "kind": lineage.get("kind"),
            "events": lineage.get("events", 0),
            "partitions_touched": lineage.get("partitions_touched", 0),
            "rows_per_partition_max": lineage.get("rows_per_partition_max", 0),
            "rows_per_partition_mean": float(
                lineage.get("rows_per_partition_mean", 0.0)
            ),
            "skew_ratio": float(lineage.get("skew_ratio", 0.0)),
            "seconds": float(lineage.get("seconds", 0.0)),
            "watermarks_json": json.dumps(lineage.get("watermarks", {})),
        }
        pq.write_table(
            pa.Table.from_pylist([row]),
            os.path.join(ldir, f"v{v:08d}.parquet"),
        )

    def lineage_table(self):
        """All lineage commits as one Arrow table (read with
        ray.data.read_parquet(f"{lake}/_lineage") at scale)."""
        import pyarrow.parquet as pq

        ldir = os.path.join(self.lake_dir, "_lineage")
        if not os.path.isdir(ldir) or not os.listdir(ldir):
            return None
        return pq.read_table(ldir)

    def _write(self) -> None:
        # OffsetWriter-protocol publish (state/store.py): version doc first,
        # then the CURRENT pointer swap — the only visibility point
        self.store.write_atomic(
            f"v{self.doc['version']}.json", json.dumps(self.doc, indent=1)
        )
        self.store.write_atomic("CURRENT", str(self.doc["version"]))
