"""Incrementally-maintained JOIN views over co-partitioned CDC lakes.

The aggregate-view path (``derive.agg_view_envelopes``) maintains a
GROUP-BY view by feeding delta envelopes back through a CdcEngine. Joins
need a different increment: a join row is owned by a (left row, right
row) pair, so the natural maintenance unit is the co-partitioned
PARTITION — when neither side's partition state changed since the last
refresh, every join row in that partition is provably unchanged and the
partition is skipped wholesale.

``JoinView`` materializes ``left ⋈ right`` partition-by-partition into
its own parquet directory and tracks, per partition, a fingerprint of
both sides' manifest entries (run lists + schema version + defaults).
``refresh()`` recomputes ONLY stale partitions — one Ray task each, no
shuffle (co-partitioning aligns the sides 1:1, same law as
``CdcEngine.join_lake``) — and commits the new file list atomically
through the ManifestStore protocol, so a crash mid-refresh leaves the
previous view version fully readable and a re-run converges.

Scale posture (100 TB): the refresh cost is proportional to the CHANGED
partitions, not the view size; fingerprints are metadata-sized (one
manifest read per side); the join itself never shuffles. Hot epochs that
touch every partition degrade gracefully to a full re-join — the same
work a non-incremental rebuild would do, minus nothing. Deployment note
(stated honestly, same as the lake itself): ``view_dir`` must be shared
storage on a multi-node cluster — refresh tasks write their partition's
parquet directly (the data plane), and only the small state doc needs
the ManifestStore protocol (pass an object-store-backed ``store`` for
the control plane); a node-local view_dir works only single-node.

Reference parity: the reference has no view maintenance — this is part
of the lake/LLM-pipeline surface this engine adds on top of the
connector semantics (SURVEY.md §2 addendum).
"""

from __future__ import annotations

import hashlib
import json
import os
import uuid
from typing import Any, Dict, List, Optional

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from debezium_incubator_ray import schema as S
from debezium_incubator_ray.state.store import LocalFsStore, ManifestStore

_STATE_DOC = "viewstate.json"


class JoinViewLockedError(RuntimeError):
    """Another process holds the view's writer lock."""


class _view_write_lock:
    """O_CREAT|O_EXCL lock file around refresh/vacuum's read-modify-
    commit window (the same local-fs single-writer discipline as the
    manifest and text-index writer locks). Concurrent mutation raises
    loudly instead of last-writer-wins-ing the state doc."""

    def __init__(self, view_dir: str):
        self.path = os.path.join(view_dir, "_LOCK")

    def __enter__(self):
        try:
            fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            raise JoinViewLockedError(
                f"another view mutator holds {self.path}; the view is "
                "single-writer (remove the stale lock only if its owner "
                "is dead)"
            ) from None
        os.write(fd, str(os.getpid()).encode())
        os.close(fd)
        return self

    def __exit__(self, *exc):
        try:
            os.remove(self.path)
        except OSError:
            pass
        return False


def side_spec(eng, manifest=None) -> Dict[str, Any]:
    """Serializable read spec for one lake side (ships to Ray tasks).
    ``manifest`` overrides the engine's live manifest — the time-travel
    hook (join_lake at pinned versions reads through retained manifest
    docs, same contract as lake_table(version=))."""
    m = manifest if manifest is not None else eng.manifest
    return dict(
        lake_dir=eng.lake_dir,
        target_b64=S.schema_to_b64(m.current_schema()),
        defaults=dict(m.doc["defaults"]),
        schema_version=m.doc["schemas"][-1]["version"],
        entries={
            p: m.doc["partitions"][str(p)] for p in range(m.num_partitions)
        },
        counter_cols=list(m.doc.get("counter_cols") or []),
        key=eng.cfg.key,
    )


def read_live_state(spec: Dict[str, Any], p: int) -> pa.Table:
    """One partition's merged LIVE state (tombstone markers dropped,
    ``_lsn`` stripped) — the join-ready form of ``read_partition_state``."""
    from debezium_incubator_ray.envelope import DELETED
    from debezium_incubator_ray.stages.apply import read_partition_state

    t = read_partition_state(
        spec["entries"][p], spec["lake_dir"],
        S.schema_from_b64(spec["target_b64"]), spec["defaults"],
        spec["schema_version"], spec["key"],
        counter_cols=tuple(spec.get("counter_cols") or []),
    )
    if DELETED in t.column_names:
        t = t.filter(
            pc.invert(pc.fill_null(t[DELETED], False))
        ).drop_columns([DELETED])
    return t.drop_columns([S.LSN]) if S.LSN in t.column_names else t


def _partition_fingerprint(m, p: int) -> str:
    """Fingerprint of everything that can change a partition's merged
    state: its run entries (names + stats + deltas), the active schema
    version and the default map. Manifest-sized, no data read.

    Hashes the raw run-entry list, so state-PRESERVING lake operations
    (compact, vacuum) also change the fingerprint and force that
    partition's view slice to be recomputed on the next refresh even
    though the merged state is identical. Deliberate: errs toward
    recompute, never toward staleness. If post-compaction rewrites
    matter, fingerprint a content-stable digest instead (per-partition
    live row count + delete count + max lsn)."""
    doc = [
        m.doc["partitions"][str(p)],
        m.doc["schemas"][-1]["version"],
        m.doc["defaults"],
    ]
    raw = json.dumps(doc, sort_keys=True, default=str).encode()
    return hashlib.md5(raw).hexdigest()[:16]


class JoinView:
    """A persisted, incrementally-refreshed ``left ⋈ right`` join view.

    Both lakes must share key, partitioner and partition count (the
    north-rule one-partitioning discipline) — validated at construction
    exactly like ``CdcEngine.join_lake``.
    """

    def __init__(
        self,
        view_dir: str,
        left,
        right,
        join_type: str = "inner",
        left_suffix: str = "",
        right_suffix: str = "_r",
        store: Optional[ManifestStore] = None,
    ):
        m1, m2 = left.manifest, right.manifest
        if (
            m1.doc["key"] != m2.doc["key"]
            or m1.num_partitions != m2.num_partitions
            or m1.doc.get("partitioner") != m2.doc.get("partitioner")
        ):
            raise ValueError(
                "JoinView requires identical key, partitioner and "
                "partition count on both lakes (co-partitioning is what "
                "makes the incremental refresh shuffle-free)"
            )
        self.view_dir = view_dir
        self.left = left
        self.right = right
        self.join_type = join_type
        self.left_suffix = left_suffix
        self.right_suffix = right_suffix
        self.num_partitions = m1.num_partitions
        os.makedirs(view_dir, exist_ok=True)
        self.store = store or LocalFsStore(os.path.join(view_dir, "_view"))

    # -- state ----------------------------------------------------------

    def _load_state(self) -> Dict[str, Any]:
        raw = self.store.read(_STATE_DOC)
        if raw is None:
            return {"version": 0, "partitions": {}}
        return json.loads(raw)

    def state(self) -> Dict[str, Any]:
        """The committed view state (version + per-partition files)."""
        return self._load_state()

    # -- refresh --------------------------------------------------------

    def refresh(self) -> Dict[str, Any]:
        """Recompute stale partitions and commit the new view version.

        Returns ``{"version", "refreshed", "skipped", "rows_written"}``.
        Idempotent: a refresh against unchanged sources rewrites nothing
        and does not bump the version. Single-writer: a second
        concurrent refresh raises ``JoinViewLockedError``. Superseded
        files are left on disk for in-flight readers of the previous
        version — ``vacuum()`` reclaims them once readers drain.
        """
        import ray
        import ray.data

        with _view_write_lock(self.view_dir):
            return self._refresh_locked()

    def _refresh_locked(self) -> Dict[str, Any]:
        import ray
        import ray.data

        state = self._load_state()
        fps = {
            p: (
                _partition_fingerprint(self.left.manifest, p)
                + ":"
                + _partition_fingerprint(self.right.manifest, p)
            )
            for p in range(self.num_partitions)
        }
        stale = [
            p
            for p in range(self.num_partitions)
            if state["partitions"].get(str(p), {}).get("fp") != fps[p]
        ]
        if not stale:
            return {
                "version": state["version"],
                "refreshed": 0,
                "skipped": self.num_partitions,
                "rows_written": 0,
            }

        specs = (side_spec(self.left), side_spec(self.right))
        view_dir = self.view_dir
        join_type = self.join_type
        lsuf, rsuf = self.left_suffix, self.right_suffix
        key = self.left.cfg.key

        def join_one(batch: pa.Table) -> pa.Table:
            parts, files, rows = [], [], []
            for p in batch["p"].to_pylist():
                p = int(p)
                lt = read_live_state(specs[0], p)
                rt = read_live_state(specs[1], p)
                j = lt.join(
                    rt, keys=key, join_type=join_type,
                    left_suffix=lsuf, right_suffix=rsuf,
                )
                fname = None
                if j.num_rows:
                    pdir = os.path.join(view_dir, f"p={p}")
                    os.makedirs(pdir, exist_ok=True)
                    fname = f"view-{uuid.uuid4().hex}.parquet"
                    tmp = os.path.join(pdir, f".{fname}.tmp")
                    pq.write_table(j, tmp)
                    os.replace(tmp, os.path.join(pdir, fname))
                parts.append(p)
                files.append(fname)
                rows.append(j.num_rows)
            return pa.table({
                "p": pa.array(parts, pa.int64()),
                "file": pa.array(files, pa.string()),
                "rows": pa.array(rows, pa.int64()),
            })

        items = [{"p": p} for p in stale]
        out = (
            ray.data.from_items(items, override_num_blocks=len(items))
            .map_batches(join_one, batch_format="pyarrow")
            .take_all()
        )  # driver pulls (partition, file, rows) triples — metadata-sized

        rows_written = 0
        for r in out:
            p = int(r["p"])
            state["partitions"][str(p)] = {
                "fp": fps[p],
                "file": r["file"],
                "rows": int(r["rows"]),
            }
            rows_written += int(r["rows"])
        state["version"] = int(state["version"]) + 1
        # per-commit lineage (the north-rule discipline: every commit
        # records what it touched); bounded — only the newest entries
        # are retained in the state doc
        row = {
            "version": state["version"],
            "refreshed": len(stale),
            "skipped": self.num_partitions - len(stale),
            "rows_written": rows_written,
            "partitions": sorted(int(r["p"]) for r in out),
        }
        state.setdefault("lineage", [])
        state["lineage"] = (state["lineage"] + [row])[-256:]
        # commit point: the state doc names exactly the live files.
        # Superseded/aborted files stay on disk — in-flight readers of
        # the previous version may still be streaming them (same
        # readers-drain contract as text-index compaction); vacuum()
        # reclaims them.
        self.store.write_atomic(
            _STATE_DOC, json.dumps(state, indent=1)
        )
        return {
            "version": state["version"],
            "refreshed": len(stale),
            "skipped": self.num_partitions - len(stale),
            "rows_written": rows_written,
        }

    def lineage(self) -> List[Dict[str, Any]]:
        """Per-commit refresh lineage rows (newest-last, bounded)."""
        return list(self._load_state().get("lineage", []))

    def vacuum(self) -> Dict[str, Any]:
        """Delete every data file NOT named by the committed state —
        superseded versions and aborted-refresh leftovers. Call only
        once in-flight readers of older versions have drained (the
        operator's contract, same as lake vacuum)."""
        with _view_write_lock(self.view_dir):
            state = self._load_state()
            removed = 0
            for p in range(self.num_partitions):
                pdir = os.path.join(self.view_dir, f"p={p}")
                if not os.path.isdir(pdir):
                    continue
                keep = state["partitions"].get(str(p), {}).get("file")
                for name in os.listdir(pdir):
                    if name != keep:
                        try:
                            os.remove(os.path.join(pdir, name))
                            removed += 1
                        except OSError:
                            pass
            return {"files_removed": removed}

    # -- read -----------------------------------------------------------

    def _committed_files(self) -> List[str]:
        state = self._load_state()
        files = []
        for p, ent in sorted(
            state["partitions"].items(), key=lambda kv: int(kv[0])
        ):
            if ent.get("file"):
                files.append(
                    os.path.join(self.view_dir, f"p={p}", ent["file"])
                )
        return files

    def _empty_table(self) -> pa.Table:
        """Zero-row table with the view's join schema, derived from the
        manifests alone — no partition state is read."""
        from debezium_incubator_ray.envelope import DELETED

        def empty_side(eng) -> pa.Table:
            sch = eng.manifest.current_schema()
            t = sch.empty_table()
            for drop in (DELETED, S.LSN):
                if drop in t.column_names:
                    t = t.drop_columns([drop])
            return t

        return empty_side(self.left).join(
            empty_side(self.right), keys=self.left.cfg.key,
            join_type=self.join_type, left_suffix=self.left_suffix,
            right_suffix=self.right_suffix,
        )

    def read(self, columns: Optional[List[str]] = None):
        """The committed view as a streaming ``ray.data.Dataset``;
        ``columns`` prunes at the parquet read."""
        import ray.data

        files = self._committed_files()
        if not files:
            t = self._empty_table()
            return ray.data.from_arrow(
                t.select(columns) if columns else t
            )
        return ray.data.read_parquet(files, columns=columns)

    def table(self) -> pa.Table:
        """The committed view as one Arrow table (small views / tests)."""
        files = self._committed_files()
        if not files:
            return self._empty_table()
        return pa.concat_tables(
            [pq.read_table(f) for f in files], promote_options="permissive"
        )
