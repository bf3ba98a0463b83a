"""PartitionApplier — the stateful sink stage (actor pool via map_groups).

One call merges one lake partition's epoch events into its sorted Parquet
runs:

1. watermark filter (P9/D1): drop events with lsn <= the partition's applied
   watermark — re-delivered segments become a no-op (the exactly-once core,
   CommitLogReadHandlerImpl.java:216-219; LcrEventHandler.java:53-65;
   FileOffsetWriter.java:92-104);
2. LWW reduce (A3): max-LSN winner per key (the log-compaction contract,
   CassandraConnectorConfig.java:216-222);
3. copy-on-write targeting (D2): only sorted runs whose [min_key, max_key]
   range intersects the epoch's keys are read + rewritten; untouched runs are
   carried over — at 100 TB an epoch touches a bounded subset of runs, so
   apply cost is O(epoch ∪ affected runs), not O(lake);
4. tombstone compaction: keys whose winner is a delete are dropped — safe
   because the watermark guarantees no older event can ever be re-applied;
5. lazy schema upgrade: runs written under an older schema version are
   upgraded (default backfill / widening) only when rewritten;
6. returns a one-row metadata record (watermark, files, counts, skew stats)
   — data files become visible only via the driver's atomic manifest commit.

The actor holds the manifest snapshot + parsed schema in ``__init__`` (once
per actor), not per batch.
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Any, Dict, List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from debezium_incubator_ray import schema as S
from debezium_incubator_ray.envelope import lww_reduce, merge_lww
from debezium_incubator_ray.schema import upgrade_table

COMMIT_SCHEMA = pa.schema(
    [
        pa.field(S.PART, pa.int32()),
        pa.field("watermark", pa.int64()),
        pa.field("events_in", pa.int64()),
        pa.field("events_applied", pa.int64()),
        pa.field("distinct_keys", pa.int64()),
        pa.field("rows_total", pa.int64()),
        pa.field("files_json", pa.string()),
        # raw delivered rows (pre-normalize) + quarantined segments, filled
        # by the aligned path so the driver never touches segment footers
        pa.field("delivered", pa.int64()),
        pa.field("quarantined_json", pa.string()),
        # merge-on-read delta runs (sink_mode="mor"; "[]" in CoW mode)
        pa.field("deltas_json", pa.string()),
        # transactional mode: segments holding rows of an incomplete
        # transaction — they must NOT be marked done (redelivered until the
        # transaction completes); "[]" otherwise
        pa.field("deferred_json", pa.string()),
    ]
)


def stats_value(v):
    """JSON-encodable zone-map bound: numbers and strings pass through,
    temporals become ISO strings (lexicographic ISO order == chronological
    order for a fixed format, so string comparison prunes correctly).
    Query bounds must round-trip through THIS function too."""
    import datetime

    if isinstance(v, (int, float, str, bool)) or v is None:
        return v
    if isinstance(v, (datetime.datetime, datetime.date, datetime.time)):
        return v.isoformat()
    return str(v)


def tx_cutoff(
    lsn: "pa.Array", tx_id: "pa.Array", tx_events: "pa.Array",
    watermark: int = -1,
):
    """Transaction-boundary cutoff for one partition's delivered rows: the
    minimum LSN belonging to any INCOMPLETE transaction (observed events <
    declared tx_events), or None when every transaction is complete. Rows
    with lsn >= cutoff defer to a later epoch — applying only the prefix
    keeps the per-partition watermark sound (it never advances past an
    unapplied row). Vectorized: one sort + run-length count per tx.

    ``watermark``: transactions whose visible rows are ALL <= watermark are
    already fully applied and must not count as incomplete. This happens
    when a complete transaction straddled a done and a deferred segment:
    redelivery shows only part of its rows. The cutoff invariant guarantees
    a tx with genuinely pending rows had NONE applied (an incomplete tx's
    rows all sit at/above the cutoff), so its delivered rows are always
    fully visible — only fully-applied txs can appear truncated."""
    import numpy as np

    t = np.asarray(tx_id.to_numpy(zero_copy_only=False), dtype=np.int64)
    n_decl = np.asarray(tx_events.to_numpy(zero_copy_only=False), dtype=np.int64)
    lo = np.asarray(lsn.to_numpy(zero_copy_only=False), dtype=np.int64)
    if len(t) == 0:
        return None
    order = np.argsort(t, kind="stable")
    ts = t[order]
    uniq, counts = np.unique(ts, return_counts=True)
    # declared size + max visible lsn per tx (declared constant within a
    # tx by contract)
    first_idx = order[np.searchsorted(ts, uniq)]
    declared = n_decl[first_idx]
    max_lsn = np.maximum.reduceat(lo[order], np.searchsorted(ts, uniq))
    pending = (counts < declared) & (max_lsn > watermark)
    if not pending.any():
        return None
    mask = np.isin(t, uniq[pending])
    return int(lo[mask].min())


def tx_pending_cutoff(lsn: "pa.Array", tx_id: "pa.Array",
                      pending_sorted: "np.ndarray"):
    """Cutoff for one partition against a GLOBALLY-computed pending
    (incomplete) transaction id set: the minimum LSN this partition holds
    for any pending tx — rows at/after it defer — or None. Global
    completeness is what makes a PK-UPDATE (rekey) transaction atomic
    across the two partitions its old and new key hash to: the
    d(old-key) and c(new-key) halves land in different partitions, so
    each half looks permanently incomplete to a per-partition count
    (mirrors the reference's key-change event sequence,
    OracleConnectorIT.java:~420-456)."""
    import numpy as np

    if len(pending_sorted) == 0:
        return None
    t = np.asarray(tx_id.to_numpy(zero_copy_only=False), dtype=np.int64)
    if len(t) == 0:
        return None
    lo = np.asarray(lsn.to_numpy(zero_copy_only=False), dtype=np.int64)
    pos = np.clip(np.searchsorted(pending_sorted, t), 0,
                  len(pending_sorted) - 1)
    mask = pending_sorted[pos] == t
    if not mask.any():
        return None
    return int(lo[mask].min())


TX_PARTIAL_SCHEMA = pa.schema([
    pa.field("tx_id", pa.int64()),
    pa.field("n", pa.int64()),
    pa.field("declared", pa.int64()),
    pa.field("above", pa.bool_()),
])


def make_tx_meta_partial(binlog_dir: str, watermarks: "np.ndarray"):
    """Distributed pre-pass for GLOBAL transaction completeness: per
    segment, read ONLY (source, tx_id, tx_events) — column-pruned, the
    payload never moves — and emit one partial row per transaction still
    incomplete WITHIN that segment. Transactions complete inside a
    segment (the common single-partition case) drop here, so the driver
    merge sees only segment-straddling and cross-partition transactions
    (bounded by segment boundaries, not by epoch size). ``above`` = any
    visible row sits above its partition's replay watermark (the
    straddled-done-segment rule of :func:`tx_cutoff`). Unreadable
    segments are skipped: their rows are invisible, so their
    transactions correctly stay incomplete (the applier quarantines the
    bytes)."""

    def fn(batch: pa.Table) -> pa.Table:
        outs: List[pa.Table] = []
        for rel in batch["path"].to_pylist():
            try:
                t = pq.read_table(
                    os.path.join(binlog_dir, rel),
                    columns=["source", "tx_id", "tx_events"],
                )
            except Exception:  # noqa: BLE001 — quarantine happens at apply
                continue
            if t.num_rows == 0:
                continue
            src = t["source"].combine_chunks()
            lsn = src.field("lsn").to_numpy(zero_copy_only=False)
            part = np.asarray(
                src.field("partition").to_numpy(zero_copy_only=False),
                dtype=np.int64,
            )
            txid = np.asarray(
                t["tx_id"].combine_chunks().to_numpy(zero_copy_only=False),
                dtype=np.int64,
            )
            decl = np.asarray(
                t["tx_events"].combine_chunks().to_numpy(
                    zero_copy_only=False
                ),
                dtype=np.int64,
            )
            above = lsn > watermarks[
                np.clip(part, 0, len(watermarks) - 1)
            ]
            order = np.argsort(txid, kind="stable")
            ts = txid[order]
            uniq, counts = np.unique(ts, return_counts=True)
            starts = np.searchsorted(ts, uniq)
            declared = decl[order[starts]]
            any_above = (
                np.maximum.reduceat(above[order].astype(np.int8), starts)
                > 0
            )
            keep = counts < declared
            if keep.any():
                outs.append(pa.table({
                    "tx_id": pa.array(uniq[keep], pa.int64()),
                    "n": pa.array(counts[keep], pa.int64()),
                    "declared": pa.array(declared[keep], pa.int64()),
                    "above": pa.array(any_above[keep], pa.bool_()),
                }))
        if not outs:
            return TX_PARTIAL_SCHEMA.empty_table()
        return pa.concat_tables(outs)

    return fn


def merge_tx_partials(rows: List[Dict[str, Any]]) -> "np.ndarray":
    """Driver-side merge of the tx pre-pass partials (one row per
    still-incomplete tx per segment — segment-boundary-sized, not
    epoch-sized): a tx is PENDING iff its total visible count across all
    segments and partitions is short of the declared size AND any of its
    visible rows sits above its partition's watermark (otherwise it was
    fully applied before — redelivery shows a truncated view). Returns
    the sorted pending tx-id array the per-partition cutoffs probe."""
    if not rows:
        return np.empty(0, dtype=np.int64)
    txid = np.array([r["tx_id"] for r in rows], dtype=np.int64)
    n = np.array([r["n"] for r in rows], dtype=np.int64)
    decl = np.array([r["declared"] for r in rows], dtype=np.int64)
    above = np.array([r["above"] for r in rows], dtype=bool)
    order = np.argsort(txid, kind="stable")
    ts = txid[order]
    uniq, _ = np.unique(ts, return_counts=True)
    starts = np.searchsorted(ts, uniq)
    n_sum = np.add.reduceat(n[order], starts)
    declared = decl[order[starts]]
    any_above = np.maximum.reduceat(above[order].astype(np.int8), starts) > 0
    pending = (n_sum < declared) & any_above
    return np.sort(uniq[pending])


def upgrade_run_table(
    tbl: pa.Table, schema: pa.Schema, defaults: Dict[str, Any],
    mask_payload_order: Optional[List[str]] = None,
) -> pa.Table:
    """Lazy schema upgrade of a lake run written under an older schema
    version: realign the payload columns to ``schema`` (default backfill /
    widening) while carrying the internal ``_lsn`` (and, in
    tombstone-retention mode, ``_deleted``; for composite-PK tables,
    ``_key``; for partial-cell delta runs, ``_set_mask``/``_had_del``)
    columns through. Partial-cell masks are REMAPPED from the run's stored
    payload bit order to the upgraded order (schema evolution reorders /
    extends the payload; a stale bit index would mark the wrong cell)."""
    from debezium_incubator_ray.envelope import (
        COMPOSITE_KEY, DELETED, HAD_DEL, SET_MASK,
    )

    # side-column order mirrors the written run layout
    # (payload, _key, _lsn, _deleted, _set_mask, _had_del) so upgraded and
    # current-version runs concat without schema reordering
    side: Dict[str, Any] = {}
    drop = []
    if COMPOSITE_KEY in tbl.column_names:
        side[COMPOSITE_KEY] = tbl[COMPOSITE_KEY]
        drop.append(COMPOSITE_KEY)
    side[S.LSN] = tbl[S.LSN]
    drop.append(S.LSN)
    for extra in (DELETED, SET_MASK, HAD_DEL):
        if extra in tbl.column_names:
            side[extra] = tbl[extra]
            drop.append(extra)
    out = upgrade_table(tbl.drop_columns(drop), schema, defaults)
    if SET_MASK in side:
        aux = {COMPOSITE_KEY, S.LSN, DELETED, SET_MASK, HAD_DEL}
        # bit positions index the run's FULL stored payload order; a
        # column-pruned caller passes that order explicitly
        # (mask_payload_order) since tbl then holds only a subset
        old_payload = (
            list(mask_payload_order)
            if mask_payload_order is not None
            else [c for c in tbl.column_names if c not in aux]
        )
        # run footers record pre-rename names; translate so the bit remap
        # compares like-for-like with the upgraded payload order
        ren = (defaults or {}).get(S.RENAMES_KEY, None) or {}
        if ren:
            old_payload = [ren.get(c, c) for c in old_payload]
        new_payload = [c for c in out.column_names if c not in aux]
        if old_payload != new_payload:
            mask = (
                pc.fill_null(side[SET_MASK].combine_chunks()
                             if isinstance(side[SET_MASK], pa.ChunkedArray)
                             else side[SET_MASK], -1)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            pos = {c: j for j, c in enumerate(old_payload)}
            remapped = np.zeros_like(mask)
            for nj, name in enumerate(new_payload):
                oj = pos.get(name)
                if oj is not None:
                    remapped |= ((mask >> np.int64(oj)) & 1) << np.int64(nj)
            side[SET_MASK] = pa.array(remapped)
    for name, col in side.items():
        out = out.append_column(name, col)
    return out


def read_partition_state(
    ent: Dict[str, Any],
    lake_dir: str,
    schema: pa.Schema,
    defaults: Dict[str, Any],
    schema_version: int,
    key: str,
    keep_tombstones: bool = False,
    columns: Optional[List[str]] = None,
    counter_cols=(),
) -> pa.Table:
    """Merged LIVE state of one partition: base sorted runs ⊕ merge-on-read
    delta runs, all lazily upgraded to ``schema``. The read half of
    sink_mode="mor" — base rows are implicitly live, delta rows carry
    ``_deleted`` markers and win by LSN. Output is key-sorted with ``_lsn``
    (and ``_deleted`` when ``keep_tombstones``). With no deltas this is a
    plain key-ordered concat of the base runs (disjoint key ranges)."""
    from debezium_incubator_ray.envelope import COMPOSITE_KEY, DELETED

    if columns is not None:
        # prune at the parquet read: requested columns + whatever the merge
        # itself needs (the key, _lsn, and the marker/sidecar columns).
        # Intersected against each file's physical schema (an evolved
        # column is absent from old files; upgrade backfills it).
        want = list(dict.fromkeys(
            list(columns)
            + ([key] if schema.get_field_index(key) >= 0 else [])
            + [S.LSN, DELETED, COMPOSITE_KEY]
        ))
        # pre-rename files store historical names: request those too, or
        # the prune would silently drop the renamed column and the upgrade
        # would backfill NULLs over stored values
        ren = (defaults or {}).get(S.RENAMES_KEY) or {}
        want += [old_n for old_n, cur in ren.items() if cur in set(want)]
        from debezium_incubator_ray.envelope import SET_MASK as _SM
        # the merge target keeps only requested payload + the key
        schema = pa.schema(
            [f for f in schema if f.name in set(columns) | {key}]
        )

    def load(files: List[Dict]) -> List[pa.Table]:
        from debezium_incubator_ray.envelope import HAD_DEL

        out = []
        for f in files:  # base files kept sorted by min_key
            path = os.path.join(lake_dir, f["path"])
            mask_order = None
            if columns is not None:
                # ONE footer read per file (schema + data through the same
                # handle — object-store metadata round trips are the cost)
                pf = pq.ParquetFile(path)
                avail = set(pf.schema_arrow.names)
                w = list(want)
                if _SM in avail:
                    # partial-cell delta run: the merge needs the mask
                    # sidecars, and the remap needs the FULL stored payload
                    # order — which the footer already gives us, so the
                    # read itself stays pruned
                    w += [_SM, HAD_DEL]
                    aux = {
                        COMPOSITE_KEY, S.LSN, DELETED, _SM, HAD_DEL,
                    }
                    mask_order = [
                        c for c in pf.schema_arrow.names if c not in aux
                    ]
                t = pf.read(columns=[c for c in dict.fromkeys(w) if c in avail])
            else:
                t = pq.read_table(path)
            if f.get("schema_version", 1) != schema_version or columns is not None:
                t = upgrade_run_table(
                    t, schema, defaults, mask_payload_order=mask_order
                )
            out.append(t)
        return out

    base_tbls = load(ent["files"])
    base = pa.concat_tables(base_tbls) if base_tbls else None
    delta_tbls = load(ent.get("deltas", []))
    if not delta_tbls:
        if base is None:
            t = upgrade_table(pa.table({}), schema, defaults)
            t = t.append_column(S.LSN, pa.array([], pa.int64()))
            if keep_tombstones:
                t = t.append_column(DELETED, pa.array([], pa.bool_()))
            return t
        # re-stamp against the target schema (field order + nullability):
        # casts are no-ops for current-version files, so this is metadata-
        # only — but it guarantees every caller sees one exact schema
        return upgrade_run_table(base, schema, defaults)
    from debezium_incubator_ray.envelope import SET_MASK, merge_partial

    if any(SET_MASK in d.column_names for d in delta_tbls):
        # partial-cell delta runs (merge_mode="partial" + sink_mode="mor"):
        # the SSTable read model — fold each delta's patches onto the state
        # IN VERSION (list) ORDER with the same per-cell merge the CoW path
        # uses; partial_fold's law (fold(all) == sequential epoch folds,
        # tests/test_partial.py) makes this byte-equal to CoW.
        state = (
            upgrade_run_table(base, schema, defaults)
            if base is not None else None
        )
        for i, d in enumerate(delta_tbls):  # load() upgraded + remapped
            op = pc.if_else(
                pc.fill_null(d[DELETED].combine_chunks(), False),
                pa.scalar("d"), pa.scalar("u"),
            )
            patches = d.drop_columns([DELETED]).append_column("op", op)
            state = merge_partial(
                state, patches, key,
                sort_output=(i == len(delta_tbls) - 1),  # sort once
                counter_cols=counter_cols,
            )
        return upgrade_run_table(state, schema, defaults)

    # newest delta first: at an equal-LSN tie the LATER-applied writer wins
    # (merge_lww's fresh-first rule extended across delta generations)
    d = pa.concat_tables(list(reversed(delta_tbls)))
    # delta _deleted markers re-enter the reduce as deletes; merge_lww
    # compacts (or retains, per table tombstone semantics)
    op = pc.if_else(
        pc.fill_null(d[DELETED].combine_chunks(), False),
        pa.scalar("d"), pa.scalar("r"),
    )
    d = d.drop_columns([DELETED]).append_column("op", op)
    merged = merge_lww(base, d, key, keep_tombstones=keep_tombstones)
    return upgrade_run_table(merged, schema, defaults)


def channel_watermark(ent: Dict[str, Any], source: str) -> int:
    """Replay-dedup watermark for an offset CHANNEL: the default channel
    ("") is the legacy per-partition scalar; a named source (sharded
    fan-in — several upstream binlogs with INDEPENDENT LSN domains feeding
    one lake table) tracks its own watermark so one shard's progress can
    never drop another shard's lower-but-unapplied LSNs (the multi-source
    generalization of the ADVICE monotonicity hazard)."""
    if source:
        return int(ent.get("watermarks", {}).get(source, -1))
    return ent["watermark"]


class PartitionApplier:
    def __init__(
        self,
        manifest_doc: Dict[str, Any],
        lake_dir: str,
        target_rows_per_file: int = 1_000_000,
        watermark_filter: bool = True,
        source: str = "",
    ):
        self.doc = manifest_doc
        self.lake_dir = lake_dir
        self.key = manifest_doc["key"]
        self.stats_columns = list(manifest_doc.get("stats_columns") or [])
        # per-run key Bloom sidecars (bits per key, 0 = off): the
        # Cassandra-SSTable point-read discipline for lookup()
        self.bloom_bits = int(manifest_doc.get("bloom_filter_bits") or 0)
        self.target_rows = target_rows_per_file
        self.schema = S.schema_from_b64(manifest_doc["schemas"][-1]["schema"])
        self.schema_version = manifest_doc["schemas"][-1]["version"]
        self.defaults = manifest_doc["defaults"]
        self.next_version = manifest_doc["version"] + 1
        # tombstones=False (manifest-recorded): retain delete markers
        self.keep_tombstones = not manifest_doc.get("tombstones", True)
        # sink_mode="mor" (manifest-recorded): append delta runs instead of
        # rewriting base runs; readers merge, compact() folds
        self.sink_mode = manifest_doc.get("sink_mode", "cow")
        # merge_mode="partial" (manifest-recorded): per-cell LWW — events
        # carry a modified-cell bitmask and unset cells inherit the lake
        # value (Cassandra CellData presence semantics, CellData.java:23-60)
        self.merge_mode = manifest_doc.get("merge_mode", "lww")
        # additive counter columns (partial mode): SET cells sum, not LWW
        self.counter_cols = tuple(manifest_doc.get("counter_cols") or [])
        # watermark_filter=False: incremental-snapshot chunk mode — rows
        # carry a read-position LSN that may trail the stream watermark,
        # must still LWW-merge (chunk wins only over older lake rows), and
        # must NOT advance the partition watermark (chunks are read-repair,
        # not stream progress)
        self.watermark_filter = watermark_filter
        self.source = source

    # ------------------------------------------------------------------
    def __call__(self, group: pa.Table) -> pa.Table:
        p = group[S.PART][0].as_py()
        ent = self.doc["partitions"][str(p)]
        wm = channel_watermark(ent, self.source)
        events_in = group.num_rows
        if self.watermark_filter:
            lsn_max = pc.max(group[S.LSN]).as_py()
            fresh = group.filter(pc.greater(group[S.LSN], wm))
        else:
            lsn_max = wm  # never advance the watermark in chunk mode
            fresh = group
        fresh = fresh.drop_columns([S.PART])
        # TRUNCATE control markers (op='t', EngineConfig.truncate_events):
        # the newest truncate wipes every row with lsn <= its LSN — lake
        # rows AND this epoch's older events; later events re-create their
        # keys. One vectorized equality scan; markers only exist when the
        # engine emitted them.
        trunc_lsn = None
        if fresh.num_rows:
            tm = pc.fill_null(pc.equal(fresh["op"], "t"), False)
            if pc.any(tm).as_py():
                trunc_lsn = pc.max(fresh.filter(tm)[S.LSN]).as_py()
                fresh = fresh.filter(
                    pc.and_(
                        pc.invert(tm),
                        pc.greater(
                            fresh[S.LSN], pa.scalar(trunc_lsn, pa.int64())
                        ),
                    )
                )
        if self.merge_mode == "partial":
            # per-cell fold: one patch per key (op/_set_mask/_had_del cols)
            from debezium_incubator_ray.envelope import partial_fold

            events = partial_fold(
                fresh, self.key, counter_cols=self.counter_cols
            )
        else:
            events = lww_reduce(fresh, self.key)  # sorted by key asc

        files = ent["files"]
        deltas = list(ent.get("deltas", []))
        new_files: List[Dict] = []
        rows_total = 0
        if trunc_lsn is not None:
            # full-partition rewrite: every run is affected by definition
            # (CoW targeting is pointless), and merge-on-read deltas fold
            # into the new base (a truncated lake restarts compacted).
            # Truncates are rare control points — O(partition) here, never
            # O(lake) per ordinary epoch.
            state = read_partition_state(
                ent, self.lake_dir, self.schema, self.defaults,
                self.schema_version, self.key,
                keep_tombstones=self.keep_tombstones,
                counter_cols=self.counter_cols,
            )
            state = state.filter(
                pc.greater(state[S.LSN], pa.scalar(trunc_lsn, pa.int64()))
            )
            if self.merge_mode == "partial":
                from debezium_incubator_ray.envelope import merge_partial

                merged = merge_partial(
                    state, events, self.key, counter_cols=self.counter_cols
                )
            else:
                merged = merge_lww(
                    state, events, self.key,
                    keep_tombstones=self.keep_tombstones,
                )
            new_files = self._write_run(p, merged)
            new_files.sort(key=lambda f: f["min_key"])
            return self._record(
                p, max(wm, lsn_max), events_in, fresh.num_rows,
                events.num_rows, merged.num_rows, new_files, deltas=[],
            )
        if events.num_rows == 0:
            # pure-duplicate delivery: watermark may still advance; files kept
            return self._record(
                p, max(wm, lsn_max), events_in, 0, 0,
                sum(f["rows"] for f in files + deltas), files, deltas=deltas,
            )

        if self.sink_mode == "mor" and (files or deltas):
            # merge-on-read: append ONE key-sorted delta run (payload + _lsn
            # + _deleted markers) — O(epoch) write cost, no base rewrite.
            # The very first write of a partition (no files, no deltas)
            # falls through to the base-run path below so the lake always
            # has a compacted base to merge deltas over.
            from debezium_incubator_ray.envelope import DELETED

            dead = pc.fill_null(
                pc.equal(events.column("op"), "d"), False
            )
            dtbl = events.drop_columns(["op"]).append_column(DELETED, dead)
            deltas = deltas + self._write_run(p, dtbl, prefix="delta-")
            rows_total = sum(f["rows"] for f in files + deltas)
            return self._record(
                p, max(wm, lsn_max), events_in, fresh.num_rows,
                events.num_rows, rows_total, files, deltas=deltas,
            )

        keys = events[self.key].combine_chunks()
        if not files:
            runs = [(None, events)]
        else:
            # assign each event to the run whose key range it falls into;
            # events beyond the last run's max_key merge into the last run.
            # String keys go through numpy's fixed-width unicode dtype so the
            # searchsorted comparisons run in C, not per-element Python
            # (object-dtype compares dominate at large epochs)
            bounds = [f["max_key"] for f in files]
            keys_np = keys.to_numpy(zero_copy_only=False)
            if keys_np.dtype == object:
                keys_np = keys_np.astype(np.str_)
                bounds_np = np.asarray(bounds, dtype=keys_np.dtype)
            else:
                bounds_np = np.asarray(bounds, dtype=keys_np.dtype)
            assign = np.searchsorted(bounds_np, keys_np, side="left")
            assign = np.minimum(assign, len(files) - 1)
            runs = []
            touched = np.unique(assign)
            touched_set = set(int(t) for t in touched)
            for i, f in enumerate(files):
                if i in touched_set:
                    sl = events.filter(pa.array(assign == i))
                    runs.append((f, sl))
                else:
                    new_files.append(f)  # carried over untouched (CoW)
                    rows_total += f["rows"]

        for f, ev in runs:
            existing = None
            if f is not None:
                existing = pq.read_table(os.path.join(self.lake_dir, f["path"]))
                if f.get("schema_version", 1) != self.schema_version:
                    existing = upgrade_run_table(
                        existing, self.schema, self.defaults
                    )
            if self.merge_mode == "partial":
                from debezium_incubator_ray.envelope import merge_partial

                merged = merge_partial(
                    existing, ev, self.key,
                    counter_cols=self.counter_cols,
                )
            else:
                merged = merge_lww(
                    existing, ev, self.key, keep_tombstones=self.keep_tombstones
                )
            rows_total += merged.num_rows
            new_files.extend(self._write_run(p, merged))

        new_files.sort(key=lambda f: f["min_key"])
        return self._record(
            p,
            max(wm, lsn_max),
            events_in,
            fresh.num_rows,
            events.num_rows,
            rows_total,
            new_files,
            deltas=deltas,
        )

    # ------------------------------------------------------------------
    def _write_run(self, p: int, tbl: pa.Table, prefix: str = "") -> List[Dict]:
        out = []
        os.makedirs(os.path.join(self.lake_dir, "data", f"p={p}"), exist_ok=True)
        n = tbl.num_rows
        if n == 0:
            return out
        for lo in range(0, n, self.target_rows):
            chunk = tbl.slice(lo, self.target_rows)
            name = (
                f"data/p={p}/{prefix}v{self.next_version:06d}-"
                f"{uuid.uuid4().hex}.parquet"
            )
            pq.write_table(chunk, os.path.join(self.lake_dir, name))
            kcol = chunk[self.key]
            entry = {
                "path": name,
                "rows": chunk.num_rows,
                "min_key": pc.min(kcol).as_py(),
                "max_key": pc.max(kcol).as_py(),
                "schema_version": self.schema_version,
            }
            if self.bloom_bits:
                # SSTable-style key bloom sidecar: lookup() skips this run
                # when every wanted key is definitely absent
                from debezium_incubator_ray.hashing import bloom_build

                bl = max(6, int(np.ceil(np.log2(chunk.num_rows * self.bloom_bits))))
                words = bloom_build(kcol.combine_chunks(), bl)
                with open(os.path.join(self.lake_dir, name) + ".bloom", "wb") as fh:
                    fh.write(words.tobytes())
                entry["bloom"] = [bl, 4]
            if self.keep_tombstones:
                from debezium_incubator_ray.envelope import DELETED as _DEL

                if _DEL in chunk.column_names:
                    # tombstone zone stat [n_markers, min_marker_lsn]:
                    # lets purge_tombstones carry marker-free (or
                    # all-young-marker) runs UNREAD
                    dead = pc.fill_null(chunk[_DEL], False)
                    n_dead = int(pc.sum(pc.cast(dead, pa.int64())).as_py() or 0)
                    mn = (
                        pc.min(chunk.filter(dead)[S.LSN]).as_py()
                        if n_dead else None
                    )
                    entry["tomb"] = [n_dead, mn]
            if self.stats_columns:
                # zone maps: per-run min/max for the configured columns
                # (null-skipping; an all-null column records no entry)
                stats = {}
                for c in self.stats_columns:
                    if c not in chunk.column_names:
                        continue
                    col = chunk[c]
                    mm = pc.min_max(col)
                    lo, hi = mm["min"].as_py(), mm["max"].as_py()
                    if lo is not None:
                        # third element: null count — whole-run pruning
                        # decisions must know whether unknown-age rows hide
                        # behind the (null-skipping) min/max
                        stats[c] = [
                            stats_value(lo), stats_value(hi),
                            int(col.null_count),
                        ]
                entry["stats"] = stats
            out.append(entry)
        return out

    def _record_unchanged(self, p: int) -> pa.Table:
        """Commit row for a partition whose epoch slice normalized to zero
        rows (e.g. fully table-filtered): watermark and files unchanged."""
        ent = self.doc["partitions"][str(p)]
        deltas = ent.get("deltas", [])
        return self._record(
            p, channel_watermark(ent, self.source), 0, 0, 0,
            sum(f["rows"] for f in ent["files"] + deltas), ent["files"],
            deltas=deltas,
        )

    def _record(
        self, p, wm, ev_in, ev_applied, distinct, rows_total, files,
        delivered: int = 0, quarantined=None, deltas=None,
    ) -> pa.Table:
        return pa.Table.from_pydict(
            {
                S.PART: [p],
                "watermark": [wm],
                "events_in": [ev_in],
                "events_applied": [ev_applied],
                "distinct_keys": [distinct],
                "rows_total": [rows_total],
                "files_json": [json.dumps(files)],
                "delivered": [delivered],
                "quarantined_json": [json.dumps(quarantined or {})],
                "deltas_json": [json.dumps(deltas or [])],
                "deferred_json": ["[]"],
            },
            schema=COMMIT_SCHEMA,
        )


class AlignedSegmentApplier:
    """Partition-aligned epoch fast path: NO exchange at all.

    When the binlog layout (``p=<p>/seg-*.parquet``) has the same partition
    count and partitioner as the lake, each binlog partition feeds exactly
    one lake partition — so shuffling rows that are already partition-local
    is pure waste (it was the dominant stage of the shuffle path: staging
    write ≈ 16 s of a 32M-event epoch). One call per binlog partition:
    read exactly that partition's new segments, normalize (vectorized, same
    NormalizeEnvelope as the exchange path), VALIDATE that every normalized
    row routes to this partition (a mismatched partitioner would silently
    break the watermark invariant — see ADVICE: per-lake-partition LSN
    monotonicity), in-batch LWW combine, then the standard PartitionApplier
    merge.

    Scale notes: parallelism = P binlog partitions (size P ≥ cluster cores);
    per-task working set = epoch/P plus affected sorted runs — identical to
    the exchange path's stage 2, minus the exchange itself. On a real
    cluster each task reads its own segment files from shared storage.
    """

    def __init__(
        self,
        manifest_doc: Dict[str, Any],
        lake_dir: str,
        binlog_dir: str,
        norm_kwargs: Dict[str, Any],
        target_rows_per_file: int = 1_000_000,
        transactional: bool = False,
        source: str = "",
        pending_tx=None,
    ):
        from debezium_incubator_ray.stages.normalize import NormalizeEnvelope

        self.inner = PartitionApplier(
            manifest_doc, lake_dir, target_rows_per_file, source=source
        )
        # aligned tasks own exactly one partition: a truncate marker emits
        # ONE _p = -1 sentinel row (rewritten to this task's partition
        # below) instead of fanning out to every partition
        norm_kwargs = dict(norm_kwargs, truncate_fanout=False)
        self.norm = NormalizeEnvelope(**norm_kwargs)
        self.binlog_dir = binlog_dir
        self.key = manifest_doc["key"]
        self.transactional = transactional
        # GLOBAL pending-transaction ids (sorted int64, from the epoch
        # driver's cross-partition pre-pass) — when present, transaction
        # completeness was judged over the WHOLE epoch, so a transaction
        # spanning partitions (a PK-update's d(old)+c(new) pair) applies
        # atomically; None falls back to per-partition counting.
        self.pending_tx = (
            np.sort(np.asarray(pending_tx, dtype=np.int64))
            if pending_tx is not None else None
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        from debezium_incubator_ray.envelope import lww_reduce

        outs: List[pa.Table] = []
        ps = batch[S.PART].to_pylist()
        for p, paths_json in zip(ps, batch["paths_json"].to_pylist()):
            flats: List[pa.Table] = []
            delivered = 0
            quarantined: Dict[str, str] = {}
            deferred: List[str] = []
            # transaction bookkeeping over RAW rows (before any filter —
            # completeness is a property of the delivered stream)
            tx_raw: List[pa.Table] = []
            seg_lsn_max: Dict[str, int] = {}
            seg_names: List[str] = []
            # read + quarantine + normalize per segment, all inside the
            # parallel task (the driver never opens segment footers on this
            # path — ~1k serial driver-side footer reads per epoch was a
            # measurable constant against scaling). Segments may carry
            # different payload schema versions; normalize aligns each.
            for rel in json.loads(paths_json):
                try:
                    env = pq.read_table(os.path.join(self.binlog_dir, rel))
                except Exception as ex:  # noqa: BLE001 — quarantine, don't fail
                    quarantined[rel] = f"{type(ex).__name__}: {ex}"
                    continue
                delivered += env.num_rows
                if self.transactional and env.num_rows:
                    if "tx_id" not in env.column_names:
                        raise ValueError(
                            "transactional=True but segment carries no "
                            f"tx_id/tx_events columns: {rel}"
                        )
                    lsn = env["source"].combine_chunks().field("lsn")
                    tx_raw.append(
                        pa.table(
                            {
                                "lsn": lsn,
                                "tx_id": env["tx_id"],
                                "tx_events": env["tx_events"],
                            }
                        )
                    )
                    seg_lsn_max[rel] = pc.max(lsn).as_py()
                    seg_names.append(rel)
                flat = self.norm(env)
                if flat.num_rows:
                    flats.append(flat)
            if self.transactional and tx_raw:
                raw = pa.concat_tables(tx_raw)
                if self.pending_tx is not None:
                    # global completeness (cross-partition txs supported):
                    # defer from the first row of any globally-pending tx
                    cut = tx_pending_cutoff(
                        raw["lsn"].combine_chunks(),
                        raw["tx_id"].combine_chunks(),
                        self.pending_tx,
                    )
                else:
                    cut = tx_cutoff(
                        raw["lsn"].combine_chunks(),
                        raw["tx_id"].combine_chunks(),
                        raw["tx_events"].combine_chunks(),
                        watermark=channel_watermark(
                            self.inner.doc["partitions"][str(p)],
                            self.inner.source,
                        ),
                    )
                if cut is not None:
                    # apply only the prefix of complete transactions;
                    # segments holding any deferred row stay un-done
                    flats = [
                        f.filter(pc.less(f[S.LSN], pa.scalar(cut, pa.int64())))
                        for f in flats
                    ]
                    flats = [f for f in flats if f.num_rows]
                    deferred = [
                        s for s in seg_names if seg_lsn_max[s] >= cut
                    ]
            if not flats:
                rec = self.inner._record_unchanged(int(p))
            else:
                events = pa.concat_tables(flats) if len(flats) > 1 else flats[0]
                if self.norm.truncate_events:
                    parr = events[S.PART].combine_chunks()
                    sent = pc.equal(parr, pa.scalar(-1, pa.int32()))
                    if pc.any(sent).as_py():
                        # truncate sentinel rows adopt this task's partition
                        i = events.schema.get_field_index(S.PART)
                        events = events.set_column(
                            i, events.schema.field(i),
                            pc.if_else(sent, pa.scalar(p, pa.int32()), parr),
                        )
                pcol = events[S.PART]
                if pc.min(pcol).as_py() != p or pc.max(pcol).as_py() != p:
                    raise RuntimeError(
                        f"aligned-binlog violation: segments under p={p} "
                        "normalized to rows routed to other lake partitions — "
                        "binlog partitioning does not match the lake "
                        "(set EngineConfig.aligned_binlog='never' to use the "
                        "exchange path for this source)"
                    )
                if self.inner.merge_mode == "partial":
                    # no LWW pre-reduce: it would drop cells of non-winning
                    # events; the inner per-cell fold needs every event
                    rec = self.inner(events)
                else:
                    # in-batch combiner (hot keys collapse before the merge)
                    rec = self.inner(lww_reduce(events, self.key))
            meta = {
                "delivered": pa.array([delivered], pa.int64()),
                "quarantined_json": pa.array([json.dumps(quarantined)]),
                "deferred_json": pa.array([json.dumps(deferred)]),
            }
            for name, col in meta.items():
                i = rec.schema.get_field_index(name)
                rec = rec.set_column(i, rec.schema.field(i), col)
            outs.append(rec)
        return pa.concat_tables(outs)


class Compactor:
    """Per-partition small-run compaction: merge a partition's sorted runs
    into the minimum number of target-sized files, preserving table state
    byte-for-byte.

    CDC lakes accrete files: every epoch's copy-on-write rewrite splits
    touched runs at ``target_rows_per_file`` and high-frequency epochs leave
    many sub-target runs. Runs within a partition hold DISJOINT key ranges
    (PartitionApplier routes each key to exactly one run by its range
    bounds), so concatenating them in ``min_key`` order is already globally
    key-sorted — compaction is a pure re-chunk plus lazy schema upgrade, no
    re-sort and no merge logic. Old files stay on disk (time-travel reads of
    prior manifest versions still work) until ``CdcEngine.vacuum``.

    One call handles one partition's batch row; parallelism = partitions,
    same shape as the aligned apply path.
    """

    def __init__(
        self,
        manifest_doc: Dict[str, Any],
        lake_dir: str,
        target_rows_per_file: int = 1_000_000,
    ):
        self.inner = PartitionApplier(manifest_doc, lake_dir, target_rows_per_file)

    def __call__(self, batch: pa.Table) -> pa.Table:
        outs: List[pa.Table] = []
        for p in batch[S.PART].to_pylist():
            ent = self.inner.doc["partitions"][str(p)]
            # merge-on-read deltas fold into the base here (read-side merge
            # once, then every future read is a plain base scan again)
            merged = read_partition_state(
                ent,
                self.inner.lake_dir,
                self.inner.schema,
                self.inner.defaults,
                self.inner.schema_version,
                self.inner.key,
                keep_tombstones=self.inner.keep_tombstones,
                counter_cols=self.inner.counter_cols,
            )
            new_files = self.inner._write_run(int(p), merged)
            outs.append(
                self.inner._record(
                    int(p), ent["watermark"], 0, 0, 0, merged.num_rows,
                    new_files, deltas=[],
                )
            )
        return pa.concat_tables(outs)



def _scrub_runs(inner: "PartitionApplier", p: int, files: List[Dict],
                prefix: str, classify):
    """Shared state-surgery sweep over one partition's runs (KeyEraser /
    RangeEraser). ``classify(f)`` returns None (carry the run untouched),
    "drop" (whole run provably erased — never read), or a callable
    ``table -> keep_mask`` for the exact rewrite."""
    out: List[Dict] = []
    erased = rows = 0
    for f in files:
        action = classify(f)
        if action is None:
            out.append(f)
            rows += f["rows"]
            continue
        if action == "drop":
            erased += f["rows"]
            continue
        t = pq.read_table(os.path.join(inner.lake_dir, f["path"]))
        if f.get("schema_version", 1) != inner.schema_version:
            t = upgrade_run_table(t, inner.schema, inner.defaults)
        kept = t.filter(action(t))
        erased += t.num_rows - kept.num_rows
        if kept.num_rows == t.num_rows:
            out.append(f)  # predicate overlapped but no row matched
            rows += f["rows"]
            continue
        out.extend(inner._write_run(p, kept, prefix=prefix))
        rows += kept.num_rows
    return out, rows, erased


class KeyEraser:
    """Per-partition key erasure (right-to-be-forgotten): rewrite ONLY the
    runs (base and merge-on-read delta) whose [min_key, max_key] range
    intersects the requested keys, dropping those rows; untouched runs carry
    over — O(affected runs), never O(lake).

    Erasure is STATE SURGERY, not a delete event: it does not move the
    watermark and does not tombstone — a later event with a higher LSN
    re-creates the key legally. Superseded files keep the data until
    ``vacuum`` (CdcEngine.erase_keys(vacuum_history=True) chains it).
    One call per partition batch row, same shape as the Compactor."""

    def __init__(
        self,
        manifest_doc: Dict[str, Any],
        lake_dir: str,
        keys_by_partition: Dict[int, List[Any]],
        target_rows_per_file: int = 1_000_000,
    ):
        self.inner = PartitionApplier(manifest_doc, lake_dir, target_rows_per_file)
        self.keys = {int(p): v for p, v in keys_by_partition.items()}

    def _scrub(self, p: int, files: List[Dict], want, prefix: str):
        def classify(f):
            hit = [k for k in want if f["min_key"] <= k <= f["max_key"]]
            if not hit:
                return None
            return lambda t: pc.invert(
                pc.is_in(
                    t[self.inner.key],
                    value_set=pa.array(hit, t[self.inner.key].type),
                )
            )

        return _scrub_runs(self.inner, p, files, prefix, classify)

    def __call__(self, batch: pa.Table) -> pa.Table:
        outs: List[pa.Table] = []
        for p in batch[S.PART].to_pylist():
            ent = self.inner.doc["partitions"][str(p)]
            want = self.keys.get(int(p), [])
            files, rows_f, er_f = self._scrub(int(p), ent["files"], want, "")
            deltas, rows_d, er_d = self._scrub(
                int(p), ent.get("deltas", []), want, "delta-"
            )
            files.sort(key=lambda f: f["min_key"])
            outs.append(
                self.inner._record(
                    int(p), ent["watermark"], 0, er_f + er_d, 0,
                    rows_f + rows_d, files, deltas=deltas,
                )
            )
        return pa.concat_tables(outs)


class RowExpirer:
    """Per-partition retention (TTL) sweep: drop LIVE rows whose ``col``
    value is strictly below ``cutoff`` — state surgery like KeyEraser
    (watermarks don't move; a later event may legally re-create a key).

    Zone maps (EngineConfig.stats_columns) set the cost:
    - a run with min(col) >= cutoff carries over UNTOUCHED (nothing old);
    - with compacted tombstones, a run with max(col) < cutoff is dropped
      whole, UNREAD (every row provably old);
    - everything else rewrites with the exact null-safe filter — a NULL
      col never expires (unknown age is not provably old), and
      tombstone-retention marker rows are never expired (dropping a
      delete marker would resurrect the row it masks).

    Operates on BASE runs only: the engine folds merge-on-read deltas
    first (expiring a delta row would expose the stale base row under
    it)."""

    def __init__(
        self,
        manifest_doc: Dict[str, Any],
        lake_dir: str,
        col: str,
        cutoff,
        target_rows_per_file: int = 1_000_000,
    ):
        self.inner = PartitionApplier(manifest_doc, lake_dir, target_rows_per_file)
        self.col = col
        self.cutoff = cutoff
        self.cut_e = stats_value(cutoff)
        # whole-run drop is sound only when base runs hold purely live rows
        self.droppable = manifest_doc.get("tombstones", True)

    def _keep_mask(self, t: pa.Table):
        from debezium_incubator_ray.envelope import DELETED

        if self.col not in t.column_names:
            return None
        expire = pc.fill_null(pc.less(t[self.col], pa.scalar(self.cutoff)), False)
        if DELETED in t.column_names:
            marker = pc.fill_null(pc.equal(t[DELETED], True), False)
            expire = pc.and_(expire, pc.invert(marker))
        return pc.invert(expire)

    def __call__(self, batch: pa.Table) -> pa.Table:
        outs: List[pa.Table] = []
        for p in batch[S.PART].to_pylist():
            ent = self.inner.doc["partitions"][str(p)]
            out: List[Dict] = []
            rows = expired = 0
            for f in ent["files"]:
                st = (f.get("stats") or {}).get(self.col)
                if st:
                    mn, mx = st[0], st[1]
                    # null count recorded from round-2 session 3 on; older
                    # runs (2-element stats) have UNKNOWN null presence and
                    # must never take the unread whole-run drop
                    n_null = st[2] if len(st) > 2 else None
                    if mn is not None and mn >= self.cut_e:
                        out.append(f)  # nothing old; NULLs (if any) kept
                        rows += f["rows"]
                        continue
                    if (
                        self.droppable
                        and mx is not None
                        and mx < self.cut_e
                        and n_null == 0  # a NULL row never expires
                    ):
                        expired += f["rows"]  # whole run provably old
                        continue
                t = pq.read_table(os.path.join(self.inner.lake_dir, f["path"]))
                if f.get("schema_version", 1) != self.inner.schema_version:
                    t = upgrade_run_table(
                        t, self.inner.schema, self.inner.defaults
                    )
                mask = self._keep_mask(t)
                kept = t if mask is None else t.filter(mask)
                expired += t.num_rows - kept.num_rows
                if kept.num_rows == t.num_rows:
                    out.append(f)
                    rows += f["rows"]
                    continue
                new = self.inner._write_run(int(p), kept)
                out.extend(new)
                rows += kept.num_rows
            out.sort(key=lambda f: f["min_key"])
            outs.append(
                self.inner._record(
                    int(p), ent["watermark"], 0, expired, 0, rows, out,
                    deltas=[],
                )
            )
        return pa.concat_tables(outs)


class RangeEraser:
    """Per-partition KEY-RANGE erasure — the Cassandra range-tombstone /
    partition-delete analog (a range of clustering keys dies at once)
    expressed as state surgery. Runs are key-sorted with recorded
    [min_key, max_key] bounds, so the sweep is three-way per run:
    disjoint → carried UNTOUCHED; wholly inside the range → dropped
    UNREAD; straddling → rewritten with the exact filter. Like KeyEraser,
    watermarks don't move and a later higher-LSN event legally re-creates
    a key. One call per partition batch row."""

    def __init__(
        self,
        manifest_doc: Dict[str, Any],
        lake_dir: str,
        lo,
        hi,
        target_rows_per_file: int = 1_000_000,
    ):
        self.inner = PartitionApplier(manifest_doc, lake_dir, target_rows_per_file)
        self.lo = lo
        self.hi = hi

    def _scrub(self, p: int, files: List[Dict], prefix: str):
        def keep_mask(t):
            k = t[self.inner.key]
            hit = pc.and_(
                pc.greater_equal(k, pa.scalar(self.lo, k.type)),
                pc.less_equal(k, pa.scalar(self.hi, k.type)),
            )
            return pc.invert(pc.fill_null(hit, False))

        def classify(f):
            if f["max_key"] < self.lo or f["min_key"] > self.hi:
                return None  # disjoint: untouched
            if self.lo <= f["min_key"] and f["max_key"] <= self.hi:
                return "drop"  # wholly in range: dropped unread
            return keep_mask

        return _scrub_runs(self.inner, p, files, prefix, classify)

    def __call__(self, batch: pa.Table) -> pa.Table:
        outs: List[pa.Table] = []
        for p in batch[S.PART].to_pylist():
            ent = self.inner.doc["partitions"][str(p)]
            files, rows_f, er_f = self._scrub(int(p), ent["files"], "")
            deltas, rows_d, er_d = self._scrub(
                int(p), ent.get("deltas", []), "delta-"
            )
            files.sort(key=lambda f: f["min_key"])
            outs.append(
                self.inner._record(
                    int(p), ent["watermark"], 0, er_f + er_d, 0,
                    rows_f + rows_d, files, deltas=deltas,
                )
            )
        return pa.concat_tables(outs)


class RowUpdater:
    """Per-partition predicate UPDATE — the lakehouse ``UPDATE ... SET
    ... WHERE`` expressed as state surgery: rewrite ONLY the runs the
    predicate can touch, assign new values to matching rows, carry
    everything else untouched. Zone maps prune when the caller supplies
    a (column, lo, hi) bound for a column in ``stats_columns``: a run
    whose recorded [min, max] is disjoint from the bound is never read.
    Like the erasers, watermarks don't move (UPDATE is not an event —
    ``_lsn`` keeps its value, and a later higher-LSN stream event
    legally overwrites the assignment). The key column itself is
    immutable (routing + run-sort invariants). One call per partition
    batch row, same shape as the Compactor."""

    def __init__(
        self,
        manifest_doc: Dict[str, Any],
        lake_dir: str,
        predicate,
        updates: Dict[str, Any],
        zone=None,
        target_rows_per_file: int = 1_000_000,
    ):
        self.inner = PartitionApplier(manifest_doc, lake_dir, target_rows_per_file)
        self.predicate = predicate
        self.updates = updates
        # zone bounds must round-trip through stats_value (temporals are
        # recorded as ISO strings; comparing a datetime against them
        # would raise) — same contract as CdcEngine.scan
        self.zone = (
            (zone[0], stats_value(zone[1]), stats_value(zone[2]))
            if zone is not None else None
        )

    def _scrub(self, p: int, files: List[Dict], prefix: str):
        updated = {"n": 0}

        def rewrite(t: pa.Table) -> pa.Table:
            mask = pc.fill_null(self.predicate(t), False)
            n_hit = int(pc.sum(pc.cast(mask, pa.int64())).as_py() or 0)
            if n_hit == 0:
                return t
            updated["n"] += n_hit
            for col, fn in self.updates.items():
                i = t.schema.get_field_index(col)
                newv = pc.if_else(
                    mask, pc.cast(fn(t), t.schema.field(i).type), t[col]
                )
                t = t.set_column(i, t.schema.field(i), newv)
            return t

        out: List[Dict] = []
        rows = 0
        for f in files:
            if self.zone is not None:
                col, lo, hi = self.zone
                st = (f.get("stats") or {}).get(col)
                if st is not None and (st[1] < lo or st[0] > hi):
                    out.append(f)  # zone-disjoint: never read
                    rows += f["rows"]
                    continue
            t = pq.read_table(os.path.join(self.inner.lake_dir, f["path"]))
            if f.get("schema_version", 1) != self.inner.schema_version:
                t = upgrade_run_table(t, self.inner.schema, self.inner.defaults)
            before = updated["n"]
            t2 = rewrite(t)
            if updated["n"] == before:
                out.append(f)  # read but no row matched: carried
                rows += f["rows"]
                continue
            out.extend(self.inner._write_run(p, t2, prefix=prefix))
            rows += t2.num_rows
        return out, rows, updated["n"]

    def __call__(self, batch: pa.Table) -> pa.Table:
        outs: List[pa.Table] = []
        for p in batch[S.PART].to_pylist():
            ent = self.inner.doc["partitions"][str(p)]
            files, rows_f, up_f = self._scrub(int(p), ent["files"], "")
            deltas, rows_d, up_d = self._scrub(
                int(p), ent.get("deltas", []), "delta-"
            )
            files.sort(key=lambda f: f["min_key"])
            outs.append(
                self.inner._record(
                    int(p), ent["watermark"], 0, up_f + up_d, 0,
                    rows_f + rows_d, files, deltas=deltas,
                )
            )
        return pa.concat_tables(outs)


class TombstonePurger:
    """gc-grace purge for tombstone-RETENTION lakes (tombstones=False):
    drop marker rows whose ``_lsn`` <= the purge horizon — Cassandra's
    gc_grace_seconds contract (a tombstone is kept only long enough for
    every consumer to observe it, then garbage-collected). Sound on BASE
    runs only: base state is fully merged, so removing a marker exposes
    nothing underneath (the engine folds merge-on-read deltas first — a
    delta marker masks a live base row and purging it would resurrect
    that row). Watermarks don't move; a re-delivered pre-horizon event is
    already dropped by the replay filter, so nothing can resurrect."""

    def __init__(
        self,
        manifest_doc: Dict[str, Any],
        lake_dir: str,
        upto_lsn: int,
        target_rows_per_file: int = 1_000_000,
    ):
        self.inner = PartitionApplier(manifest_doc, lake_dir, target_rows_per_file)
        self.upto = upto_lsn

    def __call__(self, batch: pa.Table) -> pa.Table:
        from debezium_incubator_ray.envelope import DELETED

        def keep_mask(t: pa.Table):
            purge = pc.and_(
                pc.fill_null(t[DELETED], False),
                pc.less_equal(t[S.LSN], pa.scalar(self.upto, pa.int64())),
            )
            return pc.invert(purge)

        def classify(f):
            tomb = f.get("tomb")
            if tomb is not None:
                n_markers, min_lsn = tomb
                if n_markers == 0 or (
                    min_lsn is not None and min_lsn > self.upto
                ):
                    return None  # no purgeable marker: carried UNREAD
            return keep_mask  # unknown (pre-stat run) or has old markers

        outs: List[pa.Table] = []
        for p in batch[S.PART].to_pylist():
            ent = self.inner.doc["partitions"][str(p)]
            files, rows, purged = _scrub_runs(
                self.inner, int(p), ent["files"], "", classify,
            )
            files.sort(key=lambda f: f["min_key"])
            outs.append(
                self.inner._record(
                    int(p), ent["watermark"], 0, purged, 0, rows, files,
                    deltas=ent.get("deltas", []),
                )
            )
        return pa.concat_tables(outs)
