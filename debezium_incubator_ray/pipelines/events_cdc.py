"""CDC-over-the-`events`-testdata pipeline: the oracle-checked face of the
engine.

The driver's correctness gate compares Ray results against DuckDB SQL over
the same parquet views, so this module derives a Debezium-style change
stream from the `events` table with a *SQL-expressible* mapping:

    key   = user_id          (int key → "mod" partitioner, SQL: user_id % P)
    lsn   = event_id         (unique, dense, 0..N-1)
    op    = 'd' if event_id % 10 = 0
            'c' if event_id % 10 in (1, 2)
            'u' otherwise
    before.value = lag(value) over (partition by user_id order by event_id)

Everything the engine then does (partitioned LWW apply, watermarks, replay,
snapshot handoff, blacklist/filters) has an exact ANSI-SQL oracle in
__ray_entry__.oracle_sql().
"""

from __future__ import annotations

import os
import tempfile
from typing import Dict, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from debezium_incubator_ray import schema as S
from debezium_incubator_ray.config import EngineConfig
from debezium_incubator_ray.envelope import build_envelopes
from debezium_incubator_ray.pipelines.cdc import CdcEngine

NUM_PARTITIONS = 8

EVENTS_PAYLOAD = pa.schema(
    [
        pa.field("user_id", pa.int64(), nullable=False),
        pa.field("ts", pa.timestamp("us")),
        pa.field("event_type", pa.string()),
        pa.field("value", pa.float64()),
        pa.field("props", pa.string()),
    ]
)

OP_SQL = (
    "CASE WHEN event_id % 10 = 0 THEN 'd' "
    "WHEN event_id % 10 IN (1, 2) THEN 'c' ELSE 'u' END"
)


def load_events(sf_dir: str) -> pa.Table:
    return pq.read_table(os.path.join(sf_dir, "events.parquet")).sort_by(
        [("event_id", "ascending")]
    )


def events_envelopes(
    sf_dir: str, table_name_by_parity: bool = False,
    delete_aware: bool = False, lsn_stride: int = 1,
) -> pa.Table:
    """events rows → envelope table (op/before/after/source/ts_ms).

    ``delete_aware=True`` applies Debezium's real before-image semantics
    around deletes: the event AFTER a delete re-creates the row, so it is
    op='c' with a NULL before (the deleted payload never leaks into the
    next before image). Required by consumers that fold +after/-before
    contributions (incremental view maintenance); the default (plain
    SQL-lag befores) matches the cdc_before_images oracle."""
    t = load_events(sf_dir)
    eid = t["event_id"].to_numpy()
    uid = t["user_id"].to_numpy()
    mod = eid % 10
    op_np = np.where(mod == 0, "d", np.where(mod <= 2, "c", "u"))
    after = pa.table(
        {
            "user_id": t["user_id"],
            "ts": t["ts"],
            "event_type": t["event_type"],
            "value": t["value"],
            "props": t["props"],
        }
    )
    # before image: previous event's payload per user (SQL lag())
    order = np.lexsort((eid, uid))
    prev_idx = np.full(len(eid), -1, dtype=np.int64)
    prev_idx[order[1:]] = np.where(uid[order[1:]] == uid[order[:-1]], order[:-1], -1)
    has_prev = prev_idx >= 0
    if delete_aware:
        # a CONSISTENT Debezium stream: op reflects true prior existence
        # (create only when no live prior row, update always carries the
        # real before, the deleted payload never leaks into the next
        # before). The default mod-based labels break all three (a 'c' can
        # land on a live row with its before masked), which is fine for
        # LWW upserts but corrupts +after/-before delta consumers.
        prev_was_d = has_prev & (mod[np.maximum(prev_idx, 0)] == 0)
        has_prev = has_prev & ~prev_was_d
        op_np = np.where(mod == 0, "d", np.where(has_prev, "u", "c"))
    take_idx = pa.array(np.where(has_prev, prev_idx, 0))
    before = after.take(take_idx)
    # rows without a previous event get a null before via the op mask below;
    # build_envelopes nulls before where op == 'c'/'r', but a 'u'/'d' first
    # event must also be null — mask manually afterwards
    env = build_envelopes(
        pa.array(op_np, type=pa.string()),
        after,
        before,
        (uid % NUM_PARTITIONS).astype(np.int32),
        pa.array(eid * lsn_stride, type=pa.int64()),
        table="events_a" if not table_name_by_parity else "events_parity",
        ts_us=t["ts"].combine_chunks(),
    )
    if table_name_by_parity:
        from debezium_incubator_ray.envelope import replace_source_table

        env = replace_source_table(
            env,
            pa.array(
                np.where(uid % 2 == 0, "events_a", "events_b"),
                type=pa.string(),
            ),
        )
    # null out before where there is no previous event
    b = env["before"].combine_chunks()
    keep = pa.array(has_prev)
    from debezium_incubator_ray.envelope import struct_from_table

    b_masked = pc.if_else(keep, b, pa.nulls(len(b), b.type))
    env = env.set_column(
        env.schema.get_field_index("before"), pa.field("before", b.type), b_masked
    )
    return env


PARTIAL_MASK_SQL = (
    # per-event modified-cell bitmask over [user_id, ts, event_type, value,
    # props]: full row (31) for inserts/snapshot reads, bits 1..4 taken from
    # the event_id for updates, bit 0 (the key) always set
    "CASE WHEN event_id % 10 IN (0, 1, 2) THEN 31 "
    "ELSE (event_id & 30) | 1 END"
)


def events_partial_envelopes(sf_dir: str) -> pa.Table:
    """events → envelopes carrying the ``set_mask`` cell-presence column
    (merge_mode="partial"): updates modify only the cells whose bit the
    event_id selects — the Cassandra mutation shape where RowData holds
    only modified cells (RowData.java:28-33, CellData.java:23-60)."""
    env = events_envelopes(sf_dir)
    lsn = env["source"].combine_chunks().field("lsn").to_numpy()
    mod = lsn % 10
    mask = np.where(mod <= 2, 31, (lsn & 30) | 1).astype(np.int64)
    return env.append_column("set_mask", pa.array(mask, pa.int64()))


def final_state_partial(
    sf_dir: str, field_blacklist=(), sink_mode: str = "cow",
    counter_cols=(),
) -> pa.Table:
    """Drive a merge_mode='partial' lake over the masked envelope stream
    and return the folded per-cell state (payload + lsn). With
    sink_mode='mor' the epochs append patch delta runs and the read path
    folds them in version order (the SSTable cell-merge model)."""
    root = scratch_dir("partial")
    binlog, lake = os.path.join(root, "binlog"), os.path.join(root, "lake")
    env = events_partial_envelopes(sf_dir)
    lsn = env["source"].combine_chunks().field("lsn")
    mid = int(pc.max(lsn).as_py()) // 2
    # two epochs over one appending binlog dir: the second epoch's unset
    # cells must inherit from the COMMITTED lake rows of the first
    write_env_binlog(env.filter(pc.less_equal(lsn, mid)), binlog)
    eng = make_engine(
        lake, merge_mode="partial", field_blacklist=field_blacklist,
        sink_mode=sink_mode, counter_cols=counter_cols,
    )
    eng.run(binlog)
    write_env_binlog(env.filter(pc.greater(lsn, mid)), binlog, append=True)
    eng.run(binlog)
    out = eng.lake_table(include_lsn=True)
    i = out.schema.get_field_index(S.LSN)
    return out.set_column(i, pa.field("lsn", pa.int64()), out[S.LSN])


def _append_struct_field(col, name: str, child: pa.Array) -> pa.StructArray:
    """Append one child to a struct column, keeping parent validity (null
    parents get a null child so flattening never resurrects values)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    children = [arr.field(i) for i in range(arr.type.num_fields)]
    fields = [arr.type.field(i) for i in range(arr.type.num_fields)]
    valid = pc.is_valid(arr)
    child = pc.if_else(valid, child, pa.nulls(len(arr), child.type))
    return pa.StructArray.from_arrays(
        children + [child],
        fields=fields + [pa.field(name, child.type)],
        mask=pc.invert(valid),
    )


def final_state_partial_evolution(
    sf_dir: str, sink_mode: str = "cow",
) -> pa.Table:
    """Per-cell merge ACROSS a schema evolution: epoch 1 applies v1
    envelopes (no ``score`` column), the structured add_column DDL lands
    (default 1.5, activation at the epoch boundary), then epoch 2 applies
    v2 envelopes whose writer payload gains ``score = value * 2`` with a
    6th mask bit ((lsn >> 5) & 1 on updates, set on creates). Exercises:
    lazy default backfill of v1 lake runs, writer-relative → emitted-order
    mask remap across versions, and per-cell inheritance of the upgraded
    default."""
    import json

    from debezium_incubator_ray import schema as SS

    root = scratch_dir("partialevo")
    binlog, lake = os.path.join(root, "binlog"), os.path.join(root, "lake")
    env = events_partial_envelopes(sf_dir)
    lsn = env["source"].combine_chunks().field("lsn")
    mid = int(pc.max(lsn).as_py()) // 2
    # v1 arrives as TWO epochs so a MoR drive holds v1 data in BOTH base
    # runs (epoch 1) and v1-masked patch deltas (epoch 2) — the deltas
    # must mask-remap when read under the evolved schema
    q1 = mid // 2
    write_env_binlog(env.filter(pc.less_equal(lsn, q1)), binlog)
    eng = make_engine(lake, merge_mode="partial", sink_mode=sink_mode)
    eng.run(binlog)
    write_env_binlog(
        env.filter(pc.and_(pc.greater(lsn, q1), pc.less_equal(lsn, mid))),
        binlog, append=True,
    )
    eng.run(binlog)

    with open(os.path.join(binlog, "_schema_changes.json"), "w") as f:
        json.dump(
            [SS.SchemaChange(
                "add_column", "score", "double", 1.5, at_lsn=mid
            ).to_json()],
            f,
        )
    v2 = env.filter(pc.greater(lsn, mid))
    lsn2 = v2["source"].combine_chunks().field("lsn").to_numpy()
    op2 = v2["op"].combine_chunks()
    for col in ("after", "before"):
        a = v2[col].combine_chunks()
        score = pc.multiply(
            pc.cast(a.field("value"), pa.float64()), pa.scalar(2.0)
        )
        new = _append_struct_field(a, "score", score)
        v2 = v2.set_column(
            v2.schema.get_field_index(col), pa.field(col, new.type), new
        )
    bit5 = np.where(
        op2.to_numpy(zero_copy_only=False) == "u", (lsn2 >> 5) & 1, 1
    ).astype(np.int64)
    old_mask = v2["set_mask"].to_numpy(zero_copy_only=False).astype(np.int64)
    v2 = v2.set_column(
        v2.schema.get_field_index("set_mask"),
        pa.field("set_mask", pa.int64()),
        pa.array(old_mask | (bit5 << 5)),
    )
    write_env_binlog(v2, binlog, append=True)
    eng.run(binlog)
    out = eng.lake_table(include_lsn=True)
    i = out.schema.get_field_index(S.LSN)
    return out.set_column(i, pa.field("lsn", pa.int64()), out[S.LSN])


def write_events_binlog(
    sf_dir: str,
    out_dir: str,
    seg_rows: int = 4096,
    table_name_by_parity: bool = False,
) -> pa.Table:
    """Envelope stream → segment files binlog/p=<p>/seg-<k>.parquet (per-
    partition LSN-ordered, like commit-log segments)."""
    env = events_envelopes(sf_dir, table_name_by_parity)
    part = env["source"].combine_chunks().field("partition").to_numpy()
    os.makedirs(out_dir, exist_ok=True)
    for p in range(NUM_PARTITIONS):
        idx = np.nonzero(part == p)[0]
        pdir = os.path.join(out_dir, f"p={p}")
        os.makedirs(pdir, exist_ok=True)
        for k, lo in enumerate(range(0, len(idx), seg_rows)):
            chunk = env.take(pa.array(idx[lo : lo + seg_rows]))
            pq.write_table(chunk, os.path.join(pdir, f"seg-{k:05d}.parquet"))
    return env


def make_engine(
    lake_dir: str,
    field_blacklist=(),
    table_include_regex=None,
    payload_schema: Optional[pa.Schema] = None,
    tombstones: bool = True,
    sink_mode: str = "cow",
    key_cols=None,
    stats_columns=(),
    merge_mode: str = "lww",
    counter_cols=(),
    **cfg_overrides,
) -> CdcEngine:
    base = dict(
        table="events",
        key="user_id",
        num_partitions=NUM_PARTITIONS,
        partitioner="mod" if not key_cols else "hash",
        apply_concurrency=4,
        target_rows_per_file=100_000,
        field_blacklist=field_blacklist,
        table_include_regex=table_include_regex,
        tombstones=tombstones,
        sink_mode=sink_mode,
        key_cols=key_cols,
        stats_columns=stats_columns,
        merge_mode=merge_mode,
        counter_cols=counter_cols,
        # the events binlog is laid out by uid % P; a composite key routes
        # by hash(_key) so the aligned fast path's 1:1 assumption breaks —
        # force the exchange path (the engine would otherwise detect the
        # mismatch and abort the epoch)
        aligned_binlog="auto" if not key_cols else "never",
    )
    base.update(cfg_overrides)  # overrides win over every default above
    cfg = EngineConfig(**base)
    return CdcEngine(
        lake_dir, cfg, payload_schema=payload_schema or EVENTS_PAYLOAD
    )


def scratch_dir(tag: str) -> str:
    return tempfile.mkdtemp(prefix=f"dbzray-{tag}-", dir="/tmp")


def write_env_binlog(
    env: pa.Table, out_dir: str, seg_rows: int = 4096, append: bool = False,
    num_partitions: int = NUM_PARTITIONS,
) -> None:
    """Write an envelope table as partition-aligned binlog segments.

    ``append=True`` continues each partition's segment numbering after the
    files already present — the directory-tail shape (S2): a later write is
    new commit-log segments arriving in the same binlog directory."""
    part = env["source"].combine_chunks().field("partition").to_numpy()
    os.makedirs(out_dir, exist_ok=True)
    for p in range(num_partitions):
        idx = np.nonzero(part == p)[0]
        pdir = os.path.join(out_dir, f"p={p}")
        os.makedirs(pdir, exist_ok=True)
        base = 0
        if append:
            base = sum(
                1 for n in os.listdir(pdir)
                if n.startswith("seg-") and n.endswith(".parquet")
            )
        for k, lo in enumerate(range(0, len(idx), seg_rows)):
            chunk = env.take(pa.array(idx[lo : lo + seg_rows]))
            pq.write_table(
                chunk, os.path.join(pdir, f"seg-{base + k:05d}.parquet")
            )


def _cast_value_field(env: pa.Table, to_type: pa.DataType) -> pa.Table:
    """Rebuild the before/after structs with the ``value`` field cast to
    ``to_type`` (simulates an envelope serialized under a narrower payload
    schema version)."""
    for col in ("before", "after"):
        arr = env[col].combine_chunks()
        fields = []
        children = []
        for i in range(arr.type.num_fields):
            f = arr.type.field(i)
            child = arr.field(i)
            if f.name == "value":
                child = pc.cast(child, to_type)
                f = pa.field("value", to_type)
            fields.append(f)
            children.append(child)
        new = pa.StructArray.from_arrays(
            children, fields=fields, mask=pc.invert(pc.is_valid(arr))
        )
        env = env.set_column(
            env.schema.get_field_index(col), pa.field(col, new.type), new
        )
    return env


def final_state_schema_change(
    sf_dir: str,
    change: "S.SchemaChange",
    payload_schema: Optional[pa.Schema] = None,
    narrow_value: bool = False,
) -> pa.Table:
    """Two-phase schema-evolution drive exercising the LAZY upgrade path:
    half the partitions apply and write lake files under schema v1, THEN
    the structured DDL event lands (widen_type / drop_column,
    AlterTableParserListener.java:76-133), and the rest applies under v2.
    The final read unifies both file generations."""
    import json

    env = events_envelopes(sf_dir)
    if narrow_value:
        env = _cast_value_field(env, pa.float32())
    root = scratch_dir("schchg")
    binlog, lake = os.path.join(root, "binlog"), os.path.join(root, "lake")
    write_env_binlog(env, binlog)
    eng = make_engine(lake, payload_schema=payload_schema)
    eng.apply_epoch(binlog, max_segments=NUM_PARTITIONS // 2)  # v1 files
    with open(os.path.join(binlog, "_schema_changes.json"), "w") as f:
        json.dump([change.to_json()], f)
    eng.run(binlog)  # v2 activation + remaining partitions
    out = eng.lake_table(include_lsn=True)
    i = out.schema.get_field_index(S.LSN)
    return out.set_column(i, pa.field("lsn", pa.int64()), out[S.LSN])


def final_state_range_erased(sf_dir: str, lo: int = 10, hi: int = 59) -> pa.Table:
    """LWW drive, then erase the key range [lo, hi] (range-tombstone
    analog: zone-pruned three-way sweep over the key-sorted runs)."""
    root = scratch_dir("rerase")
    binlog, lake = os.path.join(root, "binlog"), os.path.join(root, "lake")
    write_events_binlog(sf_dir, binlog)
    eng = make_engine(lake)
    eng.run(binlog)
    eng.erase_key_range(lo, hi)
    out = eng.lake_table(include_lsn=True)
    i = out.schema.get_field_index(S.LSN)
    return out.set_column(i, pa.field("lsn", pa.int64()), out[S.LSN])


def snapshot_source(sf_dir: str, upto_lsn: int) -> pa.Table:
    """The 'existing database' at lsn <= upto_lsn: LWW winners, deletes
    excluded — what a snapshot table scan (S3/S4) would read."""
    from debezium_incubator_ray.envelope import lww_reduce

    t = load_events(sf_dir)
    t = t.filter(pc.less_equal(t["event_id"], upto_lsn))
    eid = t["event_id"].to_numpy()
    mod = eid % 10
    op_np = np.where(mod == 0, "d", np.where(mod <= 2, "c", "u"))
    flat = pa.table(
        {
            "user_id": t["user_id"],
            "ts": t["ts"],
            "event_type": t["event_type"],
            "value": t["value"],
            "props": t["props"],
            S.LSN: t["event_id"],
            "op": pa.array(op_np, type=pa.string()),
        }
    )
    winners = lww_reduce(flat, "user_id")
    live = winners.filter(pc.not_equal(winners["op"], "d"))
    return live.drop_columns(["op", S.LSN])


def snapshot_then_stream(
    sf_dir: str, handoff_lsn: Optional[int] = None, row_filter=None,
) -> pa.Table:
    """Snapshot at the handoff LSN, then stream the binlog from it — the
    snapshot→streaming continuation (OracleConnectorIT snapshot+stream).
    ``row_filter`` = Debezium's snapshot.select.statement.overrides (a
    vectorized predicate over the snapshot source)."""
    t = load_events(sf_dir)
    if handoff_lsn is None:
        handoff_lsn = int(pc.max(t["event_id"]).as_py()) // 2
    root = scratch_dir("snapstream")
    binlog = os.path.join(root, "binlog")
    lake = os.path.join(root, "lake")
    write_events_binlog(sf_dir, binlog)
    eng = make_engine(lake)
    eng.snapshot(
        snapshot_source(sf_dir, handoff_lsn), snapshot_lsn=handoff_lsn,
        row_filter=row_filter,
    )
    eng.run(binlog)
    return eng.lake_table(include_lsn=False)


def final_state(
    sf_dir: str,
    include_lsn: bool = True,
    field_blacklist=(),
    table_include_regex=None,
    replay_twice: bool = False,
    restart_midway: bool = False,
) -> pa.Table:
    """Run the full pipeline variantly and return the materialized lake."""
    root = scratch_dir("cdc")
    binlog = os.path.join(root, "binlog")
    lake = os.path.join(root, "lake")
    write_events_binlog(sf_dir, binlog)
    eng = make_engine(lake, field_blacklist, table_include_regex)
    if restart_midway:
        eng.apply_epoch(binlog, max_segments=NUM_PARTITIONS // 2)
        del eng
        eng = make_engine(lake, field_blacklist, table_include_regex)
    eng.run(binlog)
    if replay_twice:
        eng.manifest.doc["segments_done"] = []
        eng.apply_epoch(binlog)
    out = eng.lake_table(include_lsn=include_lsn)
    if include_lsn:
        i = out.schema.get_field_index(S.LSN)
        out = out.set_column(i, pa.field("lsn", pa.int64()), out[S.LSN])
    return out

def tx_tagged_envelopes(sf_dir: str) -> pa.Table:
    """events envelope stream tagged with (tx_id, tx_events): partition-
    local transactions of 5 along LSN order, the LAST transaction per
    partition declared one event short (incomplete) — the shared fixture
    behind cdc_transactional (boundary-gated apply) and cdc_tx_summary
    (the Debezium transaction-metadata topic analog)."""
    env = events_envelopes(sf_dir)
    src = env["source"].combine_chunks()
    part = src.field("partition").to_numpy()
    lsn = src.field("lsn").to_numpy()
    n = len(part)
    order = np.lexsort((lsn, part))
    ps = part[order]
    starts = np.zeros(n, dtype=bool)
    starts[0] = True
    starts[1:] = ps[1:] != ps[:-1]
    idx = np.arange(n)
    seq = idx - np.maximum.accumulate(np.where(starts, idx, 0))
    n_p = np.bincount(ps, minlength=NUM_PARTITIONS)[ps]
    tx_seq = seq // 5
    last_seq = (n_p - 1) // 5
    size_last = n_p - 5 * last_seq
    declared = np.where(tx_seq == last_seq, size_last + 1, 5)
    tx_id_sorted = ps.astype(np.int64) * 1_000_000_000 + tx_seq
    tx_id = np.empty(n, dtype=np.int64)
    tx_ev = np.empty(n, dtype=np.int64)
    tx_id[order] = tx_id_sorted
    tx_ev[order] = declared
    env = env.append_column("tx_id", pa.array(tx_id, pa.int64()))
    return env.append_column("tx_events", pa.array(tx_ev, pa.int32()))


REKEY_OFFSET = 1_000_001  # new key = old + offset; shifts partition by 1 mod 8


def pk_update_envelopes(sf_dir: str) -> pa.Table:
    """Base events stream + PK-UPDATE (rekey) transactions — the
    reference's key-change event sequence (OracleConnectorIT.java:
    ~420-456): a primary-key change arrives as DELETE(old key) +
    CREATE(new key) inside ONE source transaction. Deterministic rule:
    every LIVE LWW winner with ``user_id % 10 == 3`` is rekeyed to
    ``user_id + REKEY_OFFSET`` carrying its winner payload; the k-th
    rekey (by ascending user_id) emits d at ``L + 2k + 1`` and c at
    ``L + 2k + 2`` where L = max base lsn. The offset shifts the mod-8
    partition by 1, so the two halves of every rekey transaction land in
    DIFFERENT partitions — exercising the engine's epoch-global
    transaction completeness. Base events ride as singleton
    transactions (tx_id = lsn); rekey pairs share tx_id
    ``3_000_000_000 + k`` with tx_events = 2."""
    env = events_envelopes(sf_dir)
    t = load_events(sf_dir)
    eid = t["event_id"].to_numpy()
    uid = t["user_id"].to_numpy()
    # LWW winner per user (max event_id = max lsn); live unless a delete
    order = np.lexsort((eid, uid))
    u_s = uid[order]
    last = np.ones(len(u_s), dtype=bool)
    last[:-1] = u_s[:-1] != u_s[1:]
    w_idx = order[last]  # winner row per user, ascending user_id
    live = (eid[w_idx] % 10) != 0
    rekey = w_idx[live & (uid[w_idx] % 10 == 3)]
    k = np.arange(len(rekey), dtype=np.int64)
    L = int(eid.max())
    # rebuild with default (nullable) fields so the envelope structs
    # concat cleanly with the base stream's
    payload = pa.table({
        c: t[c].combine_chunks()
        for c in ("user_id", "ts", "event_type", "value", "props")
    })
    old_rows = payload.take(pa.array(rekey))
    new_uid = uid[rekey] + REKEY_OFFSET
    new_rows = old_rows.set_column(
        0, pa.field("user_id", pa.int64()), pa.array(new_uid, pa.int64()),
    )
    d_env = build_envelopes(
        pa.array(["d"] * len(k), pa.string()), old_rows, old_rows,
        (uid[rekey] % NUM_PARTITIONS).astype(np.int32),
        pa.array(L + 2 * k + 1, pa.int64()), table="events_a",
        ts_us=old_rows["ts"].combine_chunks(),
    )
    c_env = build_envelopes(
        pa.array(["c"] * len(k), pa.string()), new_rows, None,
        (new_uid % NUM_PARTITIONS).astype(np.int32),
        pa.array(L + 2 * k + 2, pa.int64()), table="events_a",
        ts_us=new_rows["ts"].combine_chunks(),
    )
    tx_pair = 3_000_000_000 + k
    rk = pa.concat_tables([d_env, c_env])
    rk = rk.append_column(
        "tx_id", pa.array(np.concatenate([tx_pair, tx_pair]), pa.int64())
    )
    rk = rk.append_column(
        "tx_events", pa.array(np.full(2 * len(k), 2), pa.int32())
    )
    # global lsn order: base (lsn <= L) then the interleaved d/c pairs
    rk_lsn = np.concatenate([L + 2 * k + 1, L + 2 * k + 2])
    rk = rk.take(pa.array(np.argsort(rk_lsn, kind="stable")))
    base_lsn = env["source"].combine_chunks().field("lsn")
    env = env.append_column("tx_id", pc.cast(base_lsn, pa.int64()))
    env = env.append_column(
        "tx_events", pa.array(np.ones(env.num_rows, np.int32))
    )
    return pa.concat_tables([env, rk])


def final_state_pk_update(sf_dir: str) -> pa.Table:
    """cdc_pk_update's engine side: drain the rekey-bearing binlog under
    the transactional gate; final state = base LWW winners minus the
    rekeyed old keys plus the new keys carrying the winner payloads."""
    root = scratch_dir("pkup")
    binlog = os.path.join(root, "binlog")
    lake = os.path.join(root, "lake")
    write_env_binlog(pk_update_envelopes(sf_dir), binlog)
    eng = make_engine(lake)
    eng.cfg.transactional = True
    eng.run(binlog)
    out = eng.lake_table(include_lsn=True)
    i = out.schema.get_field_index(S.LSN)
    return out.set_column(i, pa.field("lsn", pa.int64()), out[S.LSN])


def truncate_marker(t_lsn: int, table: str = "events_a") -> pa.Table:
    """One op='t' truncate envelope per binlog partition at ``t_lsn`` (the
    aligned-log replication contract) — shared by the harness query and
    the truncate tests."""
    p = NUM_PARTITIONS
    after_nulls = pa.table(
        {f.name: pa.nulls(p, f.type) for f in EVENTS_PAYLOAD}
    )
    return build_envelopes(
        pa.array(["t"] * p, pa.string()),
        after_nulls,
        None,
        np.arange(p, dtype=np.int32),
        pa.array([t_lsn] * p, pa.int64()),
        table=table,
    )


def final_state_truncated(sf_dir: str, aligned: bool = True) -> pa.Table:
    """TRUNCATE TABLE mid-stream (op='t', the Debezium truncate record):
    events get lsn = 2*event_id (leaving odd LSNs free for control
    records) and a truncate marker lands at 2*T+1 where
    T = max(event_id)*3//5 — so exactly the events with event_id > T
    survive and re-create their keys. The marker is replicated into every
    binlog partition (the aligned-log contract); the oracle is plain LWW
    SQL over `event_id > T`."""
    root = scratch_dir("trunc")
    binlog, lake = os.path.join(root, "binlog"), os.path.join(root, "lake")
    env = events_envelopes(sf_dir, lsn_stride=2)
    n = env.num_rows
    t_eid = (n - 1) * 3 // 5  # event ids are dense 0..N-1
    t_lsn = 2 * t_eid + 1
    env2 = pa.concat_tables(
        [env, truncate_marker(t_lsn)], promote_options="permissive"
    )
    # segments stay LSN-ordered per partition (commit-log order): ts_ms
    # mirrors the lsn in build_envelopes
    env2 = env2.sort_by([("ts_ms", "ascending")])
    write_env_binlog(env2, binlog)
    eng = make_engine(
        lake, truncate_events=True,
        aligned_binlog="auto" if aligned else "never",
    )
    eng.run(binlog)
    out = eng.lake_table(include_lsn=True)
    i = out.schema.get_field_index(S.LSN)
    return out.set_column(i, pa.field("lsn", pa.int64()), out[S.LSN])
