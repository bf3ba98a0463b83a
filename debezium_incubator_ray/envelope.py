"""Pure-pyarrow kernels for building, flattening and reducing change-event
envelopes. All functions are vectorized (no per-row Python) — these run inside
``map_batches`` on zero-copy Arrow batches.

Reference parity:
- envelope build: RecordMaker.java:36-58 + Record.java:73-97 (key = pk cells,
  value = {ts, op, source, after});
- delete-row synthesis: after=null, key only (CommitLogReadHandlerImpl.java:
  294-334,412-425; TombstoneRecord.java:14-24);
- LWW per key: the materializing consumer of a compacted changelog — keep the
  max-LSN event per key (Kafka log-compaction contract the reference relies
  on, CassandraConnectorConfig.java:216-222).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from debezium_incubator_ray.schema import LSN, source_schema


def _as_array(col) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        return col.combine_chunks()
    return col


def _as_col(tbl: pa.Table, name: str):
    return tbl.column(name)


def struct_from_table(tbl: pa.Table, mask: Optional[pa.Array] = None) -> pa.StructArray:
    """Pack a table's columns into a StructArray; rows where ``mask`` is False
    become null structs (used for null before/after images)."""
    arrays = [_as_array(tbl.column(i)) for i in range(tbl.num_columns)]
    fields = [tbl.schema.field(i) for i in range(tbl.num_columns)]
    if mask is not None:
        null_mask = pc.invert(mask)
        # children must be null under a null parent so downstream flattening
        # never resurrects stale values
        arrays = [
            pc.if_else(mask, a, pa.nulls(len(a), a.type)) for a in arrays
        ]
        return pa.StructArray.from_arrays(
            arrays, fields=fields, mask=null_mask
        )
    return pa.StructArray.from_arrays(arrays, fields=fields)


def unpack_struct(
    col: pa.ChunkedArray | pa.StructArray, schema: pa.Schema
) -> Dict[str, pa.Array]:
    """StructArray → dict of child arrays, with parent-null masking enforced
    (a null struct yields null children even if the writer stored values)."""
    arr = _as_array(col)
    if arr.null_count == 0:  # fast path: children are authoritative
        return {f.name: arr.field(f.name) for f in schema}
    valid = pc.is_valid(arr)
    out = {}
    for f in schema:
        child = arr.field(f.name)
        out[f.name] = pc.if_else(valid, child, pa.nulls(len(arr), child.type))
    return out


def widen_struct_column(
    col: pa.ChunkedArray | pa.StructArray, target: pa.StructType
) -> pa.StructArray:
    """Rebuild a struct array against a wider struct type: fields present in
    the source carry over, missing fields become null children; parent
    validity preserved. The struct-level half of schema evolution."""
    arr = _as_array(col)
    n = len(arr)
    have = {arr.type.field(i).name for i in range(arr.type.num_fields)}
    children = []
    for i in range(target.num_fields):
        f = target.field(i)
        if f.name in have:
            child = arr.field(f.name)
            if child.type != f.type:
                child = pc.cast(child, f.type)
            children.append(child)
        else:
            children.append(pa.nulls(n, f.type))
    null_mask = pc.invert(pc.is_valid(arr))
    return pa.StructArray.from_arrays(
        children,
        fields=[target.field(i) for i in range(target.num_fields)],
        mask=null_mask,
    )


def build_envelopes(
    op: pa.Array,
    after: Optional[pa.Table],
    before: Optional[pa.Table],
    partition: np.ndarray | pa.Array,
    lsn: pa.Array | np.ndarray,
    table: str,
    snapshot: bool = False,
    ts_us: Optional[pa.Array] = None,
) -> pa.Table:
    """Assemble a batch of canonical envelopes.

    ``after`` is nulled where op == 'd' (tombstone semantics); ``before`` is
    nulled where op in {'c','r'} (no prior image exists).
    """
    op = _as_array(op)
    n = len(op)
    is_del = pc.equal(op, "d")
    has_before = pc.or_(pc.equal(op, "u"), is_del)
    after_arr = struct_from_table(after, mask=pc.invert(is_del))
    if before is not None:
        before_arr = struct_from_table(before, mask=has_before)
    else:
        before_arr = pa.nulls(n, after_arr.type)
    if ts_us is None:
        ts_us = pa.nulls(n, pa.timestamp("us"))
    lsn_arr = pa.array(np.asarray(lsn), type=pa.int64()) if isinstance(lsn, np.ndarray) else _as_array(lsn)
    part_arr = (
        pa.array(np.asarray(partition), type=pa.int32())
        if isinstance(partition, np.ndarray)
        else pc.cast(_as_array(partition), pa.int32())
    )
    src = pa.StructArray.from_arrays(
        [
            part_arr,
            lsn_arr,
            pa.array([table] * n, type=pa.string()),
            pa.array(np.full(n, snapshot), type=pa.bool_()),
            _as_array(ts_us),
        ],
        fields=list(source_schema()),
    )
    ts_ms = lsn_arr  # envelope ts: deterministic, monotone with the offset
    return pa.Table.from_arrays(
        [op, before_arr, after_arr, src, ts_ms],
        names=["op", "before", "after", "source", "ts_ms"],
    )


def replace_source_table(env: pa.Table, table) -> pa.Table:
    """Rewrite the envelope batch's ``source.table`` (a routing SMT
    building block): ``table`` is a string (constant) or a StringArray of
    per-row destinations. All other source fields carry through."""
    from debezium_incubator_ray.schema import source_schema

    src = env["source"].combine_chunks()
    if isinstance(table, str):
        table = pa.array([table] * env.num_rows, pa.string())
    new_src = pa.StructArray.from_arrays(
        [src.field("partition"), src.field("lsn"), _as_array(table),
         src.field("snapshot"), src.field("ts_us")],
        fields=list(source_schema()),
    )
    i = env.schema.get_field_index("source")
    return env.set_column(
        i, pa.field("source", new_src.type, nullable=False), new_src
    )


COMPOSITE_KEY = "_key"  # internal routing/sort column for composite PKs


def composite_key_arrays(parts: Sequence) -> pa.Array:
    """THE _key encoding (single definition — normalize, snapshot and
    lookup must all produce byte-identical keys): Arrow-string-cast
    components joined with '|'. Null if any component is null — such rows
    are unroutable, like a missing single-column key."""
    casted = [pc.cast(_as_array(p), pa.string()) for p in parts]
    return pc.binary_join_element_wise(*casted, "|")


def composite_key(tbl: pa.Table, key_cols: Sequence[str]) -> pa.Array:
    """Derive the internal ``_key`` column from a table's key component
    columns (EngineConfig.key_cols contract)."""
    return composite_key_arrays([tbl.column(c) for c in key_cols])


def lww_reduce(tbl: pa.Table, key: str, lsn_col: str = LSN) -> pa.Table:
    """Keep the max-``lsn_col`` row per ``key`` — the LWW winner.

    Vectorized: sort by (key asc, lsn desc) then keep first occurrence of
    each key. This is both the in-batch partial reduce (salting phase one:
    bounds any hot key's shuffle fan-in to one row per input block) and the
    final per-partition reduce.

    INVARIANT: the output is sorted by ``key`` ascending (winner indices are
    filtered from the key-sorted index array) — merge_lww and the sorted-run
    writer rely on this instead of re-sorting the payload.
    """
    if tbl.num_rows <= 1:
        return tbl
    # sort only the 2 key columns, then gather winners once — a full-table
    # take-then-filter would copy the heavy payload columns twice (the
    # hottest memory path in the engine)
    keys_only = tbl.select([key, lsn_col])
    idx = pc.sort_indices(
        keys_only, sort_keys=[(key, "ascending"), (lsn_col, "descending")]
    )
    k = pc.take(_as_col(tbl, key), idx)
    k = _as_array(k)
    n = len(k)
    first = np.empty(n, dtype=bool)
    first[0] = True
    neq = pc.not_equal(k.slice(1), k.slice(0, n - 1))
    if k.null_count:
        # null keys (truncate control markers) never collapse with each
        # other — each stays its own "first" (null != null is null)
        neq = pc.fill_null(neq, True)
    first[1:] = neq.to_numpy(zero_copy_only=False)
    winner_idx = idx.filter(pa.array(first))
    return tbl.take(winner_idx)


SET_MASK = "_set_mask"  # per-event modified-cell bitmask (merge_mode="partial")
HAD_DEL = "_had_del"  # patch flag: a row deletion occurred inside the epoch


def partial_fold(
    tbl: pa.Table,
    key: str,
    lsn_col: str = LSN,
    op_col: str = "op",
    mask_col: str = SET_MASK,
    counter_cols: Sequence[str] = (),
) -> pa.Table:
    """Per-cell LWW fold of one epoch's events for merge_mode="partial".

    Cassandra mutations carry only the MODIFIED cells (CellData.java:23-60;
    RowData = ordered map of present cells, RowData.java:28-33), and a row
    deletion shadows all older cells. The flat event layout encodes cell
    presence as an int64 bitmask (``_set_mask``, bit j = payload column j in
    table order; null/absent mask = all cells present, the full-row case).

    Output: ONE patch row per key, key-sorted —
      - payload column j = value of the latest live event that SET cell j
        (live = op != 'd' and lsn > the key's last row-deletion lsn),
        null if no live event set it;
      - ``_set_mask`` = union of live set bits (bit j tells merge_partial
        whether null means "set to null" or "not touched");
      - ``_had_del`` = a deletion occurred (unset cells must NOT inherit
        pre-delete lake values);
      - ``op`` = 'd' when no live event remains (the key dies), else 'u';
      - ``_lsn`` = max lsn over the key's live events (or the delete's lsn
        for dead keys).

    Fully vectorized: one sort + numpy last-write-wins scatters per column
    (ascending fancy-index assignment keeps the highest-lsn row).
    """
    aux = {op_col, lsn_col, mask_col, "_p", HAD_DEL}
    payload = [c for c in tbl.column_names if c not in aux]
    if tbl.num_rows == 0:
        out = {c: tbl[c] for c in payload}
        out[op_col] = pa.array([], pa.string())
        out[lsn_col] = pa.array([], pa.int64())
        out[SET_MASK] = pa.array([], pa.int64())
        out[HAD_DEL] = pa.array([], pa.bool_())
        return pa.table(out)
    if len(payload) > 62:
        raise ValueError(
            f"merge_mode='partial' supports at most 62 payload columns "
            f"(int64 set-mask); got {len(payload)}"
        )
    idx = pc.sort_indices(
        tbl.select([key, lsn_col]),
        sort_keys=[(key, "ascending"), (lsn_col, "ascending")],
    )
    t = tbl.take(idx)
    k = _as_array(t[key])
    n = len(k)
    first = np.empty(n, dtype=bool)
    first[0] = True
    first[1:] = pc.not_equal(k.slice(1), k.slice(0, n - 1)).to_numpy(
        zero_copy_only=False
    )
    gid = np.cumsum(first) - 1
    G = int(gid[-1]) + 1
    lsn = t[lsn_col].to_numpy(zero_copy_only=False).astype(np.int64)
    is_del = pc.equal(t[op_col], "d").to_numpy(zero_copy_only=False)
    if mask_col in t.column_names:
        mask = (
            pc.fill_null(t[mask_col].combine_chunks(), -1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
    else:
        mask = np.full(n, -1, dtype=np.int64)  # all cells present

    neg_inf = np.iinfo(np.int64).min
    del_lsn = np.full(G, neg_inf, dtype=np.int64)
    di = np.nonzero(is_del)[0]
    del_lsn[gid[di]] = lsn[di]  # ascending writes → max delete lsn wins
    live = (~is_del) & (lsn > del_lsn[gid])

    key_first = np.nonzero(first)[0]
    cols: Dict[str, pa.Array] = {}
    out_mask = np.zeros(G, dtype=np.int64)
    group_lsn = np.full(G, neg_inf, dtype=np.int64)
    li = np.nonzero(live)[0]
    group_lsn[gid[li]] = lsn[li]
    alive = np.zeros(G, dtype=bool)
    alive[gid[li]] = True
    # dead keys report the deletion's lsn (it IS the last event applied)
    group_lsn = np.where(alive, group_lsn, del_lsn)

    pk_set = {key}
    counters = set(counter_cols)
    for j, name in enumerate(payload):
        if name in pk_set:
            cols[name] = _as_array(t[name]).take(pa.array(key_first))
            out_mask |= np.int64(1) << np.int64(j)
            continue
        setj = live & (((mask >> np.int64(j)) & 1) == 1)
        src = _as_array(t[name])
        if name in counters:
            # counter column (Cassandra counter tables): live set events
            # ACCUMULATE instead of last-write-wins; a row deletion resets
            # (the `live` filter). NULL contributions are skipped (SUM
            # semantics); all-null/no contribution → null cell.
            valid = pc.is_valid(src).to_numpy(zero_copy_only=False)
            contrib = setj & valid
            is_int = pa.types.is_integer(src.type)
            zero = pa.scalar(0, type=src.type)
            vals = pc.fill_null(src, zero).to_numpy(zero_copy_only=False)
            if is_int:
                sums = np.zeros(G, dtype=np.int64)
                np.add.at(sums, gid[contrib], vals[contrib].astype(np.int64))
            else:
                sums = np.bincount(
                    gid[contrib], weights=vals[contrib], minlength=G
                )
            has_val = np.zeros(G, dtype=bool)
            has_val[gid[contrib]] = True
            cols[name] = pc.if_else(
                pa.array(has_val),
                pc.cast(pa.array(sums), src.type),
                pa.nulls(G, src.type),
            )
            has = np.zeros(G, dtype=bool)
            has[gid[np.nonzero(setj)[0]]] = True
            out_mask |= has.astype(np.int64) << np.int64(j)
            continue
        sj = np.nonzero(setj)[0]
        last = np.full(G, -1, dtype=np.int64)
        last[gid[sj]] = sj  # ascending → highest-lsn setter wins
        has = last >= 0
        vals = src.take(pa.array(np.maximum(last, 0)))
        cols[name] = pc.if_else(pa.array(has), vals, pa.nulls(G, src.type))
        out_mask |= has.astype(np.int64) << np.int64(j)
    cols[op_col] = pa.array(np.where(alive, "u", "d"), type=pa.string())
    cols[lsn_col] = pa.array(group_lsn)
    cols[SET_MASK] = pa.array(out_mask)
    cols[HAD_DEL] = pa.array(del_lsn != neg_inf)
    return pa.table(cols)


def merge_partial(
    existing: Optional[pa.Table],
    patches: pa.Table,
    key: str,
    lsn_col: str = LSN,
    op_col: str = "op",
    sort_output: bool = True,
    counter_cols: Sequence[str] = (),
) -> pa.Table:
    """Apply partial_fold patches onto a lake run's rows (merge_mode=
    "partial" counterpart of merge_lww). Per patched key and payload cell:
    set bit → patch value; unset after an in-epoch deletion → null (the
    lake value died with the row); unset otherwise → the lake value
    carries. Dead keys drop (partial mode requires compacted tombstones).
    Output = payload + ``_lsn``, key-sorted."""
    payload = [
        c for c in patches.column_names
        if c not in (op_col, SET_MASK, HAD_DEL, lsn_col, "_p")
    ]
    live_p = patches.filter(pc.not_equal(patches[op_col], "d"))
    dead_keys = patches.filter(pc.equal(patches[op_col], "d"))[key]
    n = live_p.num_rows
    mask = live_p[SET_MASK].to_numpy(zero_copy_only=False).astype(np.int64)
    had_del = live_p[HAD_DEL].to_numpy(zero_copy_only=False).astype(bool)
    if existing is not None and existing.num_rows:
        pos = pc.index_in(live_p[key], value_set=_as_array(existing[key]))
        pos_np = (
            pc.fill_null(pos, -1).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        matched = pos_np >= 0
        gather = pa.array(np.maximum(pos_np, 0))
    else:
        matched = np.zeros(n, dtype=bool)
        gather = None
    counters = set(counter_cols)
    cols: Dict[str, pa.Array] = {}
    for j, name in enumerate(payload):
        pv = _as_array(live_p[name])
        if name == key:
            cols[name] = pv
            continue
        setj = ((mask >> np.int64(j)) & 1) == 1
        # inherit the lake value only where the cell wasn't set, no deletion
        # occurred, and the key pre-existed
        inherit = (~setj) & (~had_del) & matched
        if name in counters and gather is not None:
            # counter cell: the patch holds this epoch's increment sum —
            # ADD it to the surviving lake value (dropped by a deletion)
            lv = _as_array(existing[name]).take(gather)
            pvalid = pc.is_valid(pv).to_numpy(zero_copy_only=False)
            lvalid = (
                pc.is_valid(lv).to_numpy(zero_copy_only=False)
                & matched & ~had_del
            )
            is_int = pa.types.is_integer(pv.type)
            zero = pa.scalar(0, type=pv.type)
            acc = np.int64 if is_int else np.float64
            pvals = pc.fill_null(pv, zero).to_numpy(zero_copy_only=False).astype(acc)
            lvals = pc.fill_null(lv, zero).to_numpy(zero_copy_only=False).astype(acc)
            tot = np.where(pvalid, pvals, 0) + np.where(lvalid, lvals, 0)
            summed = pc.if_else(
                pa.array(pvalid | lvalid),
                pc.cast(pa.array(tot), pv.type),
                pa.nulls(n, pv.type),
            )
            base = pc.if_else(pa.array(inherit), lv, pv)
            cols[name] = pc.if_else(pa.array(setj), summed, base)
        elif gather is not None and inherit.any():
            lake_vals = _as_array(existing[name]).take(gather)
            cols[name] = pc.if_else(pa.array(inherit), lake_vals, pv)
        else:
            cols[name] = pv
    cols[lsn_col] = live_p[lsn_col]
    out = pa.table(cols)
    if existing is not None and existing.num_rows:
        touched = pc.is_in(
            existing[key],
            value_set=pa.concat_arrays(
                [_as_array(live_p[key]), _as_array(dead_keys)]
            ),
        )
        keep = existing.filter(pc.invert(touched)).select(out.column_names)
        out = pa.concat_tables([keep, out], promote_options="permissive")
    # neither input needs to be sorted (keys match via index_in), so a
    # multi-delta read fold sorts ONCE at the end, not per epoch
    return out.sort_by([(key, "ascending")]) if sort_output else out


DELETED = "_deleted"  # tombstone marker column (tombstones=False mode only)


def merge_lww(
    existing: Optional[pa.Table],
    fresh: pa.Table,
    key: str,
    lsn_col: str = LSN,
    op_col: str = "op",
    keep_tombstones: bool = False,
) -> pa.Table:
    """Sorted-run upsert: merge the current lake rows of a partition slice
    (implicitly live, no op column) with LWW-reduced fresh events, keep the
    max-LSN winner per key, then compact tombstones (drop keys whose winner
    is a delete). Output is sorted by key — the lake's sorted-run invariant.

    ``keep_tombstones=True`` (EngineConfig.tombstones=False): delete winners
    are RETAINED as marker rows (payload nulls, ``_deleted=true``) — the
    compacted-topic-without-tombstone behavior where downstream consumers
    still observe deletions (TombstoneRecord.java:11-24 contract inverted).

    Equal-LSN tie: the FRESH side wins (fresh rows concat first; the stable
    sort in lww_reduce keeps the first occurrence). Normal stream epochs
    never tie (the watermark filter admits only lsn > watermark), so this
    only decides cross-writer collisions — e.g. a merge_into stamped at
    watermark+1 vs the next stream event carrying that same LSN: the
    stream's event is the source of truth and must supersede the merge.
    """
    payload_cols = [c for c in fresh.column_names if c not in (op_col, DELETED)]
    if existing is not None and existing.num_rows:
        ex = existing
        if op_col not in ex.column_names:
            if DELETED in ex.column_names:
                # stored tombstone markers re-enter the reduce as deletes so
                # they keep losing to any newer live write
                op = pc.if_else(
                    pc.fill_null(ex[DELETED].combine_chunks(), False),
                    pa.scalar("d"), pa.scalar("r"),
                )
                ex = ex.drop_columns([DELETED]).append_column(op_col, op)
            else:
                ex = ex.append_column(
                    op_col, pa.array(["r"] * ex.num_rows, type=pa.string())
                )
        fr = fresh.drop_columns([DELETED]) if DELETED in fresh.column_names else fresh
        both = pa.concat_tables(
            [fr, ex.select(fr.column_names)], promote_options="permissive"
        )
    else:
        both = fresh.drop_columns([DELETED]) if DELETED in fresh.column_names else fresh
    winners = lww_reduce(both, key, lsn_col)  # key-sorted by construction
    dead = pc.equal(winners.column(op_col), "d")
    if keep_tombstones:
        out = winners.select(payload_cols)
        return out.append_column(DELETED, pc.fill_null(dead, False))
    live = winners.filter(pc.invert(dead))
    return live.select(payload_cols)
