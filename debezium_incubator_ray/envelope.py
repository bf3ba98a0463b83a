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
    first[1:] = neq.to_numpy(zero_copy_only=False)
    winner_idx = idx.filter(pa.array(first))
    return tbl.take(winner_idx)


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
            [ex.select(fr.column_names), fr], promote_options="permissive"
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
