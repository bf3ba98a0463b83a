"""Derived lakes: maintain a SECONDARY INDEX (or any re-keyed table) from a
primary change stream.

The classic CDC composition: the same envelope stream that maintains the
primary table also maintains tables keyed differently — e.g. an index
(event_type, user_id) over a table keyed by user_id. Re-keying a change
stream is NOT a projection: an update that CHANGES the new key must become
a delete of the old index entry plus a create of the new one, or stale
entries accumulate. ``derive_rekeyed_envelopes`` synthesizes exactly those
pairs, vectorized:

    op c/r                         → create at the after-key
    op d                           → delete at the before-key
    op u, new key unchanged        → update at the (same) key
    op u, new key CHANGED          → delete at the before-key
                                     + create at the after-key (same LSN —
                                     different keys, so LWW is unambiguous)

Requires honest before images (create only on non-existing rows, null
before after a delete — events_envelopes(delete_aware=True) provides them;
real Debezium streams guarantee them). "No prior row" is detected on the
before STRUCT's own validity, never on a key component being null — a
prior row may legitimately carry NULL in a key column, and an update
moving off that key must still emit the delete. ``key_cols`` MUST
uniquely identify a primary row (in practice: include the primary key in
the composite, as an index does); with a non-unique key, deleting one
primary row would remove an index entry still owned by another. The
derived stream feeds a normal CdcEngine with ``key_cols`` = the new key —
watermarks, exactly-once, MoR, erasure all compose for free.

Scale shape: one stateless vectorized map over the stream (mask + take per
case, one concat); the derived engine's exchange handles the re-partition
(the new key hashes differently by construction — this is the one shuffle
a re-key fundamentally requires).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from debezium_incubator_ray.envelope import build_envelopes, unpack_struct


def derive_rekeyed_envelopes(
    env: pa.Table,
    payload_schema: pa.Schema,
    key_cols: Sequence[str],
) -> pa.Table:
    """Primary envelope stream → envelope stream for a table keyed by
    ``key_cols`` with payload ``payload_schema`` (projected from the
    primary payload). See module docstring for the op algebra."""
    src = env["source"].combine_chunks()
    lsn = src.field("lsn").to_numpy(zero_copy_only=False)
    op = env["op"].combine_chunks()
    after = unpack_struct(env["after"], payload_schema)
    before = unpack_struct(env["before"], payload_schema)
    n = env.num_rows

    opn = np.asarray(op.to_numpy(zero_copy_only=False))
    is_cr = (opn == "c") | (opn == "r")
    is_d = opn == "d"
    is_u = opn == "u"
    # "no prior row" = the before STRUCT itself is null; a present before
    # image may carry NULL in a key column and still owns an index entry
    before_absent = pc.is_null(env["before"].combine_chunks()).to_numpy(
        zero_copy_only=False
    )
    # does the NEW key change under the update? NULL-safe per component:
    # null vs null = same, null vs value = changed
    changed = np.zeros(n, dtype=bool)
    for kc in key_cols:
        a, b = after[kc], before[kc]
        one_null = pc.xor(pc.is_null(a), pc.is_null(b))
        neq = pc.or_(pc.fill_null(pc.not_equal(a, b), False), one_null)
        changed |= neq.to_numpy(zero_copy_only=False)
    u_fresh = is_u & before_absent  # no prior row → plain create
    u_same = is_u & ~before_absent & ~changed
    u_moved = is_u & ~before_absent & changed
    # op algebra (module docstring) folds to three pieces: a moved update
    # is a create at the after-key plus a delete at the before-key
    c_mask = is_cr | u_fresh | u_moved
    d_mask = is_d | u_moved

    def take(tbl_cols, mask):
        idx = pa.array(np.nonzero(mask)[0])
        return {k: pc.take(v, idx) for k, v in tbl_cols.items()}, lsn[mask]

    pieces = []  # (op_code, after_cols|None, before_cols|None, lsns)
    if c_mask.any():
        a, ls = take(after, c_mask)
        pieces.append(("c", a, None, ls))
    if u_same.any():
        a, ls = take(after, u_same)
        b, _ = take(before, u_same)
        pieces.append(("u", a, b, ls))
    if d_mask.any():
        b, ls = take(before, d_mask)
        pieces.append(("d", b, b, ls))

    outs = []
    for code, a_cols, b_cols, ls in pieces:
        m = len(ls)
        if m == 0:
            continue
        a_tbl = pa.table({f.name: a_cols[f.name] for f in payload_schema})
        b_tbl = (
            pa.table({f.name: b_cols[f.name] for f in payload_schema})
            if b_cols is not None
            else None
        )
        # binlog-layout partition is nominal: the derived engine routes by
        # its own composite-key hash through the exchange path anyway
        part = np.zeros(m, dtype=np.int32)
        outs.append(
            build_envelopes(
                pa.array([code] * m, pa.string()),
                a_tbl,
                b_tbl,
                part,
                ls.astype(np.int64),
                table="derived",
            )
        )
    if not outs:
        return build_envelopes(
            pa.array([], pa.string()),
            pa.table({f.name: pa.array([], f.type) for f in payload_schema}),
            None,
            np.zeros(0, dtype=np.int32),
            np.zeros(0, dtype=np.int64),
            table="derived",
        )
    return pa.concat_tables(outs)


def agg_view_envelopes(
    env: pa.Table,
    group_col: str,
    value_col: str,
    current: pa.Table,
    lsn: int,
) -> pa.Table:
    """One epoch of change events + the view's CURRENT (group, n, total)
    state → the envelopes that upsert a MATERIALIZED AGGREGATE VIEW lake
    to its new state (the persistent form of incremental_groupby_agg:
    the view survives restarts, time-travels, and replays exactly-once
    because it IS a CdcEngine lake keyed by the group).

    Per epoch: signed contributions (functions/incremental.py) fold to
    one delta row per touched group; groups are joined against the
    current view state and each becomes op='c' (new group), 'u' (changed)
    or 'd' (n dropped to zero). All envelopes carry the epoch's ``lsn`` —
    distinct keys, so LWW is unambiguous, and replaying the epoch's
    binlog is a watermark no-op. The view is group-cardinality (an
    aggregate), so the current-state join is lookup-table-sized by
    construction; at larger view cardinalities feed ``current`` from a
    co-partitioned read instead."""
    from debezium_incubator_ray.functions.incremental import agg_contributions

    c = agg_contributions(env, group_col, value_col)
    d = c.group_by(group_col).aggregate(
        [("d_count", "sum"), ("d_sum", "sum")]
    )
    cur = {
        r[group_col]: (r["n"], r["total"]) for r in current.to_pylist()
    } if current is not None and current.num_rows else {}
    ops, gs, ns, ts, b_ns, b_ts = [], [], [], [], [], []
    for r in d.to_pylist():
        g = r[group_col]
        dn, dsum = int(r["d_count_sum"]), float(r["d_sum_sum"])
        old = cur.get(g)
        new_n = (old[0] if old else 0) + dn
        new_t = (old[1] if old else 0.0) + dsum
        if old is None and new_n <= 0:
            # group born AND fully gone within the epoch: never existed.
            # Keyed on new_n, not dsum — float residue of +x -x chains is
            # not exactly 0.0 and must not fabricate an n=0 group
            continue
        if old is not None and dn == 0 and dsum == 0.0:
            continue  # exact no-op for an existing group
        if old is None:
            op = "c"
        elif new_n == 0:
            op = "d"
        else:
            op = "u"
        ops.append(op)
        gs.append(g)
        ns.append(new_n)
        ts.append(new_t)
        b_ns.append(old[0] if old else None)
        b_ts.append(old[1] if old else None)
    after = pa.table({
        group_col: pa.array(gs, pa.string()),
        "n": pa.array(ns, pa.int64()),
        "total": pa.array(ts, pa.float64()),
    })
    before = pa.table({
        group_col: pa.array(gs, pa.string()),
        "n": pa.array(b_ns, pa.int64()),
        "total": pa.array(b_ts, pa.float64()),
    })
    return build_envelopes(
        pa.array(ops, pa.string()), after, before,
        np.zeros(len(ops), dtype=np.int32),
        np.full(len(ops), lsn, dtype=np.int64), table="agg_view",
    )

def enrich_envelopes(
    env,
    dim_engine,
    fk_col: str,
    dim_cols: Sequence[str],
    payload_schema: pa.Schema,
):
    """Stream-table JOIN VIEW: enrich a fact envelope stream with
    dimension attributes looked up by foreign key in a dimension CDC
    lake — the denormalizing consumer every warehouse CDC feed runs
    (Kafka Streams' stream-KTable join; reference analog: consumers
    joining the orders topic to a customers compacted topic). Each
    c/u/r envelope's after image gains ``dim_cols`` (LEFT join — a
    missing dimension row yields NULLs, never drops the fact); deletes
    pass through untouched. The enriched stream feeds a normal
    CdcEngine keyed by the FACT key, so watermarks, exactly-once and
    replay compose for free.

    Semantics: attributes are the dimension state AT ENRICHMENT TIME
    (the stream-table join contract). Late dimension updates do not
    rewrite already-applied view rows — re-run enrichment (or rebuild
    the view) for slowly-changing-dimension backfills.

    Scale shape: envelopes route by the DIMENSION's own partitioner on
    the fk (one shuffle, the irreducible re-key cost); each dimension
    partition's merged state is read ONCE per group and joined with one
    vectorized Arrow hash join — never a per-event lookup, and the
    driver sees no row. Returns a Dataset of enriched envelopes.

    Citation: the reference leaves this to downstream Kafka consumers
    (CassandraTopicSelector routes per-table topics; joins happen off-
    platform) — here the lake IS that consumer."""
    import ray.data
    from debezium_incubator_ray import schema as S
    from debezium_incubator_ray.stages.apply import read_partition_state
    from debezium_incubator_ray.hashing import partition_ids
    from debezium_incubator_ray.envelope import DELETED

    m = dim_engine.manifest
    dim_key = dim_engine.cfg.key
    P = m.num_partitions
    partitioner = m.doc.get("partitioner", "mod")
    spec = dict(
        lake_dir=dim_engine.lake_dir,
        target_b64=S.schema_to_b64(m.current_schema()),
        defaults=dict(m.doc["defaults"]),
        schema_version=m.doc["schemas"][-1]["version"],
        entries={p: m.doc["partitions"][str(p)] for p in range(P)},
        counter_cols=list(m.doc.get("counter_cols") or []),
    )
    dim_schema = m.current_schema()
    dim_types = {f.name: f.type for f in dim_schema}
    for c in dim_cols:
        if c not in dim_types:
            raise ValueError(f"dimension lake has no column {c!r}")
        if c in [f.name for f in payload_schema]:
            raise ValueError(
                f"enriched column {c!r} collides with a fact payload "
                "column — rename it in the dimension or project it away"
            )
    out_schema = pa.schema(
        list(payload_schema) + [pa.field(c, dim_types[c]) for c in dim_cols]
    )

    if isinstance(env, pa.Table):
        env = ray.data.from_arrow(env)

    def route(t: pa.Table) -> pa.Table:
        after = t["after"].combine_chunks()
        fk = pc.struct_field(after, fk_col)
        pid = partition_ids(
            pc.fill_null(fk, 0 if pa.types.is_integer(fk.type) else ""),
            P, partitioner,
        ).astype(np.int32)
        return t.append_column("_dimp", pa.array(pid))

    def enrich_group(g: pa.Table) -> pa.Table:
        p = int(g["_dimp"][0].as_py())
        g = g.drop_columns(["_dimp"])
        dim = read_partition_state(
            spec["entries"][p], spec["lake_dir"],
            S.schema_from_b64(spec["target_b64"]), spec["defaults"],
            spec["schema_version"], dim_key,
            counter_cols=tuple(spec.get("counter_cols") or []),
        )
        if DELETED in dim.column_names:
            dim = dim.filter(
                pc.invert(pc.fill_null(dim[DELETED], False))
            ).drop_columns([DELETED])
        dim = dim.select([dim_key] + list(dim_cols)).rename_columns(
            ["__fk"] + list(dim_cols)
        )

        src = g["source"].combine_chunks()
        lsn = src.field("lsn").to_numpy(zero_copy_only=False)
        part = src.field("partition").to_numpy(zero_copy_only=False)
        op = g["op"].combine_chunks()
        after = unpack_struct(g["after"], payload_schema)
        before = unpack_struct(g["before"], payload_schema)

        # one vectorized hash join attaches the dim attrs to the after
        # images (row order restored by the carried index)
        a_tbl = pa.table(
            {**after, "__fk": after[fk_col],
             "__idx": pa.array(np.arange(g.num_rows, dtype=np.int64))}
        )
        j = a_tbl.join(dim, keys="__fk", join_type="left outer")
        j = j.sort_by("__idx")
        after_cols = {f.name: j[f.name] for f in payload_schema}
        for c in dim_cols:
            after_cols[c] = j[c]
        # before images carry the fact payload + NULL dim attrs: the
        # view's LWW never reads them, but the shape must match
        n = g.num_rows
        before_cols = {f.name: before[f.name] for f in payload_schema}
        for c in dim_cols:
            before_cols[c] = pa.nulls(n, dim_types[c])

        return build_envelopes(
            op,
            pa.table({f.name: after_cols[f.name] for f in out_schema}),
            pa.table({f.name: before_cols[f.name] for f in out_schema}),
            part.astype(np.int32),
            lsn.astype(np.int64),
            table="enriched",
        )

    return (
        env.map_batches(route, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_dimp")
        .map_groups(enrich_group, batch_format="pyarrow")
    ), out_schema


def flatten_envelopes(
    env,
    payload_schema: pa.Schema,
    delete_handling: str = "rewrite",
):
    """ExtractNewRecordState SMT: the Debezium envelope → a flat row per
    event, the shape every non-CDC-aware consumer (JDBC sink, search
    index, warehouse COPY) ingests. Payload columns come from ``after``;
    metadata travels as ``__op`` / ``__lsn`` / ``__table`` (the SMT's
    add.fields). Deletes (after is null by the envelope contract,
    build_envelopes tombstone semantics):

      - "rewrite": the row is kept with payload taken from the BEFORE
        image (null where no prior image exists) and ``__deleted`` set
        to 'true' — soft-delete markers for sinks that can't delete;
      - "drop": delete events are removed from the flattened stream.

    Vectorized: one unpack per struct + one if_else per column; streams
    as map_batches (no shuffle — flattening is embarrassingly parallel).

    Reference analog: the connectors emit the full envelope
    (Record.java:86-97 buildValue) and leave flattening to Kafka
    Connect's SMT layer; here it is a stream stage."""
    import ray.data

    if delete_handling not in ("rewrite", "drop"):
        raise ValueError(f"unknown delete_handling {delete_handling!r}")

    def fn(t: pa.Table) -> pa.Table:
        op = t["op"].combine_chunks()
        if delete_handling == "drop":
            keep = pc.not_equal(op, "d")
            t = t.filter(keep)
            op = t["op"].combine_chunks()
        src = t["source"].combine_chunks()
        after = unpack_struct(t["after"], payload_schema)
        if delete_handling == "rewrite":
            is_del = pc.equal(op, "d")
            before = unpack_struct(t["before"], payload_schema)
            cols = {
                name: pc.if_else(is_del, before[name], a)
                for name, a in after.items()
            }
        else:
            cols = dict(after)
        cols["__op"] = op
        cols["__lsn"] = src.field("lsn")
        cols["__table"] = src.field("table")
        if delete_handling == "rewrite":
            cols["__deleted"] = pc.if_else(
                is_del,
                pa.scalar("true", pa.string()),
                pa.scalar("false", pa.string()),
            )
        return pa.table(cols)

    if isinstance(env, pa.Table):
        env = ray.data.from_arrow(env)
    return env.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
