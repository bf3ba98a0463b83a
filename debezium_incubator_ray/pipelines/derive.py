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
