"""Slowly-changing-dimension type-2 history from a change stream.

The lake's LWW apply keeps only the latest row per key; SCD2 instead keeps
EVERY version with a validity interval — the standard warehouse consumption
of a Debezium topic (reference semantics: one change record per mutation,
RecordMaker.java:36-58, ordered by commit position). Each non-delete event
opens a version at its own LSN; the NEXT event on the same key (any op,
including the delete) closes it. The open version per key is `is_current`.

Shuffle shape: ONE hash-bucketed groupby on the key (same partitioning
assumption as the lake), with a fully vectorized per-bucket kernel —
lexsort + same-key shift masks, no per-version loop. At 100 TB the stream
is already partition-local in the lake layout, so the bucket exchange
disappears on aligned inputs exactly like the apply path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def scd2_history(
    ds,
    key_col: str = "user_id",
    lsn_col: str = "lsn",
    op_col: str = "op",
    value_cols: tuple = ("value",),
    buckets: int = 64,
):
    """changelog Dataset → SCD2 version table.

    Output columns: key, ``valid_from`` (the event's LSN), ``valid_to``
    (next event's LSN on the key, NULL while open), each value column,
    ``is_current`` (open AND not superseded — a trailing delete closes the
    last version, so a deleted key has no current row).
    """
    keep = [key_col, lsn_col, op_col, *value_cols]

    def add_bucket(t: pa.Table) -> pa.Table:
        t = t.select(keep)
        ids = t[key_col].combine_chunks().to_numpy(zero_copy_only=False)
        b = (ids.astype(np.uint64) % np.uint64(buckets)).astype(np.int32)
        return t.append_column("_bucket", pa.array(b))

    def versions(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group, sort_keys=[(key_col, "ascending"), (lsn_col, "ascending")]
        )
        s = group.take(idx)
        k = s[key_col].combine_chunks().to_numpy()
        lsn = s[lsn_col].combine_chunks().to_numpy()
        op = s[op_col].combine_chunks().to_numpy(zero_copy_only=False)
        n = len(k)
        empty_schema = pa.schema(
            [
                pa.field(key_col, pa.int64()),
                pa.field("valid_from", pa.int64()),
                pa.field("valid_to", pa.int64()),
                *[pa.field(c, group.schema.field(c).type) for c in value_cols],
                pa.field("is_current", pa.bool_()),
            ]
        )
        if n == 0:
            return empty_schema.empty_table()
        same_next = np.zeros(n, dtype=bool)
        same_next[:-1] = k[1:] == k[:-1]
        # next event's LSN on the same key closes this version
        valid_to = np.full(n, -1, dtype=np.int64)
        valid_to[:-1] = np.where(same_next[:-1], lsn[1:], -1)
        keep_mask = op != "d"
        vt = valid_to[keep_mask]
        # open intervals carry the sentinel -1 → NULL
        open_mask = pa.array(vt < 0)
        out = {
            key_col: pa.array(k[keep_mask]),
            "valid_from": pa.array(lsn[keep_mask]),
            "valid_to": pc.if_else(
                open_mask, pa.scalar(None, pa.int64()),
                pa.array(vt, type=pa.int64()),
            ),
        }
        for c in value_cols:
            out[c] = s[c].combine_chunks().filter(pa.array(keep_mask))
        out["is_current"] = open_mask
        return pa.table(out)

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_bucket")
        .map_groups(versions, batch_format="pyarrow")
    )
