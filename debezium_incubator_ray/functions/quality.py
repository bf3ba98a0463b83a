"""Data-quality operators: referential checks and column profiling.

The validation stage every ingest pipeline runs before promoting data:
both operators are decomposable (per-batch partials, metadata-sized
results) so they cost one streaming pass regardless of table size.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def fk_orphans(ds, key_col: str, dim_keys: pa.Array, id_out: str | None = None):
    """Referential check: DISTINCT values of ``key_col`` with no match in
    the dimension key set (foreign-key orphans). The dimension side is
    keys-only — the classic small side — broadcast once via ray.put; each
    fact batch reduces to its distinct unmatched keys (sorted-array
    membership), and a final distinct pass folds across batches. NULL
    keys are not orphans (unknown is not provably unmatched)."""
    import ray

    keys_np = np.sort(
        np.asarray(dim_keys.to_numpy(zero_copy_only=False), dtype=np.int64)
    )
    ref = ray.put(keys_np)
    out_name = id_out or key_col

    def unmatched(t: pa.Table) -> pa.Table:
        dim = ray.get(ref)
        col = t[key_col].combine_chunks()
        col = col.filter(pc.is_valid(col))
        vals = np.unique(
            np.asarray(col.to_numpy(zero_copy_only=False), dtype=np.int64)
        )
        if len(dim):
            pos = np.searchsorted(dim, vals)
            pos = np.minimum(pos, len(dim) - 1)
            vals = vals[dim[pos] != vals]
        return pa.table({out_name: pa.array(vals, pa.int64())})

    parts = ds.map_batches(
        unmatched, batch_format="pyarrow", zero_copy_batch=True
    )

    def distinct(t: pa.Table) -> pa.Table:
        v = np.unique(t[out_name].combine_chunks().to_numpy(zero_copy_only=False))
        return pa.table({out_name: pa.array(v, pa.int64())})

    # fold distinct per orphan-hash bucket (orphan sets are usually tiny,
    # but the fold stays distributed if they aren't)
    def bucketed(t: pa.Table) -> pa.Table:
        v = t[out_name].combine_chunks().to_numpy(zero_copy_only=False)
        return t.append_column(
            "_bucket", pa.array((v % 16).astype(np.int32))
        )

    return (
        parts.map_batches(bucketed, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_bucket")
        .map_groups(
            lambda t: distinct(t.drop_columns(["_bucket"])),
            batch_format="pyarrow",
        )
    )


def profile_table(ds, columns: Sequence[str]) -> pa.Table:
    """Column profile: (column, n_rows, n_nulls, min, max) per requested
    column, min/max rendered as strings (integer and string columns —
    float formatting is not portable across engines). Decomposable:
    each batch contributes one tiny partial row per column; the driver
    folds partials — nothing data-sized moves."""

    def partial(t: pa.Table) -> pa.Table:
        rows = []
        for c in columns:
            col = t[c]
            mm = pc.min_max(col)
            lo, hi = mm["min"].as_py(), mm["max"].as_py()
            rows.append({
                "column": c,
                "n": t.num_rows,
                "nulls": col.null_count,
                "min_v": None if lo is None else str(lo),
                "max_v": None if hi is None else str(hi),
                # fold strategy rides the partial: numeric partials fold
                # numerically, never by string-sniffing the values
                "numeric": pa.types.is_integer(col.type)
                or pa.types.is_floating(col.type),
            })
        return pa.Table.from_pylist(rows)

    parts = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()  # one row per (block, column) — metadata-sized
    out: List[dict] = []
    for c in columns:
        rs = [r for r in parts if r["column"] == c]
        mins = [r["min_v"] for r in rs if r["min_v"] is not None]
        maxs = [r["max_v"] for r in rs if r["max_v"] is not None]
        numeric = any(r["numeric"] for r in rs)

        def fold(vals, f):
            if not vals:
                return None
            return f(vals, key=float) if numeric else f(vals)

        out.append({
            "column": c,
            "n_rows": sum(r["n"] for r in rs),
            "n_nulls": sum(r["nulls"] for r in rs),
            "min_v": fold(mins, min),
            "max_v": fold(maxs, max),
        })
    return pa.Table.from_pylist(out)
