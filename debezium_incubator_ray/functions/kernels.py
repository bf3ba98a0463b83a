"""Shared vectorized kernels used by several operator families: run
pair-expansion (triangles, term-postings dots), the bucketed top-k merge
(co-purchase, PMI, cosine pairs), and NULL/NaN row masking for the
order-statistics operators.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def expand_pairs(sizes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """All within-run index pairs (i < j) for concatenated runs of the
    given ``sizes`` — fully vectorized (repeat/arange, no Python loop).
    Returns global (L, R) index arrays into the concatenated layout;
    both empty when every run has size <= 1."""
    sizes = np.asarray(sizes, dtype=np.int64)
    n = int(sizes.sum())
    starts = np.cumsum(sizes) - sizes
    pos = np.arange(n) - np.repeat(starts, sizes)
    left_cnt = np.repeat(sizes, sizes) - 1 - pos
    total = int(left_cnt.sum())
    if total == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z
    L = np.repeat(np.arange(n), left_cnt)
    block = np.cumsum(left_cnt) - left_cnt
    R = np.arange(total) - np.repeat(block, left_cnt) + L + 1
    return L, R


def table_topk(t: pa.Table, value_col: str, key_cols, k: int) -> pa.Table:
    """Top-k rows of a table by (value desc, keys asc) — the shared
    deterministic tie-break every bucketed top-k here uses."""
    if t.num_rows <= k:
        return t
    order = pc.sort_indices(
        t.append_column("_neg", pc.negate(t[value_col])),
        sort_keys=[("_neg", "ascending")]
        + [(c, "ascending") for c in key_cols],
    )
    return t.take(order.slice(0, k))


def merge_local_topk(cand_ds, value_col: str, key_cols, k: int,
                     empty: pa.Table) -> pa.Table:
    """Driver merge of per-bucket top-k candidates: concat the candidate
    blocks (#buckets x k rows) and take the global top-k with the same
    (value desc, keys asc) tie-break the buckets used."""
    merged = pa.concat_tables(
        [b for b in cand_ds.iter_batches(batch_format="pyarrow")]
        or [empty],
        promote_options="permissive",
    )
    return table_topk(merged, value_col, key_cols, k)


def drop_null_nan(t: pa.Table, col: str) -> pa.Table:
    """Rows where ``col`` is non-NULL and (for floats) non-NaN — the
    shared row mask of the order-statistics operators: NaN has no
    defined bucket in equi-width bucketing, so the rank family treats
    it like NULL and documents that divergence from SQL's NaN-greatest
    ordering."""
    a = t[col]
    keep = pc.is_valid(a)
    if pa.types.is_floating(a.type):
        keep = pc.and_(keep, pc.invert(pc.is_nan(pc.fill_null(a, 0.0))))
    return t.filter(keep)


def group_argmin(ds, group_col: str, value_col: str, tie_col: str,
                 buckets: int = 64):
    """Per-group lexicographic minimum of (value, tie): the SQL
    "min value per group, ties broken by min tie_col" shape (TPC-H Q2's
    correlated-subquery-then-join-back, collapsed into one combiner
    pass). Emits one row per group: (group, value, tie).

    Scale shape: per-block lexmin per group (the combiner — one
    (group, value, tie) row per group per block survives), then ONE
    group-hash bucketed shuffle folds the partials; events never
    shuffle. NULL values are excluded (SQL min skips NULLs)."""
    from debezium_incubator_ray.hashing import partition_ids

    def lexmin(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(
            pc.is_valid(t[group_col]), pc.is_valid(t[value_col])
        ))
        idx = pc.sort_indices(t, sort_keys=[
            (group_col, "ascending"), (value_col, "ascending"),
            (tie_col, "ascending"),
        ])
        s = t.take(idx)
        g = s[group_col].combine_chunks().to_numpy(zero_copy_only=False)
        first = np.ones(len(g), dtype=bool)
        first[1:] = g[1:] != g[:-1]
        return s.filter(pa.array(first))

    def partial(t: pa.Table) -> pa.Table:
        m = lexmin(t)
        return m.append_column(
            "_b",
            pa.array(partition_ids(m[group_col].combine_chunks(),
                                   buckets, "hash"), pa.int32()),
        )

    def fold(gr: pa.Table) -> pa.Table:
        return lexmin(gr.drop_columns(["_b"]))

    return (
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("_b")
        .map_groups(fold, batch_format="pyarrow")
    )


def collect_table(ds, empty: pa.Table | None = None) -> pa.Table:
    """Driver collect of a SMALL (already-aggregated) Dataset — the shared
    iter_batches-concat loop every metadata-sized fold finishes with."""
    blocks = [b for b in ds.iter_batches(batch_format="pyarrow")]
    if not blocks:
        return empty if empty is not None else pa.table({})
    return pa.concat_tables(blocks, promote_options="permissive")


def sorted_lookup(
    sorted_keys: np.ndarray, probe: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Clamped binary-search dimension lookup: position of each probe in
    ``sorted_keys`` plus a FOUND mask. The mask is the part every call
    site must not forget — an unguarded ``sorted_keys[pos]`` silently
    attributes missing keys to a neighboring dimension row (an inner
    join keeps no such row). Returns (pos, found); pos values where
    ``~found`` point at an arbitrary valid index and must only be used
    under the mask."""
    probe = np.asarray(probe)
    pos = np.searchsorted(sorted_keys, probe)
    if len(sorted_keys) == 0:
        return pos, np.zeros(len(probe), bool)
    pos[pos == len(sorted_keys)] = 0
    return pos, sorted_keys[pos] == probe
