"""Incremental materialized-aggregate maintenance over a CDC change stream.

The CDC-native way to keep a downstream GROUP BY view current: instead of
rescanning the lake after every epoch, fold each change event's DELTA into
the aggregate —

    op=c/r : +after        (row appears)
    op=u   : +after -before (row moves: the before contribution leaves its
                             group, the after contribution joins its own —
                             group-key changes handled for free)
    op=d   : -before        (row disappears)

Per-key deltas telescope to the final state, so for any prefix-complete,
exactly-once stream the maintained SUM/COUNT per group equals the same
aggregate recomputed from the LWW table — that identity is the oracle
(cdc_incremental_agg). Requires honest before images around deletes
(Debezium's contract: an insert after a delete is op='c', before=NULL).

Shape at 100 TB: the contribution kernel is a stateless vectorized
``map_batches`` (two struct flattens + sign application, no per-key state,
no ordering requirement), then a groupby over |groups| rows — the classic
partial-aggregate exchange. Nothing is keyed by the CDC key, so hot keys
cannot skew this stage at all.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def agg_contributions(
    env: pa.Table, group_col: str, value_col: str
) -> pa.Table:
    """One batch of envelopes → signed (group, d_count, d_sum) contribution
    rows: +1/+value per non-null after image, -1/-value per non-null before
    image. A null GROUP KEY inside a valid image contributes to the NULL
    group, exactly like SQL GROUP BY; only null IMAGES (the row doesn't
    exist on that side) contribute nothing."""
    import numpy as np

    out_g, out_c, out_s = [], [], []
    for side, sign in (("after", 1), ("before", -1)):
        img = env[side].combine_chunks()
        valid = pc.is_valid(img)  # image exists on this side
        g = pc.if_else(valid, img.field(group_col),
                       pa.nulls(len(img), img.field(group_col).type))
        v = pc.if_else(valid, img.field(value_col),
                       pa.nulls(len(img), img.field(value_col).type))
        out_g.append(pc.filter(g, valid))
        vv = pc.cast(pc.fill_null(pc.filter(v, valid), 0.0), pa.float64())
        out_s.append(pc.multiply(vv, pa.scalar(float(sign))))
        out_c.append(
            pa.array(np.full(len(out_g[-1]), sign, dtype=np.int64))
        )
    return pa.table(
        {
            group_col: pa.concat_arrays(
                [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
                 for a in out_g]
            ),
            "d_count": pa.concat_arrays(out_c),
            "d_sum": pa.concat_arrays(
                [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
                 for a in out_s]
            ),
        }
    )


def incremental_groupby_agg(
    env_ds: "ray.data.Dataset", group_col: str, value_col: str
) -> "ray.data.Dataset":
    """Maintain (n rows, sum value) per group from an envelope stream.
    Returns one row per group with n > 0 — identical to GROUP BY over the
    stream's final LWW state, computed without ever touching the lake."""
    from ray.data.aggregate import Sum

    contrib = env_ds.map_batches(
        lambda t: agg_contributions(t, group_col, value_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    agg = contrib.groupby(group_col).aggregate(
        Sum("d_count", alias_name="n"), Sum("d_sum", alias_name="total")
    )
    # groups whose rows all disappeared net out to zero — not in the view
    return agg.filter(lambda r: r["n"] > 0)


def distinct_contributions(
    env: pa.Table, group_col: str, value_col: str
) -> pa.Table:
    """One batch of envelopes → signed (group, value, d) refcount
    contributions: +1 per non-null after image, -1 per non-null before
    image; NULL values contribute nothing (SQL count(DISTINCT) ignores
    them). Pre-summed per (group, value) inside the block — the combiner
    that bounds the shuffle at the block's distinct pairs."""
    import numpy as np

    parts = []
    for side, sign in (("after", 1), ("before", -1)):
        img = env[side].combine_chunks()
        valid = pc.and_(
            pc.is_valid(img), pc.is_valid(img.field(value_col))
        )
        g = pc.filter(img.field(group_col), valid)
        v = pc.filter(img.field(value_col), valid)
        parts.append(pa.table({
            group_col: g,
            "_v": v,
            "d": pa.array(np.full(len(g), sign, dtype=np.int64)),
        }))
    t = pa.concat_tables(parts)
    a = t.group_by([group_col, "_v"]).aggregate([("d", "sum")])
    return a.rename_columns([group_col, "_v", "d"])


def incremental_distinct_count(
    env_ds: "ray.data.Dataset", group_col: str, value_col: str
) -> "ray.data.Dataset":
    """Maintain count(DISTINCT value) per group from the envelope stream
    alone — the incremental view sum/count maintenance can't give you:
    DISTINCT needs per-(group, value) REFCOUNTS (how many live rows carry
    the pair), folded as +after/-before deltas; the view counts pairs
    whose refcount stayed positive. Identical to count(DISTINCT) over the
    stream's final LWW state, computed without touching the lake. Needs a
    CONSISTENT stream (true before images — Debezium semantics), like
    every +after/-before consumer."""
    from ray.data.aggregate import Sum

    contrib = env_ds.map_batches(
        lambda t: distinct_contributions(t, group_col, value_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    refs = contrib.groupby([group_col, "_v"]).aggregate(
        Sum("d", alias_name="rc")
    )

    def live_counts(t: pa.Table) -> pa.Table:
        live = t.filter(pc.greater(t["rc"], pa.scalar(0, pa.int64())))
        g = live.group_by(group_col).aggregate([([], "count_all")])
        return pa.table({
            group_col: g[group_col],
            "nd": pc.cast(g["count_all"], pa.int64()),
        })

    counts = (
        refs.map_batches(live_counts, batch_format="pyarrow",
                         zero_copy_batch=True)
        .groupby(group_col)
        .aggregate(Sum("nd", alias_name="n_distinct"))
    )
    # group LIVENESS is independent of value nullity: a group whose live
    # rows all carry NULL values has n_distinct = 0 in SQL, not absence —
    # fold net row refcounts per group from the same +after/-before deltas
    from debezium_incubator_ray.functions.kernels import collect_table

    def row_contrib(env: pa.Table) -> pa.Table:
        import numpy as np

        gs, ds_ = [], []
        for side, sign in (("after", 1), ("before", -1)):
            img = env[side].combine_chunks()
            g = pc.filter(img.field(group_col), pc.is_valid(img))
            gs.append(g)
            ds_.append(pa.array(np.full(len(g), sign, dtype=np.int64)))
        t = pa.table({
            group_col: pa.concat_arrays(
                [a.combine_chunks() if isinstance(a, pa.ChunkedArray)
                 else a for a in gs]
            ),
            "d": pa.concat_arrays(ds_),
        })
        a = t.group_by(group_col).aggregate([("d", "sum")])
        return a.rename_columns([group_col, "d"])

    rows = env_ds.map_batches(
        row_contrib, batch_format="pyarrow", zero_copy_batch=True,
    ).groupby(group_col).aggregate(Sum("d", alias_name="n"))
    live_g = collect_table(rows).filter(pc.field("n") > 0)
    c_tbl = collect_table(counts)
    out = pa.table({group_col: live_g[group_col]}).join(
        c_tbl, keys=[group_col], join_type="left outer"
    )
    nd = pc.cast(pc.fill_null(out["n_distinct"], 0), pa.int64())
    res = pa.table({group_col: out[group_col], "n_distinct": nd})
    return res.take(
        pc.sort_indices(res, sort_keys=[(group_col, "ascending")])
    )
