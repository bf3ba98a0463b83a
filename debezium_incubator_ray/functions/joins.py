"""Temporal joins Ray Data lacks natively: as-of join and point-in-interval
(range) join.

Both use the engine's standard co-location shape: tag the two sides, union,
ONE bucketed shuffle on hash(key), then a fully vectorized merge inside
map_groups (lexsort + monotone accumulate / searchsorted — no per-row or
per-key Python loop). The documented partitioning assumption is the equi
part of the predicate (the key); the temporal part resolves sorted within
the bucket. At 100 TB the bucket column becomes the partition key so each
task holds one bucket's rows from each side.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _bucketed(t: pa.Table, key_col: str, buckets: int) -> pa.Table:
    ids = t[key_col].combine_chunks().to_numpy(zero_copy_only=False)
    b = (ids.astype(np.uint64) % np.uint64(buckets)).astype(np.int32)
    return t.append_column("_bucket", pa.array(b))


def asof_join(
    left_ds,
    right_ds,
    key_col: str,
    ts_col: str,
    left_cols: Sequence[str],
    right_cols: Sequence[str],
    right_prefix: str = "r_",
    buckets: int = 64,
):
    """LEFT as-of join: each left row picks the right row with the same key
    and the greatest right.ts <= left.ts (inclusive); unmatched left rows
    keep nulls. Right rows must be unique per (key, ts) — pre-reduce ties
    (e.g. keep max id) if the source can violate that; with ties the pick
    would depend on arrival order.

    Kernel: sort (key, ts, side) with right before left at equal ts, then
    one np.maximum.accumulate of right-row indices gives every left row its
    predecessor; a per-key start bound voids matches that leak across keys.
    """

    def tag(side: int, keep: Sequence[str]):
        def f(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols = {
                key_col: t[key_col],
                ts_col: t[ts_col],
                "_side": pa.array(np.full(n, side, np.int8)),
            }
            for c in left_cols:
                cols["l_" + c] = t[c] if side == 1 and c in t.column_names else pa.nulls(
                    n, left_types[c]
                )
            for c in right_cols:
                cols[right_prefix + c] = (
                    t[c] if side == 0 and c in t.column_names else pa.nulls(
                        n, right_types[c]
                    )
                )
            return _bucketed(pa.table(cols), key_col, buckets)

        return f

    left_schema = left_ds.schema()
    right_schema = right_ds.schema()
    left_types = {c: left_schema.base_schema.field(c).type for c in left_cols}
    right_types = {c: right_schema.base_schema.field(c).type for c in right_cols}

    unioned = left_ds.map_batches(
        tag(1, left_cols), batch_format="pyarrow", zero_copy_batch=True
    ).union(
        right_ds.map_batches(
            tag(0, right_cols), batch_format="pyarrow", zero_copy_batch=True
        )
    )

    def merge(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group,
            sort_keys=[
                (key_col, "ascending"),
                (ts_col, "ascending"),
                ("_side", "ascending"),  # right (0) before left (1) at ties
            ],
        )
        s = group.take(idx)
        k = s[key_col].combine_chunks().to_numpy()
        side = s["_side"].combine_chunks().to_numpy()
        n = len(k)
        first = np.ones(n, dtype=bool)
        first[1:] = k[1:] != k[:-1]
        starts = np.nonzero(first)[0]
        gidx = np.cumsum(first) - 1
        r_idx = np.where(side == 0, np.arange(n), -1)
        ff = np.maximum.accumulate(r_idx) if n else r_idx
        valid = ff >= starts[gidx]  # no matches across key boundaries
        lmask = side == 1
        take = ff[lmask]
        ok = valid[lmask]
        take_safe = pa.array(np.where(ok, take, 0))
        ok_pa = pa.array(ok)
        out = {}
        lrows = s.filter(pa.array(lmask))
        out[key_col] = lrows[key_col]
        out[ts_col] = lrows[ts_col]
        for c in left_cols:
            out[c] = lrows["l_" + c]
        for c in right_cols:
            col = pc.take(s[right_prefix + c].combine_chunks(), take_safe)
            out[right_prefix + c] = pc.if_else(
                ok_pa, col, pa.nulls(len(ok), col.type)
            )
        return pa.table(out)

    return unioned.groupby("_bucket").map_groups(merge, batch_format="pyarrow")


def interval_join(
    points_ds,
    intervals_ds,
    key_col: str,
    ts_col: str,
    start_col: str,
    end_col: str,
    interval_cols: Sequence[str],
    buckets: int = 64,
):
    """Point-in-interval (range) join: each point row picks the interval
    with the same key whose [start, end] contains its ts (inner join;
    intervals per key must be NON-OVERLAPPING — e.g. session windows).

    With non-overlapping intervals the containing interval is exactly the
    most recently STARTED one, so this is the as-of join on the interval
    start followed by a containment filter (ts <= end) — one bucketed
    shuffle, no per-row search."""

    def start_as_ts(t: pa.Table) -> pa.Table:
        return t.append_column(ts_col, t[start_col])

    right = intervals_ds.map_batches(
        start_as_ts, batch_format="pyarrow", zero_copy_batch=True
    )
    point_cols = [
        c for c in points_ds.schema().base_schema.names
        if c not in (key_col, ts_col)
    ]
    joined = asof_join(
        points_ds,
        right,
        key_col,
        ts_col,
        left_cols=point_cols,
        right_cols=[start_col, end_col] + list(interval_cols),
        right_prefix="",
        buckets=buckets,
    )

    def contained(t: pa.Table) -> pa.Table:
        keep = pc.and_kleene(
            pc.is_valid(t[start_col]),
            pc.less_equal(t[ts_col], t[end_col]),
        )
        return t.filter(pc.fill_null(keep, False))

    return joined.map_batches(
        contained, batch_format="pyarrow", zero_copy_batch=True
    )


def broadcast_join(
    ds,
    dim: pa.Table,
    on: str,
    right_on: str | None = None,
    join_type: str = "inner",
):
    """Broadcast hash join: the (small) dimension table is put in the
    object store ONCE and every fact batch joins against it in place with
    Arrow's hash-join kernel — the standard star-schema enrichment that
    replaces an all-to-all shuffle join whenever one side fits a node
    (lookup tables, dimensions, configs). The fact side streams at the
    read's parallelism; nothing fact-sized moves.

    Row order within the output is per-batch (joins are unordered)."""
    import ray

    ref = ray.put(dim)

    def f(batch: pa.Table) -> pa.Table:
        d = ray.get(ref)  # zero-copy once node-local
        return batch.join(
            d, keys=[on], right_keys=[right_on or on], join_type=join_type
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def distinct_count_per_group(
    ds,
    group_col: str,
    value_col: str,
):
    """EXACT count-distinct per group, with the pre-aggregation shape wide
    ops need at scale: each batch first reduces to its DISTINCT
    (group, value) pairs (the combiner — bounds shuffle volume at
    |distinct| per block, not |rows|), the narrow pair stream shuffles
    once by group, and a vectorized run-count per group finishes it."""

    def pairs(t: pa.Table) -> pa.Table:
        return t.select([group_col, value_col]).group_by(
            [group_col, value_col]
        ).aggregate([])

    def count_distinct(t: pa.Table) -> pa.Table:
        d = t.group_by([group_col, value_col]).aggregate([])
        out = d.group_by([group_col]).aggregate([(value_col, "count")])
        return out.rename_columns([group_col, "n_distinct"])

    return (
        ds.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(group_col)
        .map_groups(count_distinct, batch_format="pyarrow")
    )


def shuffle_join(
    left,
    right,
    on: str,
    right_on: str | None = None,
    buckets: int = 64,
    join_type: str = "inner",
    right_suffix: str = "_r",
    post=None,
    salt: int = 1,
):
    """Distributed hash join for two LARGE sides (when neither fits a node
    and broadcast_join doesn't apply): both sides route to the same
    key-hash bucket and each bucket joins independently with Arrow's
    hash-join kernel — the classic partitioned hash join, expressed as ONE
    Ray Data groupby so the streaming executor owns the exchange.

    The two sides are unified into one schema (each side null-pads the
    other's columns — null columns are O(1) validity buffers in Arrow, so
    the pad is metadata, not data) because a groupby shuffle needs one
    dataset. Right-side columns colliding with left names get
    ``right_suffix``. Bucket count bounds per-task memory at
    ~|join|/buckets; raise it for skewed or huge joins. ``post`` (a
    table→table callable) runs on each bucket's joined output INSIDE the
    join task — per-key postprocessing (dedup, first-per-key) is free
    there because the bucket already co-locates every row of a key,
    where a separate downstream pass would re-shuffle the whole result.

    ``salt > 1`` splits HOT KEYS: left rows spread across ``salt``
    sub-buckets per key, right rows replicate into every sub-bucket — a
    key holding half the fact table parallelizes salt-ways at the cost of
    salt× the (typically dimension-like) right side's shuffle bytes. The
    result set is identical for any salt. Only join types that emit each
    LEFT row's matches once survive salting (inner / left outer / left
    semi); right/full-outer would duplicate unmatched right replicas."""
    from debezium_incubator_ray.hashing import stable_hash

    if salt > 1 and join_type not in (
        "inner", "left outer", "left semi", "left anti"
    ):
        raise ValueError(
            f"salt>1 is only sound for left-preserving joins, not {join_type}"
        )
    if salt > 1 and post is not None:
        # salting splits a key's LEFT rows across sub-buckets, so post no
        # longer sees all rows of a key together — a per-key post would be
        # silently wrong
        raise ValueError(
            "post= relies on per-key co-location, which salt>1 breaks; "
            "run the postprocessing as a separate keyed pass instead"
        )
    right_on = right_on or on
    ls = left.schema().base_schema
    rs = right.schema().base_schema
    l_names = list(ls.names)
    reserved = {"_side", "_jbucket"}
    if reserved & set(l_names):
        raise ValueError(f"left columns collide with join internals: {reserved}")
    # collision-free right renaming: suffix until unique against left
    # names, earlier right names AND the internal columns
    taken = set(l_names) | reserved
    r_out: dict = {}
    for n in rs.names:
        out = n
        while out in taken:
            out += right_suffix
        r_out[n] = out
        taken.add(out)
    r_inv = {u: o for o, u in r_out.items()}
    r_key_out = r_out[right_on]
    unified = pa.schema(
        [pa.field(n, ls.field(n).type) for n in l_names]
        + [pa.field(r_out[n], rs.field(n).type) for n in rs.names]
        + [pa.field("_side", pa.int8()), pa.field("_jbucket", pa.int32())]
    )

    payload_schema = pa.schema([f for f in unified if f.name != "_jbucket"])

    def tag(side: int, key: str):
        def f(t: pa.Table) -> pa.Table:
            n = t.num_rows
            b = (
                stable_hash(t[key].combine_chunks()) % np.uint64(buckets)
            ).astype(np.int64)
            cols = []
            for fld in payload_schema:
                if fld.name == "_side":
                    cols.append(pa.array(np.full(n, side, np.int8)))
                else:
                    src = None
                    if side == 0 and fld.name in l_names:
                        src = t[fld.name]
                    elif side == 1 and fld.name in r_inv:
                        src = t[r_inv[fld.name]]
                    cols.append(
                        pc.cast(src.combine_chunks(), fld.type)
                        if src is not None
                        else pa.nulls(n, fld.type)
                    )
            payload = pa.Table.from_arrays(cols, schema=payload_schema)
            if side == 0 or salt == 1:
                # left rows spread across salt sub-buckets (assignment is
                # free to vary — the joined SET is salt-invariant)
                s = np.arange(n, dtype=np.int64) % salt if salt > 1 else 0
                jb = (b * salt + s).astype(np.int32)
                return payload.append_column("_jbucket", pa.array(jb))
            # right rows replicate into every sub-bucket of their key
            copies = [
                payload.append_column(
                    "_jbucket", pa.array((b * salt + s).astype(np.int32))
                )
                for s in range(salt)
            ]
            return pa.concat_tables(copies)

        return f

    both = left.map_batches(
        tag(0, on), batch_format="pyarrow", zero_copy_batch=True
    ).union(
        right.map_batches(
            tag(1, right_on), batch_format="pyarrow", zero_copy_batch=True
        )
    )

    def join_bucket(t: pa.Table) -> pa.Table:
        side = t["_side"].combine_chunks().to_numpy()
        lt = t.filter(pa.array(side == 0)).select(l_names)
        rt = t.filter(pa.array(side == 1)).select(
            [r_out[n] for n in rs.names]
        )
        joined = lt.join(
            rt, keys=[on], right_keys=[r_key_out], join_type=join_type
        )
        return post(joined) if post is not None else joined

    return both.groupby("_jbucket").map_groups(
        join_bucket, batch_format="pyarrow"
    )


def copurchase_pairs(ds, group_col: str, item_col: str, k: int = 20):
    """Top-k item co-occurrence pairs: count, over all groups (orders,
    baskets, sessions), the unordered pairs of DISTINCT items appearing in
    the same group — the counting primitive behind co-purchase mining and
    PMI/co-occurrence embedding corpora.

    Shape at 100 TB: per batch, dedupe to distinct (group, item) and
    pre-count nothing (pairs need the WHOLE group co-located); shuffle 1
    on hash(group) co-locates each group, the bucket self-joins with
    Arrow's hash-join kernel (vectorized — never a Python loop over
    groups), keeps item_a < item_b, pre-reduces to the bucket's pair
    counts and stamps each pair's own hash bucket; shuffle 2 routes by
    THAT (an int32 bucket id — measured ~2.5x cheaper than handing Ray a
    2-key groupby over the same rows), the in-bucket Arrow group-sum
    finalizes counts and keeps its local top-k, and the driver merges
    #buckets x k candidate rows. Ties at the k boundary break
    (count desc, item_a, item_b) — mirrored by the oracle SQL."""
    a_col, b_col = f"{item_col}_a", f"{item_col}_b"

    def distinct_bucketed(t: pa.Table) -> pa.Table:
        from debezium_incubator_ray.hashing import stable_hash

        d = (
            t.select([group_col, item_col])
            .group_by([group_col, item_col])
            .aggregate([])
        )
        # stable_hash, not a raw int cast: group ids may be strings/UUIDs
        b = (stable_hash(d[group_col]) % np.uint64(64)).astype(np.int32)
        return d.append_column("_bucket", pa.array(b))

    def pairs_in_bucket(t: pa.Table) -> pa.Table:
        d = (
            t.drop_columns(["_bucket"])
            .group_by([group_col, item_col])
            .aggregate([])
        )
        rhs = pa.table({group_col: d[group_col], b_col: d[item_col]})
        lhs = pa.table({group_col: d[group_col], a_col: d[item_col]})
        j = lhs.join(rhs, keys=[group_col], join_type="inner")
        j = j.filter(pc.less(j[a_col], j[b_col]))
        g = j.group_by([a_col, b_col]).aggregate([([], "count_all")])
        out = pa.table({
            a_col: g[a_col],
            b_col: g[b_col],
            "cnt": pc.cast(g["count_all"], pa.int64()),
        })
        from debezium_incubator_ray.hashing import stable_hash

        pb = (
            (stable_hash(out[a_col]) ^ stable_hash(out[b_col]))
            % np.uint64(64)
        ).astype(np.int32)
        return out.append_column("_pb", pa.array(pb))

    def sum_topk(t: pa.Table) -> pa.Table:
        from debezium_incubator_ray.functions.kernels import table_topk

        if "_pb" in t.column_names:
            t = t.drop_columns(["_pb"])
        g = t.group_by([a_col, b_col]).aggregate([("cnt", "sum")])
        t = pa.table({a_col: g[a_col], b_col: g[b_col], "cnt": g["cnt_sum"]})
        return table_topk(t, "cnt", [a_col, b_col], k)

    cand = (
        ds.map_batches(
            distinct_bucketed, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("_bucket")
        .map_groups(pairs_in_bucket, batch_format="pyarrow")
        .groupby("_pb")
        .map_groups(sum_topk, batch_format="pyarrow")
    )
    empty = pa.table({
        a_col: pa.array([], pa.int64()),
        b_col: pa.array([], pa.int64()),
        "cnt": pa.array([], pa.int64()),
    })
    merged = pa.concat_tables(
        [b for b in cand.iter_batches(batch_format="pyarrow")] or [empty],
        promote_options="permissive",
    )
    return sum_topk(merged)


def bloom_semi_join(
    left,
    right,
    on: str,
    right_on: str | None = None,
    bits_log2: int = 20,
    n_hashes: int = 4,
    buckets: int = 64,
    post=None,
):
    """EXACT left-semi join with a broadcast Bloom-filter prefilter — the
    standard way to cut an all-to-all semi-join's shuffle bytes at scale:
    (1) the right side's keys fold into per-block Bloom bitmaps
    (``2^bits_log2`` bits; double hashing h1 + i*h2 from two seeded
    stable hashes) OR-combined driver-side — bitmap traffic is
    blocks x 2^(bits_log2-23) MiB of metadata, never the keys; (2) the
    bitmap broadcasts once (ray.put) and every LEFT block drops
    definite non-matches BEFORE the shuffle — with a 1% false-positive
    budget only ~1% of non-matching rows pay shuffle bytes; (3) the
    surviving rows run the exact shuffle_join left-semi to kill the
    false positives, so the result is byte-identical to the unfiltered
    semi-join. Size bits_log2 >= log2(n_right_keys) + 3 for ~3% FPR
    with 4 hashes."""
    from debezium_incubator_ray.hashing import bloom_build, bloom_probe
    import ray

    right_on = right_on or on
    n_bits = 1 << bits_log2
    n_words = n_bits >> 6
    right = right.materialize()  # read once: bloom build + exact join

    def block_bloom(t: pa.Table) -> pa.Table:
        bm = bloom_build(t[right_on].combine_chunks(), bits_log2, n_hashes)
        return pa.table({"bm": pa.array([bm.tobytes()], pa.binary())})

    parts = right.map_batches(
        block_bloom, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()  # one 2^(bits_log2-23) MiB bitmap row per block
    bloom = np.zeros(n_words, dtype=np.uint64)
    for r in parts:
        bloom |= np.frombuffer(r["bm"], dtype=np.uint64)
    bloom_ref = ray.put(bloom)

    def prefilter(t: pa.Table) -> pa.Table:
        bm = ray.get(bloom_ref)
        keep = bloom_probe(bm, t[on].combine_chunks(), bits_log2, n_hashes)
        return t.filter(pa.array(keep))

    survivors = left.map_batches(
        prefilter, batch_format="pyarrow", zero_copy_batch=True
    )
    return shuffle_join(
        survivors, right, on=on, right_on=right_on, buckets=buckets,
        join_type="left semi", post=post,
    )


def _collect(ds, empty: pa.Table | None = None) -> pa.Table:
    from debezium_incubator_ray.functions.kernels import collect_table

    return collect_table(ds, empty)


def small_qty_brand_revenue(li, part_dim: pa.Table,
                            brand_col: str = "p_brand"):
    """TPC-H Q17-shaped two-pass aggregate: per brand, the average yearly
    revenue (sum(extendedprice)/7) of lineitems whose quantity is below
    20% of that PART's average quantity — the "small-order revenue
    leakage" probe that needs a per-group average before the row filter.

    Scale shape: pass 1 folds per-part (sum_qty, cnt) from per-block
    partials through one narrow groupby — |parts| rows, collected and
    broadcast ONCE with the part->brand dimension attached (ray.put).
    Pass 2 streams lineitem again: each block joins the broadcast stats
    in place, filters with the EXACT integer-valued comparison
    5*qty*cnt < sum_qty (quantities are integral doubles, so both sides
    are exact in fp64 — no avg-rounding ambiguity vs SQL), and pre-sums
    revenue per brand; the final groupby folds |brands| partials. The
    fact table never shuffles."""
    import ray
    from ray.data.aggregate import Sum

    def part_partial(t: pa.Table) -> pa.Table:
        g = (
            t.select(["l_partkey", "l_quantity"])
            .group_by("l_partkey")
            .aggregate([("l_quantity", "sum"), ([], "count_all")])
        )
        return pa.table({
            "l_partkey": g["l_partkey"],
            "s": g["l_quantity_sum"],
            "c": pc.cast(g["count_all"], pa.int64()),
        })

    stats = _collect(
        li.map_batches(part_partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("l_partkey")
        .aggregate(Sum("s", alias_name="s"), Sum("c", alias_name="c")),
        empty=pa.table({
            "l_partkey": pa.array([], pa.int64()),
            "s": pa.array([], pa.float64()),
            "c": pa.array([], pa.int64()),
        }),
    )
    dim = stats.join(
        part_dim.select(["p_partkey", brand_col]),
        keys=["l_partkey"], right_keys=["p_partkey"], join_type="inner",
    )
    ref = ray.put(dim)

    def rev_partial(t: pa.Table) -> pa.Table:
        d = ray.get(ref)  # zero-copy once node-local
        j = t.select(["l_partkey", "l_quantity", "l_extendedprice"]).join(
            d, keys=["l_partkey"], join_type="inner"
        )
        keep = pc.less(
            pc.multiply(
                pc.multiply(j["l_quantity"], pa.scalar(5.0)),
                pc.cast(j["c"], pa.float64()),
            ),
            j["s"],
        )
        g = (
            j.filter(keep)
            .group_by(brand_col)
            .aggregate([("l_extendedprice", "sum")])
        )
        return pa.table({
            brand_col: g[brand_col], "rev": g["l_extendedprice_sum"],
        })

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            brand_col: t[brand_col],
            "avg_yearly": pc.round(
                pc.divide(t["rev"], pa.scalar(7.0)), 2
            ),
        })

    return (
        li.map_batches(rev_partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby(brand_col)
        .aggregate(Sum("rev", alias_name="rev"))
        .map_batches(finish, batch_format="pyarrow")
    )


def large_qty_orders(li, orders, cust_dim: pa.Table,
                     threshold: float = 200.0, k: int = 100):
    """TPC-H Q18-shaped large-volume-order report: orders whose total
    lineitem quantity exceeds ``threshold``, enriched with the order and
    customer attributes; top-k by (sum_qty desc, orderkey asc).

    Scale shape: per-order quantity sums fold from per-block partials
    through one narrow groupby; only the HAVING survivors (a tiny
    table) are collected and broadcast. The orders fact then streams
    once — each block semi-filters on the broadcast key set and joins
    the sums + customer dimension in place; no fact-sized shuffle
    anywhere. Quantities are integral doubles, so the threshold
    comparison and the tie-break on sum_qty are exact."""
    import ray
    from ray.data.aggregate import Sum
    from debezium_incubator_ray.functions.kernels import (
        merge_local_topk, table_topk,
    )

    def qty_partial(t: pa.Table) -> pa.Table:
        g = (
            t.select(["l_orderkey", "l_quantity"])
            .group_by("l_orderkey")
            .aggregate([("l_quantity", "sum")])
        )
        return g.rename_columns(["l_orderkey", "sq"])

    big = _collect(
        li.map_batches(qty_partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("l_orderkey")
        .aggregate(Sum("sq", alias_name="sum_qty")),
        empty=pa.table({
            "l_orderkey": pa.array([], pa.int64()),
            "sum_qty": pa.array([], pa.float64()),
        }),
    ).filter(pc.greater(pc.field("sum_qty"), pa.scalar(threshold)))
    big_ref = ray.put(big)
    cust_ref = ray.put(cust_dim.select(["c_custkey", "c_name"]))

    def enrich(t: pa.Table) -> pa.Table:
        b = ray.get(big_ref)
        j = t.join(b, keys=["o_orderkey"], right_keys=["l_orderkey"],
                   join_type="inner")
        j = j.join(ray.get(cust_ref), keys=["o_custkey"],
                   right_keys=["c_custkey"], join_type="inner")
        out = pa.table({
            "c_custkey": j["o_custkey"],
            "c_name": j["c_name"],
            "o_orderkey": j["o_orderkey"],
            "o_orderdate": j["o_orderdate"],
            "o_totalprice": j["o_totalprice"],
            "sum_qty": j["sum_qty"],
        })
        return table_topk(out, "sum_qty", ["o_orderkey"], k)

    cand = orders.map_batches(enrich, batch_format="pyarrow",
                              zero_copy_batch=True)
    empty = pa.table({
        "c_custkey": pa.array([], pa.int64()),
        "c_name": pa.array([], pa.string()),
        "o_orderkey": pa.array([], pa.int64()),
        "o_orderdate": pa.array([], pa.timestamp("us")),
        "o_totalprice": pa.array([], pa.float64()),
        "sum_qty": pa.array([], pa.float64()),
    })
    out = merge_local_topk(cand, "sum_qty", ["o_orderkey"], k, empty)
    order = pc.sort_indices(
        out.append_column("_neg", pc.negate(out["sum_qty"])),
        sort_keys=[("_neg", "ascending"), ("o_orderkey", "ascending")],
    )
    return out.take(order)


def association_rules(ds, group_col: str, item_col: str,
                      k_pairs: int = 200, k: int = 25):
    """Market-basket association rules over the ``k_pairs`` most frequent
    co-occurring item pairs: support(a,b) = P(a and b in one basket),
    confidence(a->b) = P(b | a), lift = support / (P(a) * P(b)) — the
    classic recommendation screen, top-k by (lift desc, a, b).

    Scale shape: pair counting is :func:`copurchase_pairs` (distinct
    per-block combiner, basket-hash bucketed self-join, pair-hash
    pre-sum); per-item basket counts fold through
    :func:`distinct_count_per_group`; the basket total is a distinct
    count. Everything after the top-``k_pairs`` cut is O(k_pairs) rows
    on the driver. All ratios divide exact int64 counts, so the floats
    match SQL bit-for-bit."""
    from debezium_incubator_ray.functions.graph import distinct_rows
    from debezium_incubator_ray.functions.kernels import table_topk

    # ONE distributed dedup to distinct (group, item), pinned — the pair
    # counter, the per-item basket counts and the basket total all derive
    # from it (three independent full scans otherwise)
    d = distinct_rows(ds, [group_col, item_col]).materialize()
    pairs = copurchase_pairs(d, group_col, item_col, k=k_pairs)
    a_col, b_col = f"{item_col}_a", f"{item_col}_b"
    item_n = _collect(
        distinct_count_per_group(d, item_col, group_col),
        empty=pa.table({
            item_col: pa.array([], pa.int64()),
            "n_distinct": pa.array([], pa.int64()),
        }),
    ).rename_columns([item_col, "n_item"])
    n_groups = distinct_rows(d, [group_col]).count()

    j = pairs.join(
        item_n.rename_columns([a_col, "n_a"]), keys=[a_col],
        join_type="inner",
    ).join(item_n.rename_columns([b_col, "n_b"]), keys=[b_col],
           join_type="inner")
    cnt = pc.cast(j["cnt"], pa.float64())
    na = pc.cast(j["n_a"], pa.float64())
    nb = pc.cast(j["n_b"], pa.float64())
    n = float(n_groups)
    out = pa.table({
        "item_a": j[a_col],
        "item_b": j[b_col],
        "n_both": j["cnt"],
        "support": pc.round(pc.divide(cnt, pa.scalar(n)), 6),
        "conf_a_b": pc.round(pc.divide(cnt, na), 6),
        "conf_b_a": pc.round(pc.divide(cnt, nb), 6),
        "lift": pc.round(
            pc.divide(pc.multiply(cnt, pa.scalar(n)),
                      pc.multiply(na, nb)), 6
        ),
    })
    out = table_topk(out, "lift", ["item_a", "item_b"], k)
    order = pc.sort_indices(
        out.append_column("_neg", pc.negate(out["lift"])),
        sort_keys=[("_neg", "ascending"), ("item_a", "ascending"),
                   ("item_b", "ascending")],
    )
    return out.take(order)
