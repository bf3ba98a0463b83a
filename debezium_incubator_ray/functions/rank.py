"""Global order statistics over a distributed column: exact PERCENT_RANK,
ROW_NUMBER, NTILE and interpolated quantiles WITHOUT a global sort.

Reference parity: the reference engine has no ranking operator (single
process — it would just sort); at 100 TB a global sort is the single most
expensive primitive Ray Data offers, so ranking here decomposes into the
bucket-cumsum pattern: a global [min, max] probe, fixed equi-width value
buckets (bucket id is monotone in the value, so cross-bucket order is
free), ONE tiny bucket-count aggregate whose running sum gives every
bucket its global offset, and a bucketed shuffle where each bucket ranks
its own rows vectorized. Rows shuffle ONCE, by value bucket; nothing is
ever globally sorted and the only driver-side state is the B-row bucket
histogram. Quantiles go further: only the few buckets containing the
target ranks are ever pulled (O(n/B) rows), the rest of the data never
moves at all.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


class _BucketHist:
    """Shared first phase of every global-order operator: the equi-width
    value-bucket histogram. Holds (mn, mx, counts, below, n_total) plus
    the tagging closure; NULL and NaN values are dropped before
    bucketing (NaN has no defined equi-width bucket — floor(NaN) casts
    to INT64_MIN — so the whole rank family treats it like NULL)."""

    def __init__(self, ds, value_col: str, n_buckets: int):
        from ray.data.aggregate import Sum
        from .kernels import drop_null_nan
        from .quality import equi_bucket, global_min_max

        self._drop = drop_null_nan

        self.value_col = value_col
        self.n_buckets = n_buckets
        self.mn, self.mx = global_min_max(ds, value_col)
        mn, mx = self.mn, self.mx

        def bucket_of(v: np.ndarray) -> np.ndarray:
            return equi_bucket(v, mn, mx, n_buckets)

        self.bucket_of = bucket_of

        def hist_partial(t: pa.Table) -> pa.Table:
            t = drop_null_nan(t, value_col)
            v = t[value_col].combine_chunks().to_numpy(zero_copy_only=False)
            cnt = np.bincount(bucket_of(v), minlength=n_buckets)
            nz = np.flatnonzero(cnt)
            return pa.table({
                "_vb": pa.array(nz.astype(np.int64)),
                "cnt": pa.array(cnt[nz].astype(np.int64)),
            })

        hist = (
            ds.map_batches(hist_partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("_vb")
            .aggregate(Sum("cnt", alias_name="cnt"))
            .take_all()
        )  # <= n_buckets tiny rows: the only driver-side state
        self.counts = np.zeros(n_buckets, dtype=np.int64)
        for r in hist:
            self.counts[r["_vb"]] = r["cnt"]
        self.below = np.zeros(n_buckets, dtype=np.int64)
        np.cumsum(self.counts[:-1], out=self.below[1:])
        self.n_total = int(self.counts.sum())

    def tag(self, t: pa.Table) -> pa.Table:
        t = self._drop(t, self.value_col)
        v = t[self.value_col].combine_chunks().to_numpy(zero_copy_only=False)
        return t.append_column("_vb", pa.array(self.bucket_of(v)))


def percent_rank(ds, value_col: str, n_buckets: int = 4096):
    """Append ``pr`` = SQL PERCENT_RANK() OVER (ORDER BY value_col) =
    (rank - 1) / (n - 1), rank = 1 + count of strictly smaller values
    (ties share their minimum rank, exactly the window-function rule).

    Correctness of the decomposition: the bucket expression
    floor((v - mn) * B / (mx - mn)) is monotone non-decreasing in v, so
    every value in a lower bucket is <= any value here, and equal values
    always share a bucket — count(smaller) = cum_count(lower buckets) +
    count(smaller within my bucket), the latter a single searchsorted
    over the bucket's sorted values. NULL values are DROPPED — both the
    ranked rows and the (n - 1) denominator count non-NULL values only,
    i.e. this computes PERCENT_RANK over `WHERE value_col IS NOT NULL`
    (SQL's own NULLS-LAST window would instead keep NULL rows near
    pr=1 and widen the denominator).
    """
    h = _BucketHist(ds, value_col, n_buckets)
    below = h.below
    denom = float(h.n_total - 1) if h.n_total > 1 else 1.0

    def rank_bucket(g: pa.Table) -> pa.Table:
        b = int(g["_vb"][0].as_py())
        v = g[value_col].combine_chunks().to_numpy(zero_copy_only=False)
        sv = np.sort(v)
        smaller = below[b] + np.searchsorted(sv, v, side="left")
        return g.drop_columns(["_vb"]).append_column(
            "pr", pa.array(smaller.astype(np.float64) / denom)
        )

    return (
        ds.map_batches(h.tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_vb")
        .map_groups(rank_bucket, batch_format="pyarrow")
    )


def global_row_number(ds, value_col: str, id_col: str,
                      n_buckets: int = 4096):
    """Append ``rn`` = SQL ROW_NUMBER() OVER (ORDER BY value_col, id_col)
    — a deterministic total order, no global sort. Each bucket lexsorts
    its own rows by (value, id) and offsets by the cumulative count of
    lower buckets; (value, id) pairs never straddle a bucket, so the
    in-bucket order IS the global order restricted to the bucket. NULL
    values are dropped (rank over ``WHERE value_col IS NOT NULL``).
    ``id_col`` must be unique for rn to be well-defined."""
    h = _BucketHist(ds, value_col, n_buckets)
    below = h.below

    def rank_bucket(g: pa.Table) -> pa.Table:
        b = int(g["_vb"][0].as_py())
        v = g[value_col].combine_chunks().to_numpy(zero_copy_only=False)
        i = g[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((i, v))
        rn = np.empty(len(v), dtype=np.int64)
        rn[order] = below[b] + np.arange(len(v), dtype=np.int64) + 1
        return g.drop_columns(["_vb"]).append_column("rn", pa.array(rn))

    return (
        ds.map_batches(h.tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_vb")
        .map_groups(rank_bucket, batch_format="pyarrow")
    )


def ntile_from_rn(rn: np.ndarray, n_total: int, k: int) -> np.ndarray:
    """SQL NTILE(k) from 1-based global row numbers: the first
    ``n % k`` tiles get ``n // k + 1`` rows, the rest ``n // k`` —
    exactly the window-function fill rule."""
    size = n_total // k
    rem = n_total % k
    boundary = rem * (size + 1)
    small = np.maximum(size, 1)  # k > n: every row its own tile
    return np.where(
        rn <= boundary,
        (rn - 1) // (size + 1) + 1,
        rem + (rn - 1 - boundary) // small + 1,
    ).astype(np.int64)


def global_ntile(ds, value_col: str, id_col: str, k: int,
                 n_buckets: int = 4096):
    """Append ``rn`` (ROW_NUMBER) and ``tile`` (NTILE(k)) over
    ORDER BY (value_col, id_col) — the bucket-cumsum row number plus a
    closed-form tile from (rn, n); no extra pass over the data."""
    h = _BucketHist(ds, value_col, n_buckets)
    below, n_total = h.below, h.n_total

    def rank_bucket(g: pa.Table) -> pa.Table:
        b = int(g["_vb"][0].as_py())
        v = g[value_col].combine_chunks().to_numpy(zero_copy_only=False)
        i = g[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((i, v))
        rn = np.empty(len(v), dtype=np.int64)
        rn[order] = below[b] + np.arange(len(v), dtype=np.int64) + 1
        return (
            g.drop_columns(["_vb"])
            .append_column("rn", pa.array(rn))
            .append_column("tile", pa.array(ntile_from_rn(rn, n_total, k)))
        )

    return (
        ds.map_batches(h.tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_vb")
        .map_groups(rank_bucket, batch_format="pyarrow")
    )


def global_quantile_cont(ds, value_col: str, qs, n_buckets: int = 4096):
    """Exact interpolated quantiles (SQL ``quantile_cont`` /
    PERCENTILE_CONT) of a distributed column, returned as a pyarrow
    Table (q, value) — WITHOUT sorting or collecting the column.

    For each q the target position is p = q * (n - 1); only the order
    statistics at floor(p) / ceil(p) are needed, and the bucket histogram
    pinpoints which value bucket holds each one. A single filter pass
    over JUST those buckets collapses them to DISTINCT (value, count)
    partials before anything reaches the driver — so a duplicate-heavy
    column (few distinct values piling into one bucket) costs #distinct
    driver rows, not #rows; a continuous column costs the expected
    O(n/B) distinct values of the needed buckets. The two neighboring
    order statistics then interpolate:
    v = v0 + (p - floor(p)) * (v1 - v0). NULL and NaN are excluded
    (NaN has no defined bucket; SQL aggregates skip NULL)."""
    qs = [float(q) for q in qs]
    h = _BucketHist(ds, value_col, n_buckets)
    n_total = h.n_total
    cum = np.cumsum(h.counts)

    ps = [q * (n_total - 1) for q in qs]
    need_ranks = sorted(
        {int(np.floor(p)) for p in ps} | {int(np.ceil(p)) for p in ps}
    )
    rank_bucket = {
        r: int(np.searchsorted(cum, r, side="right")) for r in need_ranks
    }
    need_buckets = sorted(set(rank_bucket.values()))
    bset = pa.array(need_buckets, pa.int64())

    def keep(t: pa.Table) -> pa.Table:
        t = h.tag(t)
        t = t.filter(pc.is_in(t["_vb"], value_set=bset))
        # collapse to distinct (value, count) — the combiner that keeps
        # duplicate-heavy buckets driver-safe
        g = (
            t.select([value_col])
            .group_by([value_col])
            .aggregate([([], "count_all")])
        )
        return pa.table({
            "v": pc.cast(g[value_col], pa.float64()),
            "cnt": pc.cast(g["count_all"], pa.int64()),
        })

    from ray.data.aggregate import Sum

    picked = (
        ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("v")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .take_all()
    )  # #distinct values of the needed buckets: the only row pull

    vals = np.array([r["v"] for r in picked], dtype=np.float64)
    cnts = np.array([r["cnt"] for r in picked], dtype=np.int64)
    order = np.argsort(vals, kind="mergesort")
    vals, cnts = vals[order], cnts[order]
    bucket_ids = h.bucket_of(vals)
    cum_in_bucket = {}
    for b in need_buckets:
        m = bucket_ids == b
        cum_in_bucket[b] = (vals[m], np.cumsum(cnts[m]))

    def order_stat(r: int) -> float:
        b = rank_bucket[r]
        bvals, bcum = cum_in_bucket[b]
        local = r - h.below[b]  # 0-indexed rank within the bucket
        return float(bvals[int(np.searchsorted(bcum, local, side="right"))])

    out = []
    for q, p in zip(qs, ps):
        r0, r1 = int(np.floor(p)), int(np.ceil(p))
        v0 = order_stat(r0)
        v1 = order_stat(r1) if r1 != r0 else v0
        out.append(v0 + (p - r0) * (v1 - v0))
    return pa.table({
        "q": pa.array(qs, pa.float64()),
        "value": pa.array(out, pa.float64()),
    })


def grouped_percent_rank(ds, group_col: str, value_col: str,
                         buckets: int = 64):
    """Append ``pr`` = PERCENT_RANK() OVER (PARTITION BY group_col
    ORDER BY value_col): min-rank ties, (n_group - 1) denominator, NULL
    and NaN values dropped (rank over ``WHERE value_col IS NOT NULL``;
    NaN would break run detection — NaN != NaN — so it is excluded like
    the rest of the rank family rather than ranked greatest as SQL
    does).

    Groups co-locate via ONE shuffle into bounded hash buckets (never a
    Python task per key); the whole bucket then ranks in a single
    lexsort + first-occurrence scan — count(strictly smaller within
    group) is just (index of the value's first occurrence in the group
    run) - (run start), both vectorized. Same contract as
    quantiles_per_group: one group must fit a task; a group too large
    for that should use the bucket-cumsum decomposition (percent_rank)
    within the group instead."""
    from debezium_incubator_ray.hashing import partition_ids

    from .kernels import drop_null_nan

    def tag(t: pa.Table) -> pa.Table:
        t = drop_null_nan(t, value_col)
        return t.append_column(
            "_b",
            pa.array(partition_ids(t[group_col].combine_chunks(), buckets,
                                   "hash"), pa.int32()),
        )

    def rank_bucket(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["_b"])
        keys = g[group_col].combine_chunks().to_numpy(zero_copy_only=False)
        v = g[value_col].combine_chunks().to_numpy(zero_copy_only=False)
        n = len(v)
        order = np.lexsort((v, keys))
        ks, vs = keys[order], v[order]
        idx = np.arange(n)
        new_group = np.r_[True, ks[1:] != ks[:-1]]
        run_start = np.maximum.accumulate(np.where(new_group, idx, 0))
        new_val = new_group | np.r_[True, vs[1:] != vs[:-1]]
        first_eq = np.maximum.accumulate(np.where(new_val, idx, 0))
        sizes = np.diff(np.append(np.flatnonzero(new_group), n))
        run_size = np.repeat(sizes, sizes)
        denom = np.maximum(run_size - 1, 1).astype(np.float64)
        pr_sorted = (first_eq - run_start) / denom
        pr = np.empty(n, dtype=np.float64)
        pr[order] = pr_sorted
        return g.append_column("pr", pa.array(pr))

    return (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_b")
        .map_groups(rank_bucket, batch_format="pyarrow")
    )


def global_dense_rank(ds, value_col: str, n_buckets: int = 4096):
    """Append ``dr`` = SQL DENSE_RANK() OVER (ORDER BY value_col) — no
    global sort. Two bucket passes: (1) block-local distinct values fold
    into a per-bucket DISTINCT count (the shuffle carries distinct
    (bucket, value) pairs, bounded by the distinct-value count, not the
    row count) whose running sum gives every bucket its dense offset;
    (2) the standard value-bucket shuffle, where each bucket dense-ranks
    its own rows against its sorted distinct values. NULL/NaN rows are
    dropped (same contract as the rest of the rank family)."""
    h = _BucketHist(ds, value_col, n_buckets)
    drop = h._drop
    bucket_of = h.bucket_of

    def ddist_partial(t: pa.Table) -> pa.Table:
        t = drop(t, value_col)
        v = np.unique(
            t[value_col].combine_chunks().to_numpy(zero_copy_only=False)
        )
        return pa.table({
            "_vb": pa.array(bucket_of(v).astype(np.int64)),
            "v": pa.array(v),
        })

    def ddist_count(g: pa.Table) -> pa.Table:
        v = g["v"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table({
            "_vb": g["_vb"].slice(0, 1),
            "nd": pa.array([int(len(np.unique(v)))], pa.int64()),
        })

    rows = (
        ds.map_batches(ddist_partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("_vb")
        .map_groups(ddist_count, batch_format="pyarrow")
        .take_all()
    )  # one row per non-empty bucket
    nd = np.zeros(h.n_buckets, np.int64)
    for r in rows:
        nd[int(r["_vb"])] = int(r["nd"])
    below_d = np.cumsum(nd) - nd

    def rank_bucket(g: pa.Table) -> pa.Table:
        b = int(g["_vb"][0].as_py())
        v = g[value_col].combine_chunks().to_numpy(zero_copy_only=False)
        uq = np.unique(v)
        dr = below_d[b] + np.searchsorted(uq, v) + 1
        return g.drop_columns(["_vb"]).append_column("dr", pa.array(dr))

    return (
        ds.map_batches(h.tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_vb")
        .map_groups(rank_bucket, batch_format="pyarrow")
    )


def abc_classes(kv_ds, key_col: str, value_col: str,
                a_share: float = 0.8, b_share: float = 0.95,
                n_buckets: int = 1024):
    """ABC (Pareto) classification of a folded (key, value) table by
    cumulative value share in (value desc, key asc) order: class A =
    keys up to ``a_share`` of the total, B up to ``b_share``, C the rest
    — the inventory-analysis classic, computed WITHOUT a global sort.

    Decomposition (the percent_rank discipline in reverse): the equi-width
    bucket of v is monotone, so every value in a HIGHER bucket precedes
    any value here in the descending order; cum(key) = suffix-sum of
    higher buckets + the in-bucket descending prefix. Equal values share a
    bucket, and the in-bucket (v desc, key asc) sort settles ties exactly
    like the SQL window ORDER BY. Per class: key count + value share.
    NULL/NaN values drop."""
    from debezium_incubator_ray.functions.kernels import (
        collect_table, drop_null_nan,
    )
    from debezium_incubator_ray.functions.quality import (
        equi_bucket, global_min_max,
    )
    from ray.data.aggregate import Sum

    # three consumers (min/max probe, histogram, tag+classify) — pin the
    # folded (key, value) table once or each re-runs the upstream fold
    kv_ds = kv_ds.materialize()
    mn, mx = global_min_max(kv_ds, value_col)

    def hist(t: pa.Table) -> pa.Table:
        t = drop_null_nan(t, value_col)
        v = t[value_col].combine_chunks().to_numpy(zero_copy_only=False)
        vb = equi_bucket(v, mn, mx, n_buckets)
        sums = np.bincount(vb, weights=v, minlength=n_buckets)
        return pa.table({
            "b": pa.array(np.arange(n_buckets, dtype=np.int64)),
            "s": pa.array(sums),
        })

    hs = collect_table(
        kv_ds.map_batches(hist, batch_format="pyarrow",
                          zero_copy_batch=True)
        .groupby("b").aggregate(Sum("s", alias_name="s"))
    )
    sums = np.zeros(n_buckets, dtype=np.float64)
    sums[hs["b"].to_numpy(zero_copy_only=False)] = hs["s"].to_numpy(
        zero_copy_only=False
    )
    total = float(sums.sum())
    # value sum of all STRICTLY HIGHER buckets (they precede in desc order)
    above = np.concatenate([
        np.cumsum(sums[::-1])[::-1][1:], np.array([0.0])
    ])

    def tag(t: pa.Table) -> pa.Table:
        t = drop_null_nan(t, value_col)
        v = t[value_col].combine_chunks().to_numpy(zero_copy_only=False)
        return t.append_column(
            "_vb", pa.array(equi_bucket(v, mn, mx, n_buckets))
        )

    def classify(g: pa.Table) -> pa.Table:
        bkt = int(g["_vb"][0].as_py())
        v = g[value_col].combine_chunks().to_numpy(zero_copy_only=False)
        k = g[key_col].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((k, -v))  # v desc, key asc — the window order
        cum = above[bkt] + np.cumsum(v[order])
        cls = np.where(
            cum <= a_share * total, "A",
            np.where(cum <= b_share * total, "B", "C"),
        )
        out = pa.table({
            "cls": pa.array(cls, pa.string()),
            "one": pa.array(np.ones(len(v), np.int64)),
            "rev": pa.array(v[order]),
        }).group_by("cls").aggregate([("one", "sum"), ("rev", "sum")])
        return out.rename_columns(["cls", "n", "rev"])

    folded = (
        kv_ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_vb")
        .map_groups(classify, batch_format="pyarrow")
        .groupby("cls")
        .aggregate(Sum("n", alias_name="n_keys"),
                   Sum("rev", alias_name="rev"))
    )
    out = collect_table(folded)
    share = pc.round(pc.divide(out["rev"], pa.scalar(total)), 6)
    res = pa.table({
        "abc_class": out["cls"],
        "n_keys": pc.cast(out["n_keys"], pa.int64()),
        "revenue_share": share,
    })
    return res.take(
        pc.sort_indices(res, sort_keys=[("abc_class", "ascending")])
    )
