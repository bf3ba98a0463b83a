"""Global order statistics over a distributed column: exact PERCENT_RANK
without a global sort.

Reference parity: the reference engine has no ranking operator (single
process — it would just sort); at 100 TB a global sort is the single most
expensive primitive Ray Data offers, so ranking here decomposes into the
bucket-cumsum pattern: a global [min, max] probe, fixed equi-width value
buckets (bucket id is monotone in the value, so cross-bucket order is
free), ONE tiny bucket-count aggregate whose running sum gives every
bucket its global offset, and a bucketed shuffle where each bucket ranks
its own rows vectorized. Rows shuffle ONCE, by value bucket; nothing is
ever globally sorted and the only driver-side state is the B-row bucket
histogram.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


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
    from ray.data.aggregate import Sum

    from .quality import equi_bucket, global_min_max

    mn, mx = global_min_max(ds, value_col)

    def bucket_of(v: np.ndarray) -> np.ndarray:
        return equi_bucket(v, mn, mx, n_buckets)

    def tag(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[value_col]))
        v = t[value_col].combine_chunks().to_numpy(zero_copy_only=False)
        return t.append_column("_vb", pa.array(bucket_of(v)))

    def hist_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[value_col]))
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
    counts = np.zeros(n_buckets, dtype=np.int64)
    for r in hist:
        counts[r["_vb"]] = r["cnt"]
    below = np.zeros(n_buckets, dtype=np.int64)
    np.cumsum(counts[:-1], out=below[1:])
    n_total = int(counts.sum())
    denom = float(n_total - 1) if n_total > 1 else 1.0

    def rank_bucket(g: pa.Table) -> pa.Table:
        b = int(g["_vb"][0].as_py())
        v = g[value_col].combine_chunks().to_numpy(zero_copy_only=False)
        sv = np.sort(v)
        smaller = below[b] + np.searchsorted(sv, v, side="left")
        return g.drop_columns(["_vb"]).append_column(
            "pr", pa.array(smaller.astype(np.float64) / denom)
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_vb")
        .map_groups(rank_bucket, batch_format="pyarrow")
    )
