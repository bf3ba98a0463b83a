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


def global_min_max(ds, value_col: str) -> tuple[float, float]:
    """Global (min, max) of a column as two floats: per-batch single-row
    partials folded through one constant-key groupby — a metadata-sized
    probe, the first pass of every equi-width bucketing operator here
    (value_histogram, rank.percent_rank). NULL and NaN values are
    excluded — NaN has no defined equi-width bucket, so the whole
    bucketing family treats it like NULL."""
    from ray.data.aggregate import Max, Min

    from .kernels import drop_null_nan

    def mm_partial(t: pa.Table) -> pa.Table:
        v = drop_null_nan(t, value_col)[value_col]
        return pa.table({
            "_k": pa.array([0], pa.int64()),
            "mn": pa.array([pc.min(v).as_py()], pa.float64()),
            "mx": pa.array([pc.max(v).as_py()], pa.float64()),
        })

    rows = (
        ds.map_batches(mm_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_k")
        .aggregate(
            Min("mn", alias_name="mn", ignore_nulls=True),
            Max("mx", alias_name="mx", ignore_nulls=True),
        )
        .take_all()
    )
    if not rows or rows[0]["mn"] is None or rows[0]["mx"] is None:
        raise ValueError(
            f"global_min_max({value_col!r}): no non-NULL values in column"
        )
    return float(rows[0]["mn"]), float(rows[0]["mx"])


def equi_bucket(v: np.ndarray, mn: float, mx: float, n_buckets: int) -> np.ndarray:
    """Equi-width bucket ids over a global [mn, mx]: the exact expression
    ``floor((v - mn) * n / (mx - mn))`` with the top value clamped into
    the last bucket — evaluated in this operation order everywhere
    (engine AND SQL oracles) so IEEE doubles land in identical buckets.
    Monotone non-decreasing in v, and equal values always share a bucket.
    A degenerate range (mx == mn) puts every row in bucket 0. ``v`` must
    be NaN-free (floor(NaN) casts to INT64_MIN and corrupts downstream
    bincounts) — filter with kernels.drop_null_nan first."""
    if mx == mn:
        return np.zeros(len(v), dtype=np.int64)
    return np.minimum(
        np.floor((v - mn) * float(n_buckets) / (mx - mn)), n_buckets - 1
    ).astype(np.int64)


def fk_orphans(ds, key_col: str, dim_keys: pa.Array, id_out: str | None = None):
    """Referential check: DISTINCT values of ``key_col`` with no match in
    the dimension key set (foreign-key orphans). The dimension side is
    keys-only — the classic small side — broadcast once via ray.put; each
    fact batch reduces to its distinct unmatched keys (integer keys use a
    sorted-array membership probe; any other key type goes through
    Arrow's is_in hash set), and a bucketed distinct pass folds across
    batches. NULL keys are not orphans (unknown is not provably
    unmatched)."""
    import ray

    from debezium_incubator_ray.hashing import stable_hash

    int_keys = pa.types.is_integer(dim_keys.type)
    if int_keys:
        dim_payload = np.sort(
            np.asarray(dim_keys.to_numpy(zero_copy_only=False), dtype=np.int64)
        )
    else:
        dim_payload = dim_keys.combine_chunks() if isinstance(
            dim_keys, pa.ChunkedArray
        ) else dim_keys
    ref = ray.put(dim_payload)
    out_name = id_out or key_col

    def unmatched(t: pa.Table) -> pa.Table:
        dim = ray.get(ref)
        col = t[key_col].combine_chunks()
        col = pc.unique(col.filter(pc.is_valid(col)))
        if int_keys:
            vals = np.asarray(
                pc.cast(col, pa.int64()).to_numpy(zero_copy_only=False)
            )
            if len(dim):
                pos = np.searchsorted(dim, vals)
                pos = np.minimum(pos, len(dim) - 1)
                vals = vals[dim[pos] != vals]
            return pa.table({out_name: pa.array(np.sort(vals), pa.int64())})
        hit = pc.is_in(col, value_set=dim)
        return pa.table({out_name: col.filter(pc.invert(hit))})

    parts = ds.map_batches(
        unmatched, batch_format="pyarrow", zero_copy_batch=True
    )

    # fold distinct per orphan-hash bucket (orphan sets are usually tiny,
    # but the fold stays distributed if they aren't)
    def bucketed(t: pa.Table) -> pa.Table:
        h = stable_hash(t[out_name].combine_chunks())
        return t.append_column(
            "_bucket", pa.array((h % np.uint64(16)).astype(np.int32))
        )

    def distinct(t: pa.Table) -> pa.Table:
        return pa.table(
            {out_name: pc.unique(t[out_name].combine_chunks())}
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
                # fold kind rides the partial: ints fold as exact ints
                # (float folding would collide above 2^53), floats as
                # floats, everything else lexicographically
                "kind": (
                    "int" if pa.types.is_integer(col.type)
                    else "float" if pa.types.is_floating(col.type)
                    else "str"
                ),
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
        kind = rs[0]["kind"] if rs else "str"
        key = {"int": int, "float": float, "str": None}[kind]

        def fold(vals, f):
            if not vals:
                return None
            return f(vals, key=key) if key else f(vals)

        out.append({
            "column": c,
            "n_rows": sum(r["n"] for r in rs),
            "n_nulls": sum(r["nulls"] for r in rs),
            "min_v": fold(mins, min),
            "max_v": fold(maxs, max),
        })
    return pa.Table.from_pylist(out)


def psi_drift(
    ds,
    value_col: str,
    group_expr,
    bucket_width: int = 64,
):
    """Population Stability Index between two cohorts of one dataset — the
    standard data-quality drift gauge between corpus slices (crawl A vs
    crawl B, train vs val, old vs new source mix). ``group_expr(table) ->
    BooleanArray`` splits rows into cohort A (true) / B (false);
    ``value_col`` is histogrammed into fixed integer buckets
    (``value // bucket_width``, integer floor division — exact at any
    magnitude). Null values are excluded (a null has no bucket).

    Returns per-bucket rows (bucket, p_a, p_b, psi_term) over buckets
    present in BOTH cohorts (the standard PSI domain — an empty side has
    undefined log-ratio), plus psi_term = (p_a - p_b) * ln(p_a / p_b);
    shares are over each cohort's rows in those shared buckets, so the
    terms sum to the PSI. Decomposable: per-batch (bucket, cohort)
    partial counts → one tiny groupby (#buckets x 2 rows) → driver fold.
    """

    def partial(t: pa.Table) -> pa.Table:
        grp = pc.cast(group_expr(t), pa.bool_())
        v = t[value_col].combine_chunks()
        if isinstance(grp, pa.ChunkedArray):
            grp = grp.combine_chunks()
        # a null value has no bucket; a null cohort has no side; NaN
        # floats cannot bucket either
        keep = pc.and_(pc.is_valid(v), pc.is_valid(grp))
        if pa.types.is_floating(v.type):
            keep = pc.and_(keep, pc.is_finite(v))
        v = v.filter(keep)
        grp = grp.filter(keep)
        ints = (
            pc.cast(v, pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        tb = pa.table({
            "bucket": pa.array(ints // np.int64(bucket_width)),
            "is_a": grp,
        })
        g = tb.group_by(["bucket", "is_a"]).aggregate([([], "count_all")])
        return pa.table({
            "bucket": g["bucket"],
            "is_a": g["is_a"],
            "n": pc.cast(g["count_all"], pa.int64()),
        })

    parts = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    acc: dict = {}
    for t in parts.iter_batches(batch_format="pyarrow"):
        for r in t.to_pylist():  # O(buckets x 2) rows per block
            k = (r["bucket"], r["is_a"])
            acc[k] = acc.get(k, 0) + r["n"]
    buckets = sorted({b for b, _ in acc})
    shared = [
        b for b in buckets
        if acc.get((b, True), 0) > 0 and acc.get((b, False), 0) > 0
    ]
    na = sum(acc[(b, True)] for b in shared)
    nb = sum(acc[(b, False)] for b in shared)
    rows = []
    for b in shared:
        pa_ = acc[(b, True)] / na
        pb_ = acc[(b, False)] / nb
        rows.append({
            "bucket": b,
            "p_a": pa_,
            "p_b": pb_,
            "psi_term": (pa_ - pb_) * float(np.log(pa_ / pb_)),
        })
    if not rows:
        return pa.table({
            "bucket": pa.array([], pa.int64()),
            "p_a": pa.array([], pa.float64()),
            "p_b": pa.array([], pa.float64()),
            "psi_term": pa.array([], pa.float64()),
        })
    return pa.Table.from_pylist(rows)


def value_histogram(
    ds,
    group_col: str = "event_type",
    value_col: str = "value",
    n_buckets: int = 16,
):
    """Equi-width histogram of ``value_col`` per group over the GLOBAL
    [min, max] range — the data-profiling primitive behind distribution
    dashboards and drift baselines (psi_drift's buckets, but with a
    data-derived range).

    Two streaming passes, no wide shuffle: (1) per-batch (min, max)
    partials fold through one single-row groupby; (2) the two floats ride
    the task closure and each batch bincounts its rows per (group, bucket)
    — #groups x #buckets partial rows per block — then one tiny groupby
    sums. The bucket expression ``floor((v - mn) * n / (mx - mn))``
    (top value clamped into the last bucket) is evaluated in the exact
    same operation order as the SQL oracle, so IEEE doubles land in
    identical buckets. NULL values are excluded; a degenerate range
    (mx == mn) puts every row in bucket 0."""
    from ray.data.aggregate import Sum

    mn, mx = global_min_max(ds, value_col)

    def bucketed(t: pa.Table) -> pa.Table:
        keep = pc.is_valid(t[value_col])
        d = t.select([group_col, value_col]).filter(keep)
        v = d[value_col].combine_chunks().to_numpy(zero_copy_only=False)
        b = equi_bucket(v, mn, mx, n_buckets)
        g = (
            pa.table({group_col: d[group_col], "bucket": pa.array(b)})
            .group_by([group_col, "bucket"])
            .aggregate([([], "count_all")])
        )
        return pa.table({
            group_col: g[group_col],
            "bucket": g["bucket"],
            "n": pc.cast(g["count_all"], pa.int64()),
        })

    folded = (
        ds.map_batches(bucketed, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([group_col, "bucket"])
        .aggregate(Sum("n", alias_name="n"))
    )
    return folded.map_batches(
        lambda t: pa.table({
            group_col: t[group_col],
            "bucket": t["bucket"],
            "n": pc.cast(t["n"], pa.int64()),
        }),
        batch_format="pyarrow",
    )


def mad_outliers(
    ds,
    group_col: str = "event_type",
    value_col: str = "value",
    k: float = 3.0,
):
    """Robust per-group outlier screen: median, MAD (median absolute
    deviation), and the count of values beyond ``k * 1.4826 * MAD`` of
    the median (1.4826 scales MAD to sigma under normality — the
    standard robust z-score).

    Medians are exact order statistics, so the group must co-locate: ONE
    groupby on the (low-cardinality) group key, then a single numpy
    kernel computes median, MAD and the outlier count from one sorted
    copy. Same exact-path caveat as quantiles_per_group: at 100 TB
    per-group, swap the in-group sort for a mergeable quantile sketch —
    the pipeline shape is unchanged. NULL values are excluded.
    """

    def f(group: pa.Table) -> pa.Table:
        gval = group[value_col]
        v = gval.combine_chunks().drop_null().to_numpy(zero_copy_only=False)
        v = v.astype(np.float64)
        if len(v) == 0:
            # all-NULL group: the SQL formulation (WHERE value IS NOT
            # NULL before grouping) omits the group entirely — mirror it.
            return pa.table({
                group_col: pa.array([], group[group_col].type),
                "n": pa.array([], pa.int64()),
                "median": pa.array([], pa.float64()),
                "mad": pa.array([], pa.float64()),
                "n_outliers": pa.array([], pa.int64()),
                "outlier_rate": pa.array([], pa.float64()),
            })
        med = float(np.quantile(v, 0.5, method="linear"))
        dev = np.abs(v - med)
        mad = float(np.quantile(dev, 0.5, method="linear"))
        thr = k * 1.4826 * mad
        n_out = int(np.count_nonzero(dev > thr))
        return pa.table({
            group_col: pa.array([group[group_col][0].as_py()]),
            "n": pa.array([len(v)], pa.int64()),
            "median": pa.array([med], pa.float64()),
            "mad": pa.array([mad], pa.float64()),
            "n_outliers": pa.array([n_out], pa.int64()),
            "outlier_rate": pa.array([n_out / len(v)], pa.float64()),
        })

    return ds.groupby(group_col).map_groups(f, batch_format="pyarrow")


def pareto_front(ds, x_col: str, y_col: str, n_buckets: int = 1024):
    """Skyline / Pareto front maximizing BOTH columns: rows not strictly
    dominated by any other row (q dominates p iff q.x >= p.x and
    q.y >= p.y with at least one strict). Ties on both coordinates all
    survive — exactly the SQL NOT EXISTS formulation.

    Scale shape (never an all-pairs check): equi-width x-buckets give
    cross-bucket dominance for free — any point in a HIGHER bucket has
    strictly greater x, so a point survives its cross-bucket test iff
    its y exceeds the suffix-max of per-bucket y maxima (B floats on the
    driver, from one tiny fold). The in-bucket exact front is one
    vectorized pass over the bucket sorted desc by (x, y): per distinct
    x only the max-y points survive, and only when that max strictly
    exceeds the running max of greater x. NULL or NaN in either column
    drops the row (SQL comparisons with NULL never dominate or survive;
    NaN has no defined equi-width bucket)."""
    from ray.data.aggregate import Max, Sum

    from .kernels import drop_null_nan

    both_valid = lambda t: drop_null_nan(  # noqa: E731
        drop_null_nan(t, x_col), y_col
    )
    mn, mx = global_min_max(
        ds.map_batches(both_valid, batch_format="pyarrow",
                       zero_copy_batch=True),
        x_col,
    )

    def ymax_partial(t: pa.Table) -> pa.Table:
        t = both_valid(t)
        x = pc.cast(t[x_col], pa.float64()).to_numpy(zero_copy_only=False)
        y = pc.cast(t[y_col], pa.float64()).to_numpy(zero_copy_only=False)
        b = equi_bucket(x, mn, mx, n_buckets)
        out = np.full(n_buckets, -np.inf)
        np.maximum.at(out, b, y)
        nz = np.flatnonzero(out > -np.inf)
        return pa.table({
            "_xb": pa.array(nz.astype(np.int64)),
            "ym": pa.array(out[nz]),
        })

    rows = (
        ds.map_batches(ymax_partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("_xb")
        .aggregate(Max("ym", alias_name="ym"))
        .take_all()
    )  # <= n_buckets rows: the only driver-side state
    ym = np.full(n_buckets, -np.inf)
    for r in rows:
        ym[r["_xb"]] = r["ym"]
    # suffix max over STRICTLY higher buckets
    above = np.full(n_buckets, -np.inf)
    if n_buckets > 1:
        above[:-1] = np.maximum.accumulate(ym[::-1])[::-1][1:]

    def tag(t: pa.Table) -> pa.Table:
        t = both_valid(t)
        x = pc.cast(t[x_col], pa.float64()).to_numpy(zero_copy_only=False)
        b = equi_bucket(x, mn, mx, n_buckets)
        # cheap pre-filter: a row below its bucket's cross-bucket bar can
        # never survive; drops almost everything before the shuffle
        y = pc.cast(t[y_col], pa.float64()).to_numpy(zero_copy_only=False)
        keep = y > above[b]
        return t.filter(pa.array(keep)).append_column(
            "_xb", pa.array(b[keep])
        )

    def front_bucket(g: pa.Table) -> pa.Table:
        b = int(g["_xb"][0].as_py())
        g = g.drop_columns(["_xb"])
        x = pc.cast(g[x_col], pa.float64()).to_numpy(zero_copy_only=False)
        y = pc.cast(g[y_col], pa.float64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((-y, -x))
        xs, ys = x[order], y[order]
        n = len(xs)
        new_x = np.r_[True, xs[1:] != xs[:-1]]
        # max y per distinct x is the FIRST row of the x-run (sorted desc)
        run_ymax = ys[np.maximum.accumulate(
            np.where(new_x, np.arange(n), 0)
        )]
        # running max of strictly-greater x: shift the per-run cummax
        starts = np.flatnonzero(new_x)
        run_best = ys[starts]  # max y of each x-run
        prev_best = np.full(len(starts), above[b])
        if len(starts) > 1:
            prev_best[1:] = np.maximum(
                prev_best[1:], np.maximum.accumulate(run_best)[:-1]
            )
        sizes = np.diff(np.append(starts, n))
        greater_max = np.repeat(prev_best, sizes)
        keep_sorted = (ys == run_ymax) & (run_ymax > greater_max)
        keep = np.empty(n, dtype=bool)
        keep[order] = keep_sorted
        return g.filter(pa.array(keep))

    return (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_xb")
        .map_groups(front_bucket, batch_format="pyarrow")
    )


def candidate_keys(ds_for_col, columns: Sequence[str], buckets: int = 64):
    """Candidate-key discovery: per column, the exact distinct count
    (NULLs excluded, SQL ``count(DISTINCT c)`` semantics), uniqueness
    ratio and an ``is_key`` verdict — the constraint-mining DQ probe run
    before declaring merge keys.

    ``ds_for_col(col)`` must return a Dataset exposing that column —
    letting each column stream its OWN column-pruned read (a parquet
    scan that loads one column, not the whole table). Per column: each
    block folds to its distinct values (the combiner), ONE bucketed
    shuffle co-locates values by hash so in-bucket distinct counts sum
    to the global count; only int64 partials reach the driver."""
    from debezium_incubator_ray.hashing import partition_ids

    rows = []
    for c in columns:
        ds = ds_for_col(c)
        n_rows = ds.count()

        def local(t: pa.Table, c=c) -> pa.Table:
            v = t[c].combine_chunks().drop_null()
            d = pa.table({c: v}).group_by(c).aggregate([])
            b = partition_ids(d[c].combine_chunks(), buckets, "hash")
            return d.append_column("_b", pa.array(b, pa.int32()))

        def bucket_count(g: pa.Table, c=c) -> pa.Table:
            nd = g.drop_columns(["_b"]).group_by(c).aggregate([]).num_rows
            return pa.table({"nd": pa.array([nd], pa.int64())})

        n_distinct = int(
            ds.map_batches(local, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("_b")
            .map_groups(bucket_count, batch_format="pyarrow")
            .sum("nd") or 0
        )
        rows.append({
            "col_name": c,
            "n_rows": n_rows,
            "n_distinct": n_distinct,
            "uniqueness": round(n_distinct / n_rows, 6) if n_rows else None,
            "is_key": n_distinct == n_rows if n_rows else False,
        })
    return pa.Table.from_pylist(rows)
