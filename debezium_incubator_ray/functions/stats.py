"""Distributed statistical aggregates built from moment/sufficient-statistic
partials: Shannon entropy per key, least-squares regression + Pearson
correlation per group, Benford first-digit conformance, and generalized
(geometric / harmonic) means.

Every operator here follows the same scale shape: a vectorized per-batch
partial reduction (Arrow ``group_by`` / ``pyarrow.compute`` kernels) shrinks
each block to per-key sufficient statistics, one narrow ``groupby`` folds
those, and a final closed-form map finishes. Raw rows never shuffle; the
exchange payload is O(|keys|) per block, not O(rows).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def group_entropy(ds, key_col: str, type_col: str):
    """Per-key Shannon entropy (natural log) of the categorical
    distribution in ``type_col`` — the "behavioral diversity" feature
    (H = ln n - sum(c*ln c)/n over the key's category counts).

    Per-batch partials reduce rows to (key, type, cnt); the one shuffle is
    a 2-col groupby over those partials (cardinality |keys|x|types|, tiny
    next to the event stream); per-key finishing is a second narrow
    groupby of three sufficient statistics.
    """

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by([key_col, type_col]).aggregate([([], "count_all")])
        return pa.table({
            key_col: g[key_col],
            type_col: g[type_col],
            "cnt": pc.cast(g["count_all"], pa.int64()),
        })

    def per_key_stats(t: pa.Table) -> pa.Table:
        cnt = pc.cast(t["cnt"], pa.float64())
        cl = pc.multiply(cnt, pc.ln(cnt))
        d = pa.table({
            key_col: t[key_col],
            "n_events": t["cnt"],
            "cln": cl,
            "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
        })
        g = d.group_by(key_col).aggregate(
            [("n_events", "sum"), ("cln", "sum"), ("one", "sum")]
        )
        return pa.table({
            key_col: g[key_col],
            "n_events": g["n_events_sum"],
            "n_types": g["one_sum"],
            "cln": g["cln_sum"],
        })

    from ray.data.aggregate import Sum

    counts = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([key_col, type_col])
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    stats = (
        counts.map_batches(per_key_stats, batch_format="pyarrow")
        .groupby(key_col)
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("n_types", alias_name="n_types"),
            Sum("cln", alias_name="cln"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        n = pc.cast(t["n_events"], pa.float64())
        ent = pc.subtract(pc.ln(n), pc.divide(t["cln"], n))
        return pa.table({
            key_col: t[key_col],
            "n_events": t["n_events"],
            "n_types": t["n_types"],
            "entropy": ent,
        })

    return stats.map_batches(finish, batch_format="pyarrow")


def group_regression(ds, key_col: str, x_col: str, y_col: str):
    """Per-group least-squares line y = slope*x + intercept and Pearson
    correlation, from the six classical moment sums
    (n, Sx, Sy, Sxx, Syy, Sxy) — REGR_SLOPE / REGR_INTERCEPT / CORR as one
    streaming pass.

    Each batch folds to one row of moment sums per key present in it; the
    only shuffle moves |keys| x #blocks tiny rows.
    """

    def partial(t: pa.Table) -> pa.Table:
        x = pc.cast(t[x_col], pa.float64())
        y = pc.cast(t[y_col], pa.float64())
        d = pa.table({
            key_col: t[key_col],
            "sx": x,
            "sy": y,
            "sxx": pc.multiply(x, x),
            "syy": pc.multiply(y, y),
            "sxy": pc.multiply(x, y),
            "n": pa.array(np.ones(t.num_rows, dtype=np.int64)),
        })
        g = d.group_by(key_col).aggregate(
            [(c, "sum") for c in ("sx", "sy", "sxx", "syy", "sxy", "n")]
        )
        return g.rename_columns([key_col, "sx", "sy", "sxx", "syy", "sxy", "n"])

    from ray.data.aggregate import Sum

    sums = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(key_col)
        .aggregate(*[Sum(c, alias_name=c) for c in ("sx", "sy", "sxx", "syy", "sxy", "n")])
    )

    def finish(t: pa.Table) -> pa.Table:
        n = pc.cast(t["n"], pa.float64())
        sx, sy = t["sx"], t["sy"]
        cov_n = pc.subtract(pc.multiply(n, t["sxy"]), pc.multiply(sx, sy))
        var_x = pc.subtract(pc.multiply(n, t["sxx"]), pc.multiply(sx, sx))
        var_y = pc.subtract(pc.multiply(n, t["syy"]), pc.multiply(sy, sy))
        slope = pc.divide(cov_n, var_x)
        intercept = pc.divide(pc.subtract(sy, pc.multiply(slope, sx)), n)
        corr = pc.divide(cov_n, pc.sqrt(pc.multiply(var_x, var_y)))
        return pa.table({
            key_col: t[key_col],
            "n": t["n"],
            "slope": slope,
            "intercept": intercept,
            "corr": corr,
        })

    return sums.map_batches(finish, batch_format="pyarrow")


def benford_digits(ds, col: str):
    """First-significant-digit distribution of a positive measure vs
    Benford's law — the classic fraud / data-quality screen.

    digit(x) = floor(x / 10^floor(log10 x)). Per-batch partials bincount
    the nine digits, so the fold is 9 rows per block; the finish computes
    observed share, the Benford expectation log10(1 + 1/d), and the
    deviation on the 9-row aggregate inside one constant-key group.
    """

    def partial(t: pa.Table) -> pa.Table:
        x = pc.cast(t[col], pa.float64())
        x = x.filter(pc.and_(pc.is_valid(x), pc.greater(x, 0.0)))
        xf = x.to_numpy(zero_copy_only=False)
        digit = np.floor(xf / np.power(10.0, np.floor(np.log10(xf))))
        cnt = np.bincount(digit.astype(np.int64), minlength=10)[1:10]
        return pa.table({
            "digit": pa.array(np.arange(1, 10, dtype=np.int64)),
            "cnt": pa.array(cnt.astype(np.int64)),
        })

    from ray.data.aggregate import Sum

    folded = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("digit")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )

    def finish(g: pa.Table) -> pa.Table:
        g = g.sort_by("digit")
        total = pc.sum(g["cnt"]).as_py() or 1
        share = pc.divide(pc.cast(g["cnt"], pa.float64()), float(total))
        d = pc.cast(g["digit"], pa.float64())
        expected = pc.log10(pc.add(pc.divide(1.0, d), 1.0))
        return pa.table({
            "digit": g["digit"],
            "cnt": g["cnt"],
            "share": share,
            "expected": expected,
            "deviation": pc.subtract(share, expected),
        })

    # 9 rows total: fold them into one group so `finish` sees all digits.
    return (
        folded.map_batches(
            lambda t: t.append_column(
                "_k", pa.array(np.zeros(t.num_rows, dtype=np.int64))
            ),
            batch_format="pyarrow",
        )
        .groupby("_k")
        .map_groups(
            lambda g: finish(g.drop_columns(["_k"])), batch_format="pyarrow"
        )
    )


def group_generalized_means(ds, key_col: str, value_col: str):
    """Arithmetic, geometric, and harmonic mean per group over strictly
    positive values — one pass of per-batch partial sums
    (n, sum v, sum ln v, sum 1/v) folded by a narrow groupby.
    """

    def partial(t: pa.Table) -> pa.Table:
        v = pc.cast(t[value_col], pa.float64())
        keep = pc.fill_null(pc.greater(v, 0.0), False)
        t = t.filter(keep)
        v = pc.cast(t[value_col], pa.float64())
        d = pa.table({
            key_col: t[key_col],
            "s": v,
            "sln": pc.ln(v),
            "sinv": pc.divide(1.0, v),
            "n": pa.array(np.ones(t.num_rows, dtype=np.int64)),
        })
        g = d.group_by(key_col).aggregate(
            [(c, "sum") for c in ("s", "sln", "sinv", "n")]
        )
        return g.rename_columns([key_col, "s", "sln", "sinv", "n"])

    from ray.data.aggregate import Sum

    sums = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(key_col)
        .aggregate(*[Sum(c, alias_name=c) for c in ("s", "sln", "sinv", "n")])
    )

    def finish(t: pa.Table) -> pa.Table:
        n = pc.cast(t["n"], pa.float64())
        return pa.table({
            key_col: t[key_col],
            "n": t["n"],
            "mean_arith": pc.divide(t["s"], n),
            "mean_geom": pc.exp(pc.divide(t["sln"], n)),
            "mean_harm": pc.divide(n, t["sinv"]),
        })

    return sums.map_batches(finish, batch_format="pyarrow")


def grouping_sets_sum(ds, derive, key_cols, sets, level_col="gid"):
    """GROUPING SETS (the generalization behind ROLLUP and CUBE) in ONE
    pass: every batch emits partial (sum, count) rows at ALL grouping
    sets, so a single tiny shuffle folds the whole lattice — no
    per-level rescan of the input.

    ``derive(t) -> pa.Table`` maps a raw batch to columns ``key_cols``
    plus ``v`` (float64, nulls already filled); ``sets`` is
    ``[(level_id, [subset of key_cols]), ...]`` — level_id mirrors SQL
    GROUPING() arithmetic and is emitted as ``level_col``. Output: one
    row per (level, key...) with ungrouped keys null-padded,
    ``total_value`` = round(sum(v), 3) and ``n`` = count.
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        base = derive(t)
        base = base.append_column(
            "one", pa.array(np.ones(base.num_rows, dtype=np.int64))
        )
        outs = []
        for lid, keys in sets:
            g = base.group_by(keys).aggregate(
                [("v", "sum"), ("one", "sum")]
            )
            n = g.num_rows
            cols = {level_col: pa.array(np.full(n, lid, dtype=np.int64))}
            for k in key_cols:
                cols[k] = (
                    g[k] if k in g.column_names
                    else pa.nulls(n, base[k].type)
                )
            cols["sv"] = g["v_sum"]
            cols["cnt"] = g["one_sum"]
            outs.append(pa.table(cols))
        return pa.concat_tables(outs)

    folded = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([level_col, *key_cols])
        .aggregate(Sum("sv", alias_name="sv"), Sum("cnt", alias_name="cnt"))
    )

    def finish(t: pa.Table) -> pa.Table:
        cols = {level_col: t[level_col]}
        for k in key_cols:
            cols[k] = t[k]
        cols["total_value"] = pc.round(t["sv"], ndigits=3)
        cols["n"] = pc.cast(t["cnt"], pa.int64())
        return pa.table(cols)

    return folded.map_batches(finish, batch_format="pyarrow")


def corr_matrix(ds, cols):
    """Pairwise Pearson correlation over a set of numeric columns in ONE
    streaming pass — the data-profiling correlation heatmap. Output: one
    row per unordered pair (col_a < col_b by name order given) with the
    pair's n and corr.

    SQL ``corr(x, y)`` excludes a row when EITHER side is NULL, and that
    exclusion set differs per pair — so the moment sums
    (n, Sx, Sy, Sxx, Syy, Sxy) are accumulated per pair under the pair's
    own validity mask. Per batch that is p*(p-1)/2 masked numpy folds
    into ONE single-row partial; a constant-key groupby sums them and a
    closed-form finish emits the matrix. Driver state: one row of
    6 * #pairs floats."""
    from ray.data.aggregate import Sum

    pairs = [
        (cols[i], cols[j])
        for i in range(len(cols)) for j in range(i + 1, len(cols))
    ]

    def partial(t: pa.Table) -> pa.Table:
        arrs = {}
        valid = {}
        for c in cols:
            a = t[c].combine_chunks()
            valid[c] = pc.is_valid(a).to_numpy(zero_copy_only=False)
            arrs[c] = pc.cast(a, pa.float64()).to_numpy(
                zero_copy_only=False
            )
        row: dict = {"_k": pa.array([0], pa.int64())}
        for a_c, b_c in pairs:
            m = valid[a_c] & valid[b_c]
            x, y = arrs[a_c][m], arrs[b_c][m]
            pfx = f"{a_c}__{b_c}"
            row[f"{pfx}_n"] = pa.array([float(len(x))])
            row[f"{pfx}_sx"] = pa.array([float(x.sum())])
            row[f"{pfx}_sy"] = pa.array([float(y.sum())])
            row[f"{pfx}_sxx"] = pa.array([float((x * x).sum())])
            row[f"{pfx}_syy"] = pa.array([float((y * y).sum())])
            row[f"{pfx}_sxy"] = pa.array([float((x * y).sum())])
        return pa.table(row)

    aggs = []
    for a_c, b_c in pairs:
        pfx = f"{a_c}__{b_c}"
        for s in ("n", "sx", "sy", "sxx", "syy", "sxy"):
            aggs.append(Sum(f"{pfx}_{s}", alias_name=f"{pfx}_{s}"))
    folded = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_k")
        .aggregate(*aggs)
        .take_all()
    )[0]

    out_a, out_b, out_n, out_corr = [], [], [], []
    for a_c, b_c in pairs:
        pfx = f"{a_c}__{b_c}"
        n = folded[f"{pfx}_n"]
        sx, sy = folded[f"{pfx}_sx"], folded[f"{pfx}_sy"]
        sxx, syy = folded[f"{pfx}_sxx"], folded[f"{pfx}_syy"]
        sxy = folded[f"{pfx}_sxy"]
        cov_n = n * sxy - sx * sy
        var_x = n * sxx - sx * sx
        var_y = n * syy - sy * sy
        denom = np.sqrt(var_x * var_y)
        out_a.append(a_c)
        out_b.append(b_c)
        out_n.append(int(n))
        out_corr.append(cov_n / denom if denom > 0 else None)
    return pa.table({
        "col_a": pa.array(out_a, pa.string()),
        "col_b": pa.array(out_b, pa.string()),
        "n": pa.array(out_n, pa.int64()),
        "corr": pa.array(out_corr, pa.float64()),
    })


def group_higher_moments(ds, key_col: str, value_col: str):
    """Per-key adjusted sample skewness and excess kurtosis — exactly
    DuckDB/SQL ``skewness``/``kurtosis`` (the G1 / G2 bias-adjusted
    estimators) — from ONE streaming pass of raw power sums
    (n, S1..S4). Central moments come out of the raw sums in closed
    form, so the only shuffle is |keys| x #blocks single-row partials.
    NULL values are excluded; keys need n >= 3 (skew) / n >= 4 (kurt) —
    smaller groups emit NULL for the undefined statistic, as SQL does."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[value_col]))
        x = pc.cast(t[value_col], pa.float64())
        x2 = pc.multiply(x, x)
        d = pa.table({
            key_col: t[key_col],
            "s1": x,
            "s2": x2,
            "s3": pc.multiply(x2, x),
            "s4": pc.multiply(x2, x2),
            "n": pa.array(np.ones(t.num_rows, dtype=np.int64)),
        })
        g = d.group_by(key_col).aggregate(
            [(c, "sum") for c in ("s1", "s2", "s3", "s4", "n")]
        )
        return g.rename_columns([key_col, "s1", "s2", "s3", "s4", "n"])

    sums = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(key_col)
        .aggregate(*[Sum(c, alias_name=c)
                     for c in ("s1", "s2", "s3", "s4", "n")])
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t["n"].combine_chunks().to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        s1 = t["s1"].combine_chunks().to_numpy(zero_copy_only=False)
        s2 = t["s2"].combine_chunks().to_numpy(zero_copy_only=False)
        s3 = t["s3"].combine_chunks().to_numpy(zero_copy_only=False)
        s4 = t["s4"].combine_chunks().to_numpy(zero_copy_only=False)
        m = s1 / n
        m2 = s2 / n - m * m
        m3 = s3 / n - 3 * m * s2 / n + 2 * m ** 3
        m4 = s4 / n - 4 * m * s3 / n + 6 * m * m * s2 / n - 3 * m ** 4
        with np.errstate(invalid="ignore", divide="ignore"):
            g1 = m3 / m2 ** 1.5
            skew = g1 * np.sqrt(n * (n - 1)) / (n - 2)
            g2 = m4 / (m2 * m2) - 3.0
            kurt = ((n + 1) * g2 + 6) * (n - 1) / ((n - 2) * (n - 3))
        skew_ok = (n >= 3) & (m2 > 0)
        kurt_ok = (n >= 4) & (m2 > 0)
        return pa.table({
            key_col: t[key_col],
            "n": pc.cast(t["n"], pa.int64()),
            "skew": pa.array(np.where(skew_ok, skew, np.nan),
                             pa.float64(), mask=~skew_ok),
            "kurt": pa.array(np.where(kurt_ok, kurt, np.nan),
                             pa.float64(), mask=~kurt_ok),
        })

    return sums.map_batches(finish, batch_format="pyarrow")


def chi2_independence(ds, a_col: str, b_col: str):
    """Pearson chi-square test of independence between two categorical
    columns in ONE streaming pass. Returns a single row:
    (chi2, dof, n) with chi2 = sum (O-E)^2/E over the contingency table,
    E = row_total * col_total / n, dof = (r-1)(c-1).

    Scale shape: per-block contingency partials (at most r*c rows per
    block — the category product, metadata-sized for real categorical
    data) collected and folded driver-side in closed form; the events
    themselves never shuffle. Rows where either side is NULL are
    excluded (SQL GROUP BY would keep them as their own category — the
    oracle must filter NULLs the same way)."""

    def partial(t: pa.Table) -> pa.Table:
        a = t[a_col].combine_chunks()
        b = t[b_col].combine_chunks()
        keep = pc.and_(pc.is_valid(a), pc.is_valid(b))
        g = (
            pa.table({"a": a.filter(keep), "b": b.filter(keep)})
            .group_by(["a", "b"])
            .aggregate([([], "count_all")])
        )
        return pa.table({
            "a": g["a"], "b": g["b"],
            "n": pc.cast(g["count_all"], pa.int64()),
        })

    cells = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()  # <= r*c rows per block — metadata-sized
    if not cells:
        return pa.table({
            "chi2": pa.array([], pa.float64()),
            "dof": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
        })
    import pandas as pd

    df = pd.DataFrame(cells).groupby(["a", "b"], as_index=False)["n"].sum()
    piv = df.pivot(index="a", columns="b", values="n").fillna(0).to_numpy(
        dtype=np.float64
    )
    n = piv.sum()
    e = np.outer(piv.sum(axis=1), piv.sum(axis=0)) / n
    mask = e > 0
    chi2 = float((((piv - e) ** 2)[mask] / e[mask]).sum())
    dof = (piv.shape[0] - 1) * (piv.shape[1] - 1)
    return pa.table({
        "chi2": pa.array([round(chi2, 6)], pa.float64()),
        "dof": pa.array([dof], pa.int64()),
        "n": pa.array([int(n)], pa.int64()),
    })


def spearman_corr(ds, col_a: str, col_b: str):
    """Spearman rank correlation between two numeric columns in two
    passes: (1) per-column distinct-value COUNTS fold through per-block
    partials into a tie-average rank map (avg_rank = rows_below +
    (count + 1) / 2 — the shuffle and the broadcast are bounded by the
    DISTINCT value count, so this is the path for discrete/bucketed
    measures; for continuous columns switch to the bucket-shuffle rank
    machinery in functions/rank.py); (2) one streaming pass maps rows
    to rank pairs and folds Pearson moment sums (rows where either side
    is NULL are excluded, like SQL corr; ranks are computed over the
    PAIRWISE-complete rows — both sides non-null — so a null in one
    column drops the row from the other column's ranking too, matching
    the SQL oracle's WHERE-before-rank). Returns one row:
    (spearman, n)."""
    import ray

    def count_partial(t: pa.Table) -> pa.Table:
        # ONE tagged pass builds both columns' distinct-value counts
        # (ks_two_sample's shape) instead of two sequential full scans
        both = pc.and_(pc.is_valid(t[col_a]), pc.is_valid(t[col_b]))
        both = both.combine_chunks()
        parts = []
        for tag, col in ((0, col_a), (1, col_b)):
            vc = pc.cast(
                t[col].combine_chunks().filter(both), pa.float64()
            ).value_counts()
            parts.append(pa.table({
                "c": pa.array(np.full(len(vc), tag, dtype=np.int8)),
                "v": vc.field("values"),
                "n": pc.cast(vc.field("counts"), pa.int64()),
            }))
        return pa.concat_tables(parts)

    from ray.data.aggregate import Sum

    rows = (
        ds.map_batches(count_partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby(["c", "v"])
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )  # one row per (column, DISTINCT value)

    def rank_map(tag: int):
        vals = np.array([r["v"] for r in rows if r["c"] == tag],
                        dtype=np.float64)
        cnts = np.array([r["n"] for r in rows if r["c"] == tag],
                        dtype=np.float64)
        order = np.argsort(vals)
        vals, cnts = vals[order], cnts[order]
        below = np.cumsum(cnts) - cnts
        avg_rank = below + (cnts + 1.0) / 2.0
        return ray.put((vals, avg_rank))

    ref_a, ref_b = rank_map(0), rank_map(1)

    def moments(t: pa.Table) -> pa.Table:
        va_r, ra_r = ray.get(ref_a)
        vb_r, rb_r = ray.get(ref_b)
        a = t[col_a].combine_chunks()
        b = t[col_b].combine_chunks()
        keep = pc.and_(pc.is_valid(a), pc.is_valid(b))
        x = pc.cast(a.filter(keep), pa.float64()).to_numpy(
            zero_copy_only=False
        )
        y = pc.cast(b.filter(keep), pa.float64()).to_numpy(
            zero_copy_only=False
        )
        rx = ra_r[np.searchsorted(va_r, x)]
        ry = rb_r[np.searchsorted(vb_r, y)]
        return pa.table({
            "n": pa.array([float(len(rx))]),
            "sx": pa.array([rx.sum()]),
            "sy": pa.array([ry.sum()]),
            "sxx": pa.array([(rx * rx).sum()]),
            "syy": pa.array([(ry * ry).sum()]),
            "sxy": pa.array([(rx * ry).sum()]),
        })

    from ray.data.aggregate import Sum

    agg = (
        ds.map_batches(moments, batch_format="pyarrow",
                       zero_copy_batch=True)
        .aggregate(*[Sum(c, alias_name=c)
                     for c in ("n", "sx", "sy", "sxx", "syy", "sxy")])
    )
    n = agg["n"]
    if not n:  # no pairwise-complete rows: correlation undefined
        return pa.table({
            "spearman": pa.array([float("nan")], pa.float64()),
            "n": pa.array([0], pa.int64()),
        })
    cov = agg["sxy"] - agg["sx"] * agg["sy"] / n
    vx = agg["sxx"] - agg["sx"] ** 2 / n
    vy = agg["syy"] - agg["sy"] ** 2 / n
    rho = cov / np.sqrt(vx * vy) if vx > 0 and vy > 0 else float("nan")
    return pa.table({
        "spearman": pa.array([round(float(rho), 6)], pa.float64()),
        "n": pa.array([int(n)], pa.int64()),
    })


def _two_group_value_counts(ds, value_col: str, group_col: str,
                            group_a, group_b):
    """Shared fold for the two-sample tests (KS, Mann-Whitney): per-block
    per-distinct-value counts for both groups, one narrow groupby, then a
    value-sorted (vals, ca, cb) triple on the driver — bounded by the
    DISTINCT value count, never the row count. NULL values and rows
    outside the two groups are excluded."""
    groups = pa.array([group_a, group_b])

    def partial(t: pa.Table) -> pa.Table:
        v = t[value_col].combine_chunks()
        g = t[group_col].combine_chunks()
        keep = pc.and_(pc.is_valid(v), pc.is_in(g, value_set=groups))
        v, g = v.filter(keep), g.filter(keep)
        out = {"v": [], "ca": [], "cb": []}
        for name, is_a in ((group_a, True), (group_b, False)):
            vc = v.filter(pc.equal(g, name)).value_counts()
            n = len(vc)
            out["v"].append(vc.field("values"))
            cnt = pc.cast(vc.field("counts"), pa.int64())
            zero = pa.array(np.zeros(n, dtype=np.int64))
            out["ca"].append(cnt if is_a else zero)
            out["cb"].append(zero if is_a else cnt)
        return pa.table({
            "v": pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in out["v"]]),
            "ca": pa.concat_arrays(out["ca"]),
            "cb": pa.concat_arrays(out["cb"]),
        })

    from ray.data.aggregate import Sum

    rows = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("v")
        .aggregate(Sum("ca", alias_name="ca"), Sum("cb", alias_name="cb"))
        .take_all()
    )
    vals = np.array([float(r["v"]) for r in rows])
    ca = np.array([r["ca"] for r in rows], dtype=np.int64)
    cb = np.array([r["cb"] for r in rows], dtype=np.int64)
    order = np.argsort(vals)
    return vals[order], ca[order], cb[order]


def ks_two_sample(ds, value_col: str, group_col: str, group_a, group_b):
    """Two-sample Kolmogorov-Smirnov statistic D = max |F_a(v) - F_b(v)|
    between the empirical CDFs of ``value_col`` restricted to the two
    ``group_col`` populations (``_two_group_value_counts`` fold: the
    shuffle and the driver's working set are bounded by the
    distinct-value count, not the row count — for continuous columns
    pre-bucket the measure, same as :func:`spearman_corr`). Returns one
    row: (ks_d, n_a, n_b)."""
    _, ca, cb = _two_group_value_counts(
        ds, value_col, group_col, group_a, group_b
    )
    n_a, n_b = int(ca.sum()), int(cb.sum())
    if n_a == 0 or n_b == 0:
        d = float("nan")
    else:
        fa = np.cumsum(ca) / float(n_a)
        fb = np.cumsum(cb) / float(n_b)
        d = float(np.abs(fa - fb).max())
    return pa.table({
        "ks_d": pa.array([round(d, 6)], pa.float64()),
        "n_a": pa.array([n_a], pa.int64()),
        "n_b": pa.array([n_b], pa.int64()),
    })


def mann_whitney_u(ds, value_col: str, group_col: str, group_a, group_b):
    """Mann-Whitney U (Wilcoxon rank-sum) with the normal approximation
    and tie correction — does ``group_a``'s distribution of
    ``value_col`` stochastically dominate ``group_b``'s? Same
    distinct-bounded fold as :func:`ks_two_sample`; the driver computes
    tie-average ranks over the COMBINED sample from the count vectors.
    Ranks are exact multiples of 0.5 (< 2^52), so every float sum here
    is EXACT and matches a per-row SQL rank sum to the digit. Returns
    one row: (u, z, n_a, n_b) with u = group_a's U statistic."""
    _, ca, cb = _two_group_value_counts(
        ds, value_col, group_col, group_a, group_b
    )
    n_a, n_b = int(ca.sum()), int(cb.sum())
    if n_a == 0 or n_b == 0:
        return pa.table({
            "u": pa.array([float("nan")], pa.float64()),
            "z": pa.array([float("nan")], pa.float64()),
            "n_a": pa.array([n_a], pa.int64()),
            "n_b": pa.array([n_b], pa.int64()),
        })
    t = ca + cb  # combined tie counts per distinct value
    below = np.cumsum(t) - t
    avg_rank = below + (t + 1) / 2.0
    ra = float((ca * avg_rank).sum())
    n = n_a + n_b
    u = ra - n_a * (n_a + 1) / 2.0
    mu = n_a * n_b / 2.0
    # exact arbitrary-precision tie term (t^3 wraps int64 past ~2.1M-row
    # ties; the distinct-value list is small, so Python ints are free)
    tsum = float(sum(int(tv) ** 3 - int(tv) for tv in t))
    var = n_a * n_b / 12.0 * ((n + 1) - tsum / (n * (n - 1.0)))
    z = (u - mu) / np.sqrt(var) if var > 0 else float("nan")
    return pa.table({
        "u": pa.array([round(u, 6)], pa.float64()),
        "z": pa.array([round(float(z), 6)], pa.float64()),
        "n_a": pa.array([n_a], pa.int64()),
        "n_b": pa.array([n_b], pa.int64()),
    })


def autocorr_daily(ds, ts_col: str, lags=(1, 2, 3, 7)):
    """Lag-k autocorrelation of the daily event-count series: per-block
    day-count partials (rows collapse to days before anything moves), one
    narrow day groupby, then a driver finish over the day series only —
    bounded by the calendar span, never the event count. Lag is in
    POSITIONS of the day-ordered series of days that HAVE events (SQL
    ``LAG(c, k) OVER (ORDER BY day)``); with gap-free data that equals
    calendar-day lag. Returns one row per lag: (lag, acf, n_days)."""

    def partial(t: pa.Table) -> pa.Table:
        day = pc.cast(t[ts_col].combine_chunks(), pa.date32())
        vc = day.drop_null().value_counts()
        return pa.table({
            "day": vc.field("values"),
            "n": pc.cast(vc.field("counts"), pa.int64()),
        })

    from ray.data.aggregate import Sum

    rows = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("day")
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )
    days = np.array([r["day"].toordinal() for r in rows])
    cnts = np.array([r["n"] for r in rows], dtype=np.float64)
    cnts = cnts[np.argsort(days)]
    out = {"lag": [], "acf": [], "n_days": []}
    for k in lags:
        acf = (
            float(np.corrcoef(cnts[k:], cnts[:-k])[0, 1])
            if 0 < k < len(cnts) else float("nan")
        )
        out["lag"].append(int(k))
        out["acf"].append(round(acf, 6))
        out["n_days"].append(len(cnts))
    return pa.table({
        "lag": pa.array(out["lag"], pa.int64()),
        "acf": pa.array(out["acf"], pa.float64()),
        "n_days": pa.array(out["n_days"], pa.int64()),
    })


def kendall_tau_b(ds, a_col: str, b_col: str):
    """Kendall rank correlation (tau-b, tie-corrected) between two
    discrete/bucketed columns in ONE streaming pass: per-block
    contingency partials (<= distinct_a x distinct_b rows per block)
    fold driver-side, then concordant/discordant pair counts come from
    2-D suffix sums over the grid — EXACT int64 arithmetic, so the
    result is digit-identical to an exact SQL pair count. NULL pairs
    are excluded. O(grid) memory, the rows never shuffle. Returns one
    row: (tau_b, n)."""

    def partial(t: pa.Table) -> pa.Table:
        a = t[a_col].combine_chunks()
        b = t[b_col].combine_chunks()
        keep = pc.and_(pc.is_valid(a), pc.is_valid(b))
        g = (
            pa.table({"a": a.filter(keep), "b": b.filter(keep)})
            .group_by(["a", "b"])
            .aggregate([([], "count_all")])
        )
        return pa.table({
            "a": g["a"], "b": g["b"],
            "n": pc.cast(g["count_all"], pa.int64()),
        })

    cells = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    import pandas as pd

    if not cells:
        return pa.table({
            "tau_b": pa.array([float("nan")], pa.float64()),
            "n": pa.array([0], pa.int64()),
        })
    df = pd.DataFrame(cells).groupby(["a", "b"], as_index=False)["n"].sum()
    piv = (
        df.pivot(index="a", columns="b", values="n")
        .fillna(0)
        .sort_index(axis=0)
        .sort_index(axis=1)
        .to_numpy(dtype=np.int64)
    )
    n = int(piv.sum())
    # suffix sums: gt[i, j] = sum of cells strictly below AND right of (i, j)
    rev = piv[::-1, ::-1]
    suf = rev.cumsum(axis=0).cumsum(axis=1)[::-1, ::-1]
    gt = np.zeros_like(piv)
    gt[:-1, :-1] = suf[1:, 1:]
    # lt-in-b / gt-in-a: strictly below AND strictly LEFT
    rev_l = piv[::-1, :]
    suf_l = rev_l.cumsum(axis=0).cumsum(axis=1)[::-1, :]
    dt = np.zeros_like(piv)
    dt[:-1, 1:] = suf_l[1:, :-1]
    conc = int((piv * gt).sum())
    disc = int((piv * dt).sum())
    n0 = n * (n - 1) // 2
    n1 = int(sum(t * (t - 1) // 2 for t in piv.sum(axis=1)))
    n2 = int(sum(t * (t - 1) // 2 for t in piv.sum(axis=0)))
    denom = float(n0 - n1) * float(n0 - n2)
    tau = (conc - disc) / np.sqrt(denom) if denom > 0 else float("nan")
    return pa.table({
        "tau_b": pa.array([round(float(tau), 6)], pa.float64()),
        "n": pa.array([n], pa.int64()),
    })


def _gini_from_value_counts(c: np.ndarray, m: np.ndarray):
    """Exact Gini over the multiset {c_i with multiplicity m_i}: the
    integer rank-sum formula G = 2*sum(rank_i * x_i)/(n * sum(x)) -
    (n+1)/n, runs of equal values contributing c*(m*start + m(m-1)/2).
    Arbitrary-precision (Python ints) — rank-weighted sums wrap int64 at
    large n. Returns (gini, n)."""
    order = np.argsort(c)
    c, m = c[order], m[order]
    n = int(m.sum())
    s = int((c.astype(object) * m).sum())
    start = np.cumsum(m) - m + 1  # 1-based start rank of each value run
    s1 = sum(
        int(cv) * (int(mv) * int(st) + int(mv) * (int(mv) - 1) // 2)
        for cv, mv, st in zip(c, m, start)
    )
    gini = 2.0 * s1 / (n * s) - (n + 1.0) / n if n and s else float("nan")
    return gini, n


def value_gini(ds, col: str, cents: int = 100):
    """Gini coefficient of a MONEY column's values — how unequally is
    value (not activity) concentrated (events_gini's sibling: there the
    multiset is per-key event counts; here it is the column's cent
    values). One narrow fold: per-block value_counts of
    round(col * cents) → groupby — the shuffle and the driver finish are
    bounded by the DISTINCT cent-value count (a bounded price grid at any
    scale), never the row count. Exact integer rank-sum; NULLs excluded.
    Returns one row (gini, n)."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        v = t[col].combine_chunks().drop_null()
        c = pc.cast(pc.round(pc.multiply(v, float(cents))), pa.int64())
        vc = c.value_counts()
        return pa.table({
            "c": vc.field("values"),
            "m": pc.cast(vc.field("counts"), pa.int64()),
        })

    rows = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("c")
        .aggregate(Sum("m", alias_name="m"))
        .take_all()
    )
    if not rows:
        return pa.table({
            "gini": pa.array([float("nan")], pa.float64()),
            "n": pa.array([0], pa.int64()),
        })
    c = np.array([r["c"] for r in rows], dtype=np.int64)
    m = np.array([r["m"] for r in rows], dtype=np.int64)
    gini, n = _gini_from_value_counts(c, m)
    return pa.table({
        "gini": pa.array([round(float(gini), 6)], pa.float64()),
        "n": pa.array([n], pa.int64()),
    })


def gini_coefficient(ds, key_col: str):
    """Gini coefficient of per-key event counts — how unequally is
    activity concentrated across keys (0 = uniform, ->1 = one key owns
    everything)? Two narrow folds: per-block (key, cnt) partials
    groupby-fold to per-key totals (|keys| rows, never the events), then
    per-block value_counts of the TOTALS fold to (count_value,
    multiplicity) — the driver finish is bounded by the DISTINCT count
    values, not the key count. Exact integer rank-sum formula:
    G = 2*sum(i * x_i)/(n * sum(x)) - (n+1)/n over the sorted multiset
    (runs of equal values contribute c*(m*p + m(m-1)/2) with p the
    1-based start rank). Returns one row: (gini, n_keys)."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        vc = t[key_col].combine_chunks().drop_null().value_counts()
        return pa.table({
            "k": vc.field("values"),
            "c": pc.cast(vc.field("counts"), pa.int64()),
        })

    per_key = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("k")
        .aggregate(Sum("c", alias_name="c"))
    )

    def count_of_counts(t: pa.Table) -> pa.Table:
        vc = t["c"].combine_chunks().value_counts()
        return pa.table({
            "c": vc.field("values"),
            "m": pc.cast(vc.field("counts"), pa.int64()),
        })

    rows = (
        per_key.map_batches(count_of_counts, batch_format="pyarrow")
        .groupby("c")
        .aggregate(Sum("m", alias_name="m"))
        .take_all()
    )
    if not rows:
        return pa.table({
            "gini": pa.array([float("nan")], pa.float64()),
            "n_keys": pa.array([0], pa.int64()),
        })
    c = np.array([r["c"] for r in rows], dtype=np.int64)
    m = np.array([r["m"] for r in rows], dtype=np.int64)
    gini, n = _gini_from_value_counts(c, m)
    return pa.table({
        "gini": pa.array([round(float(gini), 6)], pa.float64()),
        "n_keys": pa.array([n], pa.int64()),
    })


def cusum_changepoint(ds, ts_col: str):
    """CUSUM mean-shift screen on the daily event-count series: the day
    maximizing |S_i - i*S_n/n| (cumulative count minus the uniform-rate
    expectation) — where did the volume trend break? Same calendar-
    bounded daily fold as :func:`autocorr_daily`; the driver finish is
    O(#days). Ties break to the earliest day. Returns one row:
    (change_day, cusum, n_days)."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        day = pc.strftime(
            pc.floor_temporal(t[ts_col].combine_chunks(), unit="day"),
            format="%Y-%m-%d",
        )
        vc = day.drop_null().value_counts()
        return pa.table({
            "day": vc.field("values"),
            "n": pc.cast(vc.field("counts"), pa.int64()),
        })

    rows = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("day")
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )
    days = sorted((r["day"], r["n"]) for r in rows)
    cnts = np.array([n for _, n in days], dtype=np.int64)
    n_days = len(cnts)
    if not n_days:
        return pa.table({
            "change_day": pa.array([None], pa.string()),
            "cusum": pa.array([float("nan")], pa.float64()),
            "n_days": pa.array([0], pa.int64()),
        })
    s = np.cumsum(cnts)
    i = np.arange(1, n_days + 1, dtype=np.float64)
    dev = np.abs(s - i * float(s[-1]) / n_days)
    best = int(np.argmax(dev))  # first occurrence = earliest day
    return pa.table({
        "change_day": pa.array([days[best][0]], pa.string()),
        "cusum": pa.array([round(float(dev[best]), 6)], pa.float64()),
        "n_days": pa.array([n_days], pa.int64()),
    })

def _group_power_sums(ds, value_col: str, group_col: str, keep_fn=None):
    """Shared (n, sum, sum-of-squares)-per-group streaming fold behind
    welch_ttest and anova_oneway: per-block partials shrink each block to
    one row per group, one narrow groupby folds them. ``keep_fn(g, v)``
    returns the row mask (defaults to both-valid)."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        g = t[group_col].combine_chunks()
        v = pc.cast(t[value_col].combine_chunks(), pa.float64())
        keep = keep_fn(g, v) if keep_fn is not None else pc.and_(
            pc.is_valid(v), pc.is_valid(g)
        )
        sub = pa.table({"g": g.filter(keep), "v": v.filter(keep)})
        sub = sub.append_column("v2", pc.multiply(sub["v"], sub["v"]))
        agg = sub.group_by("g").aggregate(
            [("v", "count"), ("v", "sum"), ("v2", "sum")]
        )
        return pa.table({
            "g": agg["g"],
            "n": pc.cast(agg["v_count"], pa.int64()),
            "s": agg["v_sum"],
            "ss": agg["v2_sum"],
        })

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("g")
        .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s"),
                   Sum("ss", alias_name="ss"))
        .take_all()
    )


def welch_ttest(ds, value_col: str, group_col: str, group_a, group_b):
    """Welch's unequal-variance t-test between two groups in ONE
    streaming pass of power-sum partials (n, sum, sum of squares per
    group); the Welch-Satterthwaite degrees of freedom finish in closed
    form on two rows. The variance is computed from the SAME power-sum
    algebra the SQL oracle uses ((ss - n*mean^2)/(n-1)), so both sides
    agree to summation-order rounding, far inside the 6-dp gate.

    Scale shape: per-block partials are 2 rows each; one narrow groupby
    folds them. The events never shuffle. Returns one row
    (n_a, n_b, mean_a, mean_b, t_stat, df) — or ZERO rows when either
    group has no values, matching the oracle's empty cross join."""

    def keep(g, v):
        return pc.and_(
            pc.is_valid(v),
            pc.or_(pc.equal(g, group_a), pc.equal(g, group_b)),
        )

    rows = _group_power_sums(ds, value_col, group_col, keep)
    stats = {r["g"]: r for r in rows}
    empty = pa.table({
        "n_a": pa.array([], pa.int64()),
        "n_b": pa.array([], pa.int64()),
        "mean_a": pa.array([], pa.float64()),
        "mean_b": pa.array([], pa.float64()),
        "t_stat": pa.array([], pa.float64()),
        "df": pa.array([], pa.float64()),
    })
    if group_a not in stats or group_b not in stats:
        return empty

    def _finish(r):
        n = int(r["n"])
        mean = r["s"] / n
        var = (r["ss"] - n * mean * mean) / (n - 1) if n > 1 else float("nan")
        return n, mean, var

    na, ma, va = _finish(stats[group_a])
    nb, mb, vb = _finish(stats[group_b])
    if na > 1 and nb > 1:
        se2 = va / na + vb / nb
        t = (ma - mb) / np.sqrt(se2)
        df = se2 * se2 / (
            (va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1)
        )
    else:
        t = df = float("nan")
    return pa.table({
        "n_a": pa.array([na], pa.int64()),
        "n_b": pa.array([nb], pa.int64()),
        "mean_a": pa.array([round(float(ma), 6)], pa.float64()),
        "mean_b": pa.array([round(float(mb), 6)], pa.float64()),
        "t_stat": pa.array([round(float(t), 6)], pa.float64()),
        "df": pa.array([round(float(df), 6)], pa.float64()),
    })


def anova_oneway(ds, value_col: str, group_col: str):
    """One-way ANOVA F across ALL groups from the same power-sum fold as
    :func:`welch_ttest` (shared :func:`_group_power_sums`): SSB = sum
    n_g*(mean_g - grand)^2, SSW = sum(ss_g - n_g*mean_g^2), F =
    (SSB/(k-1)) / (SSW/(n-k)). NULL values drop; NULL group keys drop
    (mirroring the SQL GROUP BY + WHERE filters). MEAN squares are
    emitted rather than raw sums of squares: they are O(variance)-scaled,
    so summation-order float noise stays far below the 6-dp compare gate
    at any row count. Returns one row (k, n, f_stat, ms_between,
    ms_within) — or ZERO rows for degenerate inputs (k < 2 or n <= k),
    matching the oracle's empty grouped cross join."""
    rows = _group_power_sums(ds, value_col, group_col)
    k = len(rows)
    n = int(sum(r["n"] for r in rows))
    if k < 2 or n <= k:
        return pa.table({
            "k": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
            "f_stat": pa.array([], pa.float64()),
            "ms_between": pa.array([], pa.float64()),
            "ms_within": pa.array([], pa.float64()),
        })
    grand = sum(r["s"] for r in rows) / n
    ssb = sum(
        r["n"] * (r["s"] / r["n"] - grand) ** 2 for r in rows
    )
    ssw = sum(
        r["ss"] - r["n"] * (r["s"] / r["n"]) ** 2 for r in rows
    )
    msb = ssb / (k - 1)
    msw = ssw / (n - k)
    f = msb / msw if msw > 0 else float("nan")
    return pa.table({
        "k": pa.array([k], pa.int64()),
        "n": pa.array([n], pa.int64()),
        "f_stat": pa.array([round(float(f), 6)], pa.float64()),
        "ms_between": pa.array([round(float(msb), 6)], pa.float64()),
        "ms_within": pa.array([round(float(msw), 6)], pa.float64()),
    })


def mutual_information(ds, a_col: str, b_col: str):
    """Mutual information (nats) between two categorical columns, plus
    Cramer's V from the same one-pass contingency fold — the pair of
    "how associated are these columns" gauges a profiler runs together.
    MI = sum c_ij/n * ln(n*c_ij / (r_i * c_j)) with exact int64 counts
    inside the log (the SQL oracle states the identical expression, so
    both sides round identically). Rows with a NULL on either side drop.

    Scale shape: per-block contingency partials (<= r*c rows per block),
    driver finish on the distinct-category grid. Returns one row:
    (n, mi_nats, h_a, h_b, cramers_v)."""

    def partial(t: pa.Table) -> pa.Table:
        a = t[a_col].combine_chunks()
        b = t[b_col].combine_chunks()
        keep = pc.and_(pc.is_valid(a), pc.is_valid(b))
        g = (
            pa.table({"a": a.filter(keep), "b": b.filter(keep)})
            .group_by(["a", "b"])
            .aggregate([([], "count_all")])
        )
        return pa.table({
            "a": g["a"], "b": g["b"],
            "n": pc.cast(g["count_all"], pa.int64()),
        })

    cells = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    if not cells:
        # zero rows, matching the oracle's empty grouped CTE chain
        return pa.table({
            "n": pa.array([], pa.int64()),
            "mi_nats": pa.array([], pa.float64()),
            "h_a": pa.array([], pa.float64()),
            "h_b": pa.array([], pa.float64()),
            "cramers_v": pa.array([], pa.float64()),
        })
    import pandas as pd

    df = pd.DataFrame(cells).groupby(["a", "b"], as_index=False)["n"].sum()
    piv = df.pivot(index="a", columns="b", values="n").fillna(0).to_numpy(
        dtype=np.float64
    )
    n = piv.sum()
    row = piv.sum(axis=1)
    col = piv.sum(axis=0)
    mask = piv > 0
    cij = piv[mask]
    outer = np.outer(row, col)[mask]
    mi = float((cij / n * np.log(n * cij / outer)).sum())

    def _ent(m):
        p = m[m > 0] / n
        return float(-(p * np.log(p)).sum())

    e = np.outer(row, col) / n
    emask = e > 0
    chi2 = float((((piv - e) ** 2)[emask] / e[emask]).sum())
    r_, c_ = piv.shape
    mindim = min(r_, c_) - 1
    v = float(np.sqrt(chi2 / (n * mindim))) if mindim > 0 else float("nan")
    return pa.table({
        "n": pa.array([int(n)], pa.int64()),
        "mi_nats": pa.array([round(mi, 6)], pa.float64()),
        "h_a": pa.array([round(_ent(row), 6)], pa.float64()),
        "h_b": pa.array([round(_ent(col), 6)], pa.float64()),
        "cramers_v": pa.array([round(v, 6)], pa.float64()),
    })


def theil_sen_daily(ds, ts_col: str):
    """Theil-Sen robust trend of the daily event-count series: the exact
    median of all pairwise slopes (c_j - c_i)/(d_j - d_i) over distinct
    days, plus the median-residual intercept — the outlier-proof "is
    volume growing" estimator. The daily series is calendar-bounded, so
    the O(days^2) pair set is driver-trivial while the events fold
    distributed; x is EPOCH DAYS so the SQL oracle can state the same
    arithmetic. Median of an even count = mean of the middle two
    (matching SQL quantile_cont). Returns one row:
    (n_days, slope_per_day, intercept)."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        ts = t[ts_col].combine_chunks()
        day = pc.cast(
            pc.cast(pc.floor_temporal(ts, unit="day"), pa.date32()),
            pa.int32(),
        )
        vc = day.drop_null().value_counts()
        return pa.table({
            "day": pc.cast(vc.field("values"), pa.int64()),
            "n": pc.cast(vc.field("counts"), pa.int64()),
        })

    rows = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("day")
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )
    if len(rows) < 2:
        return pa.table({
            "n_days": pa.array([len(rows)], pa.int64()),
            "slope_per_day": pa.array([float("nan")], pa.float64()),
            "intercept": pa.array([float("nan")], pa.float64()),
        })
    days = np.array(sorted(r["day"] for r in rows), dtype=np.float64)
    by = {r["day"]: r["n"] for r in rows}
    cnts = np.array([by[int(d)] for d in days], dtype=np.float64)
    i, j = np.triu_indices(len(days), k=1)
    slopes = (cnts[j] - cnts[i]) / (days[j] - days[i])
    slope = float(np.quantile(slopes, 0.5))  # linear-interp == quantile_cont
    intercept = float(np.quantile(cnts - slope * days, 0.5))
    return pa.table({
        "n_days": pa.array([len(days)], pa.int64()),
        "slope_per_day": pa.array([round(slope, 6)], pa.float64()),
        "intercept": pa.array([round(intercept, 6)], pa.float64()),
    })

def multi_regression(ds, y_col: str, x1_col: str, x2_col: str):
    """Two-predictor ordinary least squares, CENTERED two-pass form:
    pass 1 folds (n, Σx1, Σx2, Σy) for the means; pass 2 folds the five
    centered cross-moments Σ(x1-m1)², Σ(x2-m2)², Σ(x1-m1)(x2-m2),
    Σ(x1-m1)(y-my), Σ(x2-m2)(y-my), and the 2x2 normal equations solve
    in closed form (b0 = my - b1 m1 - b2 m2). Centering is the
    conditioning fix: raw power sums cancel ~8 leading digits at 1e6
    rows (measured: b2 off by 3e-6 vs the oracle at sf0.1) while
    centered moments agree to ~1e-12. The SQL oracle states the
    identical centered algebra. Rows with a NULL in any column drop.
    Returns one row (n, b0, b1, b2, r2) — or zero rows when singular or
    n < 4."""

    def keep_cols(t: pa.Table):
        y = pc.cast(t[y_col].combine_chunks(), pa.float64())
        x1 = pc.cast(t[x1_col].combine_chunks(), pa.float64())
        x2 = pc.cast(t[x2_col].combine_chunks(), pa.float64())
        keep = pc.and_(pc.and_(pc.is_valid(y), pc.is_valid(x1)),
                       pc.is_valid(x2))
        return (y.filter(keep).to_numpy(zero_copy_only=False),
                x1.filter(keep).to_numpy(zero_copy_only=False),
                x2.filter(keep).to_numpy(zero_copy_only=False))

    def mean_partial(t: pa.Table) -> pa.Table:
        yv, x1v, x2v = keep_cols(t)
        return pa.table({
            "n": pa.array([len(yv)], pa.int64()),
            "sx1": pa.array([x1v.sum()], pa.float64()),
            "sx2": pa.array([x2v.sum()], pa.float64()),
            "sy": pa.array([yv.sum()], pa.float64()),
        })

    rows = ds.map_batches(
        mean_partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()  # one row per block
    empty = pa.table({
        "n": pa.array([], pa.int64()),
        "b0": pa.array([], pa.float64()),
        "b1": pa.array([], pa.float64()),
        "b2": pa.array([], pa.float64()),
        "r2": pa.array([], pa.float64()),
    })
    n = int(sum(r["n"] for r in rows)) if rows else 0
    if n < 4:
        return empty
    m1 = float(sum(r["sx1"] for r in rows)) / n
    m2 = float(sum(r["sx2"] for r in rows)) / n
    my = float(sum(r["sy"] for r in rows)) / n

    def centered_partial(t: pa.Table) -> pa.Table:
        yv, x1v, x2v = keep_cols(t)
        d1, d2, dy = x1v - m1, x2v - m2, yv - my
        return pa.table({
            "s11": pa.array([(d1 * d1).sum()], pa.float64()),
            "s22": pa.array([(d2 * d2).sum()], pa.float64()),
            "s12": pa.array([(d1 * d2).sum()], pa.float64()),
            "s1y": pa.array([(d1 * dy).sum()], pa.float64()),
            "s2y": pa.array([(d2 * dy).sum()], pa.float64()),
            "syy": pa.array([(dy * dy).sum()], pa.float64()),
        })

    crows = ds.map_batches(
        centered_partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    s = {k: float(sum(r[k] for r in crows))
         for k in ("s11", "s22", "s12", "s1y", "s2y", "syy")}
    det = s["s11"] * s["s22"] - s["s12"] * s["s12"]
    if det == 0.0:
        return empty
    b1 = (s["s1y"] * s["s22"] - s["s2y"] * s["s12"]) / det
    b2 = (s["s2y"] * s["s11"] - s["s1y"] * s["s12"]) / det
    b0 = my - b1 * m1 - b2 * m2
    r2 = (b1 * s["s1y"] + b2 * s["s2y"]) / s["syy"] \
        if s["syy"] > 0 else float("nan")
    return pa.table({
        "n": pa.array([n], pa.int64()),
        "b0": pa.array([round(b0, 6)], pa.float64()),
        "b1": pa.array([round(b1, 6)], pa.float64()),
        "b2": pa.array([round(b2, 6)], pa.float64()),
        "r2": pa.array([round(r2, 6)], pa.float64()),
    })

def kaplan_meier_second_event(ds, user_col: str, ts_col: str,
                              id_col: str):
    """Kaplan-Meier survival curve of time-to-SECOND-event per user —
    the activation-latency curve ("how long until a user comes back"),
    with single-event users RIGHT-CENSORED at the observation end
    (global max ts). Durations bucket to whole hours so the curve is
    calendar-bounded. Returns one row per event time:
    (t_hours, n_risk, d_events, survival) with
    S(t) = prod_{t_i <= t} (1 - d_i / n_i); the terminal time where
    d = n_risk is set to survival 0 explicitly (both sides guard the
    ln(0), which SQL refuses to evaluate).

    Scale shape: per-block partials keep each user's two smallest
    (ts, id) pairs (<= 2 rows per user per block); a bucketed groupby
    finishes first/second per user; durations fold to distinct
    (hour, event) counts, so the driver finish is bounded by the
    calendar, never the user count."""
    from ray.data.aggregate import Sum
    from debezium_incubator_ray.hashing import stable_hash

    empty_out = pa.table({
        "t_hours": pa.array([], pa.int64()),
        "n_risk": pa.array([], pa.int64()),
        "d_events": pa.array([], pa.int64()),
        "survival": pa.array([], pa.float64()),
    })

    # observation end: one tiny scalar fold, kept in int64 MICROSECONDS
    # (Dataset.max would hand back a pandas Timestamp whose .value is
    # nanoseconds — a silent 1000x unit trap). Restricted to rows with a
    # valid user, mirroring the oracle's WHERE — a stray NULL-user row
    # with a later ts must not shift every censored duration.
    def _max_partial(t: pa.Table) -> pa.Table:
        ts = t[ts_col].combine_chunks().filter(pc.is_valid(
            t[user_col].combine_chunks()
        ))
        return pa.table({"m": pa.array(
            [pc.max(pc.cast(ts, pa.int64())).as_py()], pa.int64(),
        )})

    raw_max = ds.map_batches(
        _max_partial, batch_format="pyarrow", zero_copy_batch=True
    ).max("m")
    if raw_max is None:
        return empty_out
    end_us = int(raw_max)

    def two_smallest(t: pa.Table) -> pa.Table:
        sub = pa.table({
            "u": t[user_col], "ts": t[ts_col], "i": t[id_col],
        }).filter(pc.and_(pc.is_valid(t[user_col]),
                          pc.is_valid(t[ts_col])))
        idx = pc.sort_indices(sub, sort_keys=[
            ("u", "ascending"), ("ts", "ascending"), ("i", "ascending"),
        ])
        s = sub.take(idx)
        u = s["u"].combine_chunks().to_numpy(zero_copy_only=False)
        n = len(u)
        if n == 0:
            return pa.table({
                "u": pa.array([], sub["u"].type),
                "ts": pa.array([], sub["ts"].type),
                "i": pa.array([], sub["i"].type),
                "_b": pa.array([], pa.int32()),
            })
        new = np.ones(n, dtype=bool)
        new[1:] = u[1:] != u[:-1]
        starts = np.nonzero(new)[0]
        gid = np.cumsum(new) - 1
        rank = np.arange(n) - starts[gid]
        keep = rank < 2
        out = s.filter(pa.array(keep))
        b = (stable_hash(out["u"].combine_chunks())
             % np.uint64(64)).astype(np.int32)
        return out.append_column("_b", pa.array(b))

    def per_user_duration(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["_b"])
        idx = pc.sort_indices(g, sort_keys=[
            ("u", "ascending"), ("ts", "ascending"), ("i", "ascending"),
        ])
        s = g.take(idx)
        u = s["u"].combine_chunks().to_numpy(zero_copy_only=False)
        ts = s["ts"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )  # microseconds
        n = len(u)
        new = np.ones(n, dtype=bool)
        new[1:] = u[1:] != u[:-1]
        starts = np.nonzero(new)[0]
        sizes = np.diff(np.append(starts, n))
        t1 = ts[starts]
        has2 = sizes >= 2
        t2 = np.where(has2, ts[np.minimum(starts + 1, n - 1)], 0)
        dur_us = np.where(has2, t2 - t1, end_us - t1)
        hours = dur_us // (3600 * 1_000_000)
        vc = (
            pa.table({
                "t": pa.array(hours.astype(np.int64)),
                "e": pa.array(has2.astype(np.int64)),
                "one": pa.array(np.ones(len(hours), np.int64)),
            })
            .group_by(["t", "e"])
            .aggregate([("one", "sum")])
        )
        return pa.table({
            "t": vc["t"], "e": vc["e"],
            "c": pc.cast(vc["one_sum"], pa.int64()),
        })

    rows = (
        ds.map_batches(two_smallest, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("_b")
        .map_groups(per_user_duration, batch_format="pyarrow")
        .groupby(["t", "e"])
        .aggregate(Sum("c", alias_name="c"))
        .take_all()
    )  # distinct (hour, event-flag) rows — calendar-bounded
    if not rows:
        return empty_out
    import pandas as pd

    df = pd.DataFrame(rows)
    g = df.pivot_table(index="t", columns="e", values="c",
                       aggfunc="sum", fill_value=0).sort_index()
    d = g[1].to_numpy(np.int64) if 1 in g.columns else np.zeros(len(g), np.int64)
    c_all = g.sum(axis=1).to_numpy(np.int64)
    t = g.index.to_numpy(np.int64)
    n_risk = c_all[::-1].cumsum()[::-1]  # subjects with time >= t
    ev = d > 0
    te, de, ne = t[ev], d[ev], n_risk[ev]
    factor = np.where(de < ne, 1.0 - de / ne, 1.0)
    surv = np.exp(np.cumsum(np.log(factor)))
    dead = np.cumsum(de == ne) > 0  # terminal: everyone at risk departed
    surv = np.where(dead, 0.0, surv)
    return pa.table({
        "t_hours": pa.array(te),
        "n_risk": pa.array(ne),
        "d_events": pa.array(de),
        "survival": pa.array(np.round(surv, 6)),
    })


def brown_forsythe(ds, value_col: str, group_col: str):
    """Brown-Forsythe variance-homogeneity test: one-way ANOVA F computed
    on the absolute deviations from each group's MEDIAN — the robust
    Levene variant run before trusting a pooled-variance comparison.

    Two passes: exact per-group medians (percentile_cont interpolation,
    rounded to the shared 6-dp contract so engine and oracle transform
    identical deviations) collected once and broadcast; then the standard
    power-sum ANOVA fold over |x - med| (shared :func:`anova_oneway`
    conditioning: mean squares, not raw SS). NULL values and NULL group
    keys drop on both sides."""
    import ray
    from debezium_incubator_ray.functions.kernels import (
        collect_table, drop_null_nan,
    )
    from debezium_incubator_ray.functions.windows import quantiles_per_group

    # one NULL/NaN would poison a group's median (np.quantile propagates
    # NaN) — drop up front, mirroring the oracle's IS NOT NULL filters
    ds = ds.map_batches(
        lambda t: drop_null_nan(t, value_col),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    meds = collect_table(
        quantiles_per_group(ds, group_col=group_col, value_col=value_col,
                            qs=(0.5,))
    )
    med_tbl = pa.table({group_col: meds[group_col], "_med": meds["value"]})
    ref = ray.put(med_tbl)

    def absdev(t: pa.Table) -> pa.Table:
        d = ray.get(ref)
        j = t.select([group_col, value_col]).join(
            d, keys=[group_col], join_type="inner"
        )
        dev = pc.abs(pc.subtract(
            pc.cast(j[value_col], pa.float64()), j["_med"]
        ))
        return pa.table({group_col: j[group_col], "absdev": dev})

    tds = ds.map_batches(absdev, batch_format="pyarrow",
                         zero_copy_batch=True)
    return anova_oneway(tds, "absdev", group_col)


def _daily_value_sums(ds, ts_col: str, value_col: str):
    """(sorted day-ordinal array, per-day value sums) — the shared
    metadata-sized daily series the backtest/runs-test finishes consume.
    NULL/NaN values and NULL timestamps drop (SQL aggregate + GROUP BY
    filters)."""
    from ray.data.aggregate import Sum
    from debezium_incubator_ray.functions.kernels import drop_null_nan

    def partial(t: pa.Table) -> pa.Table:
        t = drop_null_nan(t, value_col)
        day = pc.cast(t[ts_col].combine_chunks(), pa.date32())
        d = pa.table({
            "day": day,
            "v": pc.cast(t[value_col], pa.float64()),
        }).filter(pc.is_valid(day))
        g = d.group_by("day").aggregate([("v", "sum")])
        return g.rename_columns(["day", "v"])

    rows = (
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("day")
        .aggregate(Sum("v", alias_name="v"))
        .take_all()
    )
    days = np.array([r["day"].toordinal() for r in rows])
    vals = np.array([r["v"] for r in rows], dtype=np.float64)
    order = np.argsort(days)
    return days[order], vals[order]


def seasonal_naive_backtest(ds, ts_col: str, value_col: str,
                            season: int = 7):
    """Seasonal-naive forecast backtest on the daily value-sum series:
    predict day d's total as day (d - season)'s total, score every day
    with both sides present — the baseline every forecasting pipeline
    must beat. Positions are in the day-ordered series of days that HAVE
    events (SQL LAG(v, season) OVER (ORDER BY day)). Returns one row:
    (n_scored, mae, rmse, smape) rounded to the 6-dp gate contract;
    metadata-sized driver finish over O(days)."""
    _days, vals = _daily_value_sums(ds, ts_col, value_col)
    if len(vals) <= season:
        return pa.table({
            "n_scored": pa.array([], pa.int64()),
            "mae": pa.array([], pa.float64()),
            "rmse": pa.array([], pa.float64()),
            "smape": pa.array([], pa.float64()),
        })
    actual, pred = vals[season:], vals[:-season]
    err = actual - pred
    mae = float(np.mean(np.abs(err)))
    rmse = float(np.sqrt(np.mean(err * err)))
    smape = float(np.mean(
        2.0 * np.abs(err) / (np.abs(actual) + np.abs(pred))
    ))
    return pa.table({
        "n_scored": pa.array([len(err)], pa.int64()),
        "mae": pa.array([round(mae, 6)], pa.float64()),
        "rmse": pa.array([round(rmse, 6)], pa.float64()),
        "smape": pa.array([round(smape, 6)], pa.float64()),
    })


def runs_test_daily(ds, ts_col: str, value_col: str):
    """Wald-Wolfowitz runs test on the SIGNS of day-over-day changes of
    the daily value-sum series — "is the series' direction random or
    trending/mean-reverting?". Zero changes drop (standard treatment).
    n_runs counts maximal same-sign stretches; z uses the exact
    two-category runs-test moments mu = 2*n1*n2/n + 1,
    var = (mu-1)(mu-2)/(n-1). Metadata-sized driver finish."""
    _days, vals = _daily_value_sums(ds, ts_col, value_col)
    diff = np.diff(vals)
    sign = np.sign(diff)
    sign = sign[sign != 0]
    n1 = int(np.sum(sign > 0))
    n2 = int(np.sum(sign < 0))
    n = n1 + n2
    if n1 == 0 or n2 == 0 or n < 3:
        return pa.table({
            "n_pos": pa.array([], pa.int64()),
            "n_neg": pa.array([], pa.int64()),
            "n_runs": pa.array([], pa.int64()),
            "z": pa.array([], pa.float64()),
        })
    runs = 1 + int(np.sum(sign[1:] != sign[:-1]))
    mu = 2.0 * n1 * n2 / n + 1.0
    var = (mu - 1.0) * (mu - 2.0) / (n - 1.0)
    z = (runs - mu) / np.sqrt(var)
    return pa.table({
        "n_pos": pa.array([n1], pa.int64()),
        "n_neg": pa.array([n2], pa.int64()),
        "n_runs": pa.array([runs], pa.int64()),
        "z": pa.array([round(float(z), 6)], pa.float64()),
    })


def hill_tail_index(ds, key_col: str, xmin: int = 20):
    """Hill estimator of the power-law tail index over per-key activity
    counts: alpha = 1 + k / sum(ln(n_i / xmin)) over keys with n_i >=
    xmin — the standard heavy-tail fit for web activity (Zipfian users,
    hot keys) that decides salting and caching policy.

    Scale shape: per-key counts fold from per-block partials through one
    narrow groupby; a second per-block partial reduces the count table to
    (k, sum_ln) pairs and only those reach the driver. Returns one row
    (n_tail, alpha), or zero rows when no key reaches xmin."""
    from ray.data.aggregate import Sum
    from debezium_incubator_ray.functions.kernels import collect_table

    def cnt_partial(t: pa.Table) -> pa.Table:
        vc = t[key_col].combine_chunks().drop_null().value_counts()
        return pa.table({
            key_col: vc.field("values"),
            "n": pc.cast(vc.field("counts"), pa.int64()),
        })

    counts = (
        ds.map_batches(cnt_partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby(key_col)
        .aggregate(Sum("n", alias_name="n"))
    )

    def tail_partial(t: pa.Table) -> pa.Table:
        n = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
        tail = n[n >= xmin].astype(np.float64)
        return pa.table({
            "k": pa.array([len(tail)], pa.int64()),
            "s": pa.array(
                [float(np.sum(np.log(tail / float(xmin))))], pa.float64()
            ),
        })

    parts = collect_table(
        counts.map_batches(tail_partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    )
    k = int(pc.sum(parts["k"]).as_py() or 0)
    if k == 0:
        return pa.table({
            "n_tail": pa.array([], pa.int64()),
            "alpha": pa.array([], pa.float64()),
        })
    s = float(pc.sum(parts["s"]).as_py())
    return pa.table({
        "n_tail": pa.array([k], pa.int64()),
        "alpha": pa.array([round(1.0 + k / s, 6)], pa.float64()),
    })


def lognormal_fit(ds, group_col: str, value_col: str):
    """Per-group lognormal fit of a positive size column (document
    lengths, payload bytes): mu/sigma of ln(value) via the shared
    power-sum fold, plus the fitted median exp(mu) — the length model
    behind chunking and batch-size policy. Rows with value <= 0 or NULL
    drop. sigma is the population stddev, algebraically conditioned as
    sqrt(max(ss/n - mu^2, 0)) and emitted rounded (the ln values are
    O(1), so the raw-sum form stays far inside the 6-dp gate)."""

    def derive(t: pa.Table) -> pa.Table:
        v = pc.cast(t[value_col].combine_chunks(), pa.float64())
        keep = pc.fill_null(pc.greater(v, 0.0), False)
        sub = pa.table({
            group_col: t[group_col].combine_chunks().filter(keep),
            "_lnv": pc.ln(v.filter(keep)),
        })
        return sub

    rows = _group_power_sums(
        ds.map_batches(derive, batch_format="pyarrow",
                       zero_copy_batch=True),
        "_lnv", group_col,
    )
    rows.sort(key=lambda r: r["g"])
    out = {"g": [], "n": [], "mu": [], "sigma": [], "fit_median": []}
    for r in rows:
        n, s, ss = int(r["n"]), float(r["s"]), float(r["ss"])
        if n == 0:
            continue
        mu = s / n
        var = max(ss / n - mu * mu, 0.0)
        out["g"].append(r["g"])
        out["n"].append(n)
        out["mu"].append(round(mu, 6))
        out["sigma"].append(round(float(np.sqrt(var)), 6))
        out["fit_median"].append(round(float(np.exp(mu)), 6))
    return pa.table({
        group_col: pa.array(out["g"]),
        "n": pa.array(out["n"], pa.int64()),
        "mu": pa.array(out["mu"], pa.float64()),
        "sigma": pa.array(out["sigma"], pa.float64()),
        "fit_median": pa.array(out["fit_median"], pa.float64()),
    })


def interarrival_burstiness(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    buckets: int = 64,
):
    """Per-key interarrival burstiness B = (sigma - mu) / (sigma + mu)
    over the gaps between consecutive event times — the standard
    burst-vs-Poisson gauge (B ~ -1 periodic, ~0 Poisson, -> 1 bursty;
    Goh & Barabasi 2008). Emits (key, n_gaps, mean_gap_s, burstiness);
    keys with < 2 timestamped events have no gaps and are excluded;
    all-zero gaps (every event at the same instant) yield NULL B.

    Shape: gaps need each key's full ordered history co-located — ONE
    bucketed shuffle on hash(key), then a vectorized in-bucket pass
    (sort by (key, ts), adjacent diffs masked at key boundaries,
    per-key two-pass moments via reduceat). Gaps are converted to
    SECONDS before the moment fold: dimensionless B and km-scale means
    keep float agreement with the SQL oracle well inside 6dp."""
    from debezium_incubator_ray.hashing import partition_ids

    def bucketed(t: pa.Table) -> pa.Table:
        d = t.select([key_col, ts_col]).filter(pc.is_valid(t[ts_col]))
        return d.append_column(
            "_b",
            pa.array(partition_ids(d[key_col], buckets, "hash"), pa.int32()),
        )

    def stats_in_bucket(g: pa.Table) -> pa.Table:
        d = g.drop_columns(["_b"])
        idx = pc.sort_indices(
            d, sort_keys=[(key_col, "ascending"), (ts_col, "ascending")]
        )
        s = d.take(idx)
        m = s.num_rows
        empty = pa.table({
            key_col: pa.array([], s[key_col].type),
            "n_gaps": pa.array([], pa.int64()),
            "mean_gap_s": pa.array([], pa.float64()),
            "burstiness": pa.array([], pa.float64()),
        })
        if m < 2:
            return empty
        k = s[key_col].combine_chunks().to_numpy(zero_copy_only=False)
        ts = pc.cast(
            pc.cast(s[ts_col].combine_chunks(), pa.timestamp("us")),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        same = k[1:] == k[:-1]
        gaps = (ts[1:] - ts[:-1])[same] / 1e6
        gk = k[1:][same]
        if len(gaps) == 0:
            return empty
        first = np.ones(len(gk), dtype=bool)
        first[1:] = gk[1:] != gk[:-1]
        starts = np.nonzero(first)[0]
        n = np.diff(np.append(starts, len(gk))).astype(np.float64)
        sums = np.add.reduceat(gaps, starts)
        mu = sums / n
        dev = gaps - np.repeat(mu, n.astype(np.int64))
        var = np.add.reduceat(dev * dev, starts) / n
        sd = np.sqrt(var)
        denom = sd + mu
        with np.errstate(invalid="ignore", divide="ignore"):
            b = np.where(denom > 0, (sd - mu) / denom, np.nan)
        return pa.table({
            key_col: pa.array(gk[starts]),
            "n_gaps": pa.array(n.astype(np.int64)),
            "mean_gap_s": pa.array(np.round(mu, 6)),
            "burstiness": pa.array(np.round(b, 6), pa.float64(),
                                   mask=np.isnan(b)),
        })

    return (
        ds.map_batches(bucketed, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_b")
        .map_groups(stats_in_bucket, batch_format="pyarrow")
    )


def holt_backtest(ds, ts_col: str, value_col: str,
                  alpha: float = 0.5, beta: float = 0.3):
    """Holt linear-trend one-step-ahead backtest on the daily value-sum
    series (the trend-aware step up from seasonal_naive_backtest):
    l_1 = y_1, b_1 = 0, and for each later day-with-events
    f_t = l_{t-1} + b_{t-1};  l_t = a*y_t + (1-a)*f_t;
    b_t = be*(l_t - l_{t-1}) + (1-be)*b_{t-1}.
    Emits one row per SCORED day (t >= 2): (day, y, forecast, err),
    each rounded to the 6-dp gate contract. The recursion is over the
    day-ordered series of days that HAVE events, O(days) driver-side
    after the distributed daily fold — the same bounded-finish shape as
    every *_daily operator here. The update algebra is parenthesized
    EXACTLY as the oracle's recursive CTE so the doubles agree term for
    term."""
    days, vals = _daily_value_sums(ds, ts_col, value_col)
    empty = pa.table({
        "day": pa.array([], pa.string()),
        "y": pa.array([], pa.float64()),
        "forecast": pa.array([], pa.float64()),
        "err": pa.array([], pa.float64()),
    })
    if len(vals) < 2:
        return empty
    import datetime

    out_day, out_y, out_f = [], [], []
    level = float(vals[0])
    trend = 0.0
    for t in range(1, len(vals)):
        y = float(vals[t])
        f = level + trend
        new_level = alpha * y + (1 - alpha) * f
        trend = beta * (new_level - level) + (1 - beta) * trend
        level = new_level
        out_day.append(str(datetime.date.fromordinal(int(days[t]))))
        out_y.append(y)
        out_f.append(f)
    y_arr = np.array(out_y)
    f_arr = np.array(out_f)
    return pa.table({
        "day": pa.array(out_day, pa.string()),
        "y": pa.array(np.round(y_arr, 6), pa.float64()),
        "forecast": pa.array(np.round(f_arr, 6), pa.float64()),
        "err": pa.array(np.round(y_arr - f_arr, 6), pa.float64()),
    })
