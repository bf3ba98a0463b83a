"""Event-time grouping operators Ray Data lacks natively: gap-based
session windows and grouped top-k.

Both follow the engine's standard shuffle shape — ONE bucketed groupby
with a vectorized numpy kernel inside map_groups; the partitioning
assumption is hash(key), same as the lake. (Tumbling windows live in
__ray_entry__.windowed_agg as the partial-agg pattern; sessions can't
pre-aggregate across batch boundaries — a session may span any number of
batches — so they co-locate per key instead.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def sessionize(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap_us: int = 30 * 60 * 1_000_000,
    buckets: int = 64,
):
    """Gap-based sessionization: per key, consecutive events closer than
    ``gap_us`` belong to one session. Emits one row per session:
    (key, session_start, session_end, n_events, sum_value-rounded).

    Session boundaries depend only on the per-key sorted timestamp
    sequence, so the result is deterministic under any arrival order. The
    whole per-bucket computation is one lexsort + boundary masks +
    np.add.reduceat — no per-session loop."""

    def add_bucket(t: pa.Table) -> pa.Table:
        ids = t[key_col].combine_chunks().to_numpy(zero_copy_only=False)
        b = (ids.astype(np.uint64) % np.uint64(buckets)).astype(np.int32)
        return t.append_column("_bucket", pa.array(b))

    def sessions(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group, sort_keys=[(key_col, "ascending"), (ts_col, "ascending")]
        )
        s = group.take(idx)
        k = s[key_col].combine_chunks().to_numpy()
        ts = s[ts_col].combine_chunks().to_numpy().view(np.int64)
        v = s[value_col].combine_chunks().to_numpy()
        n = len(k)
        if n == 0:
            return pa.table(
                {
                    key_col: pa.array([], pa.int64()),
                    "session_start": pa.array([], pa.timestamp("us")),
                    "session_end": pa.array([], pa.timestamp("us")),
                    "n_events": pa.array([], pa.int64()),
                    "sum_value": pa.array([], pa.float64()),
                }
            )
        new = np.ones(n, dtype=bool)
        new[1:] = (k[1:] != k[:-1]) | ((ts[1:] - ts[:-1]) > gap_us)
        starts = np.nonzero(new)[0]
        ends = np.append(starts[1:], n) - 1
        counts = np.diff(np.append(starts, n))
        sums = np.add.reduceat(v, starts)
        return pa.table(
            {
                key_col: pa.array(k[starts]),
                "session_start": pa.array(ts[starts]).cast(pa.timestamp("us")),
                "session_end": pa.array(ts[ends]).cast(pa.timestamp("us")),
                "n_events": pa.array(counts.astype(np.int64)),
                # float sums are order-dependent; stabilize like the other
                # aggregate oracles
                "sum_value": pa.array(np.round(sums, 3)),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_bucket")
        .map_groups(sessions, batch_format="pyarrow")
    )


def topk_per_group(
    ds,
    group_col: str = "event_type",
    order_col: str = "value",
    id_col: str = "event_id",
    k: int = 5,
    buckets: int | None = None,
):
    """Top-k rows per group by ``order_col`` DESC, ties broken by
    ``id_col`` ASC — deterministic, rank 1-based.

    Two-level: a per-batch partial top-k (only k rows per (batch, group)
    survive — the combiner, so the shuffle carries at most
    k x groups x blocks rows regardless of input size), then a final
    per-group cut. With ``buckets=None`` the group value itself is the
    shuffle key (small group cardinality); pass ``buckets=N`` for
    HIGH-cardinality groups (per-user top-k) — groups then shuffle by
    hash(group) % N so the reduce runs per bounded bucket, never per
    key, and the output is identical."""
    from debezium_incubator_ray.hashing import partition_ids

    def ranked(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t,
            sort_keys=[
                (group_col, "ascending"),
                (order_col, "descending"),
                (id_col, "ascending"),
            ],
        )
        s = t.take(idx)
        garr = s[group_col].combine_chunks().to_numpy(zero_copy_only=False)
        n = len(garr)
        first = np.ones(n, dtype=bool)
        first[1:] = garr[1:] != garr[:-1]
        gidx = np.cumsum(first) - 1
        starts = np.nonzero(first)[0]
        rank = np.arange(n) - starts[gidx]
        return s, rank

    def partial_topk(t: pa.Table) -> pa.Table:
        s, rank = ranked(t)
        s = s.filter(pa.array(rank < k))
        if buckets is not None:
            s = s.append_column(
                "_b",
                pa.array(partition_ids(s[group_col].combine_chunks(),
                                       buckets, "hash"), pa.int32()),
            )
        return s

    partials = ds.map_batches(
        partial_topk, batch_format="pyarrow", zero_copy_batch=True
    )

    def final_topk(group: pa.Table) -> pa.Table:
        if buckets is not None:
            group = group.drop_columns(["_b"])
        s, rank = ranked(group)
        keep = rank < k
        return s.filter(pa.array(keep)).append_column(
            "rank", pa.array(rank[keep] + 1)
        )

    key = group_col if buckets is None else "_b"
    return partials.groupby(key).map_groups(
        final_topk, batch_format="pyarrow"
    )


def quantiles_per_group(
    ds,
    group_col: str = "event_type",
    value_col: str = "value",
    qs: tuple = (0.5, 0.9, 0.99),
):
    """Exact per-group quantiles (linear interpolation between order
    statistics — numpy 'linear' == SQL percentile_cont). One groupby on
    the group key; each group sorts its values once and reads all
    requested quantiles from the same sorted array.

    Scale note: this is the exact path for modest group cardinality /
    group sizes that fit a task. At 100 TB per-group, swap the in-group
    sort for a mergeable sketch (t-digest / KLL) built per batch and
    merged in the same groupby — the pipeline shape is identical, the
    answer becomes approximate."""

    def f(group: pa.Table) -> pa.Table:
        v = np.sort(group[value_col].combine_chunks().to_numpy(zero_copy_only=False))
        out = {group_col: pa.array([group[group_col][0].as_py()] * len(qs))}
        out["q"] = pa.array(list(qs), pa.float64())
        out["value"] = pa.array(
            np.round(np.quantile(v, list(qs), method="linear"), 6)
        )
        return pa.table(out)

    return ds.groupby(group_col).map_groups(f, batch_format="pyarrow")


def hopping_agg(
    ds,
    hop_us: int,
    n_hops: int,
    group_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
):
    """Hopping (sliding) window aggregate: window size = n_hops × hop;
    every event contributes to the ``n_hops`` windows covering it. The
    fan-out happens INSIDE the partial aggregate (per (window, group) sums
    per batch), so the shuffle carries |windows × groups| rows per block,
    never n_hops copies of the events — the combiner discipline for
    overlapping windows. Output: one row per (window, group) with
    total_value and n; ``window`` is the hop index of the window START."""
    import numpy as np
    from ray.data.aggregate import Count, Sum

    def partial(t: pa.Table) -> pa.Table:
        # null-preserving arithmetic: a null ts yields a null window key,
        # which Arrow group_by keeps as its own group — exactly SQL's
        # GROUP BY semantics (pandas groupby would silently DROP it)
        us = pc.cast(t[ts_col].combine_chunks(), pa.int64())
        k = pc.divide(us, pa.scalar(hop_us, pa.int64()))
        outs = []
        for off in range(n_hops):
            outs.append(
                pa.table(
                    {
                        "window": pc.subtract(k, pa.scalar(off, pa.int64())),
                        group_col: t[group_col],
                        value_col: t[value_col],
                    }
                )
            )
        both = pa.concat_tables(outs)
        # in-batch partial aggregate (pure Arrow, no pandas round trip):
        # shuffle width = windows × groups, never n_hops event copies
        agg = both.group_by(["window", group_col]).aggregate(
            [(value_col, "sum"), ([], "count_all")]
        )
        return agg.rename_columns(
            ["window", group_col, "_sum", "_n"]
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    out = partials.groupby(["window", group_col]).aggregate(
        Sum("_sum", alias_name="total_value"), Sum("_n", alias_name="n")
    )

    def stabilize(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.schema.get_field_index("total_value"),
            "total_value",
            pc.round(t["total_value"], ndigits=3),
        )

    return out.map_batches(stabilize, batch_format="pyarrow", zero_copy_batch=True)


def funnel_users(
    ds,
    first_type: str,
    then_type: str,
    user_col: str = "user_id",
    type_col: str = "event_type",
    order_col: str = "event_id",
):
    """Two-step behavioral funnel: users with a ``then_type`` event
    STRICTLY AFTER some ``first_type`` event (by ``order_col``).

    The predicate decomposes into min/max partials — exists(then after
    first) ⇔ max(order | then) > min(order | first) — so each batch
    contributes one (user, min_first, max_then) row, the narrow partial
    stream shuffles once by user, and the final compare is vectorized.
    Shuffle volume is per-user-per-block, never per-event."""
    from ray.data.aggregate import Max, Min

    def partial(t: pa.Table) -> pa.Table:
        # placeholder/null columns carry the INPUT's types so blocks with
        # only one event type still unify (user_col may be a string —
        # nothing here assumes int64 ids). Temporal order columns go
        # through their int64 image: only the ORDER matters (the output is
        # user ids), and Ray's Min/Max reduce mishandles nullable
        # timestamp columns
        u_t = t.schema.field(user_col).type
        o_raw = t.schema.field(order_col).type
        temporal = pa.types.is_temporal(o_raw)
        o_t = pa.int64() if temporal else o_raw
        typ = t[type_col].combine_chunks()
        if temporal:
            t = t.set_column(
                t.schema.get_field_index(order_col), order_col,
                pc.cast(t[order_col].combine_chunks(), pa.int64()),
            )
        out = []
        for want, agg, name in (
            (first_type, "min", "first_o"),
            (then_type, "max", "then_o"),
        ):
            sel = t.filter(pc.equal(typ, want))
            if sel.num_rows == 0:
                continue
            g = sel.group_by(user_col).aggregate([(order_col, agg)])
            out.append(pa.table({
                user_col: g[user_col],
                "first_o": g[f"{order_col}_{agg}"]
                if name == "first_o" else pa.nulls(len(g), o_t),
                "then_o": g[f"{order_col}_{agg}"]
                if name == "then_o" else pa.nulls(len(g), o_t),
            }))
        if not out:
            return pa.table({
                user_col: pa.array([], u_t),
                "first_o": pa.array([], o_t),
                "then_o": pa.array([], o_t),
            })
        return pa.concat_tables(out)

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    folded = partials.groupby(user_col).aggregate(
        Min("first_o", alias_name="first_o", ignore_nulls=True),
        Max("then_o", alias_name="then_o", ignore_nulls=True),
    )

    def finish(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(pc.is_valid(t["first_o"]), pc.is_valid(t["then_o"])),
            pc.greater(t["then_o"], t["first_o"]),
        )
        keep = pc.fill_null(keep, False)
        return t.filter(keep).select([user_col])

    return folded.map_batches(finish, batch_format="pyarrow")


def running_total(
    ds,
    key_col: str = "user_id",
    order_col: str = "event_id",
    value_col: str = "value",
    buckets: int = 64,
):
    """Per-key running cumulative sum ordered by ``order_col`` — the
    `SUM(v) OVER (PARTITION BY key ORDER BY o ROWS UNBOUNDED PRECEDING)`
    window function Ray Data has no native operator for.

    Shape: hash-bucket the key, one groupby, then a segmented cumsum per
    bucket (lexsort + np.cumsum with per-key offsets — no per-row loop).
    Emits every input row plus ``run_total`` (rounded 3dp: float cumsums
    are sequential in both engines but the last bit can differ)."""

    def add_bucket(t: pa.Table) -> pa.Table:
        t = t.select([key_col, order_col, value_col])
        ids = t[key_col].combine_chunks().to_numpy(zero_copy_only=False)
        b = (ids.astype(np.uint64) % np.uint64(buckets)).astype(np.int32)
        return t.append_column("_bucket", pa.array(b))

    def cum(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group, sort_keys=[(key_col, "ascending"), (order_col, "ascending")]
        )
        s = group.take(idx)
        k = s[key_col].combine_chunks().to_numpy()
        v = s[value_col].combine_chunks().to_numpy(zero_copy_only=False)
        n = len(k)
        if n == 0:
            return pa.table({
                key_col: pa.array([], pa.int64()),
                order_col: pa.array([], pa.int64()),
                value_col: pa.array([], pa.float64()),
                "run_total": pa.array([], pa.float64()),
            })
        first = np.ones(n, dtype=bool)
        first[1:] = k[1:] != k[:-1]
        cs = np.cumsum(v)
        # subtract the cumsum just before each key's first row
        starts = np.nonzero(first)[0]
        base = np.zeros(len(starts))
        base[1:] = cs[starts[1:] - 1]
        run = cs - np.repeat(base, np.diff(np.append(starts, n)))
        return pa.table({
            key_col: s[key_col],
            order_col: s[order_col],
            value_col: s[value_col],
            "run_total": pa.array(np.round(run, 3)),
        })

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_bucket")
        .map_groups(cum, batch_format="pyarrow")
    )


def zscore_outliers(
    ds,
    group_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    threshold: float = 3.0,
):
    """Per-group z-score outlier detection: rows with
    |v - mean| / stddev_pop > threshold for their group.

    Two passes in the decomposable-moments pattern: (1) per-batch partial
    (n, sum, sum-of-squares) per group folds through one tiny groupby —
    only #groups rows ever reach the driver; (2) the (mean, std) table
    broadcasts into a second streaming filter pass. No sort, no wide
    shuffle; the input streams twice."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        g = t[group_col].combine_chunks()
        v = t[value_col].combine_chunks().to_numpy(zero_copy_only=False)
        enc = g.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        cats = enc.dictionary
        ng = len(cats)
        n = np.bincount(codes, minlength=ng).astype(np.float64)
        s1 = np.bincount(codes, weights=v, minlength=ng)
        s2 = np.bincount(codes, weights=v * v, minlength=ng)
        return pa.table({
            group_col: cats,
            "_n": pa.array(n), "_s1": pa.array(s1), "_s2": pa.array(s2),
        })

    moments = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(group_col)
        .aggregate(Sum("_n", alias_name="n"), Sum("_s1", alias_name="s1"),
                   Sum("_s2", alias_name="s2"))
        .take_all()
    )
    stats = {}
    for r in moments:
        mean = r["s1"] / r["n"]
        var = max(r["s2"] / r["n"] - mean * mean, 0.0)
        stats[r[group_col]] = (mean, var ** 0.5)

    def flag(t: pa.Table) -> pa.Table:
        v = t[value_col].combine_chunks().to_numpy(zero_copy_only=False)
        # vectorized lookup: dictionary-encode the group column once
        enc = t[group_col].combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        cats = enc.dictionary.to_pylist()
        mu = np.array([stats[c][0] for c in cats])[codes]
        sd = np.array([stats[c][1] for c in cats])[codes]
        with np.errstate(divide="ignore", invalid="ignore"):
            z = np.where(sd > 0, (v - mu) / sd, 0.0)
        keep = np.abs(z) > threshold
        out = t.select([id_col, group_col, value_col]).filter(pa.array(keep))
        return out.append_column("z", pa.array(np.round(z[keep], 3)))

    return ds.map_batches(flag, batch_format="pyarrow", zero_copy_batch=True)


def retention_cohorts(
    ds,
    user_col: str = "user_id",
    ts_col: str = "ts",
    week_fmt: str = "%Y-%m-%d",
):
    """Cohort retention matrix: users are cohorted by the week of their
    first activity; each (cohort_week, week) cell counts the distinct
    cohort members active that week.

    Decomposition: batches pre-reduce to DISTINCT (user, week) pairs (the
    combiner — shuffle volume is active-user-weeks per block, never
    events), ONE shuffle routes each user's pairs to a bounded HASH BUCKET
    (not one Python group per user — the map_groups UDF runs once per
    group, so groups must be O(buckets), the dedup.py bucketing pattern);
    within a bucket the cohort = min(week) per user joins back via Arrow
    kernels, emitting one (cohort, week) row per user-week, so the final
    tiny multi-key groupby count IS the distinct-user count. Weeks travel
    as ISO 'YYYY-MM-DD' strings (Monday-start, both Arrow and the oracle's
    date_trunc('week')), which also makes MIN() the calendar min."""
    from debezium_incubator_ray.hashing import partition_ids

    def pairs(t: pa.Table) -> pa.Table:
        wk = pc.strftime(
            pc.floor_temporal(
                t[ts_col].combine_chunks(), unit="week",
                week_starts_monday=True,
            ),
            format=week_fmt,
        )
        tb = pa.table({user_col: t[user_col].combine_chunks(), "week": wk})
        tb = tb.group_by([user_col, "week"]).aggregate([])
        return tb.append_column(
            "_b", pa.array(partition_ids(tb[user_col], 64, "hash"),
                           pa.int32()),
        )

    def per_bucket(g: pa.Table) -> pa.Table:
        d = g.drop_columns(["_b"]).group_by([user_col, "week"]).aggregate([])
        cohort = d.group_by([user_col]).aggregate([("week", "min")])
        pos = pc.index_in(d[user_col], value_set=cohort[user_col].combine_chunks())
        return pa.table({
            "cohort_week": cohort["week_min"].take(pos),
            "week": d["week"],
        })

    cells = (
        ds.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_b")
        .map_groups(per_bucket, batch_format="pyarrow")
        .groupby(["cohort_week", "week"])
        .count()
    )
    return cells.map_batches(
        lambda t: t.rename_columns(["cohort_week", "week", "n_users"]),
        batch_format="pyarrow",
    )


def pivot_counts(
    ds,
    key_col: str = "user_id",
    type_col: str = "event_type",
    types=None,
    prefix: str = "n_",
):
    """Pivot a categorical column into per-key count columns (one row per
    key, one ``prefix<type>`` column per category) — the wide activity
    profile a feature store derives from an event stream.

    Per batch, an Arrow (key, type) group-count pivots locally into the
    wide layout (numpy scatter), so the ONE shuffle moves per-key-per-block
    rows with small int64 columns; a groupby-sum finishes. ``types`` may be
    given explicitly (the schema contract); otherwise one tiny distinct
    pre-pass derives it (per-batch distinct, driver union — O(categories)).
    The category table is a few strings, so it ships in the task closure —
    no ray.put broadcast needed (and an ObjectRef captured in an
    actor-pool class closure can deadlock actor construction on this Ray
    version; see ray-project/ray#53727)."""
    if types is None:
        seen = set()
        parts = ds.map_batches(
            lambda t: t.select([type_col]).group_by([type_col]).aggregate([]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        for b in parts.iter_batches(batch_format="pyarrow"):
            seen.update(v for v in b[type_col].to_pylist() if v is not None)
        types = sorted(seen)
    types = list(types)
    cols = [prefix + str(v) for v in types]
    pos = {v: i for i, v in enumerate(types)}

    def wide_partial(t: pa.Table) -> pa.Table:
        g = (
            t.select([key_col, type_col])
            .group_by([key_col, type_col])
            .aggregate([([], "count_all")])
        )
        keys = g[key_col].combine_chunks()
        kd = pc.dictionary_encode(keys)
        uk = kd.dictionary
        ki = kd.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        tv = g[type_col].to_pylist()
        cnt = g["count_all"].to_numpy(zero_copy_only=False).astype(np.int64)
        wide = np.zeros((len(uk), len(cols)), dtype=np.int64)
        for r, v in enumerate(tv):
            c = pos.get(v)
            if c is not None:
                wide[ki[r], c] += cnt[r]
        out = {key_col: uk}
        for c, name in enumerate(cols):
            out[name] = pa.array(wide[:, c])
        return pa.table(out)

    summed = (
        ds.map_batches(
            wide_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby(key_col)
        .sum(cols)
    )
    return summed.map_batches(
        lambda t: t.rename_columns([key_col] + cols),
        batch_format="pyarrow",
    )


def markov_transitions(
    ds,
    key_col: str = "user_id",
    type_col: str = "event_type",
    order_col: str = "event_id",
    buckets: int = 64,
):
    """Global (prev_type, next_type) transition counts over each key's
    event sequence in ``order_col`` order — the Markov-chain / next-event
    counting primitive behind behavioral models. Exactly
    sequence_ngram_counts with n=2 (one kernel, pinned by pytest) under
    the historical (prev_type, next_type) column names."""
    out = sequence_ngram_counts(
        ds, key_col=key_col, type_col=type_col, order_col=order_col,
        n=2, buckets=buckets,
    )
    return out.map_batches(
        lambda t: t.rename_columns(["prev_type", "next_type", "cnt"]),
        batch_format="pyarrow",
    )


def sequence_ngram_counts(
    ds,
    key_col: str = "user_id",
    type_col: str = "event_type",
    order_col: str = "event_id",
    n: int = 3,
    buckets: int = 64,
    k: int | None = None,
):
    """Counts of length-``n`` consecutive type sequences within each
    key's ordered event stream — the sequence-mining generalization of
    markov_transitions (n=2): "what are the most common 3-step paths"
    behind funnel discovery and prefetch models.

    Same shape as markov_transitions: ONE bucketed shuffle co-locates
    each key's history; a vectorized in-bucket pass (sort by (key,
    order), n-1 shifted same-key masks ANDed, n sliced type columns)
    pre-reduces to the bucket's sequence counts; the final groupby folds
    at most #buckets x |types|^n tiny rows. ``k`` keeps only the top-k
    sequences (count desc, then types asc) — the fold output is
    |types|^n rows, so the cut is a driver-side finish."""
    from debezium_incubator_ray.hashing import partition_ids

    cols = [f"t{i}" for i in range(n)]

    def bucketed(t: pa.Table) -> pa.Table:
        d = t.select([key_col, type_col, order_col])
        return d.append_column(
            "_b",
            pa.array(partition_ids(d[key_col], buckets, "hash"), pa.int32()),
        )

    def ngrams_in_bucket(g: pa.Table) -> pa.Table:
        d = g.drop_columns(["_b"])
        idx = pc.sort_indices(
            d, sort_keys=[(key_col, "ascending"), (order_col, "ascending")]
        )
        s = d.take(idx)
        m = s.num_rows
        ty = s[type_col].combine_chunks()
        if m < n:
            return pa.table(
                {c: pa.array([], ty.type) for c in cols}
                | {"cnt": pa.array([], pa.int64())}
            )
        kk = s[key_col].combine_chunks()
        # fill_null(False): a null key equals nothing, so windows touching
        # it drop — the same degrade markov_transitions' Arrow filter has
        same = pc.fill_null(
            pc.equal(kk.slice(1), kk.slice(0, m - 1)), False
        ).to_numpy(zero_copy_only=False).astype(bool)
        # window i..i+n-1 valid iff all n-1 adjacent pairs share the key
        valid = np.ones(m - n + 1, dtype=bool)
        for j in range(n - 1):
            valid &= same[j : j + m - n + 1]
        vmask = pa.array(valid)
        tb = pa.table({
            cols[j]: ty.slice(j, m - n + 1).filter(vmask) for j in range(n)
        })
        g2 = tb.group_by(cols).aggregate([([], "count_all")])
        out = {c: g2[c] for c in cols}
        out["cnt"] = pc.cast(g2["count_all"], pa.int64())
        return pa.table(out)

    folded = (
        ds.map_batches(bucketed, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_b")
        .map_groups(ngrams_in_bucket, batch_format="pyarrow")
        .groupby(cols)  # |types|^n rows — tiny
        .sum("cnt")
    )
    renamed = folded.map_batches(
        lambda t: t.rename_columns(cols + ["cnt"]),
        batch_format="pyarrow",
    )
    if k is None:
        return renamed
    from debezium_incubator_ray.functions.kernels import collect_table

    tbl = collect_table(renamed, empty=pa.table(
        {c: pa.array([], pa.string()) for c in cols}
        | {"cnt": pa.array([], pa.int64())}
    ))
    # canonical schema either way (empty fallback vs data-bearing blocks)
    tbl = tbl.cast(pa.schema(
        [pa.field(c, pa.large_string()) for c in cols]
        + [pa.field("cnt", pa.int64())]
    ))
    idx = pc.sort_indices(
        tbl, sort_keys=[("cnt", "descending")] + [(c, "ascending") for c in cols]
    )
    top = tbl.take(idx[:k])
    return top.append_column(
        "rank", pa.array(np.arange(1, top.num_rows + 1, dtype=np.int64))
    )


def peak_window_avg(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    value_col: str = "value",
    window: int = 3,
    buckets: int = 64,
):
    """Per-key PEAK moving average: the maximum of
    ``AVG(v) OVER (PARTITION BY key ORDER BY ts, order
    ROWS BETWEEN window-1 PRECEDING AND CURRENT ROW)`` — the "hottest
    w-event stretch" primitive (burst detection / peak spend windows),
    reduced to one row per key so the wide per-event window output never
    leaves the tasks.

    Shape (same as :func:`running_total`): ONE bucketed shuffle on
    hash(key) co-locates each key's history; in-bucket a single lexsort +
    cumulative sums give every row's frame sum/count (frames shorter than
    ``window`` at a key's start average over the available rows — SQL
    frame semantics), and np.maximum.reduceat takes the per-key max. NULL
    values are excluded from frame averages (SQL AVG); a key whose every
    frame is all-NULL emits peak_avg NULL."""
    from debezium_incubator_ray.hashing import partition_ids

    def add_bucket(t: pa.Table) -> pa.Table:
        d = t.select([key_col, ts_col, order_col, value_col])
        return d.append_column(
            "_b",
            pa.array(partition_ids(d[key_col], buckets, "hash"), pa.int32()),
        )

    key_t = ds.schema().base_schema.field(key_col).type

    def peak(g: pa.Table) -> pa.Table:
        d = g.drop_columns(["_b"])
        idx = pc.sort_indices(
            d,
            sort_keys=[
                (key_col, "ascending"),
                (ts_col, "ascending"),
                (order_col, "ascending"),
            ],
        )
        s = d.take(idx)
        n = s.num_rows
        if n == 0:
            return pa.table({
                key_col: pa.array([], key_t),
                "peak_avg": pa.array([], pa.float64()),
            })
        k = s[key_col].combine_chunks()
        vcol = s[value_col].combine_chunks()
        v = vcol.to_numpy(zero_copy_only=False).astype(np.float64)
        valid = ~np.isnan(v) if vcol.null_count or np.isnan(v).any() else None
        first = np.ones(n, dtype=bool)
        first[1:] = ~pc.equal(k.slice(1), k.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
        starts = np.nonzero(first)[0]
        gidx = np.cumsum(first) - 1
        pos = np.arange(n) - starts[gidx]
        lo = np.arange(n) - np.minimum(pos, window - 1)
        if valid is None:
            cs = np.cumsum(v)
            fsum = cs - np.where(lo > 0, cs[np.maximum(lo - 1, 0)], 0.0)
            fcnt = np.arange(n) - lo + 1.0
        else:
            cs = np.cumsum(np.where(valid, v, 0.0))
            cn = np.cumsum(valid.astype(np.float64))
            base = np.where(lo > 0, cs[np.maximum(lo - 1, 0)], 0.0)
            fsum = cs - base
            fcnt = cn - np.where(lo > 0, cn[np.maximum(lo - 1, 0)], 0.0)
        with np.errstate(invalid="ignore", divide="ignore"):
            avg = np.where(fcnt > 0, fsum / np.maximum(fcnt, 1.0), -np.inf)
        peaks = np.maximum.reduceat(avg, starts)
        out_v = np.round(peaks, 3)
        mask = np.isfinite(peaks)
        return pa.table({
            key_col: k.filter(pa.array(first)),
            "peak_avg": pa.array(
                np.where(mask, out_v, np.nan), mask=~mask
            ),
        })

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_b")
        .map_groups(peak, batch_format="pyarrow")
    )


def argmax_rows(
    ds,
    key_col: str = "user_id",
    value_col: str = "value",
    id_col: str = "event_id",
    buckets: int = 64,
):
    """All rows achieving their key's maximum ``value_col`` — the
    ``QUALIFY value = MAX(value) OVER (PARTITION BY key)`` argmax-with-ties
    window predicate. Unlike topk_per_group (k rows, rank order) this keeps
    EVERY tied row and no rank column.

    ONE bucketed shuffle of the narrow (key, id, value) projection; in each
    bucket an Arrow group-max joins back via index_in and an equality
    filter — NULL values never match (SQL semantics: a key with all-NULL
    values emits nothing). A per-batch pre-filter (drop rows below their
    key's in-batch max) acts as the combiner so the shuffle carries at
    most the per-block argmax candidates, not every event."""
    from debezium_incubator_ray.hashing import partition_ids

    def _keep_batch_max(d: pa.Table) -> pa.Table:
        m = d.group_by(key_col).aggregate([(value_col, "max")])
        pos = pc.index_in(d[key_col], value_set=m[key_col].combine_chunks())
        mx = m[f"{value_col}_max"].combine_chunks().take(pos)
        keep = pc.fill_null(pc.equal(d[value_col], mx), False)
        return d.filter(keep)

    def partial(t: pa.Table) -> pa.Table:
        d = _keep_batch_max(t.select([key_col, id_col, value_col]))
        return d.append_column(
            "_b",
            pa.array(partition_ids(d[key_col], buckets, "hash"), pa.int32()),
        )

    def final(g: pa.Table) -> pa.Table:
        return _keep_batch_max(g.drop_columns(["_b"]))

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_b")
        .map_groups(final, batch_format="pyarrow")
    )


def lag_gap_stats(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    buckets: int = 64,
):
    """Per-key inter-event gap statistics — the LAG() window primitive
    (SQL: ts - LAG(ts) OVER (PARTITION BY key ORDER BY order)) reduced to
    per-key (n_gaps, sum_gap_us, max_gap_us). All-integer outputs, so the
    result is exact at any parallelism.

    Same shape as :func:`markov_transitions`: ONE bucketed shuffle on
    hash(key) co-locates each key's full history, then a single vectorized
    in-bucket pass (sort by (key, order), adjacent diff on the int64
    microsecond timeline, key-boundary mask, Arrow group-aggregate) emits
    the FINAL per-key rows — a key lives in exactly one bucket, so no
    second fold is needed. Keys with fewer than two events emit nothing
    (matching SQL's WHERE prev IS NOT NULL)."""
    from debezium_incubator_ray.hashing import partition_ids

    def bucketed(t: pa.Table) -> pa.Table:
        d = t.select([key_col, ts_col, order_col])
        return d.append_column(
            "_b",
            pa.array(partition_ids(d[key_col], buckets, "hash"), pa.int32()),
        )

    key_t = ds.schema().base_schema.field(key_col).type

    def gaps_in_bucket(g: pa.Table) -> pa.Table:
        d = g.drop_columns(["_b"])
        idx = pc.sort_indices(
            d, sort_keys=[(key_col, "ascending"), (order_col, "ascending")]
        )
        s = d.take(idx)
        n = s.num_rows
        empty = pa.table({
            key_col: pa.array([], key_t),
            "n_gaps": pa.array([], pa.int64()),
            "sum_gap_us": pa.array([], pa.int64()),
            "max_gap_us": pa.array([], pa.int64()),
        })
        if n < 2:
            return empty
        k = s[key_col].combine_chunks()
        same = pc.equal(k.slice(1), k.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
        if not same.any():
            return empty
        us = pc.cast(s[ts_col].combine_chunks(), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        mask = pa.array(same)
        tb = pa.table({
            key_col: k.slice(1).filter(mask),
            "gap": pa.array((us[1:] - us[:-1])[same]),
        })
        g2 = tb.group_by([key_col]).aggregate(
            [("gap", "count"), ("gap", "sum"), ("gap", "max")]
        )
        return pa.table({
            key_col: g2[key_col],
            "n_gaps": pc.cast(g2["gap_count"], pa.int64()),
            "sum_gap_us": g2["gap_sum"],
            "max_gap_us": g2["gap_max"],
        })

    return (
        ds.map_batches(bucketed, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_b")
        .map_groups(gaps_in_bucket, batch_format="pyarrow")
    )


def path_signatures(
    ds,
    key_col: str = "user_id",
    type_col: str = "event_type",
    order_col: str = "event_id",
    first_n: int = 5,
    sep: str = ">",
    buckets: int = 64,
):
    """Behavioral path mining: each key's first ``first_n`` event types
    (in ``order_col`` order) joined into one signature string, counted
    across keys — the "how do sessions start" primitive behind funnel
    discovery.

    ONE bucketed shuffle on hash(key) co-locates each key's history; the
    in-bucket pass is fully vectorized: lexsort, keep rows with per-key
    position < first_n, rebuild list offsets from the clipped per-key
    counts, and pc.binary_join stitches each key's slice in one kernel.
    Per-bucket signature counts pre-reduce before the final tiny groupby
    fold (same path can appear in every bucket)."""
    from debezium_incubator_ray.hashing import partition_ids

    def bucketed(t: pa.Table) -> pa.Table:
        d = t.select([key_col, type_col, order_col])
        return d.append_column(
            "_b",
            pa.array(partition_ids(d[key_col], buckets, "hash"), pa.int32()),
        )

    def paths_in_bucket(g: pa.Table) -> pa.Table:
        d = g.drop_columns(["_b"])
        idx = pc.sort_indices(
            d, sort_keys=[(key_col, "ascending"), (order_col, "ascending")]
        )
        s = d.take(idx)
        n = s.num_rows
        ty_t = s[type_col].combine_chunks().type
        if n == 0:
            return pa.table({
                "path": pa.array([], ty_t),
                "n_keys": pa.array([], pa.int64()),
            })
        k = s[key_col].combine_chunks()
        first = np.ones(n, dtype=bool)
        first[1:] = ~pc.equal(k.slice(1), k.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
        starts = np.nonzero(first)[0]
        pos = np.arange(n) - starts[np.cumsum(first) - 1]
        keep = pos < first_n
        vals = s[type_col].combine_chunks().filter(pa.array(keep))
        counts = np.minimum(
            np.diff(np.append(starts, n)), first_n
        ).astype(np.int64)
        offsets = np.zeros(len(counts) + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        lst = pa.LargeListArray.from_arrays(
            pa.array(offsets), pc.cast(vals, pa.large_string())
        )
        joined = pc.binary_join(lst, pa.scalar(sep, pa.large_string()))
        gb = (
            pa.table({"path": joined})
            .group_by(["path"])
            .aggregate([([], "count_all")])
        )
        return pa.table({
            "path": gb["path"],
            "n_keys": pc.cast(gb["count_all"], pa.int64()),
        })

    folded = (
        ds.map_batches(bucketed, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_b")
        .map_groups(paths_in_bucket, batch_format="pyarrow")
        .groupby("path")
        .sum("n_keys")
    )
    return folded.map_batches(
        lambda t: t.rename_columns(["path", "n_keys"]),
        batch_format="pyarrow",
    )


def first_last_per_group(
    ds,
    key_col: str = "user_id",
    order_col: str = "event_id",
    value_col: str = "event_type",
):
    """First- and last-touch attribution: for each key, the ``value_col``
    at the minimum and maximum ``order_col`` (SQL ``arg_min``/``arg_max``),
    plus the key's event count.

    Scale shape: the low-cardinality value vocabulary is collected once
    (a tiny distinct aggregate) and each (order, value) pair is PACKED
    into one int64 ``order * V + value_index`` — order dominates the
    comparison, so plain Min/Max aggregates ARE arg-min/arg-max. The only
    shuffle is a three-aggregate groupby over per-batch partials; no row
    ever leaves its block unaggregated and no per-group Python runs.
    Requires non-negative int orders and a vocabulary small enough to
    broadcast (categorical columns); order values must be unique per key
    for a deterministic answer (ties resolve to the packed min/max).
    """
    from ray.data.aggregate import Max, Min, Sum

    vocab = sorted(v for v in ds.unique(value_col) if v is not None)
    V = len(vocab)
    vocab_arr = pa.array(vocab)

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(pc.is_valid(t[value_col]), pc.is_valid(t[order_col]))
        )
        idx = pc.cast(
            pc.index_in(t[value_col].combine_chunks(), value_set=vocab_arr),
            pa.int64(),
        )
        packed = pc.add(
            pc.multiply(pc.cast(t[order_col], pa.int64()), V), idx
        )
        d = pa.table({
            key_col: t[key_col],
            "pk": packed,
            "n_events": pa.array(np.ones(t.num_rows, dtype=np.int64)),
        })
        g = d.group_by(key_col).aggregate(
            [("pk", "min"), ("pk", "max"), ("n_events", "sum")]
        )
        return g.rename_columns([key_col, "pk_min", "pk_max", "n_events"])

    folded = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(key_col)
        .aggregate(
            Min("pk_min", alias_name="pk_min"),
            Max("pk_max", alias_name="pk_max"),
            Sum("n_events", alias_name="n_events"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        lo = t["pk_min"].combine_chunks().to_numpy(zero_copy_only=False)
        hi = t["pk_max"].combine_chunks().to_numpy(zero_copy_only=False)
        vv = np.asarray(vocab, dtype=object)
        return pa.table({
            key_col: t[key_col],
            "n_events": t["n_events"],
            "first_value": pa.array(vv[(lo % V).astype(np.int64)]),
            "last_value": pa.array(vv[(hi % V).astype(np.int64)]),
        })

    return folded.map_batches(finish, batch_format="pyarrow")


def group_ewma(
    ds,
    key_col: str = "user_id",
    order_col: str = "event_id",
    value_col: str = "value",
    alpha: float = 0.2,
    buckets: int = 64,
):
    """Final exponentially-weighted moving average per key over the
    key's values in ``order_col`` order (pandas ``ewm(adjust=True)``
    semantics): ewma = sum(w_i * x_i) / sum(w_i) with
    w_i = (1-alpha)^(position from the end).

    EWMA is order-recursive, so it can't pre-aggregate across blocks;
    like sessionize, keys co-locate via ONE shuffle into bounded hash
    buckets (never one Python group per key) and the whole bucket is
    processed with a numpy lexsort + reduceat — weights never exceed 1,
    so the closed form is overflow-free for any stream length (the naive
    (1-a)^(-i) prefix trick explodes past ~700 events). NULL values are
    excluded.
    """
    from debezium_incubator_ray.hashing import partition_ids

    decay = 1.0 - alpha

    def tag(t: pa.Table) -> pa.Table:
        t = t.select([key_col, order_col, value_col]).filter(
            pc.is_valid(t[value_col])
        )
        return t.append_column(
            "_b",
            pa.array(partition_ids(t[key_col].combine_chunks(), buckets,
                                   "hash"), pa.int32()),
        )

    def per_bucket(g: pa.Table) -> pa.Table:
        k = g[key_col].combine_chunks().to_numpy(zero_copy_only=False)
        o = g[order_col].combine_chunks().to_numpy(zero_copy_only=False)
        x = g[value_col].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((o, k))
        k, x = k[order], x[order].astype(np.float64)
        n = len(k)
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        sizes = np.diff(np.append(starts, n))
        # position from the END of each key's run: sizes-1 .. 0
        pos = np.arange(n) - np.repeat(starts, sizes)
        k_from_end = np.repeat(sizes, sizes) - 1 - pos
        w = np.power(decay, k_from_end)
        num = np.add.reduceat(w * x, starts)
        den = np.add.reduceat(w, starts)
        return pa.table({
            key_col: pa.array(k[starts]),
            "n_events": pa.array(sizes.astype(np.int64)),
            "ewma": pa.array(num / den),
        })

    return (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_b")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def longest_streak(ds, key_col: str = "user_id", ts_col: str = "ts",
                   buckets: int = 64):
    """Longest run of CONSECUTIVE active days per key plus the key's
    total distinct active days — the classic gaps-and-islands window,
    shuffle-decomposed: per-batch distinct (key, day) is the combiner,
    ONE shuffle co-locates each key's days in a bounded hash bucket, and
    the whole bucket resolves islands in a single vectorized pass
    (anchor = day - position-within-key; equal anchors = one island,
    exactly the SQL ``day - ROW_NUMBER()`` trick)."""
    from debezium_incubator_ray.hashing import partition_ids

    def distinct_days(t: pa.Table) -> pa.Table:
        day = pc.cast(t[ts_col].combine_chunks(), pa.date32())
        d = (
            pa.table({key_col: t[key_col], "day": day})
            .group_by([key_col, "day"])
            .aggregate([])
        )
        return d.append_column(
            "_b",
            pa.array(partition_ids(d[key_col].combine_chunks(), buckets,
                                   "hash"), pa.int32()),
        )

    def islands(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["_b"])
        # bucket-local distinct (cross-batch duplicates of a key's day)
        g = g.group_by([key_col, "day"]).aggregate([])
        k = g[key_col].combine_chunks().to_numpy(zero_copy_only=False)
        day = g["day"].combine_chunks().to_numpy(
            zero_copy_only=False
        ).astype("datetime64[D]").astype(np.int64)
        order = np.lexsort((day, k))
        k, day = k[order], day[order]
        n = len(k)
        if n == 0:
            return pa.table({
                key_col: pa.array([], g[key_col].type),
                "n_days": pa.array([], pa.int64()),
                "longest_streak": pa.array([], pa.int64()),
            })
        new_key = np.r_[True, k[1:] != k[:-1]]
        starts = np.flatnonzero(new_key)
        sizes = np.diff(np.append(starts, n))
        pos = np.arange(n) - np.repeat(starts, sizes)
        anchor = day - pos
        new_run = new_key | np.r_[True, anchor[1:] != anchor[:-1]]
        run_starts = np.flatnonzero(new_run)
        run_lens = np.diff(np.append(run_starts, n))
        # per-key max over its runs: runs are contiguous per key
        run_key_idx = np.searchsorted(starts, run_starts, side="right") - 1
        key_first_run = np.r_[True,
                              run_key_idx[1:] != run_key_idx[:-1]]
        key_run_starts = np.flatnonzero(key_first_run)
        longest = np.maximum.reduceat(run_lens, key_run_starts)
        return pa.table({
            key_col: pa.array(k[starts]),
            "n_days": pa.array(sizes.astype(np.int64)),
            "longest_streak": pa.array(longest.astype(np.int64)),
        })

    return (
        ds.map_batches(distinct_days, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("_b")
        .map_groups(islands, batch_format="pyarrow")
    )


def window_pair_stats(
    ds,
    key_col: str,
    ts_col: str,
    type_col: str,
    from_type: str,
    to_type: str,
    window_us: int,
    buckets: int = 64,
):
    """Sliding-window self-join with per-key aggregates and NO pair
    materialization: for each key, count (a, b) pairs where a is a
    ``from_type`` event, b a ``to_type`` event, and 0 < ts_b - ts_a <=
    window_us (the "view -> purchase within the window" conversion
    primitive; as-of join keeps only the NEAREST match — this counts
    every match in the window). Emits one row per key with >= 1 pair:
    (key, n_pairs, min_delay_us, max_delay_us).

    Scale shape: ONE hash(key) bucketed shuffle of the two filtered
    event sides; inside each bucket both sides sort once and every
    left event finds its window span with two binary searches over a
    (dense-key * span + ts) composite — counts and min/max delays come
    from the span ENDPOINTS, so the n^2 pair set is never expanded.
    The composite stays in int64 because keys are dense per bucket:
    u_dense * span needs log2(users_per_bucket) + log2(span_us) < 63
    (a 30-day span and 2M keys per bucket uses 62 bits; wider spans
    raise buckets)."""
    from debezium_incubator_ray.hashing import partition_ids

    def tag(t: pa.Table) -> pa.Table:
        keep = pc.is_in(
            t[type_col].combine_chunks(),
            value_set=pa.array([from_type, to_type]),
        )
        t = t.filter(keep)
        sel = pa.table({
            "k": pc.cast(t[key_col].combine_chunks(), pa.int64()),
            "t": pc.cast(t[ts_col].combine_chunks(), pa.int64()),
            "is_from": pc.equal(
                t[type_col].combine_chunks(), pa.scalar(from_type)
            ),
        })
        return sel.append_column(
            "_b",
            pa.array(partition_ids(sel["k"].combine_chunks(), buckets,
                                   "hash"), pa.int32()),
        )

    def _empty() -> pa.Table:
        return pa.table({
            "k": pa.array([], pa.int64()),
            "n_pairs": pa.array([], pa.int64()),
            "min_delay_us": pa.array([], pa.int64()),
            "max_delay_us": pa.array([], pa.int64()),
        })

    def fold(g: pa.Table) -> pa.Table:
        k = g["k"].combine_chunks().to_numpy(zero_copy_only=False)
        t = g["t"].combine_chunks().to_numpy(zero_copy_only=False)
        is_from = g["is_from"].combine_chunks().to_numpy(
            zero_copy_only=False
        )
        if len(k) == 0:
            return _empty()
        t0 = t.min()
        span = int(t.max() - t0) + window_us + 2
        uk, dense = np.unique(k, return_inverse=True)
        if len(uk) * span >= (1 << 63):
            raise ValueError(
                "dense-key x span composite exceeds int64; raise buckets"
            )
        key = dense * span + (t - t0)
        a_key = np.sort(key[is_from])
        b_key = np.sort(key[~is_from])
        if len(a_key) == 0 or len(b_key) == 0:
            return _empty()
        # window ends clamp INSIDE the key's span stripe so a late event
        # never probes into the next dense key's range
        stripe_end = (a_key // span + 1) * span - 1
        lo = np.searchsorted(b_key, a_key, side="right")  # strict >
        hi = np.searchsorted(
            b_key, np.minimum(a_key + window_us, stripe_end), side="right"
        )
        cnt = hi - lo
        has = cnt > 0
        if not has.any():
            return _empty()
        a_has = a_key[has]
        dmin = b_key[lo[has]] - a_has
        dmax = b_key[hi[has] - 1] - a_has
        ku = uk[(a_has // span).astype(np.int64)]
        order = np.argsort(ku, kind="stable")
        ku, cu = ku[order], cnt[has][order]
        dmin, dmax = dmin[order], dmax[order]
        starts = np.flatnonzero(np.r_[True, ku[1:] != ku[:-1]])
        return pa.table({
            "k": pa.array(ku[starts]),
            "n_pairs": pa.array(np.add.reduceat(cu, starts)),
            "min_delay_us": pa.array(np.minimum.reduceat(dmin, starts)),
            "max_delay_us": pa.array(np.maximum.reduceat(dmax, starts)),
        })

    return (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_b")
        .map_groups(fold, batch_format="pyarrow")
    )


def rolling_distinct(
    ds,
    ts_col: str,
    id_col: str,
    window_days: int = 7,
    buckets: int = 64,
    include_daily: bool = False,
):
    """Trailing-window COUNT(DISTINCT id) per day: for each day with at
    least one event, the number of distinct ids seen in the last
    ``window_days`` days (window end inclusive). Emits (day, n_ids).

    Scale shape: each event expands to the <= window_days window-end
    days it contributes to — a bounded fan-out applied per block and
    immediately re-collapsed by a block-local distinct, so the shuffle
    carries at most (days x ids) pairs, not events; one hash(id)
    bucketed shuffle makes the (day, id) distinct global (an id's pairs
    co-locate), per-day partial counts then fold in a second
    metadata-sized shuffle. Whether a day has events of its OWN rides
    the expanded pairs as a flag (offset-0 contribution), so the input
    is consumed exactly once and gap days (window ends with no events)
    drop in the final fold. ``include_daily=True`` adds n_ids_day (the
    day's OWN distinct-id count, i.e. DAU next to the windowed WAU) from
    the same single pass — the own flag doubles as its count."""
    from debezium_incubator_ray.hashing import partition_ids

    day_us = 86_400_000_000

    def expand(t: pa.Table) -> pa.Table:
        ts = pc.cast(t[ts_col].combine_chunks(), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        ids = pc.cast(t[id_col].combine_chunks(), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        day = np.floor_divide(ts, day_us) * day_us
        n = len(day)
        w = np.arange(window_days, dtype=np.int64) * day_us
        d = np.repeat(day, window_days) + np.tile(w, n)
        u = np.repeat(ids, window_days)
        own = np.tile((w == 0).astype(np.int8), n)
        out = pa.table({
            "d": pa.array(d), "id": pa.array(u), "own": pa.array(own),
        })
        # block-local distinct; keep whether any contribution is offset-0
        g = out.group_by(["d", "id"]).aggregate([("own", "max")])
        out = pa.table({
            "d": g["d"], "id": g["id"], "own": g["own_max"],
        })
        return out.append_column(
            "_b",
            pa.array(partition_ids(out["id"].combine_chunks(), buckets,
                                   "hash"), pa.int32()),
        )

    def day_partial(g: pa.Table) -> pa.Table:
        d = g.drop_columns(["_b"]).group_by(["d", "id"]).aggregate(
            [("own", "max")]
        )
        r = d.group_by(["d"]).aggregate(
            [([], "count_all"), ("own_max", "max"), ("own_max", "sum")]
        )
        out = pa.table({
            "d": r["d"],
            "n": pc.cast(r["count_all"], pa.int64()),
            "own": r["own_max_max"],
            # per-bucket count of ids whose offset-0 contribution exists:
            # summing the 0/1 own flags over the distinct (d, id) rows IS
            # the bucket's own-day distinct count
            "n_day": pc.cast(r["own_max_sum"], pa.int64()),
        })
        return out.append_column(
            "_b2",
            pa.array(partition_ids(out["d"].combine_chunks(), buckets,
                                   "hash"), pa.int32()),
        )

    def day_fold(g: pa.Table) -> pa.Table:
        r = g.drop_columns(["_b2"]).group_by(["d"]).aggregate(
            [("n", "sum"), ("own", "max"), ("n_day", "sum")]
        )
        r = r.filter(pc.equal(r["own_max"], 1))
        cols = {
            "day": r["d"].combine_chunks().cast(pa.timestamp("us")),
            "n_ids": r["n_sum"],
        }
        if include_daily:
            cols["n_ids_day"] = r["n_day_sum"]
        return pa.table(cols)

    return (
        ds.map_batches(expand, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_b")
        .map_groups(day_partial, batch_format="pyarrow")
        .groupby("_b2")
        .map_groups(day_fold, batch_format="pyarrow")
    )

def cohort_ltv(
    ds,
    cust_col: str = "o_custkey",
    date_col: str = "o_orderdate",
    rev_col: str = "o_totalprice",
):
    """Cohort LIFETIME-VALUE curve: customers cohort by the month of
    their first order; each (cohort, age-in-months) cell reports that
    month's revenue and the cohort's CUMULATIVE revenue per customer —
    the "how much is a January customer worth after N months" view that
    complements the retention matrix's activity counts.

    Decomposition (the retention_cohorts shape): batches pre-reduce to
    (customer, month, revenue-sum) partials, ONE shuffle routes each
    customer's partials to a bounded hash bucket, the in-bucket cohort =
    min(month) joins back via Arrow kernels, and cohort sizes ride the
    same stream as marker rows (age = -1). The driver finish —
    per-cohort cumulative sums — is bounded by months^2 cells, never by
    customers. Months travel as int indices (12*year + month-1), which
    the SQL oracle states identically."""
    from ray.data.aggregate import Sum
    from debezium_incubator_ray.hashing import partition_ids

    def partial(t: pa.Table) -> pa.Table:
        c = t[cust_col].combine_chunks()
        d = t[date_col].combine_chunks()
        r = pc.cast(t[rev_col].combine_chunks(), pa.float64())
        keep = pc.and_(pc.is_valid(c), pc.is_valid(d))
        fd = d.filter(keep)
        m = pc.add(
            pc.multiply(pc.year(fd), 12),
            pc.subtract(pc.month(fd), 1),
        )
        tb = pa.table({
            "c": c.filter(keep),
            "m": pc.cast(m, pa.int64()),
            "r": r.filter(keep),
        }).group_by(["c", "m"]).aggregate([("r", "sum")])
        tb = pa.table({"c": tb["c"], "m": tb["m"], "r": tb["r_sum"]})
        return tb.append_column(
            "_b", pa.array(partition_ids(tb["c"], 64, "hash"), pa.int32()),
        )

    def per_bucket(g: pa.Table) -> pa.Table:
        d = g.drop_columns(["_b"]).group_by(["c", "m"]).aggregate(
            [("r", "sum")]
        )
        cohort = d.group_by(["c"]).aggregate([("m", "min")])
        pos = pc.index_in(d["c"], value_set=cohort["c"].combine_chunks())
        cm = cohort["m_min"].take(pos)
        cells = pa.table({
            "cohort": cm,
            "age": pc.subtract(d["m"], cm),
            "rev": d["r_sum"],
            "cnt": pa.array(np.zeros(d.num_rows, np.int64)),
        })
        sizes = pa.table({
            "cohort": cohort["m_min"],
            "age": pa.array(np.full(cohort.num_rows, -1, np.int64)),
            "rev": pa.array(np.zeros(cohort.num_rows, np.float64)),
            "cnt": pa.array(np.ones(cohort.num_rows, np.int64)),
        })
        return pa.concat_tables([cells, sizes])

    rows = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_b")
        .map_groups(per_bucket, batch_format="pyarrow")
        .groupby(["cohort", "age"])
        .aggregate(Sum("rev", alias_name="rev"), Sum("cnt", alias_name="cnt"))
        .take_all()
    )  # <= months^2 cells + months size rows
    if not rows:
        return pa.table({
            "cohort": pa.array([], pa.int64()),
            "age": pa.array([], pa.int64()),
            "n_customers": pa.array([], pa.int64()),
            "revenue": pa.array([], pa.float64()),
            "ltv_per_customer": pa.array([], pa.float64()),
        })
    import pandas as pd

    df = pd.DataFrame(rows)
    sizes = df[df["age"] < 0].set_index("cohort")["cnt"]
    cells = df[df["age"] >= 0].sort_values(["cohort", "age"])
    cells["cum"] = cells.groupby("cohort")["rev"].cumsum()
    n = cells["cohort"].map(sizes).to_numpy(np.int64)
    return pa.table({
        "cohort": pa.array(cells["cohort"].to_numpy(np.int64)),
        "age": pa.array(cells["age"].to_numpy(np.int64)),
        "n_customers": pa.array(n),
        # cents precision: a 1e8-magnitude money sum sits exactly at the
        # 6-dp float-noise edge (measured 1e-6 divergence at sf0.1); 2 dp
        # is the natural unit and leaves 5 orders of margin
        "revenue": pa.array(np.round(cells["rev"].to_numpy(), 2)),
        "ltv_per_customer": pa.array(
            np.round(cells["cum"].to_numpy() / n, 6)
        ),
    })

def time_in_state(ds, user_col: str, ts_col: str, type_col: str,
                  id_col: str, buckets: int = 64):
    """Time-weighted STATE OCCUPANCY: each interval between a user's
    consecutive events is attributed to the EARLIER event's type (the
    state the user was in), with the final open interval censored at the
    observation end — "how long do users sit in each state", the dwell-
    time complement of transition counting. Returns one row per type:
    (state, n_intervals, total_hours).

    Scale shape: the total is an EXACT int64 microsecond sum (no float
    fold drift; the hours division happens once at the end). One
    bucketed shuffle routes each user's (ts, id, type) rows together;
    in-bucket lead() is a vectorized shift over user runs; per-type
    partials fold narrow."""
    from ray.data.aggregate import Sum
    from debezium_incubator_ray.hashing import partition_ids

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
    empty = pa.table({
        "state": pa.array([], pa.string()),
        "n_intervals": pa.array([], pa.int64()),
        "total_hours": pa.array([], pa.float64()),
    })
    if raw_max is None:
        return empty
    end_us = int(raw_max)

    def route(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(pc.is_valid(t[user_col].combine_chunks()),
                    pc.is_valid(t[ts_col].combine_chunks())),
            pc.is_valid(t[type_col].combine_chunks()),
        )
        sub = pa.table({
            "u": t[user_col].combine_chunks().filter(keep),
            "ts": t[ts_col].combine_chunks().filter(keep),
            "i": t[id_col].combine_chunks().filter(keep),
            "s": t[type_col].combine_chunks().filter(keep),
        })
        return sub.append_column(
            "_b", pa.array(partition_ids(sub["u"], buckets, "hash"),
                           pa.int32()),
        )

    def per_bucket(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["_b"])
        idx = pc.sort_indices(g, sort_keys=[
            ("u", "ascending"), ("ts", "ascending"), ("i", "ascending"),
        ])
        s = g.take(idx)
        u = s["u"].combine_chunks().to_numpy(zero_copy_only=False)
        ts = s["ts"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        n = len(u)
        if n == 0:
            return pa.table({
                "state": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "us": pa.array([], pa.int64()),
            })
        nxt = np.empty(n, dtype=np.int64)
        nxt[:-1] = ts[1:]
        nxt[-1] = end_us
        last_of_user = np.ones(n, dtype=bool)
        last_of_user[:-1] = u[1:] != u[:-1]
        nxt[last_of_user] = end_us  # open interval -> censor at end
        dur = nxt - ts
        agg = pa.table({
            "state": s["s"],
            "one": pa.array(np.ones(n, np.int64)),
            "us": pa.array(dur),
        }).group_by("state").aggregate([("one", "sum"), ("us", "sum")])
        return pa.table({
            "state": agg["state"],
            "n": pc.cast(agg["one_sum"], pa.int64()),
            "us": pc.cast(agg["us_sum"], pa.int64()),
        })

    folded = (
        ds.map_batches(route, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_b")
        .map_groups(per_bucket, batch_format="pyarrow")
        .groupby("state")
        .aggregate(Sum("n", alias_name="n"), Sum("us", alias_name="us"))
    )

    def finish(t: pa.Table) -> pa.Table:
        hours = pc.round(
            pc.divide(pc.cast(t["us"], pa.float64()), 3.6e9), 6
        )
        return pa.table({
            "state": t["state"],
            "n_intervals": t["n"],
            "total_hours": hours,
        })

    return folded.map_batches(finish, batch_format="pyarrow")


def rfm_segments(
    orders_ds,
    cust_col: str = "o_custkey",
    date_col: str = "o_orderdate",
    rev_col: str = "o_totalprice",
):
    """RFM SEGMENTATION: customers coded 1-4 on each of Recency (days
    since last order), Frequency (order count) and Monetary (revenue
    sum) by their quartile (quantile_cont thresholds; code = 1 +
    #thresholds strictly exceeded), then folded to the segment
    histogram — one row per occupied (r, f, m) cell with its size and
    average spend. The classic marketing cube, distributed end to end.

    Scale shape: per-customer aggregates fold narrow (one groupby of
    3-column partials); thresholds come from the shared bucket-histogram
    exact-quantile machinery (global_quantile_cont — no sort, driver
    cost bounded by distinct values of the needed buckets: exact for
    int-like recency/frequency; quantize money at extreme scale);
    labeling is one vectorized pass and the output is at most 64 cells."""
    from ray.data.aggregate import Max, Sum
    from debezium_incubator_ray.functions.rank import global_quantile_cont

    def partial(t: pa.Table) -> pa.Table:
        c = t[cust_col].combine_chunks()
        d = t[date_col].combine_chunks()
        r = pc.cast(t[rev_col].combine_chunks(), pa.float64())
        keep = pc.and_(pc.is_valid(c), pc.is_valid(d))
        days = pc.cast(pc.cast(
            pc.floor_temporal(d.filter(keep), unit="day"), pa.date32()
        ), pa.int32())
        g = pa.table({
            "c": c.filter(keep),
            "d": pc.cast(days, pa.int64()),
            "r": r.filter(keep),
            "one": pa.array(np.ones(len(days), np.int64)),
        }).group_by("c").aggregate(
            [("d", "max"), ("r", "sum"), ("one", "sum")]
        )
        return pa.table({
            "c": g["c"], "last_day": g["d_max"],
            "mon": g["r_sum"], "freq": pc.cast(g["one_sum"], pa.int64()),
        })

    per_cust = (
        orders_ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
        .groupby("c")
        .aggregate(Max("last_day", alias_name="last_day"),
                   Sum("mon", alias_name="mon"),
                   Sum("freq", alias_name="freq"))
        .materialize()  # consumed by 4 quantile passes + the label pass
    )
    gmax = per_cust.max("last_day")
    if gmax is None:
        return pa.table({
            "r_code": pa.array([], pa.int64()),
            "f_code": pa.array([], pa.int64()),
            "m_code": pa.array([], pa.int64()),
            "n_customers": pa.array([], pa.int64()),
            "avg_monetary": pa.array([], pa.float64()),
        })
    gmax = int(gmax)

    rec_ds = per_cust.map_batches(
        lambda t: t.append_column(
            "recency", pc.cast(pc.subtract(pa.scalar(gmax), t["last_day"]),
                               pa.int64())
        ),
        batch_format="pyarrow",
    ).materialize()
    qs = (0.25, 0.5, 0.75)
    thr = {}
    for col in ("recency", "freq", "mon"):
        tq = global_quantile_cont(rec_ds, col, qs)
        thr[col] = tq["value"].to_pylist()

    def label(t: pa.Table) -> pa.Table:
        def code(col):
            v = pc.cast(t[col], pa.float64()).to_numpy(
                zero_copy_only=False
            )
            c = np.ones(len(v), np.int64)
            for q in thr[col]:
                c += (v > q).astype(np.int64)
            return c

        g = pa.table({
            "r_code": pa.array(code("recency")),
            "f_code": pa.array(code("freq")),
            "m_code": pa.array(code("mon")),
            "mon": t["mon"],
            "one": pa.array(np.ones(t.num_rows, np.int64)),
        }).group_by(["r_code", "f_code", "m_code"]).aggregate(
            [("one", "sum"), ("mon", "sum")]
        )
        return pa.table({
            "r_code": g["r_code"], "f_code": g["f_code"],
            "m_code": g["m_code"],
            "n": pc.cast(g["one_sum"], pa.int64()),
            "mon": g["mon_sum"],
        })

    cells = (
        rec_ds.map_batches(label, batch_format="pyarrow")
        .groupby(["r_code", "f_code", "m_code"])
        .aggregate(Sum("n", alias_name="n"), Sum("mon", alias_name="mon"))
        .take_all()
    )  # <= 64 cells
    import pandas as pd

    df = pd.DataFrame(cells).sort_values(["r_code", "f_code", "m_code"])
    return pa.table({
        "r_code": pa.array(df["r_code"].to_numpy(np.int64)),
        "f_code": pa.array(df["f_code"].to_numpy(np.int64)),
        "m_code": pa.array(df["m_code"].to_numpy(np.int64)),
        "n_customers": pa.array(df["n"].to_numpy(np.int64)),
        "avg_monetary": pa.array(np.round(
            df["mon"].to_numpy() / df["n"].to_numpy(), 2
        )),
    })

def peak_concurrency(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap_us: int = 30 * 60 * 1_000_000,
    buckets: int = 64,
):
    """PEAK CONCURRENCY: the maximum number of sessions simultaneously
    open (closed intervals — a session counts at both endpoints), via a
    TWO-PHASE PARALLEL SWEEP instead of one global ordered scan:
    sessions from :func:`sessionize` become (+1 at start, -1 at end)
    points bucketed by calendar day; each day's group sorts its own
    points (t asc, +1 before -1 at the same instant) and reports
    (total_delta, max_prefix); the driver folds day totals into running
    offsets and takes max(offset_before_day + max_prefix_in_day) —
    O(days) driver rows, never a global sort. Returns one row:
    (n_sessions, peak_concurrency).

    The tie rule (+1 sorts before -1 at the identical microsecond) is
    what makes closed-interval overlap exact and matches the oracle's
    ORDER BY t, d DESC."""
    from ray.data.aggregate import Sum

    sess = sessionize(ds, key_col, ts_col, value_col, gap_us=gap_us,
                      buckets=buckets)

    def points(t: pa.Table) -> pa.Table:
        st = t["session_start"].combine_chunks()
        en = t["session_end"].combine_chunks()
        n = t.num_rows
        ts = pa.chunked_array([st, en]).combine_chunks()
        delta = np.concatenate([
            np.ones(n, np.int64), -np.ones(n, np.int64)
        ])
        day = pc.cast(pc.cast(pc.cast(
            pc.floor_temporal(ts, unit="day"), pa.date32()
        ), pa.int32()), pa.int64())  # date32 has no direct int64 cast
        return pa.table({
            "day": day,
            "t": pc.cast(ts, pa.int64()),
            "d": pa.array(delta),
        })

    def day_sweep(g: pa.Table) -> pa.Table:
        day = int(g["day"][0].as_py())
        t = g["t"].combine_chunks().to_numpy(zero_copy_only=False)
        d = g["d"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((-d, t))  # t asc, +1 before -1 at equal t
        run = np.cumsum(d[order])
        return pa.table({
            "day": pa.array([day], pa.int64()),
            "total": pa.array([int(d.sum())], pa.int64()),
            "max_prefix": pa.array([int(run.max())], pa.int64()),
            "n_pts": pa.array([len(d)], pa.int64()),
        })

    rows = (
        sess.map_batches(points, batch_format="pyarrow",
                         zero_copy_batch=True)
        .groupby("day")
        .map_groups(day_sweep, batch_format="pyarrow")
        .take_all()
    )  # O(days)
    if not rows:
        return pa.table({
            "n_sessions": pa.array([0], pa.int64()),
            "peak_concurrency": pa.array([0], pa.int64()),
        })
    rows.sort(key=lambda r: r["day"])
    offset = 0
    peak = 0
    n_pts = 0
    for r in rows:
        peak = max(peak, offset + r["max_prefix"])
        offset += r["total"]
        n_pts += r["n_pts"]
    return pa.table({
        "n_sessions": pa.array([n_pts // 2], pa.int64()),
        "peak_concurrency": pa.array([peak], pa.int64()),
    })


def daily_ohlc(ds, ts_col: str = "ts", order_col: str = "event_id",
               value_col: str = "value"):
    """Daily OHLC bars: per calendar day, the open (value at the minimum
    (ts, order) — SQL arg_min), close (arg_max), low, high and row
    count — the canonical time-series downsample.

    Scale shape: each block folds to AT MOST one partial row per day it
    touches (open/close candidates carried with their (ts, order) keys,
    low/high/n as plain extrema) — an associative fold, so the one
    groupby moves O(days x blocks) tiny rows and a vectorized in-group
    pass picks the global open/close. NULL/NaN values are dropped
    (mirrors SQL aggregate semantics)."""
    from debezium_incubator_ray.functions.kernels import drop_null_nan

    def partial(t: pa.Table) -> pa.Table:
        t = drop_null_nan(t, value_col)
        # a NULL event time has no bar; the oracle filters ts IS NOT NULL
        t = t.filter(pc.is_valid(t[ts_col]))
        if t.num_rows == 0:
            return pa.table({
                "day": pa.array([], pa.string()),
                "o_ts": pa.array([], pa.int64()),
                "o_id": pa.array([], pa.int64()),
                "open": pa.array([], pa.float64()),
                "c_ts": pa.array([], pa.int64()),
                "c_id": pa.array([], pa.int64()),
                "close": pa.array([], pa.float64()),
                "low": pa.array([], pa.float64()),
                "high": pa.array([], pa.float64()),
                "n": pa.array([], pa.int64()),
            })
        ts = t[ts_col].combine_chunks()
        day = pc.strftime(pc.floor_temporal(ts, unit="day"),
                          format="%Y-%m-%d")
        tsu = pc.cast(ts, pa.int64()).to_numpy(zero_copy_only=False)
        oid = pc.cast(t[order_col], pa.int64()).to_numpy()
        val = pc.cast(t[value_col], pa.float64()).to_numpy(
            zero_copy_only=False
        )
        dnp = day.to_numpy(zero_copy_only=False)
        _, codes = np.unique(dnp, return_inverse=True)
        order = np.lexsort((oid, tsu, codes))
        codes_s, tsu_s = codes[order], tsu[order]
        starts = np.flatnonzero(np.r_[True, codes_s[1:] != codes_s[:-1]])
        ends = np.append(starts[1:], len(codes_s)) - 1
        first, last = order[starts], order[ends]
        lows = np.minimum.reduceat(val[order], starts)
        highs = np.maximum.reduceat(val[order], starts)
        sizes = np.diff(np.append(starts, len(codes_s)))
        return pa.table({
            "day": pc.cast(day, pa.string()).take(pa.array(first)),
            "o_ts": pa.array(tsu[first]),
            "o_id": pa.array(oid[first]),
            "open": pa.array(val[first]),
            "c_ts": pa.array(tsu[last]),
            "c_id": pa.array(oid[last]),
            "close": pa.array(val[last]),
            "low": pa.array(lows),
            "high": pa.array(highs),
            "n": pa.array(sizes.astype(np.int64)),
        })

    def fold(g: pa.Table) -> pa.Table:
        o = np.lexsort((
            g["o_id"].combine_chunks().to_numpy(),
            g["o_ts"].combine_chunks().to_numpy(),
        ))[0]
        cl_ts = g["c_ts"].combine_chunks().to_numpy()
        cl_id = g["c_id"].combine_chunks().to_numpy()
        c = np.lexsort((-cl_id, -cl_ts))[0]
        return pa.table({
            "day": g["day"].slice(0, 1),
            "open": g["open"].slice(int(o), 1),
            "high": pa.array([pc.max(g["high"]).as_py()], pa.float64()),
            "low": pa.array([pc.min(g["low"]).as_py()], pa.float64()),
            "close": g["close"].slice(int(c), 1),
            "n": pa.array([pc.sum(g["n"]).as_py()], pa.int64()),
        })

    return (
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("day")
        .map_groups(fold, batch_format="pyarrow")
    )


def rolling_window_quantile(
    ds,
    ts_col: str = "ts",
    value_col: str = "value",
    window_days: int = 7,
    q: float = 0.5,
    out_col: str = "med",
):
    """Trailing-window exact quantile per calendar day: for each day that
    has events, the ``q``-quantile (percentile_cont interpolation) of
    ``value_col`` over the trailing ``window_days`` days — the
    rolling-median monitoring series.

    Shape: quantiles can't pre-aggregate, so each value REPLICATES into
    the <= ``window_days`` windows it belongs to (an 8-byte value + day
    ordinal per copy — the replicated column is narrow by construction)
    and ONE groupby co-locates each window's values; the in-group sort
    reads the quantile. Windows anchored on days with no events are
    phantom (no k=0 contribution) and emit nothing, matching the SQL
    `days JOIN` shape. At 100 TB swap the in-group sort for a mergeable
    t-digest/KLL per batch — identical pipeline, approximate answer."""
    from debezium_incubator_ray.functions.kernels import drop_null_nan

    DAY_US = 86_400_000_000

    def expand(t: pa.Table) -> pa.Table:
        t = drop_null_nan(t, value_col)
        t = t.filter(pc.is_valid(t[ts_col]))
        if t.num_rows == 0:
            return pa.table({
                "win": pa.array([], pa.int64()),
                "v": pa.array([], pa.float64()),
                "ctr": pa.array([], pa.bool_()),
            })
        us = pc.cast(
            pc.floor_temporal(t[ts_col].combine_chunks(), unit="day"),
            pa.int64(),
        )
        day = pc.divide(us, pa.scalar(DAY_US, pa.int64())).to_numpy(
            zero_copy_only=False
        )
        val = pc.cast(t[value_col], pa.float64()).to_numpy(
            zero_copy_only=False
        )
        n = len(day)
        wins = np.concatenate([day + k for k in range(window_days)])
        vals = np.tile(val, window_days)
        ctr = np.zeros(n * window_days, dtype=bool)
        ctr[:n] = True  # the k=0 block marks "this window's day has events"
        return pa.table({
            "win": pa.array(wins), "v": pa.array(vals), "ctr": pa.array(ctr),
        })

    def per_win(g: pa.Table) -> pa.Table:
        empty = pa.table({
            "day": pa.array([], pa.string()),
            "n_win": pa.array([], pa.int64()),
            out_col: pa.array([], pa.float64()),
        })
        if not pc.any(g["ctr"]).as_py():
            return empty  # phantom window: its anchor day has no events
        v = np.sort(g["v"].combine_chunks().to_numpy(zero_copy_only=False))
        w = int(g["win"][0].as_py())
        day = pc.strftime(
            pa.array([w * DAY_US], pa.timestamp("us")), format="%Y-%m-%d"
        )
        return pa.table({
            "day": day,
            "n_win": pa.array([len(v)], pa.int64()),
            out_col: pa.array(
                [round(float(np.quantile(v, q, method="linear")), 6)],
                pa.float64(),
            ),
        })

    return (
        ds.map_batches(expand, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("win")
        .map_groups(per_win, batch_format="pyarrow")
    )


def markov_stationary(
    ds,
    key_col: str = "user_id",
    type_col: str = "event_type",
    order_col: str = "event_id",
    rounds: int = 8,
    buckets: int = 64,
):
    """Approximate stationary distribution of the behavioral Markov chain:
    ``rounds`` synchronous power-iteration steps v' = v·P from the uniform
    start over the row-normalized (prev, next) transition matrix — "where
    does user behavior settle". The distributed work is the transition
    fold (:func:`markov_transitions`); the |types|^2 matrix is
    metadata-sized, so the iterations run on the driver and the SQL
    oracle unrolls the same rounds. States with no outgoing transitions
    leak their mass (no artificial self-loop), identically on both
    sides."""
    from debezium_incubator_ray.functions.kernels import collect_table

    t = collect_table(
        markov_transitions(ds, key_col=key_col, type_col=type_col,
                           order_col=order_col, buckets=buckets)
    )
    prev = t["prev_type"].to_pylist()
    nxt = t["next_type"].to_pylist()
    cnt = np.asarray(t["cnt"].to_pylist(), dtype=np.float64)
    tot: dict = {}
    for p, c in zip(prev, cnt):
        tot[p] = tot.get(p, 0.0) + c
    pr = np.array([c / tot[p] for p, c in zip(prev, cnt)])
    states = sorted(set(prev) | set(nxt))
    v = {s: 1.0 / len(states) for s in states}
    for _ in range(rounds):
        nv: dict = {}
        for p, n, w in zip(prev, nxt, pr):
            if p in v:
                nv[n] = nv.get(n, 0.0) + v[p] * w
        v = nv
    out_states = sorted(v)
    return pa.table({
        type_col: pa.array(out_states, pa.string()),
        "prob": pa.array(
            [round(v[s], 6) for s in out_states], pa.float64()
        ),
    })


def watermark_late_flags(
    ds,
    id_col: str = "event_id",
    ts_col: str = "ts",
    allowed_us: int = 300_000_000,
    range_width: int = 65_536,
    carry_cols=(),
):
    """Streaming-watermark late-event detection, computed exactly in
    batch: processing order = ``id_col`` ascending (the arrival log
    order); after each event the watermark is (max event-time seen so
    far) - ``allowed_us``; an event is LATE iff its own event-time is
    below the watermark induced by the events BEFORE it — the
    allowed-lateness rule of every streaming window engine, as a
    replayable batch audit (which windows would have dropped this event).

    Output: (id_col, ts_us, watermark_us, is_late); watermark_us is NULL
    for the globally first event (no predecessor). Rows with NULL
    event-time are excluded — they neither advance nor get judged by the
    watermark. ``carry_cols`` pass through unchanged (so a downstream
    on-time aggregate needs no join back to the source).

    Scale shape (the pack_sequences prefix-scan pattern): a global
    running max looks sequential but distributes in two passes — pass 1
    folds one (range, max_ts) row per ``range_width`` ids (tiny), the
    driver takes the exclusive prefix-max over ranges (metadata-sized)
    and broadcasts it; pass 2 co-locates each range once and combines
    the incoming base with the in-range exclusive running max. One
    shuffle by range id; events never cross ranges."""
    import ray
    from ray.data.aggregate import Max

    def tag(t: pa.Table) -> pa.Table:
        # rows with NULL event-time are excluded from the audit outright:
        # they carry no time, so they neither advance the watermark nor
        # can be judged against it (and a NaN would poison the int64
        # running max)
        t = t.filter(pc.is_valid(t[ts_col]))
        ids = t[id_col].combine_chunks()
        ts_us = pc.cast(
            pc.cast(t[ts_col].combine_chunks(), pa.timestamp("us")),
            pa.int64(),
        )
        rng = pc.cast(
            pc.divide(pc.cast(ids, pa.int64()), range_width), pa.int64()
        )
        cols = {id_col: ids, "_ts_us": ts_us, "_rng": rng}
        for c in carry_cols:
            cols[c] = t[c]
        return pa.table(cols)

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    totals = tagged.groupby("_rng").aggregate(Max("_ts_us")).take_all()
    rng_keys = np.array(sorted(r["_rng"] for r in totals), dtype=np.int64)
    by_key = {r["_rng"]: r["max(_ts_us)"] for r in totals}
    maxes = np.array([by_key[k] for k in rng_keys], dtype=np.int64)
    base = np.full(len(maxes), np.iinfo(np.int64).min, dtype=np.int64)
    if len(maxes) > 1:
        np.maximum.accumulate(maxes[:-1], out=base[1:])
    base_ref = ray.put((rng_keys, base))

    def flag(group: pa.Table) -> pa.Table:
        keys, bases = ray.get(base_ref)
        ids = group[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        ts = group["_ts_us"].combine_chunks().to_numpy(zero_copy_only=False)
        rng = int(group["_rng"][0].as_py())
        incoming = bases[np.searchsorted(keys, rng)]
        order = np.argsort(ids, kind="stable")
        ts_o = ts[order]
        # exclusive running max within the range, seeded by the base
        prev = np.empty(len(ts_o), dtype=np.int64)
        prev[0] = incoming
        if len(ts_o) > 1:
            inc = np.maximum.accumulate(ts_o[:-1])
            prev[1:] = np.maximum(inc, incoming)
        has_prev = prev != np.iinfo(np.int64).min
        # subtract only where a predecessor exists (masked assignment —
        # np.where would still evaluate the subtraction on the INT64_MIN
        # sentinel rows and wrap)
        wm = np.zeros(len(prev), dtype=np.int64)
        wm[has_prev] = prev[has_prev] - np.int64(allowed_us)
        late = has_prev & (ts_o < wm)
        cols = {
            id_col: pa.array(ids[order], pa.int64()),
            "ts_us": pa.array(ts_o),
            "watermark_us": pa.array(wm, pa.int64(), mask=~has_prev),
            "is_late": pa.array(late),
        }
        take = pa.array(order)
        for c in carry_cols:
            cols[c] = group[c].combine_chunks().take(take)
        return pa.table(cols)

    return (
        tagged.groupby("_rng").map_groups(flag, batch_format="pyarrow")
    )


def first_per_window(ds, group_cols, order_cols, buckets: int = 64):
    """Windowed FIRST-row dedup (the alert-throttle / at-most-once-per-
    window ingest primitive): keep exactly the first row of every
    composite window ``group_cols``, ordered by ``order_cols`` (ties
    break by later order columns — make the last one unique for a
    deterministic answer). Returns the kept rows plus ``win_n`` = how
    many rows the window held (so suppressed = win_n - 1).

    Scale shape: the per-batch combiner keeps one row per window per
    batch (with its partial count), so the shuffle carries at most
    windows x blocks rows; windows co-locate by hash(group_cols[0]) %
    ``buckets`` — the first group column must functionally contain the
    window's locality key (e.g. user_id first) — and the in-bucket
    resolve is one vectorized sort + run-length pass per bounded
    bucket, never per key.

    Null semantics: rows with a NULL in ANY group or order column are
    REJECTED (silently dropped before windowing, and excluded from
    ``win_n``) — the same null-rejecting contract as the repo's other
    keyed operators; the matching SQL oracle must filter
    ``c IS NOT NULL`` for every window/order column."""
    from debezium_incubator_ray.hashing import partition_ids

    gcols = list(group_cols)
    ocols = list(order_cols)
    keys = [(c, "ascending") for c in gcols + ocols]

    def partial(t: pa.Table) -> pa.Table:
        for c in gcols + ocols:
            t = t.filter(pc.is_valid(t[c]))
        if t.num_rows == 0:
            return t.append_column(
                "win_n", pa.array([], pa.int64())
            ).append_column("_b", pa.array([], pa.int32()))
        s = t.take(pc.sort_indices(t, sort_keys=keys))
        n = s.num_rows
        first = np.zeros(n, bool)
        first[0] = True
        if n > 1:
            for c in gcols:
                a = s[c].combine_chunks()
                neq = pc.fill_null(
                    pc.not_equal(a.slice(1), a.slice(0, n - 1)), True
                )
                first[1:] |= neq.to_numpy(zero_copy_only=False)
        starts = np.nonzero(first)[0]
        sizes = np.diff(np.append(starts, n))
        kept = s.filter(pa.array(first))
        kept = kept.append_column("win_n", pa.array(sizes))
        return kept.append_column(
            "_b",
            pa.array(partition_ids(kept[gcols[0]].combine_chunks(),
                                   buckets, "hash"), pa.int32()),
        )

    def resolve(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["_b"])
        s = g.take(pc.sort_indices(g, sort_keys=keys))
        n = s.num_rows
        first = np.zeros(n, bool)
        first[0] = True
        if n > 1:
            for c in gcols:
                a = s[c].combine_chunks()
                neq = pc.fill_null(
                    pc.not_equal(a.slice(1), a.slice(0, n - 1)), True
                )
                first[1:] |= neq.to_numpy(zero_copy_only=False)
        starts = np.nonzero(first)[0]
        win = s["win_n"].combine_chunks().to_numpy(zero_copy_only=False)
        totals = np.add.reduceat(win, starts)
        out = s.filter(pa.array(first)).drop_columns(["win_n"])
        return out.append_column("win_n", pa.array(totals))

    return (
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("_b")
        .map_groups(resolve, batch_format="pyarrow")
    )
