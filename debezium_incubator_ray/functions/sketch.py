"""Mergeable sketches with DETERMINISTIC results.

Sketch operators normally trade exactness for space; these are chosen so
the result is additionally a pure function of the input SET — independent
of partitioning, merge order and parallelism — which is what makes them
verifiable against a SQL oracle and replayable across engines.

KMV (k-minimum-values) distinct-count estimator: keep the k smallest
distinct 64-bit hashes of the values; estimate = (k-1) * 2^64 / h_k
(Bar-Yossef et al. 2002). The k-min set is a pure function of the value
set, so partial top-k per block + one driver merge reproduces exactly the
single-machine answer. Standard error ~ 1/sqrt(k-2)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from debezium_incubator_ray.functions.tokens import md5_u64


def approx_distinct_kmv(ds, col: str, k: int = 128) -> pa.Table:
    """One-row table (estimate DOUBLE, k, h_k) — see module docstring.

    Each batch reduces to its own k smallest distinct value hashes
    (k uint64s, metadata-sized); the driver merges the partials. md5 over
    the stringified value is the cross-engine bridge hash, so any engine
    (or the DuckDB oracle) computes the identical estimate."""

    def partial(t: pa.Table) -> pa.Table:
        v = t[col].combine_chunks()
        v = v.filter(pc.is_valid(v))
        h = np.unique(md5_u64(pc.cast(v, pa.string())))
        return pa.table({"h": pa.array(h[:k], pa.uint64())})

    parts = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    allh = np.unique(np.array([r["h"] for r in parts], dtype=np.uint64))[:k]
    if len(allh) < k:
        # fewer than k distinct values: the hash set IS the exact count
        est = float(len(allh))
        hk = int(allh[-1]) if len(allh) else 0
    else:
        hk = int(allh[-1])
        est = (k - 1) * (2.0 ** 64) / float(np.uint64(hk))
    return pa.table({
        "estimate": pa.array([est], pa.float64()),
        "k": pa.array([min(k, len(allh))], pa.int64()),
        "h_k": pa.array([hk], pa.uint64()),
    })

def approx_distinct_hll(ds, col: str, p: int = 8) -> pa.Table:
    """HyperLogLog distinct-count estimator (Flajolet et al. 2007) with
    DETERMINISTIC registers: bucket = top ``p`` bits of the md5 bridge
    hash, rho = leading-zero count of the remaining 64-p bits + 1,
    register = max rho — a pure function of the value SET, so per-block
    register partials + a max-fold reproduce the single-machine sketch
    exactly and the SQL oracle states the identical registers via
    length(bin(w)). Includes the standard small-range linear-counting
    correction. Returns one row (m, n_zero, estimate).

    vs KMV: HLL registers are O(m) bytes and merge by elementwise max —
    the shape that unions across shards/epochs for free; KMV keeps exact
    low-range behavior. Both ship here because both merge disciplines
    appear in real pipelines.

    Bit lengths are computed by vectorized binary search (6 shift
    passes), never floor(log2(float)) — a 56-bit integer rounds to a
    53-bit mantissa and can cross a power of two at the boundary."""
    from ray.data.aggregate import Max

    m = 1 << p
    wbits = 64 - p
    mask = np.uint64((1 << wbits) - 1)

    def partial(t: pa.Table) -> pa.Table:
        v = t[col].combine_chunks()
        v = v.filter(pc.is_valid(v))
        if len(v) == 0:
            return pa.table({
                "j": pa.array([], pa.int64()),
                "rho": pa.array([], pa.int64()),
            })
        h = md5_u64(pc.cast(v, pa.string()))
        j = (h >> np.uint64(wbits)).astype(np.int64)
        w = h & mask
        bl = np.zeros(len(w), np.int64)
        vv = w.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            big = vv >= np.uint64(1 << shift)
            bl[big] += shift
            vv[big] >>= np.uint64(shift)
        bl += (vv > 0).astype(np.int64)
        rho = (wbits + 1) - bl  # w == 0 -> bl 0 -> rho = wbits + 1
        reg = np.zeros(m, np.int64)
        np.maximum.at(reg, j, rho)
        nz = np.nonzero(reg)[0]
        return pa.table({
            "j": pa.array(nz.astype(np.int64)),
            "rho": pa.array(reg[nz]),
        })

    rows = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("j")
        .aggregate(Max("rho", alias_name="rho"))
        .take_all()
    )  # <= m rows
    reg = np.zeros(m, np.int64)
    for r in rows:
        reg[r["j"]] = r["rho"]
    v_zero = int((reg == 0).sum())
    denom = float(np.power(2.0, -reg.astype(np.float64)).sum())
    alpha = 0.7213 / (1.0 + 1.079 / m)
    raw = alpha * m * m / denom
    if raw <= 2.5 * m and v_zero > 0:
        est = m * np.log(m / v_zero)
    else:
        est = raw
    return pa.table({
        "m": pa.array([m], pa.int64()),
        "n_zero": pa.array([v_zero], pa.int64()),
        "estimate": pa.array([round(float(est), 3)], pa.float64()),
    })


def heavy_hitters(ds, explode, k: int = 20, width: int = 2048):
    """EXACT top-k most frequent items via the two-pass Misra-Gries
    pattern — the scalable heavy-hitters shape (find candidates with a
    bounded-memory sketch, then count ONLY the candidates exactly):

    - pass 1: every block folds a Misra-Gries summary of ``width``
      (item, count) counters (vectorized: bincount, keep the top
      ``width`` — a SUPERSET of decremented-MG survivors, so the
      classic guarantee transfers: any item with true count > N/width
      survives in at least one block's summary). The partials MERGE
      DISTRIBUTED — one item-hash groupby sums retained counts (the
      mergeable-summaries fold of Agarwal et al.), then a per-block
      top-width + driver merge cuts the candidate set to ``width``
      items; summed retained counts undercount true counts by at most
      N/width total, so any item with true count > 2N/width survives
      the cut. The driver never holds width x blocks rows — only the
      final width candidates plus #blocks x width merge partials of
      the already-folded summary.
    - pass 2: one streaming filter of the input against the broadcast
      candidate set + a tiny groupby counts candidates EXACTLY.

    Result = exact top-k by (count desc, item asc) whenever the true
    k-th count exceeds 2N/width (choose width >> k x skew; the driver
    queries use width=2048 over a ~1k vocabulary, making pass 1
    lossless outright). The corpus never shuffles — only candidate
    rows do, and only their (item, count) partials.

    ``explode(batch) -> pa.StringArray`` maps a batch to its item
    multiset (e.g. tokens); plug any item domain."""
    import ray
    from ray.data.aggregate import Sum

    def _top_width(vocab, counts) -> "tuple":
        if len(counts) <= width:
            keep = np.ones(len(counts), dtype=bool)
        else:
            # keep counters above the (n-width)-th largest, filling
            # boundary ties deterministically (lowest item string first)
            kth = np.partition(counts, len(counts) - width)[len(counts) - width]
            keep = counts > kth
            need = width - int(keep.sum())
            if need > 0:
                tie_idx = np.nonzero(counts == kth)[0]
                order = np.argsort(
                    np.asarray([str(vocab[i]) for i in tie_idx], dtype=object)
                )
                keep[tie_idx[order[:need]]] = True
        m = pa.array(keep)
        return vocab.filter(m), counts[keep]

    def mg_partial(t: pa.Table) -> pa.Table:
        items = explode(t)
        if len(items) == 0:
            return pa.table({"item": pa.array([], pa.string()),
                             "pcnt": pa.array([], pa.int64())})
        enc = pc.dictionary_encode(items)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        counts = np.bincount(
            enc.indices.to_numpy(zero_copy_only=False),
            minlength=len(enc.dictionary),
        )
        vocab, kept = _top_width(enc.dictionary, counts)
        return pa.table({"item": vocab, "pcnt": pa.array(kept, pa.int64())})

    # mergeable-summaries fold: sum retained counts per item (ONE
    # distributed item groupby of the width-bounded partials), then cut
    # to width candidates via per-block top-width + a driver merge of
    # the folded summary's few blocks
    folded_partials = (
        ds.map_batches(mg_partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("item")
        .aggregate(Sum("pcnt", alias_name="pcnt"))
    )

    def block_top(t: pa.Table) -> pa.Table:
        v = t["item"].combine_chunks()
        c = t["pcnt"].combine_chunks().to_numpy(zero_copy_only=False)
        vv, cc = _top_width(v, np.asarray(c, dtype=np.int64))
        return pa.table({"item": vv, "pcnt": pa.array(cc, pa.int64())})

    from debezium_incubator_ray.functions.kernels import collect_table

    merged = collect_table(
        folded_partials.map_batches(block_top, batch_format="pyarrow",
                                    zero_copy_batch=True),
        empty=pa.table({"item": pa.array([], pa.string()),
                        "pcnt": pa.array([], pa.int64())}),
    )
    vv, _ = _top_width(
        merged["item"].combine_chunks(),
        merged["pcnt"].combine_chunks().to_numpy(zero_copy_only=False)
        .astype(np.int64),
    )
    cand_ref = ray.put(pc.cast(vv, pa.string()))

    def count_candidates(t: pa.Table) -> pa.Table:
        items = explode(t)
        wanted = ray.get(cand_ref)
        hit = items.filter(pc.is_in(items, value_set=wanted))
        if len(hit) == 0:
            return pa.table({
                "item": pa.array([], pa.string()),
                "cnt": pa.array([], pa.int64()),
            })
        g = pa.table({"item": hit}).group_by("item").aggregate([([], "count_all")])
        return pa.table({
            "item": g["item"],
            "cnt": pc.cast(g["count_all"], pa.int64()),
        })

    folded = (
        ds.map_batches(count_candidates, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("item")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )

    def finish(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t, sort_keys=[("cnt", "descending"), ("item", "ascending")]
        )
        top = t.take(idx[:k])
        return pa.table({
            "item": top["item"],
            "cnt": pc.cast(top["cnt"], pa.int64()),
            "rank": pa.array(np.arange(1, top.num_rows + 1, dtype=np.int64)),
        })

    # the fold output is (distinct candidates) rows — tiny; one final cut
    from debezium_incubator_ray.functions.kernels import collect_table

    tbl = collect_table(folded, empty=pa.table({
        "item": pa.array([], pa.string()), "cnt": pa.array([], pa.int64()),
    }))
    return finish(tbl)


def hll_grouped(ds, group_col: str, col: str, p: int = 8) -> pa.Table:
    """Per-GROUP HyperLogLog distinct-count estimates — the grouped form
    of approx_distinct_hll (audience size per segment, distinct users
    per event type) with the same deterministic md5-bridge registers.

    Scale shape: every block folds its own (group, bucket, max-rho)
    partial rows (bounded by groups x m per block); ONE distributed
    groupby max-folds the registers; the driver finishes groups x m tiny
    rows into one estimate per group. Registers merge by elementwise
    max, so shard/epoch unions are free — the property that makes HLL
    the per-segment cardinality sketch at 100 TB."""
    from ray.data.aggregate import Max

    m = 1 << p
    wbits = 64 - p
    mask = np.uint64((1 << wbits) - 1)

    def partial(t: pa.Table) -> pa.Table:
        d = t.select([group_col, col]).filter(pc.is_valid(t[col]))
        if d.num_rows == 0:
            return pa.table({
                group_col: pa.array([], t[group_col].type),
                "j": pa.array([], pa.int64()),
                "rho": pa.array([], pa.int64()),
            })
        h = md5_u64(pc.cast(d[col].combine_chunks(), pa.string()))
        j = (h >> np.uint64(wbits)).astype(np.int64)
        w = h & mask
        bl = np.zeros(len(w), np.int64)
        vv = w.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            big = vv >= np.uint64(1 << shift)
            bl[big] += shift
            vv[big] >>= np.uint64(shift)
        bl += (vv > 0).astype(np.int64)
        rho = (wbits + 1) - bl
        tb = pa.table({
            group_col: d[group_col],
            "j": pa.array(j),
            "rho": pa.array(rho),
        })
        g = tb.group_by([group_col, "j"]).aggregate([("rho", "max")])
        return pa.table({
            group_col: g[group_col],
            "j": g["j"],
            "rho": pc.cast(g["rho_max"], pa.int64()),
        })

    rows = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([group_col, "j"])
        .aggregate(Max("rho", alias_name="rho"))
        .take_all()
    )  # <= groups x m rows — tiny
    from collections import defaultdict

    regs: dict = defaultdict(lambda: np.zeros(m, np.int64))
    for r in rows:
        regs[r[group_col]][r["j"]] = r["rho"]
    alpha = 0.7213 / (1.0 + 1.079 / m)
    out_g, out_z, out_e = [], [], []
    for gval in sorted(regs, key=lambda x: (x is None, x)):
        reg = regs[gval]
        v_zero = int((reg == 0).sum())
        denom = float(np.power(2.0, -reg.astype(np.float64)).sum())
        raw = alpha * m * m / denom
        est = m * np.log(m / v_zero) if (raw <= 2.5 * m and v_zero > 0) else raw
        out_g.append(gval)
        out_z.append(v_zero)
        out_e.append(round(float(est), 3))
    return pa.table({
        group_col: pa.array(out_g),
        "m": pa.array([m] * len(out_g), pa.int64()),
        "n_zero": pa.array(out_z, pa.int64()),
        "estimate": pa.array(out_e, pa.float64()),
    })
