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
