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
