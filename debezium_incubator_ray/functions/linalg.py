"""Distributed dense linear algebra over embedding columns.

The building blocks an embedding-curation pipeline needs before anything
fancier (PCA whitening, spectral dedup, drift monitoring) are the corpus
Gram matrix X'X, the column means, and from them the covariance — all
decomposable as per-batch partial sums + one tiny driver fold, so they
stream at the read's parallelism with O(d^2) bytes per block leaving the
tasks regardless of corpus size. The reference has no linear algebra; this
extends the training-data surface over the same substrate (SURVEY.md §2.5's
decomposable-aggregate family, e.g. the partial-sum shape of
OracleDatabaseVersion-style fold-then-merge counters is the same pattern).

At 100 TB: each task ships d*(d+1)/2 float64s (d=64 → 16 KiB) no matter how
many rows it read; the driver folds #blocks such vectors. No shuffle at all.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _batch_xtx(batch: pa.Table, col: str) -> pa.Table:
    """One partial per batch: n, column sums, and the upper triangle of
    X'X (float64 accumulation regardless of storage dtype). Null
    embeddings are excluded from n and the sums; a ragged batch (rows of
    differing dimension) raises instead of silently misaligning the
    reshape."""
    emb = batch[col].combine_chunks()
    if emb.null_count:
        emb = emb.drop_null()
    n = len(emb)
    if n == 0:
        return pa.table(
            {
                "n": pa.array([], pa.int64()),
                "sums": pa.array([], pa.large_list(pa.float64())),
                "gram": pa.array([], pa.large_list(pa.float64())),
            }
        )
    lens = pc.unique(pc.list_value_length(emb))
    if len(lens) != 1:
        raise ValueError(
            f"ragged embedding column: found lengths {lens.to_pylist()}"
        )
    d = lens[0].as_py()
    flat = emb.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    X = flat.reshape(n, d)
    g = X.T @ X
    iu = np.triu_indices(d)
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "sums": pa.array([X.sum(axis=0)], pa.large_list(pa.float64())),
            "gram": pa.array([g[iu]], pa.large_list(pa.float64())),
        }
    )


def _fold_partials(ds, col: str):
    """Stream the O(blocks × d^2) partial rows to the driver and fold.
    Returns (n_total, sums[d], gram upper-tri flat)."""
    n_total = 0
    sums: Optional[np.ndarray] = None
    gram: Optional[np.ndarray] = None
    parts = ds.map_batches(
        lambda t: _batch_xtx(t, col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    # each row is one block's 16 KiB partial — this is a combiner fold,
    # not a dataset materialization
    for b in parts.iter_batches(batch_format="pyarrow"):
        for i in range(b.num_rows):
            n_total += b["n"][i].as_py()
            s = np.asarray(b["sums"][i].as_py(), dtype=np.float64)
            g = np.asarray(b["gram"][i].as_py(), dtype=np.float64)
            sums = s if sums is None else sums + s
            gram = g if gram is None else gram + g
    return n_total, sums, gram


def gram_matrix(ds, col: str = "embedding") -> pa.Table:
    """Upper-triangle corpus Gram matrix as (i, j, gram) rows, i <= j.

    Oracle-SQL-expressible: gram(i,j) = SUM(v_i * v_j) over all rows via
    UNNEST + self-join — float64 accumulation both sides, so the values
    agree to well past 6 decimal places."""
    n, sums, gram = _fold_partials(ds, col)
    if sums is None:
        return pa.table(
            {
                "i": pa.array([], pa.int64()),
                "j": pa.array([], pa.int64()),
                "gram": pa.array([], pa.float64()),
            }
        )
    d = len(sums)
    iu = np.triu_indices(d)
    return pa.table(
        {
            "i": pa.array(iu[0].astype(np.int64)),
            "j": pa.array(iu[1].astype(np.int64)),
            "gram": pa.array(gram),
        }
    )


def covariance_matrix(ds, col: str = "embedding") -> pa.Table:
    """Upper-triangle sample covariance (denominator n-1) as (i, j, cov)
    rows from the same one-pass partials: cov = (X'X - n·mean·mean') / (n-1)."""
    n, sums, gram = _fold_partials(ds, col)
    if sums is None or n < 2:
        return pa.table(
            {
                "i": pa.array([], pa.int64()),
                "j": pa.array([], pa.int64()),
                "cov": pa.array([], pa.float64()),
            }
        )
    d = len(sums)
    mean = sums / n
    iu = np.triu_indices(d)
    cov = (gram - n * (mean[iu[0]] * mean[iu[1]])) / (n - 1)
    return pa.table(
        {
            "i": pa.array(iu[0].astype(np.int64)),
            "j": pa.array(iu[1].astype(np.int64)),
            "cov": pa.array(cov),
        }
    )


def top_eigvec(ds, col: str = "embedding", iters: int = 32) -> np.ndarray:
    """Principal direction by power iteration on the driver-folded d×d
    Gram (the heavy O(rows·d²) pass is distributed; the d×d eigenproblem
    is trivially local). Deterministic all-ones start (an e_j start goes
    NaN when G's j-th column is zero and stalls when e_j is orthogonal to
    the dominant eigenvector)."""
    n, sums, gram = _fold_partials(ds, col)
    if sums is None:
        return np.empty(0)
    d = len(sums)
    G = np.zeros((d, d))
    iu = np.triu_indices(d)
    G[iu] = gram
    G = G + G.T - np.diag(np.diag(G))
    v = np.full(d, 1.0 / np.sqrt(d))
    for _ in range(iters):
        v = G @ v
        nv = np.linalg.norm(v)
        if nv == 0.0:  # G annihilated v (zero matrix): no principal direction
            return np.zeros(d)
        v = v / nv
    return v


def quantize_int8_stats(ds, col: str = "embedding"):
    """Scalar (per-dimension) int8 quantization of an embedding column —
    the storage-compression step before a 100 TB vector corpus ships to an
    ANN index. code = floor((v - lo_d) / (hi_d - lo_d) * 255 + 0.5)
    clipped to [0, 255], with (lo_d, hi_d) the corpus-global per-dimension
    range.

    Two streaming passes, both decomposable: (1) per-batch per-dim
    min/max partials (d rows per block) folded on the driver — O(d) state,
    the calibration table; (2) the d-float broadcast range re-quantizes
    every batch and emits per-dim (sum_code, n) partials folded by one
    tiny groupby. Returns one row per dimension: (i, lo, hi, avg_code) —
    the verification surface; the per-row codes themselves stay inside the
    tasks (at scale they'd stream to the sink, not to the driver).

    All arithmetic is float64 in exactly the SQL evaluation order
    ((v - lo) / (hi - lo) * 255 + 0.5), so a DuckDB oracle reproduces the
    codes bit-for-bit."""

    def minmax_partial(t: pa.Table) -> pa.Table:
        emb = t[col].combine_chunks()
        if emb.null_count:
            emb = emb.drop_null()
        n = len(emb)
        if n == 0:
            return pa.table({
                "i": pa.array([], pa.int64()),
                "lo": pa.array([], pa.float64()),
                "hi": pa.array([], pa.float64()),
            })
        lens = pc.unique(pc.list_value_length(emb))
        if len(lens) != 1:
            raise ValueError(
                f"ragged embedding column: lengths {lens.to_pylist()}"
            )
        d = lens[0].as_py()
        X = emb.flatten().to_numpy(zero_copy_only=False).astype(
            np.float64
        ).reshape(n, d)
        return pa.table({
            "i": pa.array(np.arange(d, dtype=np.int64)),
            "lo": pa.array(X.min(axis=0)),
            "hi": pa.array(X.max(axis=0)),
        })

    lo: Optional[np.ndarray] = None
    hi: Optional[np.ndarray] = None
    parts = ds.map_batches(
        minmax_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    for b in parts.iter_batches(batch_format="pyarrow"):
        if b.num_rows == 0:
            continue
        i = b["i"].to_numpy(zero_copy_only=False)
        blo = b["lo"].to_numpy(zero_copy_only=False)
        bhi = b["hi"].to_numpy(zero_copy_only=False)
        # iter_batches re-chunks the d-row partials (default 256-row
        # batches), so a batch may cover only a slice of the dimensions:
        # grow the fold arrays to the largest index seen so far.
        d_seen = int(i.max()) + 1
        if lo is None:
            lo = np.full(d_seen, np.inf)
            hi = np.full(d_seen, -np.inf)
        elif d_seen > len(lo):
            pad = d_seen - len(lo)
            lo = np.concatenate([lo, np.full(pad, np.inf)])
            hi = np.concatenate([hi, np.full(pad, -np.inf)])
        np.minimum.at(lo, i, blo)
        np.maximum.at(hi, i, bhi)
    if lo is None:
        raise ValueError("no embeddings to quantize")
    lo_b, hi_b = lo, hi  # captured per task; d floats — broadcast-small

    def code_partial(t: pa.Table) -> pa.Table:
        emb = t[col].combine_chunks()
        if emb.null_count:
            emb = emb.drop_null()
        n = len(emb)
        d = len(lo_b)
        if n == 0:
            return pa.table({
                "i": pa.array([], pa.int64()),
                "sum_code": pa.array([], pa.float64()),
                "cnt": pa.array([], pa.int64()),
            })
        X = emb.flatten().to_numpy(zero_copy_only=False).astype(
            np.float64
        ).reshape(n, d)
        codes = np.clip(
            np.floor((X - lo_b) / (hi_b - lo_b) * 255 + 0.5), 0, 255
        )
        return pa.table({
            "i": pa.array(np.arange(d, dtype=np.int64)),
            "sum_code": pa.array(codes.sum(axis=0)),
            "cnt": pa.array(np.full(d, n, dtype=np.int64)),
        })

    from ray.data.aggregate import Sum

    folded = (
        ds.map_batches(code_partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("i")
        .aggregate(Sum("sum_code", alias_name="sum_code"),
                   Sum("cnt", alias_name="cnt"))
    )

    def finish(t: pa.Table) -> pa.Table:
        i = t["i"].to_numpy(zero_copy_only=False)
        return pa.table({
            "i": t["i"],
            "lo": pa.array(np.round(lo_b[i], 6)),
            "hi": pa.array(np.round(hi_b[i], 6)),
            "avg_code": pc.round(
                pc.divide(t["sum_code"], pc.cast(t["cnt"], pa.float64())),
                ndigits=6,
            ),
        })

    return folded.map_batches(finish, batch_format="pyarrow")
