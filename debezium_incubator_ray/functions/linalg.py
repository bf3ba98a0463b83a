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
