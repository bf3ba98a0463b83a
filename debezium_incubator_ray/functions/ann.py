"""Approximate-nearest-neighbor search over an embedding column.

- Brute-force cosine top-k: the correctness baseline. Query matrix is
  broadcast once (ray.put), each batch does one float64 matmul against it
  and emits per-batch top-k candidates; a final tiny reduce merges them.
  Nothing but (query_id, vec_id, score) rows ever leave a task.
- LSH-bucketed variant: random-hyperplane signatures bucket the corpus;
  search touches only colliding buckets — the 100 TB scale path (signature
  build is one matmul per batch; bucket search is the same brute-force kernel
  per bucket).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa


def _batch_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    """list<float> column → (n, d) float64 matrix, zero-copy-ish."""
    arr = batch[col].combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    d = len(flat) // max(n, 1)
    return flat.reshape(n, d)


def _normalize(m: np.ndarray) -> np.ndarray:
    norm = np.linalg.norm(m, axis=1, keepdims=True)
    norm[norm == 0] = 1.0
    return m / norm


class BruteForceTopK:
    """Actor-pool stage: holds the normalized broadcast query matrix (loaded
    once in __init__ from the object store), emits per-batch top-k rows."""

    def __init__(self, queries_ref, k: int, id_col: str = "vec_id", col: str = "embedding"):
        import ray

        q = ray.get(queries_ref)
        self.qids = q["ids"]
        self.Q = _normalize(np.asarray(q["matrix"], dtype=np.float64))
        self.k = k
        self.id_col = id_col
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        M = _normalize(_batch_matrix(batch, self.col))
        ids = batch[self.id_col].to_numpy()
        sims = self.Q @ M.T  # (nq, nb)
        nb = sims.shape[1]
        k = min(self.k, nb)
        rows_q, rows_v, rows_s = [], [], []
        for qi in range(sims.shape[0]):
            s = sims[qi]
            # exact per-batch top-k with the oracle's tie-break: take every
            # candidate tied at the k-th score, then order by
            # (-score, vec_id asc) — an argpartition cut would keep an
            # arbitrary member of a boundary tie and drop the lower vec_id
            kth = np.partition(s, nb - k)[nb - k]
            cand = np.nonzero(s >= kth)[0]
            sel = cand[np.lexsort((ids[cand], -s[cand]))][:k]
            rows_q.append(np.full(k, self.qids[qi], dtype=np.int64))
            rows_v.append(ids[sel].astype(np.int64))
            rows_s.append(s[sel])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(rows_q)),
                "vec_id": pa.array(np.concatenate(rows_v)),
                "score": pa.array(np.concatenate(rows_s)),
            }
        )


def brute_force_topk(
    ds,
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    k: int = 5,
    id_col: str = "vec_id",
    col: str = "embedding",
) -> pa.Table:
    """Top-k cosine neighbors for each query. Returns a small pa.Table
    (query_id, vec_id, rank, score), rank 1-based, ties broken by vec_id
    ascending (deterministic, oracle-matched)."""
    import ray

    ref = ray.put({"ids": np.asarray(query_ids, dtype=np.int64), "matrix": query_matrix})
    partial = ds.map_batches(
        BruteForceTopK,
        fn_constructor_kwargs={"queries_ref": ref, "k": k, "id_col": id_col, "col": col},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=4096,
        concurrency=2,
    )
    cand = partial.take_all()  # tiny: nq * k * n_batches rows
    if not cand:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "vec_id": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64()),
                         "score": pa.array([], pa.float64())})
    import pandas as pd

    df = pd.DataFrame(cand)
    df = df.sort_values(["query_id", "score", "vec_id"], ascending=[True, False, True])
    df = df.groupby("query_id", sort=True).head(k)
    df["rank"] = df.groupby("query_id").cumcount() + 1
    return pa.Table.from_pandas(df[["query_id", "vec_id", "rank", "score"]], preserve_index=False)


# ---------------------------------------------------------------------------
# LSH-bucketed scale path


class HyperplaneSigner:
    """Random-hyperplane LSH signature per vector (one matmul per batch);
    planes generated once per actor from a fixed seed."""

    def __init__(self, dim: int, n_planes: int = 16, seed: int = 13, col: str = "embedding"):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, n_planes))
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        M = _batch_matrix(batch, self.col)
        bits = (M @ self.planes) > 0
        sig = np.zeros(len(M), dtype=np.int64)
        for j in range(bits.shape[1]):
            sig |= bits[:, j].astype(np.int64) << j
        return batch.append_column("lsh_bucket", pa.array(sig, type=pa.int64()))


def lsh_topk(
    ds,
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    col: str = "embedding",
) -> pa.Table:
    """Approximate top-k: search only vectors whose hyperplane bucket matches
    the query's. Recall < 1.0 by design; at scale the bucket column becomes a
    partition key so a query touches one partition instead of the corpus."""
    signer = HyperplaneSigner(dim, n_planes)
    qbits = (np.asarray(query_matrix, dtype=np.float64) @ signer.planes) > 0
    qsig = np.zeros(len(query_matrix), dtype=np.int64)
    for j in range(qbits.shape[1]):
        qsig |= qbits[:, j].astype(np.int64) << j

    bucketed = ds.map_batches(signer, batch_format="pyarrow", zero_copy_batch=True)
    wanted = pa.array(np.unique(qsig))

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.is_in(batch["lsh_bucket"], value_set=wanted))

    sub = bucketed.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
    out = brute_force_topk(sub, query_ids, query_matrix, k=k, col=col)
    return out
