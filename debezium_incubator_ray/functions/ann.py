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
    return _merge_topk(partial.take_all(), k)


def _merge_topk(cand: list, k: int) -> pa.Table:
    """Final tiny reduce of per-batch candidates (nq * k * n_batches rows)
    with the deterministic (-score, vec_id) order — numpy lexsort + one
    run-length rank pass, keeping the ANN path Arrow/numpy-pure."""
    if not cand:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "vec_id": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64()),
                         "score": pa.array([], pa.float64())})
    q = np.fromiter((r["query_id"] for r in cand), np.int64, len(cand))
    v = np.fromiter((r["vec_id"] for r in cand), np.int64, len(cand))
    s = np.fromiter((r["score"] for r in cand), np.float64, len(cand))
    order = np.lexsort((v, -s, q))  # query asc, score desc, vec_id asc
    q, v, s = q[order], v[order], s[order]
    first = np.ones(len(q), dtype=bool)
    first[1:] = q[1:] != q[:-1]
    starts = np.nonzero(first)[0]
    runs = np.diff(np.append(starts, len(q)))
    rank = np.arange(len(q), dtype=np.int64) - np.repeat(starts, runs) + 1
    keep = rank <= k
    return pa.table({
        "query_id": pa.array(q[keep]),
        "vec_id": pa.array(v[keep]),
        "rank": pa.array(rank[keep]),
        "score": pa.array(s[keep]),
    })


# ---------------------------------------------------------------------------
# LSH-bucketed scale path


class HyperplaneSigner:
    """Hyperplane LSH signature per vector (one matmul per batch); planes
    built once per actor. Two plane families:

    - random Gaussian hyperplanes (``axis_aligned=False``, classic SimHash
      LSH — the scale default);
    - axis-aligned hyperplanes (``axis_aligned=True``): bit j = sign of
      coordinate j. An equally valid LSH family whose buckets are
      reproducible by plain SQL over the embedding list column — the
      cross-engine verification bridge for the bucketed search."""

    def __init__(
        self,
        dim: int,
        n_planes: int = 16,
        seed: int = 13,
        col: str = "embedding",
        axis_aligned: bool = False,
    ):
        if axis_aligned:
            assert n_planes <= dim
            self.planes = np.eye(dim)[:, :n_planes]
        else:
            rng = np.random.default_rng(seed)
            self.planes = rng.standard_normal((dim, n_planes))
        self.col = col

    def sign(self, M: np.ndarray) -> np.ndarray:
        bits = (np.asarray(M, dtype=np.float64) @ self.planes) > 0
        sig = np.zeros(len(M), dtype=np.int64)
        for j in range(bits.shape[1]):
            sig |= bits[:, j].astype(np.int64) << j
        return sig

    def __call__(self, batch: pa.Table) -> pa.Table:
        sig = self.sign(_batch_matrix(batch, self.col))
        return batch.append_column("lsh_bucket", pa.array(sig, type=pa.int64()))


def _masked_topk(sims: np.ndarray, ids: np.ndarray, qids: np.ndarray, k: int) -> pa.Table:
    """Per-query top-k over a (nq, nb) score matrix where excluded
    candidates are -inf; ties at the k-th cut keep the LOWER vec_id
    (the deterministic oracle order)."""
    rows_q, rows_v, rows_s = [], [], []
    for qi in range(sims.shape[0]):
        s = sims[qi]
        cand = np.nonzero(s > -np.inf)[0]
        if len(cand) == 0:
            continue
        kk = min(k, len(cand))
        sc = s[cand]
        kth = np.partition(sc, len(sc) - kk)[len(sc) - kk]
        cand = cand[sc >= kth]
        sel = cand[np.lexsort((ids[cand], -s[cand]))][:kk]
        rows_q.append(np.full(len(sel), qids[qi], dtype=np.int64))
        rows_v.append(ids[sel].astype(np.int64))
        rows_s.append(s[sel])
    if not rows_q:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "vec_id": pa.array([], pa.int64()),
                         "score": pa.array([], pa.float64())})
    return pa.table(
        {
            "query_id": pa.array(np.concatenate(rows_q)),
            "vec_id": pa.array(np.concatenate(rows_v)),
            "score": pa.array(np.concatenate(rows_s)),
        }
    )


class _BucketMatchTopK(BruteForceTopK):
    """BruteForceTopK restricted per query to corpus vectors in the SAME
    LSH bucket (sims to other buckets masked out before the top-k cut)."""

    def __init__(self, queries_ref, k, qsig, id_col="vec_id", col="embedding"):
        super().__init__(queries_ref, k, id_col, col)
        self.qsig = np.asarray(qsig, dtype=np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        M = _normalize(_batch_matrix(batch, self.col))
        ids = batch[self.id_col].to_numpy()
        buckets = batch["lsh_bucket"].to_numpy()
        sims = self.Q @ M.T
        sims = np.where(self.qsig[:, None] == buckets[None, :], sims, -np.inf)
        return _masked_topk(sims, ids, self.qids, self.k)


def lsh_topk(
    ds,
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    col: str = "embedding",
    axis_aligned: bool = False,
) -> pa.Table:
    """Approximate top-k: each query searches ONLY corpus vectors in its
    hyperplane bucket. Recall < 1.0 by design (bucket boundaries cut true
    neighbors); at scale the bucket column becomes a partition key so a
    query touches one partition instead of the corpus. The corpus is pruned
    to the union of query buckets at the read, then per-query bucket
    equality is enforced inside the scorer."""
    signer = HyperplaneSigner(dim, n_planes, col=col, axis_aligned=axis_aligned)
    qsig = signer.sign(np.asarray(query_matrix, dtype=np.float64))

    bucketed = ds.map_batches(signer, batch_format="pyarrow", zero_copy_batch=True)
    wanted = pa.array(np.unique(qsig))

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.is_in(batch["lsh_bucket"], value_set=wanted))

    sub = bucketed.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
    import ray

    ref = ray.put({"ids": np.asarray(query_ids, dtype=np.int64), "matrix": query_matrix})
    partial = sub.map_batches(
        _BucketMatchTopK,
        fn_constructor_kwargs={"queries_ref": ref, "k": k, "qsig": qsig, "col": col},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=4096,
        concurrency=2,
    )
    return _merge_topk(partial.take_all(), k)


# ---------------------------------------------------------------------------
# IVF (inverted-file) scale path


class _IVFTopK(BruteForceTopK):
    """BruteForceTopK restricted per query to corpus vectors whose nearest
    centroid is in the query's probe set. Assignment happens inside the
    batch (one matmul vs the broadcast centroid matrix) — the corpus is
    never staged twice."""

    def __init__(self, queries_ref, k, centroids, probes, id_col="vec_id", col="embedding"):
        super().__init__(queries_ref, k, id_col, col)
        self.C = _normalize(np.asarray(centroids, dtype=np.float64))
        self.P = np.asarray(probes, dtype=bool)  # (nq, n_centroids)

    def __call__(self, batch: pa.Table) -> pa.Table:
        M = _normalize(_batch_matrix(batch, self.col))
        ids = batch[self.id_col].to_numpy()
        # nearest centroid; np.argmax keeps the FIRST max = lowest centroid
        # index on ties (the oracle's ORDER BY cos DESC, cid ASC)
        assign = np.argmax(M @ self.C.T, axis=1)
        sims = self.Q @ M.T
        sims = np.where(self.P[:, assign], sims, -np.inf)
        return _masked_topk(sims, ids, self.qids, self.k)


def ivf_topk(
    ds,
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    centroids: np.ndarray,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    col: str = "embedding",
) -> pa.Table:
    """IVF approximate top-k: corpus vectors are assigned to their nearest
    centroid (cosine); each query probes only its ``nprobe`` closest
    centroids' lists and ranks those exactly.

    At scale the assignment becomes the partition key (write the corpus
    bucketed by centroid once, then a query reads nprobe partitions instead
    of the corpus — compute drops by ~n_centroids/nprobe). Centroids are
    caller-supplied: k-means for quality, or any deterministic pick (e.g.
    the first K vectors) when cross-engine reproducibility matters more
    than recall. Ties break toward the lower centroid index and lower
    vec_id — fully deterministic."""
    import ray

    Cn = _normalize(np.asarray(centroids, dtype=np.float64))
    Qn = _normalize(np.asarray(query_matrix, dtype=np.float64))
    qsims = Qn @ Cn.T  # (nq, nc)
    nq, nc = qsims.shape
    probes = np.zeros((nq, nc), dtype=bool)
    for qi in range(nq):  # nq is small (the query set)
        order = np.lexsort((np.arange(nc), -qsims[qi]))
        probes[qi, order[: min(nprobe, nc)]] = True
    ref = ray.put({"ids": np.asarray(query_ids, dtype=np.int64), "matrix": query_matrix})
    partial = ds.map_batches(
        _IVFTopK,
        fn_constructor_kwargs={
            "queries_ref": ref, "k": k, "centroids": centroids,
            "probes": probes, "id_col": id_col, "col": col,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=4096,
        concurrency=2,
    )
    return _merge_topk(partial.take_all(), k)


# ---------------------------------------------------------------------------
# spherical k-means (IVF centroid training)


def kmeans_assign(M: np.ndarray, C: np.ndarray) -> np.ndarray:
    """Cluster assignment by max cosine vs the (rounded) centroids —
    ties to the LOWER centroid index (np.argmax takes the first max).
    The ONE shared kernel: spherical_kmeans's per-batch pass and every
    downstream consumer (e.g. the SemDeDup prune) must assign
    identically or their oracles desynchronize."""
    return np.argmax(_normalize(M) @ _normalize(C).T, axis=1)


def spherical_kmeans(
    ds,
    init_centroids: np.ndarray,
    iters: int = 2,
    id_col: str = "vec_id",
    col: str = "embedding",
):
    """Spherical k-means: assign by max cosine (ties -> lower centroid
    index), recenter as the element-wise mean of raw member vectors.
    Returns (centroids ndarray, assignment Dataset of (id, cluster)).

    Scale shape: each iteration is ONE streaming pass — per batch: one
    matmul vs the broadcast centroids, then per-cluster partial sums
    (k x d floats + k counts per batch, metadata-sized); the driver
    reduces partials and re-broadcasts. Centroids are rounded to 6
    decimals per iteration so the trajectory is reproducible across
    engines/summation orders (the cross-engine oracle bridge). Empty
    clusters keep their previous centroid."""
    import ray

    C = np.round(np.asarray(init_centroids, dtype=np.float64), 6)
    k = C.shape[0]

    def partials_fn(cref):
        def f(t: pa.Table) -> pa.Table:
            import ray as _ray

            M = _batch_matrix(t, col)
            assign = kmeans_assign(M, _ray.get(cref))
            sums = np.zeros((k, M.shape[1]))
            np.add.at(sums, assign, M)
            counts = np.bincount(assign, minlength=k).astype(np.int64)
            return pa.table(
                {
                    "cid": pa.array(np.arange(k, dtype=np.int64)),
                    "s": pa.array(list(sums)),
                    "n": pa.array(counts),
                }
            )

        return f

    for _ in range(iters):
        cref = ray.put(C)
        rows = ds.map_batches(
            partials_fn(cref), batch_format="pyarrow", zero_copy_batch=True
        ).take_all()  # k rows per batch — metadata-sized
        sums = np.zeros_like(C)
        counts = np.zeros(k, dtype=np.int64)
        for r in rows:
            sums[int(r["cid"])] += np.asarray(r["s"])
            counts[int(r["cid"])] += int(r["n"])
        nz = counts > 0
        C = C.copy()
        C[nz] = np.round(sums[nz] / counts[nz, None], 6)

    cref = ray.put(C)

    def assign_fn(t: pa.Table) -> pa.Table:
        import ray as _ray

        Cn = _normalize(_ray.get(cref))
        M = _normalize(_batch_matrix(t, col))
        a = np.argmax(M @ Cn.T, axis=1)
        return pa.table(
            {
                id_col: t[id_col],
                "cluster": pa.array(a.astype(np.int64)),
            }
        )

    return C, ds.map_batches(
        assign_fn, batch_format="pyarrow", zero_copy_batch=True
    )


def normalize_embeddings(
    batch: pa.Table, col: str = "embedding", out_col: str = "embedding_unit",
    ndigits: int = 6,
) -> pa.Table:
    """L2-normalize the embedding column (unit vectors make cosine = dot —
    the precondition every similarity stage here assumes). One matrix op
    per batch; zero-norm vectors pass through as zeros. Components rounded
    to ``ndigits`` so the result is bit-stable across engines (the oracle
    computes the identical expression in SQL)."""
    import pyarrow.compute as _pc

    if batch.num_rows == 0:
        return batch.append_column(
            out_col, pa.array([], pa.list_(pa.float64()))
        )
    M = _batch_matrix(batch, col)
    unit = np.round(_normalize(M), ndigits)  # zero rows stay zeros
    arr = pa.FixedSizeListArray.from_arrays(
        pa.array(unit.reshape(-1), pa.float64()), M.shape[1]
    )
    return batch.append_column(out_col, _pc.cast(arr, pa.list_(pa.float64())))


# ---------------------------------------------------------------------------
# Persisted IVF index: the scale path ivf_topk's docstring describes —
# the centroid assignment becomes the PARTITION KEY on disk, so a query
# reads nprobe partitions instead of the corpus.


def build_ivf_index(
    ds,
    centroids: np.ndarray,
    out_dir: str,
    id_col: str = "vec_id",
    col: str = "embedding",
) -> dict:
    """Write the corpus partitioned by nearest-centroid id
    (``cluster=<cid>/*.parquet``) in ONE streaming pass: per batch, one
    matmul vs the broadcast centroid matrix assigns rows; Ray's
    partitioned parquet writer lays the files out by cluster. The
    centroid matrix is persisted next to the data (_CENTROIDS.json,
    rounded 6dp — the same reproducibility contract as
    spherical_kmeans) so searches provably probe the space the index was
    built in. Publish is atomic (tmp dir + rename): readers never see a
    half-built index. Returns {"clusters": nc, "cluster_dirs": n}."""
    import json
    import os
    import shutil
    import uuid

    import ray

    # assign against the 6dp-ROUNDED matrix that gets persisted — build
    # and append must share ONE assignment space or an appended index
    # could cluster a knife-edge vector differently than a rebuild
    Cpersist = np.round(np.asarray(centroids, np.float64), 6)
    cref = ray.put(_normalize(Cpersist))
    assign = _ivf_assign_fn(cref, col)

    tmp = f"{out_dir}.{uuid.uuid4().hex}.tmp"
    assigned = ds.map_batches(assign, batch_format="pyarrow",
                              zero_copy_batch=True)
    assigned.write_parquet(tmp, partition_cols=["cluster"])
    with open(os.path.join(tmp, "_CENTROIDS.json"), "w") as f:
        json.dump({"centroids": Cpersist.tolist()}, f)
    # baseline assignment distortion (mean similarity of every vector to
    # its assigned centroid) — the reference point the append-drift
    # trigger compares against; one float-column scan of what was written
    import ray.data

    n, s = _ivf_distortion(ray.data.read_parquet(tmp, columns=["sim"]))
    _ivf_commit_manifest(tmp, {
        "files": _ivf_files_on_disk(tmp),
        "distortion": {
            "n": int(n), "sum_sim": s,
            "build_mean_sim": (s / n) if n else 0.0,
            "retrain_recommended": False,
        },
    })
    shutil.rmtree(out_dir, ignore_errors=True)
    os.rename(tmp, out_dir)  # the visibility point
    nc = len(centroids)
    n_rows = sum(
        1 for d in os.listdir(out_dir) if d.startswith("cluster=")
    )
    return {"clusters": nc, "cluster_dirs": n_rows,
            "build_mean_sim": (s / n) if n else 0.0}


def _ivf_assign_fn(cref, col: str):
    """THE cluster-assignment closure — build and append must assign
    identically (against the persisted, rounded centroid matrix) or the
    index diverges from a rebuild; one closure, used by both."""

    def assign(t: pa.Table) -> pa.Table:
        import ray as _ray

        C = _ray.get(cref)
        M = _normalize(_batch_matrix(t, col))
        sims = M @ C.T
        cid = np.argmax(sims, axis=1).astype(np.int64)
        # "cluster" becomes the hive partition dir (dropped from the
        # data files by the writer); "cid" persists IN the files so a
        # reader coalescing several partitions still knows each row's
        # list; "sim" (similarity to the assigned centroid) is the
        # per-row assignment-distortion term the drift trigger folds
        t = t.append_column("cluster", pa.array(cid))
        t = t.append_column("cid", pa.array(cid))
        return t.append_column(
            "sim", pa.array(sims[np.arange(len(cid)), cid])
        )

    return assign


def _ivf_distortion(ds) -> tuple:
    """(n, sum_sim) fold over an assigned dataset — distributed per-batch
    partials, only (n, s) pairs reach the driver (a one-float-column
    statistic even at corpus scale)."""

    def partial(t: pa.Table) -> pa.Table:
        s = (float(np.sum(t["sim"].to_numpy(zero_copy_only=False)))
             if t.num_rows else 0.0)
        return pa.table({"n": pa.array([t.num_rows], pa.int64()),
                         "s": pa.array([s], pa.float64())})

    rows = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    return (sum(r["n"] for r in rows), float(sum(r["s"] for r in rows)))


def _ivf_files_on_disk(root: str) -> dict:
    """{cluster_id: [relative parquet names]} actually present."""
    from debezium_incubator_ray.functions.text import _index_files_on_disk

    return _index_files_on_disk(root, prefix="cluster=")


def _ivf_commit_manifest(index_dir: str, doc: dict) -> None:
    """Atomic replace of the IVF file manifest — the shared visibility
    point (one implementation in functions/text.py)."""
    from debezium_incubator_ray.functions.text import _atomic_json_replace

    _atomic_json_replace(index_dir, "_MANIFEST.json", doc)


def _ivf_manifest(index_dir: str) -> dict:
    """The committed manifest; a pre-manifest index adopts disk state."""
    import json
    import os

    path = os.path.join(index_dir, "_MANIFEST.json")
    if not os.path.exists(path):
        return {"files": _ivf_files_on_disk(index_dir)}
    with open(path) as f:
        return json.load(f)


def append_to_ivf_index(
    index_dir: str,
    ds,
    id_col: str = "vec_id",
    col: str = "embedding",
    drift_tolerance: float = 0.05,
) -> dict:
    """Incrementally add NEW vectors: assign against the PERSISTED
    centroid matrix (the index's space never drifts under appends —
    rebuild when the distribution moves), land delta files inside the
    cluster dirs invisibly, and publish with one atomic manifest
    replace. Same single-writer lock and crash contract as the text
    and minhash index appends. The caller owns id disjointness.

    Drift trigger: the manifest carries the corpus's running assignment
    distortion (n, sum of each vector's similarity to its assigned
    centroid; baseline recorded at build). When the post-append mean
    similarity falls below ``build_mean_sim × (1 - drift_tolerance)``,
    the commit sets ``retrain_recommended`` (also returned) — skewed
    appends that the frozen centroids quantize poorly silently degrade
    partition-pruned recall even while replica-style appends (same
    distribution) pass the 16× recall law; the flag is the tripwire.
    Rebuilding with re-trained centroids resets the baseline and clears
    the flag."""
    import json
    import os
    import shutil
    import uuid

    import ray

    from debezium_incubator_ray.functions.text import (
        _index_write_lock, _promote_delta_files,
    )

    with _index_write_lock(index_dir):
        with open(os.path.join(index_dir, "_CENTROIDS.json")) as f:
            C = np.asarray(json.load(f)["centroids"], dtype=np.float64)
        cref = ray.put(_normalize(C))
        assign = _ivf_assign_fn(cref, col)

        tag = uuid.uuid4().hex
        tmp = os.path.join(index_dir, f"_append-{tag}.tmp")
        delta = ds.map_batches(assign, batch_format="pyarrow",
                               zero_copy_batch=True).materialize()
        sch = delta.schema()
        if sch is None or delta.count() == 0:
            # an empty incremental cycle is a legitimate no-op (an
            # empty materialized dataset has no schema to validate) —
            # same return shape as a real append, so drift monitors can
            # read retrain_recommended unconditionally
            dist0 = _ivf_manifest(index_dir).get("distortion") or {}
            n0 = int(dist0.get("n", 0))
            return {
                "appended": 0,
                "post_mean_sim": (
                    float(dist0.get("sum_sim", 0.0)) / n0 if n0 else 0.0
                ),
                "retrain_recommended": bool(
                    dist0.get("retrain_recommended", False)
                ),
            }
        if id_col not in sch.names:
            raise ValueError(
                f"append_to_ivf_index: delta has no id column {id_col!r}"
            )
        delta.write_parquet(tmp, partition_cols=["cluster"])
        n_new = delta.count()
        dn, dsum = _ivf_distortion(delta)

        man = _ivf_manifest(index_dir)
        files = {k: list(v) for k, v in man["files"].items()}
        _promote_delta_files(index_dir, tmp, files, tag, prefix="cluster=")
        shutil.rmtree(tmp, ignore_errors=True)
        # fold the delta into the running distortion; compare against
        # the BUILD-time baseline
        dist = dict(man.get("distortion") or {})
        base = dist.get("build_mean_sim")
        n_tot = int(dist.get("n", 0)) + dn
        s_tot = float(dist.get("sum_sim", 0.0)) + dsum
        post_mean = (s_tot / n_tot) if n_tot else 0.0
        flagged = bool(
            base is not None and n_tot
            and post_mean < base * (1.0 - drift_tolerance)
        )
        dist.update({
            "n": n_tot, "sum_sim": s_tot, "post_mean_sim": post_mean,
            "retrain_recommended": flagged or
            bool(dist.get("retrain_recommended")),
        })
        _ivf_commit_manifest(index_dir, {"files": files,
                                         "distortion": dist})
        return {"appended": int(n_new),
                "post_mean_sim": post_mean,
                "retrain_recommended": dist["retrain_recommended"]}


def ivf_index_topk(
    index_dir: str,
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    col: str = "embedding",
) -> pa.Table:
    """Search a :func:`build_ivf_index` layout: compute each query's
    ``nprobe`` closest centroids from the PERSISTED matrix, then READ
    ONLY the union of probed ``cluster=`` partitions off storage — the
    I/O-pruning payoff of bucketing by assignment (nprobe/nc of the
    corpus bytes move, vs all of them for the in-memory path). In-batch
    masking against each row's stored cluster id keeps per-query
    probe-set exactness identical to :func:`ivf_topk` (same tie rules:
    lower centroid index, lower id)."""
    import json
    import os

    import ray
    import ray.data

    with open(os.path.join(index_dir, "_CENTROIDS.json")) as f:
        C = np.asarray(json.load(f)["centroids"], dtype=np.float64)
    Cn = _normalize(C)
    Qn = _normalize(np.asarray(query_matrix, dtype=np.float64))
    qsims = Qn @ Cn.T
    nq, nc = qsims.shape
    probes = np.zeros((nq, nc), dtype=bool)
    for qi in range(nq):  # nq is small (the query set)
        order = np.lexsort((np.arange(nc), -qsims[qi]))
        probes[qi, order[: min(nprobe, nc)]] = True
    probed = sorted(np.nonzero(probes.any(axis=0))[0].tolist())
    # only MANIFESTED files of probed partitions are read (partition
    # pruning + append atomicity: a crashed append's files are invisible)
    manifest = _ivf_manifest(index_dir)["files"]
    paths = []
    for c in probed:
        d = os.path.join(index_dir, f"cluster={c}")
        if os.path.isdir(d):
            paths.extend(
                os.path.join(d, f) for f in manifest.get(str(c), [])
            )
    if not paths:
        return _merge_topk([], k)
    ref = ray.put({"ids": np.asarray(query_ids, dtype=np.int64),
                   "matrix": query_matrix})
    probes_ref = ray.put(probes)

    class _IndexTopK(BruteForceTopK):
        def __init__(self):
            super().__init__(ref, k, id_col, col)

        def __call__(self, batch: pa.Table) -> pa.Table:
            import ray as _ray

            P = _ray.get(probes_ref)
            M = _normalize(_batch_matrix(batch, self.col))
            ids = batch[self.id_col].to_numpy()
            cid = batch["cid"].to_numpy(zero_copy_only=False).astype(
                np.int64)
            sims = self.Q @ M.T
            sims = np.where(P[:, cid], sims, -np.inf)
            return _masked_topk(sims, ids, self.qids, self.k)

    partial = ray.data.read_parquet(paths).map_batches(
        _IndexTopK,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=4096,
        concurrency=2,
    )
    return _merge_topk(partial.take_all(), k)
