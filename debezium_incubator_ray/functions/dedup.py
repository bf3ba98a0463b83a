"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Ray-Data-first shapes (no driver-side loops over data):
- exact: vectorized content-hash per batch → groupby(hash) → first-per-group
  (hash-partitioned; only the 16-byte hashes + ids shuffle, never the text);
- MinHash+LSH: shingle→minhash per batch (numpy, one pass) → explode to
  (band, band_hash, doc_id) rows → groupby band bucket → candidate pairs →
  Jaccard verify. At the tested scale the verify step broadcasts the shingle
  sets (ray.put once); at 100 TB the verify becomes a co-grouped join on
  doc_id — the bucketing/groupby stages are unchanged.
- SimHash: 64-bit signature per doc, vectorized; near-dup = small Hamming
  distance within LSH-style chunk buckets.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from debezium_incubator_ray.hashing import stable_hash

# ---------------------------------------------------------------------------
# exact dedup (D-exact)


def add_content_hash(batch: pa.Table, col: str = "text", out: str = "content_hash") -> pa.Table:
    h = stable_hash(batch[col].combine_chunks())
    return batch.append_column(out, pa.array(h.astype(np.int64), type=pa.int64()))


def exact_dedup(ds, col: str = "text", id_col: str = "doc_id", buckets: int = 64):
    """Keep the min-id row per distinct content.

    Shuffle by hash *bucket* (hash % buckets), then dedup each bucket with
    one vectorized sort+mask kernel — NOT per-content-hash map_groups, which
    pays a Python UDF call per distinct document (catastrophic at scale).
    A bucket contains every row of each of its content-hashes, so the
    first-per-hash pick inside a bucket is globally correct."""
    hashed = ds.map_batches(
        lambda t: add_content_hash(t, col), batch_format="pyarrow", zero_copy_batch=True
    )

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(
            pc.bit_wise_and(t["content_hash"], buckets - 1), pa.int32()
        )
        return t.append_column("_bucket", b)

    def dedup_bucket(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t, sort_keys=[("content_hash", "ascending"), (id_col, "ascending")]
        )
        s = t.take(idx)
        h = s["content_hash"].combine_chunks()
        n = len(s)
        first = np.empty(n, dtype=bool)
        if n:
            first[0] = True
            first[1:] = pc.not_equal(h.slice(1), h.slice(0, n - 1)).to_numpy(
                zero_copy_only=False
            )
        return s.filter(pa.array(first)).drop_columns(["_bucket", "content_hash"])

    return (
        hashed.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_bucket")
        .map_groups(dedup_bucket, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# tokenize / shingle helpers (shared, deterministic)


def _tokens(text: str) -> List[str]:
    return text.lower().split()


def _shingles(text: str, k: int = 3) -> np.ndarray:
    toks = _tokens(text)
    if len(toks) < k:
        grams = [" ".join(toks)] if toks else []
    else:
        grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    if not grams:
        return np.empty(0, dtype=np.uint64)
    return stable_hash(pa.array(grams)).astype(np.uint64)


_MERSENNE = np.uint64((1 << 61) - 1)


def _minhash_params(n_hashes: int, seed: int = 7) -> Tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 61, size=n_hashes, dtype=np.uint64)
    b = rng.integers(0, 1 << 61, size=n_hashes, dtype=np.uint64)
    return a, b


class MinHasher:
    """Per-batch minhash signatures (stateful: hash params built once).

    Emits exploded LSH rows: one (band, band_hash, doc_id) row per band —
    the groupby key for candidate buckets."""

    def __init__(self, n_hashes: int = 64, bands: int = 16, shingle_k: int = 3):
        assert n_hashes % bands == 0
        self.n = n_hashes
        self.bands = bands
        self.r = n_hashes // bands
        self.k = shingle_k
        self.a, self.b = _minhash_params(n_hashes)

    def signature(self, text: str) -> np.ndarray:
        sh = _shingles(text, self.k)
        if len(sh) == 0:
            return np.zeros(self.n, dtype=np.uint64)
        with np.errstate(over="ignore"):
            # (n_hashes, n_shingles) universal hashing, min per row
            v = (self.a[:, None] * sh[None, :] + self.b[:, None]) % _MERSENNE
        return v.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        texts = batch["text"].to_pylist()
        n_docs = len(ids)
        band_ids = np.tile(np.arange(self.bands, dtype=np.int32), n_docs)
        doc_rep = np.repeat(ids, self.bands)
        band_hashes = np.empty(n_docs * self.bands, dtype=np.int64)
        for i, t in enumerate(texts):
            sig = self.signature(t)
            bh = stable_hash(
                pa.array([sig[j * self.r : (j + 1) * self.r].tobytes() for j in range(self.bands)],
                         type=pa.binary())
            ).astype(np.int64)
            band_hashes[i * self.bands : (i + 1) * self.bands] = bh
        return pa.table(
            {
                "band": pa.array(band_ids),
                "band_hash": pa.array(band_hashes),
                "doc_id": pa.array(doc_rep),
            }
        )


def minhash_candidate_pairs(
    ds, n_hashes: int = 64, bands: int = 16, shingle_k: int = 3, buckets: int = 64
):
    """documents(doc_id, text) → candidate near-dup pairs (a < b) that share
    ≥1 LSH band bucket.

    The (band, band_hash) space is shuffled by a coarse bucket and the pair
    expansion runs vectorized per bucket (pandas C groupby), never one Python
    call per LSH bucket — at web scale almost every LSH bucket is a
    singleton and per-bucket UDF calls would dominate."""
    import pandas as pd

    exploded = ds.map_batches(
        MinHasher(n_hashes, bands, shingle_k),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=1024,
    )

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.bit_wise_and(t["band_hash"], buckets - 1), pa.int32())
        return t.append_column("_bucket", b)

    def pairs_in_bucket(t: pa.Table) -> pa.Table:
        df = t.select(["band", "band_hash", "doc_id"]).to_pandas()
        # only LSH buckets with >= 2 docs can produce pairs
        sizes = df.groupby(["band", "band_hash"])["doc_id"].transform("size")
        df = df[sizes > 1]
        out_a: List[np.ndarray] = []
        out_b: List[np.ndarray] = []
        for (_, _), g in df.groupby(["band", "band_hash"], sort=False):
            ids = np.sort(g["doc_id"].unique())
            if len(ids) < 2:
                continue
            ii, jj = np.triu_indices(len(ids), k=1)
            out_a.append(ids[ii])
            out_b.append(ids[jj])
        if not out_a:
            return pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "a": pa.array(np.concatenate(out_a)),
                "b": pa.array(np.concatenate(out_b)),
            }
        )

    cand = (
        exploded.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_bucket")
        .map_groups(pairs_in_bucket, batch_format="pyarrow")
    )
    # distinct pairs (a pair found in several bands appears once per band)
    from ray.data.aggregate import Count

    return cand.groupby(["a", "b"]).aggregate(Count(alias_name="_c")).drop_columns(["_c"])


def verify_jaccard(pairs_ds, docs_ds, shingle_k: int = 3, threshold: float = 0.6):
    """Jaccard-verify candidate pairs. Small side (shingle sets) is broadcast
    via ray.put and read once per actor — no shuffle join."""
    import ray

    docs = docs_ds.select_columns(["doc_id", "text"]).take_all()
    sets = {
        d["doc_id"]: set(_shingles(d["text"], shingle_k).tolist()) for d in docs
    }
    ref = ray.put(sets)

    class Verify:
        def __init__(self):
            self.sets = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            a = batch["a"].to_numpy()
            b = batch["b"].to_numpy()
            jac = np.empty(len(a), dtype=np.float64)
            for i in range(len(a)):
                sa, sb = self.sets.get(a[i], set()), self.sets.get(b[i], set())
                u = len(sa | sb)
                jac[i] = (len(sa & sb) / u) if u else 0.0
            out = batch.append_column("jaccard", pa.array(jac))
            return out.filter(pc.greater_equal(out["jaccard"], threshold))

    return pairs_ds.map_batches(Verify, batch_format="pyarrow", concurrency=2)


# ---------------------------------------------------------------------------
# SimHash


class SimHash:
    """64-bit SimHash per doc: sign-sum of token-hash bit vectors, weighted
    by token frequency. Vectorized over each doc's token hashes."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            toks = _tokens(t)
            if not toks:
                continue
            h = stable_hash(pa.array(toks)).astype(np.uint64)
            bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int64)
            v = (2 * bits - 1).sum(axis=0)
            sig = np.uint64(0)
            for j in range(64):
                if v[j] > 0:
                    sig |= np.uint64(1) << np.uint64(j)
            out[i] = np.int64(sig.astype(np.int64))
        return batch.append_column("simhash", pa.array(out, type=pa.int64()))


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = (a.astype(np.uint64)) ^ (b.astype(np.uint64))
    cnt = np.zeros(len(x), dtype=np.int64)
    for _ in range(64):
        cnt += (x & 1).astype(np.int64)
        x >>= np.uint64(1)
    return cnt


# ---------------------------------------------------------------------------
# embedding-cosine near-dup


def embedding_near_dup_pairs(ds, tau: float = 0.4, id_col: str = "vec_id", col: str = "embedding"):
    """Pairs (a < b) whose embedding cosine similarity >= tau.

    The corpus matrix is broadcast once (ray.put) and each batch does one
    float64 matmul against it — the brute-force baseline. At 100 TB the
    corpus side becomes LSH/IVF buckets (see ann.lsh_topk) and only
    colliding buckets are compared; the per-batch kernel is unchanged."""
    import ray

    from debezium_incubator_ray.functions.ann import _batch_matrix, _normalize

    full = ds.select_columns([id_col, col]).take_all()
    ids = np.array([r[id_col] for r in full], dtype=np.int64)
    import pyarrow as _pa

    mat = np.stack([np.asarray(r[col], dtype=np.float64) for r in full])
    ref = ray.put({"ids": ids, "M": _normalize(mat)})

    class PairFinder:
        def __init__(self):
            d = ray.get(ref)
            self.ids = d["ids"]
            self.M = d["M"]

        def __call__(self, batch: pa.Table) -> pa.Table:
            B = _normalize(_batch_matrix(batch, col))
            bids = batch[id_col].to_numpy()
            sims = B @ self.M.T
            bi, cj = np.nonzero(sims >= tau)
            a = bids[bi]
            b = self.ids[cj]
            keep = a < b  # dedupe the symmetric pair + drop self-matches
            return pa.table(
                {"a": pa.array(a[keep]), "b": pa.array(b[keep])}
            )

    return ds.map_batches(
        PairFinder, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=2048, concurrency=2,
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (direct, for candidate verification or small corpora)


def ngram_jaccard_pairs(docs_ds, shingle_k: int = 3, threshold: float = 0.5):
    """All-pairs n-gram Jaccard via LSH candidates + verify (never the naive
    O(n²) over the full corpus)."""
    cand = minhash_candidate_pairs(docs_ds, shingle_k=shingle_k)
    return verify_jaccard(cand, docs_ds, shingle_k, threshold)
