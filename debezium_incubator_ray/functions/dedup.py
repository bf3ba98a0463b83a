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


def exact_dedup(ds, col: str = "text", id_col: str = "doc_id"):
    """Keep the min-id row per distinct content. groupby on the 8-byte hash
    — the only shuffled payload is (hash, row)."""
    import pandas as pd

    hashed = ds.map_batches(
        lambda t: add_content_hash(t, col), batch_format="pyarrow", zero_copy_batch=True
    )

    def first_per_group(g: pd.DataFrame) -> pd.DataFrame:
        return g.nsmallest(1, id_col)

    out = hashed.groupby("content_hash").map_groups(first_per_group, batch_format="pandas")
    return out.drop_columns(["content_hash"])


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


def minhash_candidate_pairs(ds, n_hashes: int = 64, bands: int = 16, shingle_k: int = 3):
    """documents(doc_id, text) → candidate near-dup pairs (a < b) that share
    ≥1 LSH band bucket."""
    import pandas as pd

    exploded = ds.map_batches(
        MinHasher(n_hashes, bands, shingle_k),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=1024,
    )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].unique())
        if len(ids) < 2:
            return pd.DataFrame({"a": [], "b": []}).astype({"a": "int64", "b": "int64"})
        ii, jj = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"a": ids[ii], "b": ids[jj]})

    cand = exploded.groupby(["band", "band_hash"]).map_groups(pairs, batch_format="pandas")
    # distinct pairs (a bucket in several bands yields duplicates) —
    # aggregate-count is far cheaper than per-group map for the dedup
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
# n-gram Jaccard (direct, for candidate verification or small corpora)


def ngram_jaccard_pairs(docs_ds, shingle_k: int = 3, threshold: float = 0.5):
    """All-pairs n-gram Jaccard via LSH candidates + verify (never the naive
    O(n²) over the full corpus)."""
    cand = minhash_candidate_pairs(docs_ds, shingle_k=shingle_k)
    return verify_jaccard(cand, docs_ds, shingle_k, threshold)
