"""Shared vectorized tokenization / shingling / hashing kernels.

Every function here is batch-level (one Arrow/numpy pass per batch, no
per-document Python loop) — the building blocks for MinHash, SimHash,
n-gram Jaccard, language ID and fingerprinting. The tokenization rule is
deliberately SQL-mirrorable so DuckDB oracles can recompute it:

    tokens(text)  = string_split_regex(trim(lower(text)), '\\s+'),
                    with '' -> zero tokens
    shingle k-gram = tokens[i] || ' ' || ... || tokens[i+k-1];
                    docs with 0 < n < k tokens yield ONE gram = join(all)

Two token hashers:
- ``stable_hash`` (hashing.py): the fast in-repo 64-bit hash — the scale
  path for everything internal (LSH bands, dedup buckets);
- ``md5_u64``: first 8 bytes of md5, big-endian — byte-identical to DuckDB's
  ``('0x' || substring(md5(tok), 1, 16))::UBIGINT``, the cross-engine
  verification bridge (the reference pins its type conversions with golden
  values the same way, CassandraTypeDeserializerTest.java:72-447).
  Vectorization: md5 runs once per DISTINCT token (dictionary-encode →
  hash the vocabulary → gather), so repeated tokens cost one lookup.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from debezium_incubator_ray.hashing import stable_hash

_WS = r"\s+"

# gram combiner: g = sum_j h(tok_{i+j}) * C^(k-1-j) mod 2^64 — injective per
# token-hash tuple (no per-doc loop; k vectorized shifted adds)
_C = np.uint64(0x9E3779B185EBCA87)


def token_lists(texts: pa.Array | pa.ChunkedArray) -> pa.Array:
    """list<string> of lowercase whitespace tokens per doc ('' -> [])."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    trimmed = pc.utf8_trim_whitespace(pc.utf8_lower(texts))
    lists = pc.split_pattern_regex(trimmed, _WS)
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    # '' splits to [''] — mask those docs to empty lists via a filtered
    # rebuild (vectorized: list lengths recomputed from the empty mask)
    empty = pc.equal(pc.utf8_length(trimmed), 0)
    if pc.any(empty).as_py():
        lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        lens = np.where(empty.to_numpy(zero_copy_only=False), 0, lens)
        keep = pc.invert(empty)
        flat = lists.filter(keep).flatten()
        offsets = np.zeros(len(lists) + 1, dtype=np.int64)
        np.cumsum(lens, out=offsets[1:])
        lists = pa.LargeListArray.from_arrays(
            pa.array(offsets, pa.int64()), flat
        )
    return lists


def flat_tokens(texts: pa.Array | pa.ChunkedArray) -> Tuple[pa.Array, np.ndarray]:
    """(flattened token array, tokens-per-doc int64 array)."""
    lists = token_lists(texts)
    lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False).astype(np.int64)
    return lists.flatten(), lens


def md5_u64(arr: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """uint64 from the first 8 md5 bytes (big-endian) per value — equals
    DuckDB ('0x' || substring(md5(v),1,16))::UBIGINT. Hashed once per
    distinct value via dictionary encoding."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if len(arr) == 0:
        return np.empty(0, dtype=np.uint64)
    de = pc.dictionary_encode(arr)
    vocab = de.dictionary.to_pylist()
    hs = np.fromiter(
        (
            int.from_bytes(hashlib.md5(str(v).encode()).digest()[:8], "big")
            for v in vocab
        ),
        dtype=np.uint64,
        count=len(vocab),
    )
    idx = de.indices.to_numpy(zero_copy_only=False)
    out = np.zeros(len(arr), dtype=np.uint64)
    valid = ~np.isnan(idx) if idx.dtype.kind == "f" else np.ones(len(idx), bool)
    out[valid] = hs[idx[valid].astype(np.int64)]
    return out


def token_hashes(
    texts: pa.Array | pa.ChunkedArray,
    hasher: Callable[[pa.Array], np.ndarray] = stable_hash,
) -> Tuple[np.ndarray, np.ndarray]:
    """(uint64 hash per token flattened, tokens-per-doc)."""
    flat, lens = flat_tokens(texts)
    h = hasher(flat).astype(np.uint64) if len(flat) else np.empty(0, np.uint64)
    return h, lens


def shingle_hashes(
    texts: pa.Array | pa.ChunkedArray,
    k: int = 3,
    hasher: Callable[[pa.Array], np.ndarray] = stable_hash,
) -> Tuple[np.ndarray, np.ndarray]:
    """(uint64 gram hash flattened, grams-per-doc).

    grams-per-doc = n-k+1 for n>=k, 1 for 0<n<k, 0 for n=0 — matching the
    SQL list-comprehension oracle. Gram hash = injective polynomial combine
    of the k token hashes (no gram strings are materialized)."""
    h, lens = token_hashes(texts, hasher)
    n_docs = len(lens)
    starts = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(lens, out=starts[1:])
    glens = np.where(lens == 0, 0, np.maximum(lens - k + 1, 1))
    total_g = int(glens.sum())
    if total_g == 0:
        return np.empty(0, np.uint64), glens
    gstarts = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(glens, out=gstarts[1:])
    # token index of each gram's first token
    grow = np.repeat(np.arange(n_docs), glens)
    first = starts[grow] + (np.arange(total_g) - gstarts[grow])
    out = np.zeros(total_g, dtype=np.uint64)
    full = np.repeat(lens >= k, glens)  # grams from docs with >= k tokens
    with np.errstate(over="ignore"):
        if full.any():
            f = first[full]
            acc = np.zeros(len(f), dtype=np.uint64)
            for j in range(k):
                acc = acc * _C + h[f + j]
            out[full] = acc
        if (~full).any():
            # short docs: one gram over all n<k tokens — same combiner
            rows = np.nonzero((lens > 0) & (lens < k))[0]
            for r in rows:  # bounded by the (rare) short-doc count per batch
                acc = np.uint64(0)
                for t in range(int(lens[r])):
                    acc = acc * _C + h[starts[r] + t]
                out[gstarts[r]] = acc
    return out, glens


def distinct_per_doc(values: np.ndarray, per_doc: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Deduplicate ``values`` within each doc segment (sorted output per
    doc): returns (distinct values flattened, distinct-count per doc).
    One lexsort over the batch, no per-doc loop."""
    n_docs = len(per_doc)
    if len(values) == 0:
        return values, np.zeros(n_docs, dtype=np.int64)
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), per_doc)
    order = np.lexsort((values, doc_of))
    v, d = values[order], doc_of[order]
    keep = np.ones(len(v), dtype=bool)
    keep[1:] = (v[1:] != v[:-1]) | (d[1:] != d[:-1])
    vd, dd = v[keep], d[keep]
    counts = np.bincount(dd, minlength=n_docs).astype(np.int64)
    return vd, counts


def gram_string_hashes(
    texts: pa.Array | pa.ChunkedArray,
    k: int = 3,
    hasher: Callable[[pa.Array], np.ndarray] = md5_u64,
) -> Tuple[np.ndarray, np.ndarray]:
    """(uint64 hash of each k-gram STRING, grams-per-doc) — the
    SQL-bridgeable shingle hash: grams are materialized as the exact
    strings the oracle builds ("tok || ' ' || tok || ..."; short docs ->
    one whole-doc gram) and hashed with the md5 bridge, so DuckDB can
    recompute every gram hash bit-for-bit. Costlier than
    shingle_hashes' string-free polynomial combine — use THAT for pure
    engine-side work and THIS when a SQL oracle must reproduce the
    hashes (md5 runs once per distinct gram via dictionary encoding)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    lists = token_lists(texts)
    lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = lists.flatten()
    n_docs = len(lens)
    starts = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(lens, out=starts[1:])
    glens = np.where(lens == 0, 0, np.maximum(lens - k + 1, 1))
    total_g = int(glens.sum())
    if total_g == 0:
        return np.empty(0, np.uint64), glens
    gstarts = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(glens, out=gstarts[1:])
    grow = np.repeat(np.arange(n_docs), glens)
    first = starts[grow] + (np.arange(total_g) - gstarts[grow])
    full = np.repeat(lens >= k, glens)
    grams = pa.nulls(total_g, pa.string())
    if full.any():
        f = first[full]
        parts = [flat.take(pa.array(f + j)) for j in range(k)]
        joined = pc.binary_join_element_wise(*parts, pa.scalar(" "))
        grams = pc.if_else(pa.array(full), _scatter(joined, full, total_g), grams)
    short_rows = np.nonzero((lens > 0) & (lens < k))[0]
    if len(short_rows):
        whole = pc.binary_join(
            lists.take(pa.array(short_rows)), pa.scalar(" ")
        )
        short_mask = np.zeros(total_g, dtype=bool)
        short_mask[gstarts[short_rows]] = True
        grams = pc.if_else(
            pa.array(short_mask), _scatter(whole, short_mask, total_g), grams
        )
    return hasher(grams), glens


def _scatter(values: pa.Array, mask: np.ndarray, n: int) -> pa.Array:
    """Spread ``values`` (len == mask.sum()) over an n-length array at
    the True positions of ``mask`` (others null) — the take-based
    scatter Arrow lacks natively."""
    idx = np.full(n, -1, dtype=np.int64)
    idx[mask] = np.arange(int(mask.sum()))
    return pc.if_else(
        pa.array(mask),
        values.take(pa.array(np.maximum(idx, 0))),
        pa.nulls(n, values.type),
    )


def char_gram_hashes(
    texts: pa.Array | pa.ChunkedArray, k: int
) -> Tuple[np.ndarray, np.ndarray]:
    """(uint64 rolling hash per char k-gram flattened, grams-per-doc).

    Byte-level sliding windows (the corpus is ASCII, so byte == codepoint
    and a DuckDB ``substr`` oracle sees the same grams): ONE polynomial
    rolling-hash pass over the batch's concatenated text buffer, then a
    gather at the window starts that lie fully inside one doc —
    O(total_chars), no per-doc loop. grams-per-doc = max(0, len - k + 1)
    (docs shorter than k contribute none). Arithmetic is uint64 wraparound;
    the base is odd, so its modular inverse exists and prefix sums of
    ``byte * B^-i`` turn every window into one subtraction + one product.
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = pc.cast(texts, pa.large_string())
    n_docs = len(texts)
    # zero-copy concatenation: a LargeString array's data buffer between
    # its first and last offsets IS the docs back-to-back. Lengths are
    # BYTE lengths (== codepoints for this ASCII corpus; windows are
    # byte-level either way)
    arr = pc.fill_null(texts, "").combine_chunks() \
        if isinstance(texts, pa.ChunkedArray) else pc.fill_null(texts, "")
    offs = np.frombuffer(arr.buffers()[1], np.int64,
                         count=len(arr) + 1, offset=8 * arr.offset)
    data = np.frombuffer(arr.buffers()[2], np.uint8)
    buf = data[offs[0]: offs[-1]]
    starts = (offs - offs[0]).astype(np.int64)
    lens = np.diff(starts)
    grams_per_doc = np.maximum(lens - k + 1, 0)
    total = int(grams_per_doc.sum())
    if total == 0:
        return np.empty(0, np.uint64), grams_per_doc
    B = np.uint64(1099511628211)  # odd -> invertible mod 2^64
    Binv = np.uint64(pow(int(B), -1, 1 << 64))
    n = len(buf)
    powB = np.empty(n + 1, dtype=np.uint64)
    powB[0] = 1
    np.multiply.accumulate(np.full(n, B, np.uint64), out=powB[1:])
    powInv = np.empty(n, dtype=np.uint64)
    powInv[0] = 1
    if n > 1:
        np.multiply.accumulate(np.full(n - 1, Binv, np.uint64),
                               out=powInv[1:])
    S = np.zeros(n + 1, dtype=np.uint64)
    np.cumsum(buf.astype(np.uint64) * powInv, out=S[1:])
    # ragged arange of valid window starts per doc
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), grams_per_doc)
    gstart = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(grams_per_doc, out=gstart[1:])
    i = (np.arange(total, dtype=np.int64) - gstart[doc_of]
         + starts[doc_of])
    h = (S[i + k] - S[i]) * powB[i + k - 1]
    return h.astype(np.uint64), grams_per_doc
