"""Stable, vectorized key hashing / partition assignment.

The reference never partitions (single process); partitioning by key is the
core scale-out design of this engine (SURVEY.md §7.1). Requirements:

- deterministic across processes, workers, library versions and resumed
  runs — exactly-once and the lake's key->partition invariant depend on every
  process computing the identical hash. Third-party row hashes (polars
  ``Series.hash``, pandas ``hash_array``) are documented as unstable across
  versions, so the hash is implemented IN-REPO with plain numpy uint64
  arithmetic (wraparound semantics are defined and version-independent);
- vectorized: no Python loop per row in the hot path. Variable-length
  strings hash via one flat-byte polynomial pass + ``np.add.reduceat``;
  fixed-width values via a splitmix64 finisher;
- the implementation id (``HASH_IMPL``) is recorded in the lake manifest;
  resuming a lake written with a different hash refuses to start rather than
  silently re-routing keys (see state/manifest.py).

Two partitioner modes: ``mod`` for integer keys (SQL-expressible, used by the
oracle-checked queries) and ``hash`` for strings.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# bump when the hash function changes — manifests record it and refuse to
# resume across a change (silent change = keys re-routed = data loss)
HASH_IMPL = "dbz-poly64-v2"

_SM1 = np.uint64(0xBF58476D1CE4E5B9)
_SM2 = np.uint64(0x94D049BB133111EB)
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_POLY_P = np.uint64(0x100000001B3)  # FNV-ish odd multiplier for the poly hash

_MAX_POW = 1 << 22  # longest hashable byte-string per value (4 MiB)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finisher (public-domain construction): full
    avalanche over uint64 with wraparound multiply — stable across numpy
    versions by the C uint64 semantics."""
    with np.errstate(over="ignore"):
        x = (x + _GOLDEN).astype(np.uint64)
        x = (x ^ (x >> np.uint64(30))) * _SM1
        x = (x ^ (x >> np.uint64(27))) * _SM2
        return x ^ (x >> np.uint64(31))


_POWERS: np.ndarray | None = None


def _powers(n: int) -> np.ndarray:
    """P^0..P^(n-1) mod 2^64, grown lazily and cached per process."""
    global _POWERS
    if _POWERS is None or len(_POWERS) < n:
        size = max(1024, 1 << int(np.ceil(np.log2(max(n, 2)))))
        pw = np.empty(size, dtype=np.uint64)
        pw[0] = 1
        with np.errstate(over="ignore"):
            # accumulate of a constant: pw[k] = P^k mod 2^64
            const = np.full(size - 1, _POLY_P, dtype=np.uint64)
            np.multiply.accumulate(const, out=pw[1:], dtype=np.uint64)
        _POWERS = pw
    return _POWERS


def _hash_bytes_like(arr: pa.Array, seed: int) -> np.ndarray:
    """Polynomial hash over each value's bytes:
    h = sum(byte_i * P^(L-1-i)) mod 2^64, finished with splitmix64 mixed
    with the length and seed. One flat pass + reduceat — no per-row loop."""
    typ = arr.type
    if pa.types.is_large_string(typ) or pa.types.is_large_binary(typ):
        off_dtype = np.int64
    else:
        off_dtype = np.int32
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=off_dtype)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
    lo, hi = int(offsets[0]), int(offsets[-1])
    flat = data[lo:hi].astype(np.uint64)
    starts = offsets[:-1] - lo
    ends = offsets[1:] - lo
    lens = (ends - starts).astype(np.int64)
    maxlen = int(lens.max()) if len(lens) else 0
    if maxlen > _MAX_POW:
        raise ValueError(f"stable_hash: value longer than {_MAX_POW} bytes")
    pw = _powers(maxlen + 1)
    n = len(arr)
    if len(flat):
        # exponent of byte g (global) in row r: ends[r] - 1 - g
        row_of = np.repeat(np.arange(n, dtype=np.int64), lens)
        exp = ends[row_of] - 1 - np.arange(len(flat), dtype=np.int64)
        with np.errstate(over="ignore"):
            prod = flat * pw[exp]
        # a trailing empty row's start == len(prod), which reduceat rejects;
        # a zero sentinel keeps every index valid without disturbing sums
        # (empty rows are zeroed by the lens>0 mask below regardless)
        prod = np.concatenate([prod, np.zeros(1, dtype=np.uint64)])
        sums = np.add.reduceat(prod, starts, dtype=np.uint64)
        # reduceat quirk: an empty segment returns the element AT its start
        # index — zero those rows explicitly
        h = np.where(lens > 0, sums, np.uint64(0)).astype(np.uint64)
    else:
        h = np.zeros(n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        h = h ^ _splitmix64(lens.astype(np.uint64) + np.uint64(seed))
    out = _splitmix64(h)
    if arr.null_count:
        out = np.where(
            np.asarray(pa.compute.is_valid(arr)), out, np.uint64(0)
        )
    return out


def stable_hash(key_array: pa.Array | pa.ChunkedArray, seed: int = 42) -> np.ndarray:
    """uint64 stable hash of an Arrow array (strings/binary/ints/floats/bool).

    Version-pinned in-repo implementation (``HASH_IMPL``): identical output on
    every process/worker/version — the routing invariant exactly-once needs.
    """
    if isinstance(key_array, pa.ChunkedArray):
        key_array = key_array.combine_chunks()
    typ = key_array.type
    if (
        pa.types.is_string(typ)
        or pa.types.is_large_string(typ)
        or pa.types.is_binary(typ)
        or pa.types.is_large_binary(typ)
    ):
        return _hash_bytes_like(key_array, seed)
    # fixed-width scalars: reinterpret to uint64 then splitmix64
    if pa.types.is_floating(typ):
        vals = key_array.to_numpy(zero_copy_only=False).astype(np.float64).view(np.uint64)
    elif pa.types.is_boolean(typ):
        vals = key_array.to_numpy(zero_copy_only=False).astype(np.uint64)
    else:
        vals = (
            key_array.to_numpy(zero_copy_only=False)
            .astype(np.int64, copy=False)
            .view(np.uint64)
        )
    with np.errstate(over="ignore"):
        return _splitmix64(vals + np.uint64(seed))


def partition_ids(
    key_array: pa.Array | pa.ChunkedArray, num_partitions: int, mode: str = "hash"
) -> np.ndarray:
    """int32 partition id per row: hash(key) % P (or key % P for ints)."""
    if mode == "mod":
        if isinstance(key_array, pa.ChunkedArray):
            key_array = key_array.combine_chunks()
        vals = key_array.to_numpy(zero_copy_only=False)
        return (vals % num_partitions).astype(np.int32)
    h = stable_hash(key_array)
    return (h % np.uint64(num_partitions)).astype(np.int32)


def bloom_build(
    key_array: pa.Array | pa.ChunkedArray, bits_log2: int, n_hashes: int = 4
) -> np.ndarray:
    """Bloom bitmap (uint64 words) over an Arrow key array: double
    hashing h1 + i*h2 from two seeded ``stable_hash`` passes — the same
    version-pinned kernel everywhere a bloom is built (the broadcast
    semi-join prefilter and the SSTable-style per-run sidecars), so a
    bitmap built by any worker probes identically on any other."""
    n_bits = np.uint64(1 << bits_log2)
    h1 = stable_hash(key_array, seed=1001)
    h2 = stable_hash(key_array, seed=2002) | np.uint64(1)
    words = np.zeros((1 << bits_log2) >> 6, dtype=np.uint64)
    for i in range(n_hashes):
        with np.errstate(over="ignore"):
            idx = (h1 + np.uint64(i) * h2) % n_bits
        word = (idx >> np.uint64(6)).astype(np.int64)
        bit = np.uint64(1) << (idx & np.uint64(63))
        np.bitwise_or.at(words, word, bit)
    return words


def bloom_probe(
    words: np.ndarray,
    key_array: pa.Array | pa.ChunkedArray,
    bits_log2: int,
    n_hashes: int = 4,
) -> np.ndarray:
    """Membership mask against a ``bloom_build`` bitmap: True = maybe
    present (bounded false-positive rate), False = DEFINITELY absent."""
    n_bits = np.uint64(1 << bits_log2)
    h1 = stable_hash(key_array, seed=1001)
    h2 = stable_hash(key_array, seed=2002) | np.uint64(1)
    keep = np.ones(len(h1), dtype=bool)
    for i in range(n_hashes):
        with np.errstate(over="ignore"):
            idx = (h1 + np.uint64(i) * h2) % n_bits
        word = (idx >> np.uint64(6)).astype(np.int64)
        bit = np.uint64(1) << (idx & np.uint64(63))
        keep &= (words[word] & bit) != 0
    return keep
