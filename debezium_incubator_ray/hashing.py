"""Stable, vectorized key hashing / partition assignment.

The reference never partitions (single process); partitioning by key is the
core scale-out design of this engine (SURVEY.md §7.1). Requirements:

- deterministic across processes and runs (a re-run / resumed job must route
  every key to the same partition — exactly-once depends on it);
- vectorized (no Python loop per row in the hot path);
- two modes: ``mod`` for integer keys (SQL-expressible, used by the
  oracle-checked queries) and ``hash`` for strings (polars xxhash, falling
  back to pandas siphash — both deterministic with fixed seeds/keys).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

try:  # polars ships a vectorized, seed-stable row hash (rust xxhash)
    import polars as pl

    _HAVE_POLARS = True
except Exception:  # pragma: no cover
    _HAVE_POLARS = False


def stable_hash(key_array: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """uint64 stable hash of an Arrow array (any scalar type)."""
    if isinstance(key_array, pa.ChunkedArray):
        key_array = key_array.combine_chunks()
    if _HAVE_POLARS:
        s = pl.from_arrow(key_array)
        if isinstance(s, pl.DataFrame):  # pragma: no cover
            s = s.to_series()
        return s.hash(seed=42).to_numpy()
    import pandas as pd  # pragma: no cover - fallback path

    return pd.util.hash_array(key_array.to_numpy(zero_copy_only=False))


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
