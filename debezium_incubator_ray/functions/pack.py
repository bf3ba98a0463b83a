"""Sequence packing: concatenate a document stream (in doc-id order) and
slice it into fixed-length training sequences.

The operator every pretraining data pipeline ends with: documents are
tokenized, laid end-to-end in a deterministic total order, and cut into
``seq_len``-token sequences. Each document's placement is fully determined
by the EXCLUSIVE prefix sum of token counts over all earlier documents:

    offset(d)   = sum(n_tokens(e) for e.doc_id < d.doc_id)
    seq_id(d)   = offset(d) // seq_len
    seq_offset  = offset(d) %  seq_len

A global prefix sum looks inherently sequential; it distributes as the
classic two-level scan (Blelloch):

  pass 1  map_batches -> (range, n_tokens) partial sums -> groupby(range)
          -> ONE tiny row per range on the driver (range = doc_id //
          range_width, contiguous in the total order by construction);
          the driver computes the exclusive prefix over the ~n_docs/width
          sorted ranges — metadata-sized (millions of ranges at 100 TB,
          held as two numpy arrays, broadcast once via ray.put).
  pass 2  groupby(range).map_groups: within a range (<= range_width docs,
          bounded memory) sort by doc_id, local exclusive cumsum, add the
          broadcast range-start offset.

Only (doc_id, n_tokens, range) ever shuffles — the text column is dropped
before the groupby. The narrow projection is recomputed by each pass
(lineage re-execution) rather than materialized: tokenizing twice is
cheaper at scale than pinning an id+count table in the object store.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from debezium_incubator_ray.functions.tokens import flat_tokens


def _token_counts(batch: pa.Table, id_col: str, text_col: str,
                  range_width: int) -> pa.Table:
    _, lens = flat_tokens(batch[text_col])
    ids = batch[id_col].combine_chunks()
    rng = np.asarray(ids.to_numpy(zero_copy_only=False)) // range_width
    return pa.table({
        id_col: ids,
        "n_tokens": pa.array(lens, pa.int64()),
        "_rng": pa.array(rng.astype(np.int64), pa.int64()),
    })


def pack_sequences(
    ds: "ray.data.Dataset",
    seq_len: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    range_width: int = 4096,
) -> "ray.data.Dataset":
    """Assign (seq_id, seq_offset) to every document — see module docstring.

    Returns a Dataset of (id_col, n_tokens, seq_id, seq_offset).
    """
    from ray.data.aggregate import Sum

    counts = ds.map_batches(
        lambda t: _token_counts(t, id_col, text_col, range_width),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    # pass 1: one row per range — tiny — then the driver-side exclusive scan
    totals = counts.groupby("_rng").aggregate(Sum("n_tokens")).take_all()
    rng_keys = np.array(sorted(r["_rng"] for r in totals), dtype=np.int64)
    by_key = {r["_rng"]: r["sum(n_tokens)"] for r in totals}
    sums = np.array([by_key[k] for k in rng_keys], dtype=np.int64)
    starts = np.zeros(len(sums), dtype=np.int64)
    np.cumsum(sums[:-1], out=starts[1:])
    offsets_ref = ray.put((rng_keys, starts))

    def assign(group: pa.Table) -> pa.Table:
        keys, base = ray.get(offsets_ref)
        ids = np.asarray(group[id_col].combine_chunks().to_numpy(
            zero_copy_only=False))
        toks = np.asarray(group["n_tokens"].combine_chunks().to_numpy(
            zero_copy_only=False))
        rng = int(group["_rng"][0].as_py())
        order = np.argsort(ids, kind="stable")
        local = np.zeros(len(ids), dtype=np.int64)
        np.cumsum(toks[order][:-1], out=local[1:])
        off = np.empty(len(ids), dtype=np.int64)
        off[order] = local + base[np.searchsorted(keys, rng)]
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "n_tokens": pa.array(toks, pa.int64()),
            "seq_id": pa.array(off // seq_len, pa.int64()),
            "seq_offset": pa.array(off % seq_len, pa.int64()),
        })

    return counts.groupby("_rng").map_groups(assign, batch_format="pyarrow")
