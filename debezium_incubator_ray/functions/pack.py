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


def chunk_token_windows(ds, chunk: int = 32, overlap: int = 8,
                        text_col: str = "text", id_col: str = "doc_id"):
    """Split each document into overlapping fixed-size token windows —
    the context-window chunking step of RAG / long-doc training prep.

    Chunk c of a doc covers tokens [c*stride, min(c*stride + chunk, L))
    with stride = chunk - overlap; every chunk starts inside the doc, so
    a doc with L tokens yields ceil(L / stride) chunks and empty docs
    yield none. Fully vectorized and shuffle-free: one gather index array
    rebuilds all chunk tokens from the batch's flat token array, then one
    ``binary_join`` re-materializes the window texts. Each document is one
    row, so chunking is exact within the batch at any scale."""
    if not 0 <= overlap < chunk:
        raise ValueError("need 0 <= overlap < chunk")
    stride = chunk - overlap

    def f(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        flat, lens = flat_tokens(t[text_col].combine_chunks())
        ids = t[id_col].combine_chunks().to_numpy()
        n_chunks = -(-lens // stride)  # ceil; 0 for empty docs
        total = int(n_chunks.sum())
        if total == 0:
            return pa.table({
                id_col: pa.array([], pa.int64()),
                "chunk_idx": pa.array([], pa.int64()),
                "chunk_text": pa.array([], pa.string()),
                "n_tokens": pa.array([], pa.int64()),
            })
        doc_rep = np.repeat(np.arange(len(ids)), n_chunks)
        # chunk index within its doc
        starts_per_doc = np.zeros(len(ids), dtype=np.int64)
        np.cumsum(n_chunks[:-1], out=starts_per_doc[1:])
        ci = np.arange(total) - starts_per_doc[doc_rep]
        tok_start = ci * stride
        tok_end = np.minimum(tok_start + chunk, lens[doc_rep])
        m = tok_end - tok_start  # tokens per chunk (>= 1)
        # flat-token gather indices for every chunk position
        doc_flat_off = np.zeros(len(ids), dtype=np.int64)
        np.cumsum(lens[:-1], out=doc_flat_off[1:])
        base = doc_flat_off[doc_rep] + tok_start
        out_off = np.zeros(total, dtype=np.int64)
        np.cumsum(m[:-1], out=out_off[1:])
        intra = np.arange(int(m.sum())) - np.repeat(out_off, m)
        gather = np.repeat(base, m) + intra
        toks = flat.take(pa.array(gather))
        offsets = np.zeros(total + 1, dtype=np.int32)
        np.cumsum(m, out=offsets[1:])
        chunk_lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                               toks)
        return pa.table({
            id_col: pa.array(ids[doc_rep]),
            "chunk_idx": pa.array(ci.astype(np.int64)),
            "chunk_text": pc.binary_join(chunk_lists, " "),
            "n_tokens": pa.array(m.astype(np.int64)),
        })

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)
