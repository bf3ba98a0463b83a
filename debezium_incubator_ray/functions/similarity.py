"""Lexical document similarity: top-k TF-IDF cosine document pairs via
inverted-index (term-postings) blocking — the sparse-vector sibling of the
embedding near-dup family in ``dedup.py``.

Scale shape: a document pair is only ever considered if it SHARES a kept
term, and kept terms are df-bounded (``2 <= df <= max_df``), so the pair
space is sum_t C(df_t, 2) — bounded by construction, never all-pairs.
Documents are row-complete (one row = one doc), so per-doc tf vectors AND
per-doc norms are computed entirely inside the batch — no shuffle; the
kept-term idf table is the classic broadcast-small side (ray.put once,
read per task). The whole operator therefore runs exactly TWO exchanges:
the term-hash bucket shuffle that co-locates each kept term's postings
for pair expansion (the shared repeat/arange kernel), and the pair-hash
bucket fold; each pair bucket keeps its local top-k and the driver merges
#buckets x k candidate rows.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def cosine_pairs_topk(
    ds,
    k: int = 50,
    max_df: int | None = None,
    max_df_frac: float | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 64,
):
    """Top-k document pairs by TF-IDF cosine similarity.

    Weights: w(d, t) = tf(d, t) * ln(n_docs / df(t)) over terms with
    2 <= df <= cutoff (df=1 terms pair nothing; high-df stop terms are
    blocked — the standard bound that keeps the candidate space
    sum C(df, 2) instead of quadratic). The cutoff is ``max_df``
    (absolute) or ``max_df_frac * n_docs`` — prefer the fraction: an
    absolute cutoff silently drops to zero kept terms as the corpus
    grows past it. Norms use the SAME kept-term weights and divide in
    BEFORE pair generation (unit-vector dot = cosine), so the result is
    the cosine of the df-filtered TF-IDF vectors evaluated as
    sum((wa/|a|) * (wb/|b|)) — the oracle mirrors that exact
    formulation. Ties at the k boundary break (cosine desc, a asc,
    b asc). Returns a pyarrow Table (a, b, cosine) — empty when no term
    survives the df window.
    """
    if (max_df is None) == (max_df_frac is None):
        raise ValueError("pass exactly one of max_df / max_df_frac")
    import ray

    from debezium_incubator_ray.hashing import stable_hash
    from debezium_incubator_ray.functions.kernels import (
        expand_pairs, merge_local_topk, table_topk,
    )
    from debezium_incubator_ray.functions.text import (
        _flat_tokens, document_frequency,
    )

    df, n_docs = document_frequency(ds, text_col=text_col, id_col=id_col,
                                    buckets=buckets)
    cutoff = float(max_df) if max_df is not None else max_df_frac * n_docs

    def keep_idf(t: pa.Table) -> pa.Table:
        dfv = pc.cast(t["df"], pa.float64())
        m = pc.and_(pc.greater_equal(dfv, 2.0),
                    pc.less_equal(dfv, cutoff))
        t = pa.table({"term": t["term"], "dfv": dfv}).filter(m)
        return pa.table({
            "term": t["term"],
            "idf": pc.ln(pc.divide(float(n_docs), t["dfv"])),
        })

    # the kept (term, idf) table is the broadcast-small side: collect
    # once, ray.put once, read inside every task — never re-shipped per
    # batch and never joined by shuffle
    kept_parts = [
        b for b in df.map_batches(
            keep_idf, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow")
    ]
    id_type = ds.schema().base_schema.field(id_col).type
    empty = pa.table({
        "a": pa.array([], id_type),
        "b": pa.array([], id_type),
        "cosine": pa.array([], pa.float64()),
    })
    kept_tbl = pa.concat_tables(kept_parts) if kept_parts else None
    if kept_tbl is None or kept_tbl.num_rows == 0:
        return empty
    kept_ref = ray.put(kept_tbl.combine_chunks())

    def unit_postings(t: pa.Table) -> pa.Table:
        """(doc, term, unit-weight) for kept terms — all in-batch:
        documents are row-complete, so tf and the doc norm never cross
        a batch boundary."""
        kt = ray.get(kept_ref)
        flat, lens = _flat_tokens(t, text_col)
        ids = np.repeat(
            t[id_col].combine_chunks().to_numpy(zero_copy_only=False),
            lens,
        )
        g = (
            pa.table({id_col: pa.array(ids), "term": flat})
            .group_by([id_col, "term"])
            .aggregate([([], "count_all")])
        )
        pos = pc.index_in(g["term"], value_set=kt["term"])
        keep = pc.is_valid(pos)
        g = pa.table({
            id_col: g[id_col].filter(keep),
            "term": g["term"].filter(keep),
            "tf": pc.cast(g["count_all"].filter(keep), pa.float64()),
        })
        idf = kt["idf"].take(pos.filter(keep))
        w = pc.multiply(g["tf"], idf).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        # per-doc norm over the kept-term weights, via one sort + reduceat
        did = g[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(did, kind="mergesort")
        ds_, ws_ = did[order], w[order]
        starts = np.flatnonzero(np.r_[True, ds_[1:] != ds_[:-1]])
        sizes = np.diff(np.append(starts, len(ds_)))
        nrm = np.sqrt(np.add.reduceat(ws_ * ws_, starts)) if len(ds_) \
            else np.empty(0)
        wn = np.empty_like(w)
        wn[order] = ws_ / np.repeat(nrm, sizes)
        out = pa.table({
            id_col: g[id_col],
            "term": g["term"],
            "w": pa.array(wn),
        })
        b = (stable_hash(out["term"]) % np.uint64(buckets)).astype(
            np.int32
        )
        return out.append_column("_tb", pa.array(b))

    def pair_dots(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["_tb"])
        ids = g[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        w = g["w"].combine_chunks().to_numpy(zero_copy_only=False)
        tr = g["term"].combine_chunks()
        # group runs by term: sort by (term, id) so pairs come out a < b
        order = pc.sort_indices(
            pa.table({"t": tr, "i": pa.array(ids)}),
            sort_keys=[("t", "ascending"), ("i", "ascending")],
        ).to_numpy(zero_copy_only=False)
        tr = pc.take(tr, pa.array(order))
        ids, w = ids[order], w[order]
        n = len(ids)
        if n == 0:
            return pa.table({
                "a": pa.array([], g[id_col].type),
                "b": pa.array([], g[id_col].type),
                "dot": pa.array([], pa.float64()),
                "_pb": pa.array([], pa.int32()),
            })
        same = pc.equal(tr.slice(1), tr.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
        starts = np.flatnonzero(np.r_[True, ~same])
        sizes = np.diff(np.append(starts, n))
        L, R = expand_pairs(sizes)
        if len(L) == 0:
            return pa.table({
                "a": pa.array([], g[id_col].type),
                "b": pa.array([], g[id_col].type),
                "dot": pa.array([], pa.float64()),
                "_pb": pa.array([], pa.int32()),
            })
        d = (
            pa.table({
                "a": pa.array(ids[L]),
                "b": pa.array(ids[R]),
                "p": pa.array(w[L] * w[R]),
            })
            .group_by(["a", "b"])
            .aggregate([("p", "sum")])
        )
        pb = (
            (stable_hash(d["a"]) ^ stable_hash(d["b"]))
            % np.uint64(buckets)
        ).astype(np.int32)
        return pa.table({
            "a": pc.cast(d["a"], g[id_col].type),
            "b": pc.cast(d["b"], g[id_col].type),
            "dot": d["p_sum"],
            "_pb": pa.array(pb),
        })

    def fold_pairs(t: pa.Table) -> pa.Table:
        g = (
            t.drop_columns(["_pb"])
            .group_by(["a", "b"])
            .aggregate([("dot", "sum")])
        )
        return g.rename_columns(["a", "b", "cosine"])

    # exchange 1: term-hash buckets co-locate each kept term's postings;
    # exchange 2: pair-hash buckets fold the partial dots (an int32
    # bucket id — measured ~2.5-7x cheaper than a 2-key groupby)
    cos = (
        ds.map_batches(unit_postings, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("_tb")
        .map_groups(pair_dots, batch_format="pyarrow")
        .groupby("_pb")
        .map_groups(fold_pairs, batch_format="pyarrow")
    )

    def local_topk(t: pa.Table) -> pa.Table:
        return table_topk(t, "cosine", ["a", "b"], k)

    cand = cos.map_batches(local_topk, batch_format="pyarrow")
    return merge_local_topk(cand, "cosine", ["a", "b"], k, empty)
