"""Lexical document similarity: top-k TF-IDF cosine document pairs via
inverted-index (term-postings) blocking — the sparse-vector sibling of the
embedding near-dup family in ``dedup.py``.

Scale shape: a document pair is only ever considered if it SHARES a kept
term, and kept terms are df-bounded (``2 <= df <= max_df``), so the pair
space is sum_t C(df_t, 2) — bounded by construction, never all-pairs.
Per-term partial dot products are generated inside term-hash buckets with
the same fully vectorized repeat/arange pair expansion the triangle
counter uses, pre-reduced per bucket, then folded by pair-hash bucket;
norms attach via two hash joins (the norm table is per-doc, it never sits
on the driver); each pair bucket keeps its local top-k and the driver
merges #buckets x k candidate rows.
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
    grows past it. Cosine uses norms over the SAME kept-term weights, so
    the result is exactly the cosine of the df-filtered TF-IDF vectors.
    Ties at the k boundary break (cosine desc, a asc, b asc). Returns a
    pyarrow Table (a, b, cosine) — empty when no term survives the df
    window.
    """
    if (max_df is None) == (max_df_frac is None):
        raise ValueError("pass exactly one of max_df / max_df_frac")
    from ray.data.aggregate import Sum
    from debezium_incubator_ray.hashing import stable_hash
    from debezium_incubator_ray.functions.joins import shuffle_join
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

    kept = df.map_batches(keep_idf, batch_format="pyarrow",
                          zero_copy_batch=True)

    def tf_explode(t: pa.Table) -> pa.Table:
        flat, lens = _flat_tokens(t, text_col)
        ids = np.repeat(
            t[id_col].combine_chunks().to_numpy(zero_copy_only=False), lens
        )
        g = (
            pa.table({id_col: pa.array(ids), "term": flat})
            .group_by([id_col, "term"])
            .aggregate([([], "count_all")])
        )
        return pa.table({
            id_col: g[id_col],
            "term": g["term"],
            "tf": pc.cast(g["count_all"], pa.float64()),
        })

    postings = shuffle_join(
        ds.map_batches(tf_explode, batch_format="pyarrow",
                       zero_copy_batch=True),
        kept, on="term", buckets=buckets,
    ).map_batches(
        lambda t: pa.table({
            id_col: t[id_col],
            "term": t["term"],
            "w": pc.multiply(t["tf"], t["idf"]),
        }),
        batch_format="pyarrow",
    ).materialize()  # consumed by norms AND pair generation

    def norm_partial(t: pa.Table) -> pa.Table:
        d = pa.table({
            id_col: t[id_col],
            "w2": pc.multiply(t["w"], t["w"]),
        })
        g = d.group_by(id_col).aggregate([("w2", "sum")])
        return g.rename_columns([id_col, "w2"])

    norms = (
        postings.map_batches(norm_partial, batch_format="pyarrow",
                             zero_copy_batch=True)
        .groupby(id_col)
        .aggregate(Sum("w2", alias_name="w2"))
        .map_batches(
            lambda t: pa.table({
                id_col: t[id_col],
                "nrm": pc.sqrt(t["w2"]),
            }),
            batch_format="pyarrow",
        )
        .materialize()  # consumed by BOTH marginal joins — without the
        # pin each join re-runs the full norm aggregation over postings
    )

    def tag_term(t: pa.Table) -> pa.Table:
        b = (stable_hash(t["term"]) % np.uint64(buckets)).astype(np.int32)
        return t.append_column("_tb", pa.array(b))

    def pair_dots(g: pa.Table) -> pa.Table:
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
        return g.rename_columns(["a", "b", "dot"])

    # route by the int32 pair-hash bucket instead of a 2-key groupby
    # (measured ~2.5-7x cheaper shuffle for pair streams elsewhere here)
    dots = (
        postings.map_batches(tag_term, batch_format="pyarrow",
                             zero_copy_batch=True)
        .groupby("_tb")
        .map_groups(pair_dots, batch_format="pyarrow")
        .groupby("_pb")
        .map_groups(fold_pairs, batch_format="pyarrow")
        .materialize()  # consumed by the norm join; also: an empty
        # candidate set (no term in the df window) must short-circuit —
        # joins can't infer a schema from zero blocks
    )
    id_type = ds.schema().base_schema.field(id_col).type
    empty = pa.table({
        "a": pa.array([], id_type),
        "b": pa.array([], id_type),
        "cosine": pa.array([], pa.float64()),
    })
    if dots.count() == 0:
        return empty

    with_na = shuffle_join(
        dots, norms, on="a", right_on=id_col, buckets=buckets
    ).map_batches(
        lambda t: pa.table({
            "a": t["a"], "b": t["b"], "dot": t["dot"], "na": t["nrm"],
        }),
        batch_format="pyarrow",
    )
    cos = shuffle_join(
        with_na, norms, on="b", right_on=id_col, buckets=buckets
    ).map_batches(
        lambda t: pa.table({
            "a": t["a"],
            "b": t["b"],
            "cosine": pc.divide(t["dot"], pc.multiply(t["na"], t["nrm"])),
        }),
        batch_format="pyarrow",
    )

    def local_topk(t: pa.Table) -> pa.Table:
        return table_topk(t, "cosine", ["a", "b"], k)

    cand = cos.map_batches(local_topk, batch_format="pyarrow")
    return merge_local_topk(cand, "cosine", ["a", "b"], k, empty)
