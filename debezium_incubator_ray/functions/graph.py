"""Iterative graph algorithms over an edge Dataset: PageRank by power
iteration.

Reference parity: none (the reference is a CDC agent); this is the
training-data-pipeline side of the engine — link-graph importance for
corpus weighting / crawl prioritization.

Scale shape: the edge list is the big side and is MATERIALIZED ONCE with
the source degree attached (Ray Datasets are lazy — without pinning, every
power iteration would re-derive the edges from the raw input). Each
iteration is one distributed hash join (edges x ranks on src, both sides
bucket-partitioned by the same key hash) plus one narrow groupby summing
contributions per destination; the rank vector is re-materialized per
iteration to keep lineage flat. Nothing node-scoped ever sits on the
driver — N comes from a count() aggregate and rides the task closures as
one float.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def distinct_edges(ds, src_col: str, dst_col: str, buckets: int = 128):
    """Distinct (src, dst) pairs: per-batch Arrow distinct as the
    combiner, then ONE shuffle on src-hash buckets with an in-bucket
    vectorized distinct (src co-locates all its pairs, so bucket-local
    distinct is global — and the map_groups UDF runs per bounded bucket,
    never per key)."""
    from debezium_incubator_ray.hashing import partition_ids

    def local(t: pa.Table) -> pa.Table:
        d = (
            t.select([src_col, dst_col])
            .group_by([src_col, dst_col])
            .aggregate([])
        )
        return d.append_column(
            "_b",
            pa.array(partition_ids(d[src_col].combine_chunks(), buckets,
                                   "hash"), pa.int32()),
        )

    def bucket_distinct(g: pa.Table) -> pa.Table:
        return (
            g.drop_columns(["_b"])
            .group_by([src_col, dst_col])
            .aggregate([])
        )

    return (
        ds.map_batches(local, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_b")
        .map_groups(bucket_distinct, batch_format="pyarrow")
    )


def pagerank(
    edges,
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    iters: int = 5,
    buckets: int = 64,
):
    """PageRank by ``iters`` power iterations over a DISTINCT directed
    edge Dataset. Assumes every node has at least one out-edge (true by
    construction for symmetrized/undirected graphs); dangling-node mass
    is therefore zero and each iteration is exactly
    r'(v) = (1-damping)/N + damping * sum_{u->v} r(u)/deg(u).

    Returns (node, rank) with ranks summing to 1. The output also carries
    ``rank_scaled`` = N * rank (~1 for an average node) so small ranks
    survive fixed-precision comparison.
    """
    from ray.data.aggregate import Sum
    from debezium_incubator_ray.functions.joins import shuffle_join

    teleport_w = 1.0 - damping  # written as its own name; callers pass
    # damping=0.85 and the oracle writes the literal 0.15 — identical
    # IEEE doubles either way for the default.

    def ones(t: pa.Table) -> pa.Table:
        return pa.table({
            src_col: t[src_col],
            "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
        })

    # edges is consumed twice (degree build + edges_deg join) and deg
    # three times (count, join, rank init); pin each once — un-materialized
    # Datasets re-run their whole upstream shuffle on every consumption.
    edges = edges.materialize()
    deg = (
        edges.map_batches(ones, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(src_col)
        .aggregate(Sum("one", alias_name="deg"))
        .materialize()
    )
    n_nodes = float(deg.count())

    # pin the big side once: (src, dst, deg-of-src)
    edges_deg = shuffle_join(
        edges, deg, on=src_col, right_on=src_col, buckets=buckets
    ).map_batches(
        lambda t: pa.table({
            "src": t[src_col],
            "dst": t[dst_col],
            "deg": pc.cast(t["deg"], pa.float64()),
        }),
        batch_format="pyarrow",
    ).materialize()

    init = 1.0 / n_nodes

    ranks = deg.map_batches(
        lambda t: pa.table({
            "node": t[src_col],
            "r": pa.array(np.full(t.num_rows, init)),
        }),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(iters):
        contrib = shuffle_join(
            edges_deg, ranks, on="src", right_on="node", buckets=buckets
        ).map_batches(
            lambda t: pa.table({
                "dst": t["dst"],
                "c": pc.divide(t["r"], t["deg"]),
            }),
            batch_format="pyarrow",
        )
        summed = contrib.groupby("dst").aggregate(Sum("c", alias_name="c"))
        ranks = summed.map_batches(
            lambda t: pa.table({
                "node": t["dst"],
                "r": pc.add(
                    teleport_w / n_nodes, pc.multiply(damping, t["c"])
                ),
            }),
            batch_format="pyarrow",
        ).materialize()

    return ranks.map_batches(
        lambda t: pa.table({
            "node": t["node"],
            "rank": t["r"],
            "rank_scaled": pc.multiply(t["r"], n_nodes),
        }),
        batch_format="pyarrow",
    )
