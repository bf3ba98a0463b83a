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


def distinct_rows(ds, cols, buckets: int = 128):
    """Distinct rows over ``cols``: per-batch Arrow distinct as the
    combiner, then ONE shuffle on first-column-hash buckets with an
    in-bucket vectorized distinct (the first column co-locates all its
    rows, so bucket-local distinct is global — and the map_groups UDF
    runs per bounded bucket, never per key)."""
    from debezium_incubator_ray.hashing import partition_ids

    cols = list(cols)

    def local(t: pa.Table) -> pa.Table:
        d = t.select(cols).group_by(cols).aggregate([])
        return d.append_column(
            "_b",
            pa.array(partition_ids(d[cols[0]].combine_chunks(), buckets,
                                   "hash"), pa.int32()),
        )

    def bucket_distinct(g: pa.Table) -> pa.Table:
        return g.drop_columns(["_b"]).group_by(cols).aggregate([])

    return (
        ds.map_batches(local, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_b")
        .map_groups(bucket_distinct, batch_format="pyarrow")
    )


def distinct_edges(ds, src_col: str, dst_col: str, buckets: int = 128):
    """Distinct (src, dst) pairs — distinct_rows over the two edge
    columns (kept as the graph-module entry point)."""
    return distinct_rows(ds, [src_col, dst_col], buckets=buckets)



def canonical_edges(edges, src_col: str, dst_col: str, buckets: int = 64):
    """Canonical (min, max) distinct edge set, loops/NULLs dropped, PINNED —
    the shared front step of every undirected-graph operator here."""

    def canon(t: pa.Table) -> pa.Table:
        s = t[src_col].combine_chunks()
        d = t[dst_col].combine_chunks()
        a = pc.min_element_wise(s, d)
        b = pc.max_element_wise(s, d)
        keep = pc.and_(
            pc.not_equal(a, b),
            pc.and_(pc.is_valid(a), pc.is_valid(b)),
        )
        return pa.table({"a": a, "b": b}).filter(keep)

    return distinct_edges(
        edges.map_batches(canon, batch_format="pyarrow",
                          zero_copy_batch=True),
        "a", "b", buckets=buckets,
    ).materialize()


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

    # pin the big side once: (src, dst, deg-of-src). Coalesce to a
    # bounded block count — join/groupby output arrives as #buckets
    # tiny blocks, and per-block fixed cost dominates tiny blocks.
    edges_deg = shuffle_join(
        edges, deg, on=src_col, right_on=src_col, buckets=buckets
    ).map_batches(
        lambda t: pa.table({
            "src": t[src_col],
            "dst": t[dst_col],
            "deg": pc.cast(t["deg"], pa.float64()),
        }),
        batch_format="pyarrow",
    ).repartition(max(buckets // 4, 4)).materialize()

    init = 1.0 / n_nodes
    rank_blocks = max(buckets // 8, 2)

    ranks = deg.map_batches(
        lambda t: pa.table({
            "node": t[src_col],
            "r": pa.array(np.full(t.num_rows, init)),
        }),
        batch_format="pyarrow",
    ).repartition(rank_blocks).materialize()

    from debezium_incubator_ray.hashing import partition_ids

    def tag_dst(t: pa.Table) -> pa.Table:
        # pre-reduce contributions per dst inside the block, then route
        # by an int32 dst-hash bucket (measured much cheaper than the
        # sort-based groupby over the same rows)
        d = pa.table({
            "dst": t["dst"],
            "c": pc.divide(t["r"], t["deg"]),
        })
        g = d.group_by("dst").aggregate([("c", "sum")])
        g = g.rename_columns(["dst", "c"])
        return g.append_column(
            "_db",
            pa.array(partition_ids(g["dst"].combine_chunks(), buckets,
                                   "hash"), pa.int32()),
        )

    def fold_dst(g: pa.Table) -> pa.Table:
        s = (
            g.drop_columns(["_db"])
            .group_by("dst")
            .aggregate([("c", "sum")])
        )
        return pa.table({
            "node": s["dst"],
            "r": pc.add(
                teleport_w / n_nodes, pc.multiply(damping, s["c_sum"])
            ),
        })

    for _ in range(iters):
        joined = shuffle_join(
            edges_deg, ranks, on="src", right_on="node", buckets=buckets
        )
        ranks = (
            joined.map_batches(tag_dst, batch_format="pyarrow")
            .groupby("_db")
            .map_groups(fold_dst, batch_format="pyarrow")
            .repartition(rank_blocks)
            .materialize()
        )

    return ranks.map_batches(
        lambda t: pa.table({
            "node": t["node"],
            "rank": t["r"],
            "rank_scaled": pc.multiply(t["r"], n_nodes),
        }),
        batch_format="pyarrow",
    )


def _canonical_oriented(edges, src_col: str, dst_col: str, buckets: int):
    """Shared front half of the degree-ordered triangle family:
    canonicalize (min, max) edges dropping loops/NULLs, distinct them
    (one bucketed shuffle), fold per-node degrees (narrow groupby of
    count partials), then two bucketed hash joins attach endpoint
    degrees and orient each edge from its lower-(degree, id) endpoint —
    so wedges are only ever generated at a triangle's lowest-degree
    corner. Returns (ce, deg, oriented): the pinned canonical edge set,
    the pinned (node, deg) table, and the lazy oriented edge Dataset
    with a `_wb` wedge-source bucket column."""
    from ray.data.aggregate import Sum
    from debezium_incubator_ray.hashing import partition_ids
    from debezium_incubator_ray.functions.joins import shuffle_join

    def canon(t: pa.Table) -> pa.Table:
        s = t[src_col].combine_chunks()
        d = t[dst_col].combine_chunks()
        a = pc.min_element_wise(s, d)
        b = pc.max_element_wise(s, d)
        keep = pc.and_(
            pc.not_equal(a, b),
            pc.and_(pc.is_valid(a), pc.is_valid(b)),
        )
        return pa.table({"a": a, "b": b}).filter(keep)

    # consumed by degrees, the orientation join and the closing-edge
    # match — pin once
    ce = distinct_edges(
        edges.map_batches(canon, batch_format="pyarrow",
                          zero_copy_batch=True),
        "a", "b", buckets=buckets,
    ).materialize()

    def deg_partial(t: pa.Table) -> pa.Table:
        nodes = pa.chunked_array(
            [t["a"].combine_chunks(), t["b"].combine_chunks()]
        )
        g = pa.table({"node": nodes}).group_by("node").aggregate(
            [([], "count_all")]
        )
        return pa.table({
            "node": g["node"],
            "dcnt": pc.cast(g["count_all"], pa.int64()),
        })

    deg = (
        ce.map_batches(deg_partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("node")
        .aggregate(Sum("dcnt", alias_name="deg"))
        .materialize()
    )

    j1 = shuffle_join(
        ce, deg, on="a", right_on="node", buckets=buckets
    ).map_batches(
        lambda t: pa.table({"a": t["a"], "b": t["b"], "deg_a": t["deg"]}),
        batch_format="pyarrow",
    )

    def orient(t: pa.Table) -> pa.Table:
        a = t["a"].combine_chunks()
        b = t["b"].combine_chunks()
        da = t["deg_a"].combine_chunks().to_numpy(zero_copy_only=False)
        db = t["deg"].combine_chunks().to_numpy(zero_copy_only=False)
        # lower (degree, id) endpoint becomes the wedge source; ties in
        # degree fall back to the canonical a < b order
        a_first = pa.array(da < db) if len(da) else pa.array([], pa.bool_())
        a_first = pc.or_(a_first, pa.array(da == db))
        u = pc.if_else(a_first, a, b)
        v = pc.if_else(a_first, b, a)
        return pa.table({"u": u, "v": v}).append_column(
            "_wb",
            pa.array(partition_ids(u.combine_chunks()
                                   if isinstance(u, pa.ChunkedArray) else u,
                                   buckets, "hash"), pa.int32()),
        )

    oriented = shuffle_join(
        j1, deg, on="b", right_on="node", buckets=buckets
    ).map_batches(orient, batch_format="pyarrow")
    return ce, deg, oriented


def triangle_count(edges, src_col: str = "src", dst_col: str = "dst",
                   buckets: int = 64):
    """Exact triangle count of the undirected graph induced by an edge
    Dataset (duplicates / orientations / self-loops cleaned first).
    Returns a 1-row pyarrow Table (n_nodes, n_edges, n_triangles).

    Scale shape — the classic degree-ordered wedge algorithm, O(m^1.5)
    work instead of the naive O(sum deg^2): every edge is oriented from
    its lower-(degree, id) endpoint to the higher one, so wedges are only
    generated at a triangle's LOWEST-degree corner and no single hub node
    ever expands its full neighborhood. Stages: (1) canonical distinct
    edges (one bucketed shuffle); (2) per-node degrees (narrow groupby of
    per-batch count partials); (3) two hash joins attach endpoint degrees
    and orient; (4) wedges per source bucket — a fully vectorized
    repeat/arange pair expansion, pre-reduced to (x, y, cnt) inside the
    bucket; (5) wedges and edges route by the SAME pair-hash bucket and
    an in-bucket Arrow join counts wedges whose closing edge exists.
    Only (x, y, cnt) candidate rows ever re-shuffle; the driver sees one
    int per bucket."""
    from debezium_incubator_ray.hashing import stable_hash

    ce, deg, oriented = _canonical_oriented(edges, src_col, dst_col, buckets)

    def wedges(g: pa.Table) -> pa.Table:
        u = g["u"].combine_chunks().to_numpy(zero_copy_only=False)
        v = g["v"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((v, u))
        u, v = u[order], v[order]
        n = len(u)
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        sizes = np.diff(np.append(starts, n))
        from debezium_incubator_ray.functions.kernels import expand_pairs

        L, R = expand_pairs(sizes)
        empty = pa.table({
            "x": pa.array([], g["v"].type),
            "y": pa.array([], g["v"].type),
            "cnt": pa.array([], pa.int64()),
            "_pb": pa.array([], pa.int32()),
        })
        if len(L) == 0:
            return empty
        x = np.minimum(v[L], v[R])
        y = np.maximum(v[L], v[R])
        w = (
            pa.table({"x": pa.array(x), "y": pa.array(y)})
            .group_by(["x", "y"])
            .aggregate([([], "count_all")])
        )
        pb = (
            (stable_hash(w["x"]) ^ stable_hash(w["y"]))
            % np.uint64(buckets)
        ).astype(np.int32)
        return pa.table({
            "x": pc.cast(w["x"], g["v"].type),
            "y": pc.cast(w["y"], g["v"].type),
            "cnt": pc.cast(w["count_all"], pa.int64()),
            "_pb": pa.array(pb),
        })

    wedge_ds = oriented.groupby("_wb").map_groups(
        wedges, batch_format="pyarrow"
    )

    def tag_edge(t: pa.Table) -> pa.Table:
        pb = (
            (stable_hash(t["a"]) ^ stable_hash(t["b"]))
            % np.uint64(buckets)
        ).astype(np.int32)
        return pa.table({
            "x": t["a"],
            "y": t["b"],
            "cnt": pa.nulls(t.num_rows, pa.int64()),  # edge marker
            "_pb": pa.array(pb),
        })

    def close_bucket(t: pa.Table) -> pa.Table:
        is_edge = pc.is_null(t["cnt"])
        e = t.filter(is_edge).select(["x", "y"])
        w = t.filter(pc.invert(is_edge)).select(["x", "y", "cnt"])
        j = w.join(e, keys=["x", "y"], join_type="inner")
        tri = pc.sum(j["cnt"]).as_py() or 0
        return pa.table({"tri": pa.array([tri], pa.int64())})

    parts = (
        wedge_ds.union(
            ce.map_batches(tag_edge, batch_format="pyarrow",
                           zero_copy_batch=True)
        )
        .groupby("_pb")
        .map_groups(close_bucket, batch_format="pyarrow")
        .take_all()
    )
    n_tri = sum(r["tri"] for r in parts)

    # total wedges (unordered 2-paths) = sum C(deg, 2) —
    # orientation-independent, so the global clustering coefficient
    # 3T / W is exact regardless of the wedge-generation orientation
    def wedge_partial(t: pa.Table) -> pa.Table:
        d = pc.cast(t["deg"], pa.float64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "w": pa.array([float((d * (d - 1.0) / 2.0).sum())],
                          pa.float64())
        })

    n_wedges = int(
        deg.map_batches(wedge_partial, batch_format="pyarrow").sum("w")
    )
    coef = (3.0 * n_tri / n_wedges) if n_wedges else 0.0
    return pa.table({
        "n_nodes": pa.array([deg.count()], pa.int64()),
        "n_edges": pa.array([ce.count()], pa.int64()),
        "n_triangles": pa.array([n_tri], pa.int64()),
        "n_wedges": pa.array([n_wedges], pa.int64()),
        "clustering_coef": pa.array([coef], pa.float64()),
    })


def bfs_hops(edges, seeds, src_col: str = "src", dst_col: str = "dst",
             max_hops: int = 3, buckets: int = 64):
    """Multi-source BFS hop distance over the undirected graph of an edge
    Dataset: returns (node, hops) for every node within ``max_hops`` of
    the seed set (seeds themselves at hops=0).

    Scale shape — frontier expansion, the standard distributed BFS: the
    undirected adjacency is materialized once; each hop is ONE hash join
    (frontier x adjacency, both sides routed by the same key hash), an
    in-bucket distinct, and ONE anti-join against the visited set (also
    hash-bucketed — the visited set never sits on the driver). Work per
    hop is proportional to the frontier's edge cut, not the graph; the
    loop exits early when a frontier drains."""
    from debezium_incubator_ray.functions.joins import shuffle_join
    import ray.data

    def both_dirs(t: pa.Table) -> pa.Table:
        s = t[src_col].combine_chunks()
        d = t[dst_col].combine_chunks()
        keep = pc.and_(
            pc.not_equal(s, d), pc.and_(pc.is_valid(s), pc.is_valid(d))
        )
        s, d = s.filter(keep), d.filter(keep)
        return pa.table({
            "u": pa.chunked_array([s, d]),
            "v": pa.chunked_array([d, s]),
        })

    adj = distinct_edges(
        edges.map_batches(both_dirs, batch_format="pyarrow",
                          zero_copy_batch=True),
        "u", "v", buckets=buckets,
    ).materialize()
    node_type = adj.schema().base_schema.field("u").type

    def _distinct(ds):
        return distinct_rows(ds, ["node"], buckets=buckets)

    frontier = ray.data.from_arrow(pa.table({
        "node": pc.cast(pa.array(sorted(set(seeds))), node_type),
        "hops": pa.array([0] * len(set(seeds)), pa.int64()),
    })).materialize()
    visited = frontier

    for h in range(1, max_hops + 1):
        nbrs = shuffle_join(
            frontier.map_batches(
                lambda t: t.select(["node"]), batch_format="pyarrow"
            ),
            adj, on="node", right_on="u", buckets=buckets,
        ).map_batches(
            lambda t: pa.table({"node": t["v"]}), batch_format="pyarrow"
        )
        fresh = shuffle_join(
            _distinct(nbrs), visited, on="node", buckets=buckets,
            join_type="left anti",
        ).map_batches(
            lambda t, _h=h: pa.table({
                "node": t["node"],
                "hops": pa.array(np.full(t.num_rows, _h, np.int64)),
            }),
            batch_format="pyarrow",
        ).materialize()
        if fresh.count() == 0:
            break
        visited = visited.union(fresh).materialize()
        frontier = fresh

    return visited


def _block_cc(n: int, ui: np.ndarray, vi: np.ndarray) -> np.ndarray:
    """In-memory connected components over ``n`` nodes indexed 0..n-1 and
    edge index arrays (ui, vi): vectorized hash-min with pointer doubling
    (labels converge to the minimum node INDEX of each component in
    O(log diameter) numpy passes — no per-edge Python loop)."""
    lab = np.arange(n, dtype=np.int64)
    while True:
        nxt = lab.copy()
        np.minimum.at(nxt, ui, lab[vi])
        np.minimum.at(nxt, vi, lab[ui])
        while True:  # pointer jumping: collapse label chains
            hop = nxt[nxt]
            if np.array_equal(hop, nxt):
                break
            nxt = hop
        if np.array_equal(nxt, lab):
            return lab
        lab = nxt


def cc_labels(edges, src_col: str = "src", dst_col: str = "dst",
              buckets: int = 64, driver_edge_limit: int = 2_000_000):
    """Component labels for every node of an edge Dataset: one row per
    node, (node, comp), comp = the MINIMUM node id of its component.

    Scale shape — two-level contraction, NOT per-round shuffling:
    (1) every edge block runs an in-memory vectorized hash-min union
    (``_block_cc``), contracting the block to a (node -> root) mapping
    where root = the block-local min id; (2) ONE shuffle groups the
    mapping by node hash — a node landing in k blocks with differing
    roots emits (min_root, root) ROOT-GRAPH edges, and along any path of
    the original graph consecutive blocks share a node, so the root
    graph connects exactly the roots of each component; (3) the root
    graph is metadata-sized (only roots that disagree across blocks),
    so it finishes with the same vectorized kernel driver-side and the
    root -> comp fix-up broadcasts back as two sorted numpy arrays; (4)
    one more node-hash shuffle dedups the mapping to one labeled row
    per node. Total: one pass over the edges + two 16-byte/row shuffles
    — constant shuffle count, no O(diameter) iteration. If the root
    graph exceeds ``driver_edge_limit`` (pathological block
    fragmentation), this raises rather than silently materializing —
    re-run with larger blocks or a higher limit."""
    from debezium_incubator_ray.hashing import partition_ids
    import ray

    def local_cc(t: pa.Table) -> pa.Table:
        s = pc.cast(t[src_col].combine_chunks(), pa.int64())
        d = pc.cast(t[dst_col].combine_chunks(), pa.int64())
        keep = pc.and_(pc.is_valid(s), pc.is_valid(d))
        u = s.filter(keep).to_numpy(zero_copy_only=False)
        v = d.filter(keep).to_numpy(zero_copy_only=False)
        ids, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
        ui, vi = inv[: len(u)], inv[len(u):]
        lab = _block_cc(len(ids), ui, vi)
        m = pa.table({
            "node": pa.array(ids), "root": pa.array(ids[lab]),
        })
        return m.append_column(
            "_b",
            pa.array(partition_ids(m["node"].combine_chunks(), buckets,
                                   "hash"), pa.int32()),
        )

    mapping = edges.map_batches(
        local_cc, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def root_pairs(g: pa.Table) -> pa.Table:
        # per node: (min_root, other_root) edges between disagreeing
        # block-local roots — empty when every block agrees
        node = g["node"].combine_chunks().to_numpy(zero_copy_only=False)
        root = g["root"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(node, kind="stable")
        node, root = node[order], root[order]
        starts = np.flatnonzero(np.r_[True, node[1:] != node[:-1]])
        mins = np.minimum.reduceat(root, starts)
        a = np.repeat(mins, np.diff(np.r_[starts, len(node)]))
        mask = a != root
        out = pa.table({"a": pa.array(a[mask]), "b": pa.array(root[mask])})
        return out.group_by(["a", "b"]).aggregate([])

    pairs_ds = (
        mapping.groupby("_b")
        .map_groups(root_pairs, batch_format="pyarrow")
        .materialize()
    )  # root-graph edges: metadata-sized (disagreeing roots only)
    n_pairs = pairs_ds.count()
    if n_pairs > driver_edge_limit:
        # fail BEFORE pulling anything to the driver
        raise ValueError(
            f"root graph has {n_pairs} edges > driver_edge_limit="
            f"{driver_edge_limit}; increase block size or the limit"
        )
    pairs = pairs_ds.take_all()
    if pairs:
        ra = np.array([r["a"] for r in pairs], dtype=np.int64)
        rb = np.array([r["b"] for r in pairs], dtype=np.int64)
        rid, rinv = np.unique(np.concatenate([ra, rb]),
                              return_inverse=True)
        rlab = _block_cc(len(rid), rinv[: len(ra)], rinv[len(ra):])
        fix_from, fix_to = rid, rid[rlab]
    else:
        fix_from = np.empty(0, np.int64)
        fix_to = np.empty(0, np.int64)
    fix_ref = ray.put((fix_from, fix_to))  # sorted by construction

    def resolve(t: pa.Table) -> pa.Table:
        fsrc, fdst = ray.get(fix_ref)
        root = t["root"].combine_chunks().to_numpy(zero_copy_only=False)
        comp = root.copy()
        if len(fsrc):
            pos = np.searchsorted(fsrc, root)
            pos = np.minimum(pos, len(fsrc) - 1)
            hit = fsrc[pos] == root
            comp[hit] = fdst[pos[hit]]
        out = pa.table({
            "node": t["node"],
            "comp": pa.array(comp),
            "_b": t["_b"],
        })
        # block-local distinct (a node repeats across blocks, always with
        # the same resolved comp)
        return out.group_by(["node", "comp", "_b"]).aggregate([])

    def node_distinct(g: pa.Table) -> pa.Table:
        return (
            g.drop_columns(["_b"]).group_by(["node", "comp"]).aggregate([])
        )

    return (
        mapping.map_batches(resolve, batch_format="pyarrow",
                            zero_copy_batch=True)
        .groupby("_b")
        .map_groups(node_distinct, batch_format="pyarrow")
    )


def connected_components(edges, src_col: str = "src", dst_col: str = "dst",
                         buckets: int = 64,
                         driver_edge_limit: int = 2_000_000):
    """Connected components over an edge Dataset: one row per component,
    (comp, n_nodes), comp = the MINIMUM node id of the component. See
    ``cc_labels`` for the contraction design; this adds a per-block
    partial count + one comp-hash fold on top."""
    from debezium_incubator_ray.hashing import partition_ids

    labels = cc_labels(edges, src_col, dst_col, buckets=buckets,
                       driver_edge_limit=driver_edge_limit)

    def count_partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["comp"]).aggregate([([], "count_all")])
        out = pa.table({
            "comp": g["comp"],
            "n": pc.cast(g["count_all"], pa.int64()),
        })
        return out.append_column(
            "_b2",
            pa.array(partition_ids(out["comp"].combine_chunks(), buckets,
                                   "hash"), pa.int32()),
        )

    def count_fold(g: pa.Table) -> pa.Table:
        r = g.drop_columns(["_b2"]).group_by(["comp"]).aggregate(
            [("n", "sum")]
        )
        return pa.table({
            "comp": r["comp"],
            "n_nodes": pc.cast(r["n_sum"], pa.int64()),
        })

    return (
        labels.map_batches(count_partial, batch_format="pyarrow",
                           zero_copy_batch=True)
        .groupby("_b2")
        .map_groups(count_fold, batch_format="pyarrow")
    )


def degree_assortativity(edges, src_col: str = "src", dst_col: str = "dst"):
    """Degree assortativity coefficient of an UNDIRECTED edge list (each
    edge once): the Pearson correlation of (deg(u), deg(v)) over all 2m
    directed edge instances — do hubs link to hubs (r > 0) or to leaves
    (r < 0)?

    Scale shape: pass 1 folds per-block endpoint value_counts into the
    node-degree table (|V| rows — broadcast once via ray.put; for graphs
    whose node table outgrows a worker, bucket-join degrees like
    pagerank does); pass 2 maps each edge block to int64 moment sums
    (exact — degrees are ints), one scalar aggregate folds them. The
    edge list never shuffles. Returns one row:
    (assortativity, n_nodes, m2) with m2 = 2 * edge count."""
    import ray
    from ray.data.aggregate import Sum

    def deg_partial(t: pa.Table) -> pa.Table:
        both = pa.concat_arrays([
            t[src_col].combine_chunks(), t[dst_col].combine_chunks()
        ])
        vc = both.value_counts()
        return pa.table({
            "node": vc.field("values"),
            "d": pc.cast(vc.field("counts"), pa.int64()),
        })

    rows = (
        edges.map_batches(deg_partial, batch_format="pyarrow",
                          zero_copy_batch=True)
        .groupby("node")
        .aggregate(Sum("d", alias_name="d"))
        .take_all()
    )
    nodes = np.array([r["node"] for r in rows], dtype=np.int64)
    degs = np.array([r["d"] for r in rows], dtype=np.int64)
    order = np.argsort(nodes)
    ref = ray.put((nodes[order], degs[order]))
    n_nodes = len(nodes)

    def moments(t: pa.Table) -> pa.Table:
        nd, dg = ray.get(ref)
        u = t[src_col].combine_chunks().to_numpy(zero_copy_only=False)
        v = t[dst_col].combine_chunks().to_numpy(zero_copy_only=False)
        x = dg[np.searchsorted(nd, u)]
        y = dg[np.searchsorted(nd, v)]
        # both orientations of each undirected edge: symmetric sums
        return pa.table({
            "m": pa.array([2 * len(x)], pa.int64()),
            "sx": pa.array([int(x.sum() + y.sum())], pa.int64()),
            "sxx": pa.array([int((x * x).sum() + (y * y).sum())], pa.int64()),
            "sxy": pa.array([int(2 * (x * y).sum())], pa.int64()),
        })

    agg = edges.map_batches(
        moments, batch_format="pyarrow", zero_copy_batch=True
    ).aggregate(*[Sum(c, alias_name=c) for c in ("m", "sx", "sxx", "sxy")])
    # Python ints: m2*sxx etc. would wrap numpy int64 on large graphs
    m2, sx, sxx, sxy = (int(agg[c] or 0) for c in ("m", "sx", "sxx", "sxy"))
    var = float(m2 * sxx - sx * sx)
    r = (m2 * sxy - sx * sx) / var if m2 and var > 0 else float("nan")
    return pa.table({
        "assortativity": pa.array([round(float(r), 6)], pa.float64()),
        "n_nodes": pa.array([n_nodes], pa.int64()),
        "m2": pa.array([int(m2 or 0)], pa.int64()),
    })

def local_clustering(edges, src_col: str = "src", dst_col: str = "dst",
                     k: int = 50, buckets: int = 64):
    """Per-node local clustering coefficient lcc(v) = 2*tri(v) /
    (deg(v)*(deg(v)-1)) over the undirected simple graph of an edge
    Dataset; returns the top-k nodes by (lcc desc, node asc) with their
    degree and triangle membership counts — "whose neighborhood is the
    most clique-like".

    Same degree-ordered wedge machinery as :func:`triangle_count`
    (O(m^1.5) wedge work, pair-hash bucketed closing-edge join) with one
    change: wedges keep their CENTER node instead of collapsing to
    (x, y, cnt), because a closed wedge (w; x, y) must credit all three
    corners. Matched rows fold to (node, tri) partials inside the
    bucket; one narrow groupby sums them; degrees attach by a bucketed
    left join so zero-triangle nodes keep lcc = 0. Nodes of degree < 2
    have no defined coefficient and are excluded (mirroring the SQL
    HAVING deg >= 2)."""
    from ray.data.aggregate import Sum
    from debezium_incubator_ray.hashing import stable_hash
    from debezium_incubator_ray.functions.joins import shuffle_join
    from debezium_incubator_ray.functions.kernels import (
        expand_pairs, merge_local_topk, table_topk,
    )

    ce, deg, oriented = _canonical_oriented(edges, src_col, dst_col, buckets)

    def wedges_with_center(g: pa.Table) -> pa.Table:
        u = g["u"].combine_chunks().to_numpy(zero_copy_only=False)
        v = g["v"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((v, u))
        u, v = u[order], v[order]
        n = len(u)
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        sizes = np.diff(np.append(starts, n))
        L, R = expand_pairs(sizes)
        if len(L) == 0:
            return pa.table({
                "x": pa.array([], g["v"].type),
                "y": pa.array([], g["v"].type),
                "w": pa.array([], g["u"].type),
                "_pb": pa.array([], pa.int32()),
            })
        x = np.minimum(v[L], v[R])
        y = np.maximum(v[L], v[R])
        w = u[L]  # wedge center (same group => u[L] == u[R])
        xa, ya = pa.array(x), pa.array(y)
        pb = (
            (stable_hash(xa) ^ stable_hash(ya)) % np.uint64(buckets)
        ).astype(np.int32)
        return pa.table({
            "x": pc.cast(xa, g["v"].type),
            "y": pc.cast(ya, g["v"].type),
            "w": pc.cast(pa.array(w), g["u"].type),
            "_pb": pa.array(pb),
        })

    wedge_ds = oriented.groupby("_wb").map_groups(
        wedges_with_center, batch_format="pyarrow"
    )

    def tag_edge(t: pa.Table) -> pa.Table:
        pb = (
            (stable_hash(t["a"]) ^ stable_hash(t["b"]))
            % np.uint64(buckets)
        ).astype(np.int32)
        return pa.table({
            "x": t["a"],
            "y": t["b"],
            "w": pa.nulls(t.num_rows, t["a"].type),  # edge marker
            "_pb": pa.array(pb),
        })

    def close_bucket(t: pa.Table) -> pa.Table:
        is_edge = pc.is_null(t["w"])
        e = t.filter(is_edge).select(["x", "y"])
        wt = t.filter(pc.invert(is_edge)).select(["x", "y", "w"])
        j = wt.join(e, keys=["x", "y"], join_type="inner")
        if j.num_rows == 0:
            return pa.table({
                "node": pa.array([], t["x"].type),
                "tri": pa.array([], pa.int64()),
            })
        corners = pa.chunked_array([
            j["w"].combine_chunks(), j["x"].combine_chunks(),
            j["y"].combine_chunks(),
        ])
        vc = corners.value_counts()
        return pa.table({
            "node": vc.field("values"),
            "tri": pc.cast(vc.field("counts"), pa.int64()),
        })

    tri = (
        wedge_ds.union(
            ce.map_batches(tag_edge, batch_format="pyarrow",
                           zero_copy_batch=True)
        )
        .groupby("_pb")
        .map_groups(close_bucket, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum("tri", alias_name="tri"))
        # O(|nodes|) rows; pinned because shuffle_join needs the right
        # side's schema and a lazy double-groupby can't state one
        .materialize()
    )

    def finish(t: pa.Table) -> pa.Table:
        d = pc.cast(t["deg"], pa.float64())
        tr = pc.cast(pc.fill_null(t["tri"], 0), pa.int64())
        denom = pc.multiply(d, pc.subtract(d, pa.scalar(1.0)))
        lcc = pc.divide(
            pc.multiply(pc.cast(tr, pa.float64()), pa.scalar(2.0)), denom
        )
        out = pa.table({
            "node": t["node"], "deg": t["deg"], "tri": tr,
            "lcc": pc.round(lcc, 6),
        }).filter(pc.greater_equal(t["deg"], pa.scalar(2)))
        return table_topk(out, "lcc", ["node"], k)

    if tri.count() == 0:
        # triangle-free graph: every deg>=2 node keeps lcc = 0 — a
        # 0-block right side has no schema, so skip the join entirely
        cand = deg.map_batches(
            lambda t: finish(t.append_column(
                "tri", pa.nulls(t.num_rows, pa.int64())
            )),
            batch_format="pyarrow",
        )
    else:
        cand = shuffle_join(
            deg, tri, on="node", buckets=buckets, join_type="left outer"
        ).map_batches(finish, batch_format="pyarrow")
    empty = pa.table({
        "node": pa.array([], pa.int64()),
        "deg": pa.array([], pa.int64()),
        "tri": pa.array([], pa.int64()),
        "lcc": pa.array([], pa.float64()),
    })
    out = merge_local_topk(cand, "lcc", ["node"], k, empty)
    # table_topk skips the sort when fewer than k candidates survive —
    # present (lcc desc, node asc) deterministically regardless
    order = pc.sort_indices(
        out.append_column("_neg", pc.negate(out["lcc"])),
        sort_keys=[("_neg", "ascending"), ("node", "ascending")],
    )
    return out.take(order)


def adamic_adar(edges, src_col: str = "src", dst_col: str = "dst",
                k: int = 50, buckets: int = 64):
    """Top-k NON-adjacent node pairs by Adamic-Adar score
    AA(x, y) = sum over common neighbors w of 1 / ln(deg(w)) — the
    classic link-prediction ranking ("which parts will be co-bought
    next").

    Reference parity: none (training-data / graph-curation side).

    Scale shape: the full adjacency (both directions of the canonical
    edge set) is bucketed by CENTER hash, so each bucket holds complete
    neighborhoods; one vectorized pass per bucket expands each center's
    neighbor pairs (the center's degree is its group size, so the
    1/ln(deg) weight needs no join) and pre-sums per pair, stamping the
    pair-hash bucket. The canonical edges ride the same pair buckets as
    null-weight markers so the in-bucket anti-join (drop pairs that are
    already edges) never leaves the bucket. Per-pair partials fold in
    the bucket groupby; only #buckets x k candidate rows reach the
    driver. Hub centers expand deg^2 pairs — callers bound that by
    feeding a top-k edge cut (as the co-purchase queries do) or a
    degree cap upstream."""
    from debezium_incubator_ray.hashing import partition_ids, stable_hash
    from debezium_incubator_ray.functions.kernels import (
        expand_pairs, merge_local_topk,
    )

    # consumed by the adjacency expansion AND the edge markers — pin once
    ce = canonical_edges(edges, src_col, dst_col, buckets=buckets)

    def adjacency(t: pa.Table) -> pa.Table:
        c = pa.chunked_array([t["a"].combine_chunks(),
                              t["b"].combine_chunks()])
        n = pa.chunked_array([t["b"].combine_chunks(),
                              t["a"].combine_chunks()])
        out = pa.table({"c": c, "n": n})
        cb = pa.array(
            partition_ids(out["c"].combine_chunks(), buckets, "hash"),
            pa.int32(),
        )
        return out.append_column("_cb", cb)

    def wedges(g: pa.Table) -> pa.Table:
        c = g["c"].combine_chunks().to_numpy(zero_copy_only=False)
        nb = g["n"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((nb, c))
        c, nb = c[order], nb[order]
        starts = np.flatnonzero(np.r_[True, c[1:] != c[:-1]])
        sizes = np.diff(np.append(starts, len(c)))
        L, R = expand_pairs(sizes)
        if len(L) == 0:
            return pa.table({
                "x": pa.array([], g["n"].type),
                "y": pa.array([], g["n"].type),
                "w": pa.array([], pa.float64()),
                "_pb": pa.array([], pa.int32()),
            })
        x = np.minimum(nb[L], nb[R])
        y = np.maximum(nb[L], nb[R])
        # deg(center) = its adjacency group size (simple graph); sizes
        # == 1 emit no pairs, so ln() is always of >= 2
        n_pairs = sizes * (sizes - 1) // 2
        w = np.repeat(1.0 / np.log(sizes.astype(np.float64)), n_pairs)
        part = pa.table({
            "x": pc.cast(pa.array(x), g["n"].type),
            "y": pc.cast(pa.array(y), g["n"].type),
            "w": pa.array(w, pa.float64()),
        }).group_by(["x", "y"]).aggregate([("w", "sum")])
        pb = (
            (stable_hash(part["x"]) ^ stable_hash(part["y"]))
            % np.uint64(buckets)
        ).astype(np.int32)
        return pa.table({
            "x": part["x"], "y": part["y"], "w": part["w_sum"],
            "_pb": pa.array(pb),
        })

    wedge_ds = (
        ce.map_batches(adjacency, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("_cb")
        .map_groups(wedges, batch_format="pyarrow")
    )

    def tag_edge(t: pa.Table) -> pa.Table:
        pb = (
            (stable_hash(t["a"]) ^ stable_hash(t["b"]))
            % np.uint64(buckets)
        ).astype(np.int32)
        return pa.table({
            "x": t["a"], "y": t["b"],
            "w": pa.nulls(t.num_rows, pa.float64()),  # edge marker
            "_pb": pa.array(pb),
        })

    def score_bucket(t: pa.Table) -> pa.Table:
        is_edge = pc.is_null(t["w"])
        e = t.filter(is_edge).select(["x", "y"])
        s = (
            t.filter(pc.invert(is_edge))
            .select(["x", "y", "w"])
            .group_by(["x", "y"])
            .aggregate([("w", "sum")])
        )
        j = s.join(e, keys=["x", "y"], join_type="left anti")
        out = pa.table({
            "node_a": j["x"], "node_b": j["y"],
            "aa_score": pc.round(j["w_sum"], 6),
        })
        from debezium_incubator_ray.functions.kernels import table_topk

        return table_topk(out, "aa_score", ["node_a", "node_b"], k)

    cand = (
        wedge_ds.union(
            ce.map_batches(tag_edge, batch_format="pyarrow",
                           zero_copy_batch=True)
        )
        .groupby("_pb")
        .map_groups(score_bucket, batch_format="pyarrow")
    )
    empty = pa.table({
        "node_a": pa.array([], pa.int64()),
        "node_b": pa.array([], pa.int64()),
        "aa_score": pa.array([], pa.float64()),
    })
    out = merge_local_topk(cand, "aa_score", ["node_a", "node_b"], k, empty)
    order = pc.sort_indices(
        out.append_column("_neg", pc.negate(out["aa_score"])),
        sort_keys=[("_neg", "ascending"), ("node_a", "ascending"),
                   ("node_b", "ascending")],
    )
    return out.take(order)


def jaccard_topk(edges, src_col: str = "src", dst_col: str = "dst",
                 k: int = 50, buckets: int = 64):
    """Top-k NON-adjacent node pairs by neighborhood Jaccard
    J(x, y) = |N(x) ∩ N(y)| / |N(x) ∪ N(y)| — the set-overlap sibling
    of :func:`adamic_adar` (same wedge machinery, integer common-
    neighbor counts instead of 1/ln(deg) weights, and a degree lookup
    to finish the union denominator).

    Reference parity: none (training-data / graph-curation side).

    Scale shape: identical to adamic_adar — full neighborhoods
    co-locate by center hash, per-center pair expansion pre-sums
    integer wedge counts per pair, canonical edges ride the same pair
    buckets as null markers for the in-bucket anti-join. The degree
    table is O(|V|) of the (already cut) edge graph and is broadcast
    once via ray.put; only #buckets x k candidates reach the driver.
    Scores are rounded half-AWAY-from-zero before the top-k (integer
    ratios CAN land exactly on a 6dp half; DuckDB rounds away)."""
    import ray

    from debezium_incubator_ray.hashing import partition_ids, stable_hash
    from debezium_incubator_ray.functions.kernels import (
        expand_pairs, merge_local_topk, table_topk,
    )

    ce = canonical_edges(edges, src_col, dst_col, buckets=buckets)

    def adjacency(t: pa.Table) -> pa.Table:
        c = pa.chunked_array([t["a"].combine_chunks(),
                              t["b"].combine_chunks()])
        n = pa.chunked_array([t["b"].combine_chunks(),
                              t["a"].combine_chunks()])
        out = pa.table({"c": c, "n": n})
        cb = pa.array(
            partition_ids(out["c"].combine_chunks(), buckets, "hash"),
            pa.int32(),
        )
        return out.append_column("_cb", cb)

    # degree map of the cut graph: O(|V|) rows, folded distributed then
    # broadcast ONCE (the cut keeps |V| <= 2 * |edge cut| by construction)
    from ray.data.aggregate import Sum

    def deg_partial(t: pa.Table) -> pa.Table:
        both = pa.chunked_array([t["a"].combine_chunks(),
                                 t["b"].combine_chunks()])
        part = pa.table({"node": both}).group_by("node").aggregate(
            [("node", "count")]
        )
        return pa.table({"node": part["node"],
                         "d": pc.cast(part["node_count"], pa.int64())})

    deg_rows = (
        ce.map_batches(deg_partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("node")
        .aggregate(Sum("d", alias_name="d"))
        .take_all()
    )
    deg_nodes = np.array(sorted(r["node"] for r in deg_rows), np.int64)
    dmap = {r["node"]: r["d"] for r in deg_rows}
    deg_vals = np.array([dmap[n] for n in deg_nodes], np.int64)
    deg_ref = ray.put((deg_nodes, deg_vals))

    def wedges(g: pa.Table) -> pa.Table:
        c = g["c"].combine_chunks().to_numpy(zero_copy_only=False)
        nb = g["n"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((nb, c))
        c, nb = c[order], nb[order]
        starts = np.flatnonzero(np.r_[True, c[1:] != c[:-1]])
        sizes = np.diff(np.append(starts, len(c)))
        L, R = expand_pairs(sizes)
        if len(L) == 0:
            return pa.table({
                "x": pa.array([], g["n"].type),
                "y": pa.array([], g["n"].type),
                "w": pa.array([], pa.int64()),
                "_pb": pa.array([], pa.int32()),
            })
        x = np.minimum(nb[L], nb[R])
        y = np.maximum(nb[L], nb[R])
        part = pa.table({
            "x": pc.cast(pa.array(x), g["n"].type),
            "y": pc.cast(pa.array(y), g["n"].type),
            "w": pa.array(np.ones(len(x), np.int64)),
        }).group_by(["x", "y"]).aggregate([("w", "sum")])
        pb = (
            (stable_hash(part["x"]) ^ stable_hash(part["y"]))
            % np.uint64(buckets)
        ).astype(np.int32)
        return pa.table({
            "x": part["x"], "y": part["y"], "w": part["w_sum"],
            "_pb": pa.array(pb),
        })

    wedge_ds = (
        ce.map_batches(adjacency, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("_cb")
        .map_groups(wedges, batch_format="pyarrow")
    )

    def tag_edge(t: pa.Table) -> pa.Table:
        pb = (
            (stable_hash(t["a"]) ^ stable_hash(t["b"]))
            % np.uint64(buckets)
        ).astype(np.int32)
        return pa.table({
            "x": t["a"], "y": t["b"],
            "w": pa.nulls(t.num_rows, pa.int64()),  # edge marker
            "_pb": pa.array(pb),
        })

    def score_bucket(t: pa.Table) -> pa.Table:
        nodes, degs = ray.get(deg_ref)
        is_edge = pc.is_null(t["w"])
        e = t.filter(is_edge).select(["x", "y"])
        s = (
            t.filter(pc.invert(is_edge))
            .select(["x", "y", "w"])
            .group_by(["x", "y"])
            .aggregate([("w", "sum")])
        )
        j = s.join(e, keys=["x", "y"], join_type="left anti")
        xs = j["x"].combine_chunks().to_numpy(zero_copy_only=False)
        ys = j["y"].combine_chunks().to_numpy(zero_copy_only=False)
        cnt = j["w_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        dx = degs[np.searchsorted(nodes, xs)]
        dy = degs[np.searchsorted(nodes, ys)]
        jac = pc.round(
            pa.array(cnt / (dx + dy - cnt).astype(np.float64)),
            6, round_mode="half_towards_infinity",
        )
        out = pa.table({
            "node_a": j["x"], "node_b": j["y"], "jaccard": jac,
        })
        return table_topk(out, "jaccard", ["node_a", "node_b"], k)

    cand = (
        wedge_ds.union(
            ce.map_batches(tag_edge, batch_format="pyarrow",
                           zero_copy_batch=True)
        )
        .groupby("_pb")
        .map_groups(score_bucket, batch_format="pyarrow")
    )
    empty = pa.table({
        "node_a": pa.array([], pa.int64()),
        "node_b": pa.array([], pa.int64()),
        "jaccard": pa.array([], pa.float64()),
    })
    out = merge_local_topk(cand, "jaccard", ["node_a", "node_b"], k, empty)
    order = pc.sort_indices(
        out.append_column("_neg", pc.negate(out["jaccard"])),
        sort_keys=[("_neg", "ascending"), ("node_a", "ascending"),
                   ("node_b", "ascending")],
    )
    return out.take(order)


def kcore_peel(edges, src_col: str = "src", dst_col: str = "dst",
               k: int = 3, rounds: int = 4, buckets: int = 64):
    """Bounded k-core peeling: ``rounds`` iterations of "drop every node
    with degree < k, keep only edges between survivors" — the standard
    distributed core-decomposition round (each round is one degree fold +
    one broadcast semi-filter of the edge set). With enough rounds this
    converges to the exact k-core; bounding the round count makes the
    operator's cost explicit and the oracle finitely expressible (the SQL
    unrolls the same ``rounds`` levels, and extra rounds past the fixed
    point are no-ops on both sides). Returns the surviving nodes with
    their degree inside the final surviving-edge set (0 for a survivor
    whose last neighbors were peeled in the final round).

    Scale shape: the edge set stays distributed and is re-pinned per
    round; only the O(|V|) degree table and the survivor node set touch
    the driver / broadcast (ray.put once per round)."""
    import ray
    from ray.data.aggregate import Sum

    if rounds < 1:
        raise ValueError("kcore_peel needs rounds >= 1")
    cur = canonical_edges(edges, src_col, dst_col, buckets=buckets)

    def deg_partial(t: pa.Table) -> pa.Table:
        nodes = pa.chunked_array(
            [t["a"].combine_chunks(), t["b"].combine_chunks()]
        )
        g = pa.table({"node": nodes}).group_by("node").aggregate(
            [([], "count_all")]
        )
        return pa.table({
            "node": g["node"],
            "dcnt": pc.cast(g["count_all"], pa.int64()),
        })

    def degrees(edge_ds) -> pa.Table:
        d = (
            edge_ds.map_batches(deg_partial, batch_format="pyarrow",
                                zero_copy_batch=True)
            .groupby("node")
            .aggregate(Sum("dcnt", alias_name="deg"))
        )
        from debezium_incubator_ray.functions.kernels import collect_table

        return collect_table(d, empty=pa.table({
            "node": pa.array([], pa.int64()),
            "deg": pa.array([], pa.int64()),
        }))

    survivors = None
    for _ in range(rounds):
        deg = degrees(cur)
        keepers = deg.filter(
            pc.greater_equal(deg["deg"], pa.scalar(k, pa.int64()))
        )["node"].combine_chunks()
        survivors = keepers
        ref = ray.put(keepers)

        def filt(t: pa.Table) -> pa.Table:
            kn = ray.get(ref)
            return t.filter(pc.and_(
                pc.is_in(t["a"], value_set=kn),
                pc.is_in(t["b"], value_set=kn),
            ))

        cur = cur.map_batches(
            filt, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()

    final_deg = degrees(cur)
    out = pa.table({"node": survivors}).join(
        final_deg, keys=["node"], join_type="left outer"
    )
    core = pc.cast(pc.fill_null(out["deg"], 0), pa.int64())
    res = pa.table({"node": out["node"], "core_deg": core})
    return res.take(pc.sort_indices(res, sort_keys=[("node", "ascending")]))


def label_propagation(edges, src_col: str = "src", dst_col: str = "dst",
                      rounds: int = 3, buckets: int = 64):
    """Bounded synchronous label propagation (community detection): every
    node starts as its own label; each round it adopts the MOST FREQUENT
    label among its neighbors (ties: smallest label) — the deterministic
    sync-LPA round. Bounding the rounds makes the cost explicit and the
    oracle finitely expressible (the SQL unrolls the same rounds).
    Returns (node, label) for every node with at least one edge.

    Scale shape: the adjacency stays distributed and pinned once; per
    round, blocks translate neighbor ids to labels against the broadcast
    O(|V|) label table (ray.put per round), pre-count (node, label) pairs
    per block, and one narrow groupby folds the votes; the argmax per
    node is a vectorized lexsort over the O(|V| x labels-per-node) vote
    table."""
    import ray
    from ray.data.aggregate import Sum
    from debezium_incubator_ray.functions.kernels import collect_table

    ce = canonical_edges(edges, src_col, dst_col, buckets=buckets)

    def adjacency(t: pa.Table) -> pa.Table:
        c = pa.chunked_array([t["a"].combine_chunks(),
                              t["b"].combine_chunks()])
        n = pa.chunked_array([t["b"].combine_chunks(),
                              t["a"].combine_chunks()])
        return pa.table({"c": c, "n": n})

    und = ce.map_batches(adjacency, batch_format="pyarrow",
                         zero_copy_batch=True).materialize()

    # initial labels: node -> node (collected once; |V| is two columns of
    # the edge cut — metadata-sized next to the edges)
    def node_partial(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["c"]}).group_by("node").aggregate([])

    nodes = collect_table(
        und.map_batches(node_partial, batch_format="pyarrow",
                        zero_copy_batch=True)
    ).group_by("node").aggregate([])["node"].combine_chunks()
    labels = pa.table({"node": nodes, "lab": nodes})

    for _ in range(rounds):
        ref = ray.put(labels)

        def vote(t: pa.Table) -> pa.Table:
            lmap = ray.get(ref)
            j = t.join(lmap, keys=["n"], right_keys=["node"],
                       join_type="inner")
            g = j.select(["c", "lab"]).group_by(["c", "lab"]).aggregate(
                [([], "count_all")]
            )
            return pa.table({
                "c": g["c"], "lab": g["lab"],
                "cnt": pc.cast(g["count_all"], pa.int64()),
            })

        votes = collect_table(
            und.map_batches(vote, batch_format="pyarrow",
                            zero_copy_batch=True)
            .groupby(["c", "lab"])
            .aggregate(Sum("cnt", alias_name="cnt")),
            empty=pa.table({
                "c": pa.array([], nodes.type),
                "lab": pa.array([], nodes.type),
                "cnt": pa.array([], pa.int64()),
            }),
        )
        c = votes["c"].combine_chunks().to_numpy(zero_copy_only=False)
        lab = votes["lab"].combine_chunks().to_numpy(zero_copy_only=False)
        cnt = votes["cnt"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((lab, -cnt, c))  # per node: cnt desc, lab asc
        cs, labs = c[order], lab[order]
        first = np.ones(len(cs), dtype=bool)
        first[1:] = cs[1:] != cs[:-1]
        labels = pa.table({
            "node": pa.array(cs[first], nodes.type),
            "lab": pa.array(labs[first], nodes.type),
        })

    out = labels.rename_columns(["node", "label"])
    return out.take(pc.sort_indices(out, sort_keys=[("node", "ascending")]))
