"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Ray-Data-first shapes — every stage is a batch-level Arrow/numpy kernel;
there are NO driver-side materializations of document data (no take_all of
texts/embeddings) and NO per-document Python loops in hot paths:

- exact: only (content_hash128, id) rows shuffle — never the text. Winner
  ids are broadcast back (ray.put) and the source is filtered in place.
- MinHash+LSH: batch-vectorized signatures (one universal-hash matrix pass
  + np.minimum.reduceat) → exploded (band, band_hash, doc_id) rows →
  bucketed groupby → vectorized pair expansion → DISTRIBUTED exact-Jaccard
  verify (a two-stage co-grouped join on doc buckets then pair buckets).
- n-gram Jaccard: exact inverted index on shingle hashes, ONE shuffle
  pass — each shared distinct shingle emits its pair row exactly once, so
  a bucketed per-pair count IS the intersection size and J falls out
  directly (no verify stage, no shingle-list shipping). ``max_df`` caps
  pathological shingle buckets at scale (off by default = exact).
- near-dup clustering: pairs → connected components (vectorized
  union-find under a documented edge cutover — the dup graph is the small
  side by construction — else distributed min-label propagation) →
  canonical = min doc id per cluster.
- All per-(a, b) reductions (distinct, count, min-Hamming, max-cos) go
  through one bucketed shuffle + a numpy run-reduce — Ray's multi-key
  groupby.aggregate pays per-group overhead that is ~30x slower at ~1M
  distinct pairs.
- SimHash: batch-vectorized 64-bit signatures (unpackbits + reduceat);
  near-dup pairs via the pigeonhole chunk buckets (4 x 16-bit chunks cover
  every pair with Hamming distance <= 3 exactly) + vectorized popcount.
- embedding: block-partitioned all-pairs — blocks staged once, one task
  per block pair, exact results with bounded memory (2 blocks per task).

Reference parity note: the reference has no dedup beyond replay-offsets
(CommitLogReadHandlerImpl.java:216-219); these operators are the
training-data extensions over the same engine substrate.
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Callable, List, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from debezium_incubator_ray.hashing import stable_hash
from debezium_incubator_ray.functions.tokens import (
    distinct_per_doc,
    shingle_hashes,
    token_hashes,
)

# ---------------------------------------------------------------------------
# shared: vectorized pair expansion within co-grouped buckets


def _pairs_within_groups(
    group_codes: np.ndarray, docs: np.ndarray, max_group: Optional[int] = None
) -> Tuple[np.ndarray, np.ndarray]:
    """All (a < b) doc pairs sharing a group code.

    Input must be sorted by (group_codes, docs) with per-group-distinct
    docs. Vectorized over groups: one np.triu_indices per DISTINCT group
    size (a handful), gathered across all groups of that size at once —
    never a Python loop per group."""
    if len(docs) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    boundary = np.ones(len(group_codes), dtype=bool)
    boundary[1:] = group_codes[1:] != group_codes[:-1]
    starts = np.nonzero(boundary)[0]
    sizes = np.diff(np.append(starts, len(group_codes)))
    if max_group is not None:
        keep = sizes <= max_group
        starts, sizes = starts[keep], sizes[keep]
    out_a: List[np.ndarray] = []
    out_b: List[np.ndarray] = []
    for s in np.unique(sizes):
        if s < 2:
            continue
        st = starts[sizes == s]  # all groups of this size, at once
        iu, ju = np.triu_indices(int(s), k=1)
        a = docs[(st[:, None] + iu[None, :]).ravel()]
        b = docs[(st[:, None] + ju[None, :]).ravel()]
        out_a.append(a)
        out_b.append(b)
    if not out_a:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    a = np.concatenate(out_a)
    b = np.concatenate(out_b)
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    return lo, hi


def _add_pair_bucket(t: pa.Table, buckets: int) -> pa.Table:
    """Route each (a, b) row to a pair bucket — the shuffle key for all
    per-pair reductions (Ray's multi-key groupby.aggregate pays per-group
    overhead; at ~1M distinct pairs that is 30x slower than one bucketed
    shuffle + a numpy run-reduce inside map_groups)."""
    a = t["a"].combine_chunks().to_numpy().astype(np.uint64)
    b = t["b"].combine_chunks().to_numpy().astype(np.uint64)
    with np.errstate(over="ignore"):
        code = a * np.uint64(0x9E3779B97F4A7C15) + b
    return t.append_column(
        "_pbucket", pa.array((code % np.uint64(buckets)).astype(np.int32))
    )


def _pair_runs(a: np.ndarray, b: np.ndarray):
    """(sort order, first-of-pair mask, pair index per sorted row) for
    vectorized per-(a, b) reductions."""
    order = np.lexsort((b, a))
    a_s, b_s = a[order], b[order]
    first = np.ones(len(a_s), dtype=bool)
    first[1:] = (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])
    pidx = np.cumsum(first) - 1
    return order, first, pidx


def _dedupe_pairs(ds, buckets: int = 64):
    """Distinct (a, b) pairs (a pair found via several buckets/bands appears
    once per bucket)."""

    def distinct(group: pa.Table) -> pa.Table:
        a = group["a"].combine_chunks().to_numpy()
        b = group["b"].combine_chunks().to_numpy()
        order, first, _ = _pair_runs(a, b)
        keep = order[first]
        return pa.table({"a": pa.array(a[keep]), "b": pa.array(b[keep])})

    return (
        ds.map_batches(
            lambda t: _add_pair_bucket(t, buckets),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("_pbucket")
        .map_groups(distinct, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# exact dedup (D-exact)


def _first_per_id_table(t: pa.Table, id_col: str) -> pa.Table:
    """First row per id within one co-located table (callers guarantee all
    rows of an id are present — a groupby group or a join bucket)."""
    idx = pc.sort_indices(t, sort_keys=[(id_col, "ascending")])
    s = t.take(idx)
    ids = s[id_col].combine_chunks().to_numpy(zero_copy_only=False)
    first = np.ones(len(s), dtype=bool)
    first[1:] = ids[1:] != ids[:-1]
    return s.filter(pa.array(first))


def _first_per_id(ds, id_col: str, buckets: int = 64):
    """Collapse duplicate physical rows per id (output-sized shuffle)."""

    def add_id_bucket(t: pa.Table) -> pa.Table:
        ids = t[id_col].combine_chunks()
        b = (stable_hash(ids) % np.uint64(buckets)).astype(np.int32)
        return t.append_column("_bucket", pa.array(b))

    def first_per_id(t: pa.Table) -> pa.Table:
        return _first_per_id_table(t, id_col).drop_columns(["_bucket"])

    return (
        ds.map_batches(add_id_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_bucket")
        .map_groups(first_per_id, batch_format="pyarrow")
    )


def _broadcast_winner_filter(
    ds, winners, id_col: str, buckets: int = 64, unique_ids: bool = False,
    mode: str = "broadcast",
):
    """Shared tail of every winner-election dedup: keep the source rows
    whose id won the election.

    ``mode="broadcast"`` (default): collect winner ids only (8 B/doc — the
    one small-side hop), broadcast once via ray.put, filter the source in
    place. The right choice while winner ids fit a node.

    ``mode="semijoin"``: the scale path when they don't — a partitioned
    LEFT SEMI hash join (functions/joins.py shuffle_join): winner ids and
    source rows route to the same id-hash bucket and nothing ever
    materializes on the driver. Costs a full shuffle of the source rows,
    which is exactly the price of a winner set too large to broadcast.

    ``unique_ids=True`` asserts one physical row per id; otherwise a final
    OUTPUT-sized first-per-id pass collapses identical copies. ``winners``
    is a Dataset of winner-id rows, or a numpy id array for callers that
    already merged winners on the driver."""
    import ray

    if mode == "semijoin":
        from debezium_incubator_ray.functions.joins import shuffle_join

        w_col = f"{id_col}__winner"
        if isinstance(winners, np.ndarray):
            wds = ray.data.from_arrow(
                pa.table({w_col: pa.array(winners, pa.int64())})
            )
        else:
            wds = winners.map_batches(
                lambda t: t.rename_columns([w_col]),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
        # first-per-id collapse runs INSIDE the join bucket (the bucket
        # already co-locates every row of an id) — a downstream
        # _first_per_id pass would re-shuffle the whole kept output
        return shuffle_join(
            ds, wds, on=id_col, right_on=w_col, buckets=buckets,
            join_type="left semi",
            post=None if unique_ids
            else (lambda t: _first_per_id_table(t, id_col)),
        )

    if isinstance(winners, np.ndarray):
        wid = np.sort(winners)
    else:
        chunks = [
            b[id_col].to_numpy()
            for b in winners.iter_batches(batch_format="pyarrow")
        ]
        wid = np.sort(np.concatenate(chunks)) if chunks else np.empty(0, np.int64)
    ref = ray.put(wid)

    def keep_winners(t: pa.Table) -> pa.Table:
        # plain task (no actor pool): the broadcast winner array is a
        # numpy object in plasma — ray.get is zero-copy once node-local,
        # so per-task get costs ~µs and we skip actor spin-up entirely
        wid_l = ray.get(ref)
        if len(wid_l) == 0:
            return t.slice(0, 0)
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        pos = np.searchsorted(wid_l, ids)
        pos = np.minimum(pos, len(wid_l) - 1)
        return t.filter(pa.array(wid_l[pos] == ids))

    kept = ds.map_batches(
        keep_winners, batch_format="pyarrow", zero_copy_batch=True
    )
    if unique_ids:
        return kept
    return _first_per_id(kept, id_col, buckets)


def exact_dedup(
    ds,
    col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 64,
    unique_ids: bool = False,
    winner_filter: str = "broadcast",
):
    """Keep the min-id row per distinct content.

    ``unique_ids=True`` asserts one physical row per id — the broadcast
    filter alone yields the result (zero full-row shuffle). With duplicate
    ids (e.g. re-delivered shards), a final OUTPUT-sized first-per-id pass
    collapses identical copies — it shuffles exactly the winner rows, the
    lower bound for producing them.

    Scale shape: stage 1 shuffles ONLY (h1, h2, id) — 24 bytes/row, never
    the text (~100x less shuffle volume on documents); the winner-id set is
    broadcast once via ray.put and the source filtered in place. The
    128-bit content hash (two independent 64-bit passes) makes a false
    merge at 10^10 docs vanishingly unlikely; the broadcast winner set is
    the documented small-side assumption — at corpus sizes where winner ids
    exceed node memory, swap the filter for a partitioned semi-join keyed
    by the same buckets."""

    def hash_only(t: pa.Table) -> pa.Table:
        c = t[col].combine_chunks()
        h1 = stable_hash(c, seed=42)
        h2 = stable_hash(c, seed=1337)
        return pa.table(
            {
                "h1": pa.array(h1.view(np.int64)),
                "h2": pa.array(h2.view(np.int64)),
                id_col: t[id_col],
                "_bucket": pa.array((h1 % np.uint64(buckets)).astype(np.int32)),
            }
        )

    def min_id_per_hash(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t, sort_keys=[("h1", "ascending"), ("h2", "ascending"), (id_col, "ascending")]
        )
        s = t.take(idx)
        h1 = s["h1"].combine_chunks().to_numpy()
        h2 = s["h2"].combine_chunks().to_numpy()
        first = np.ones(len(s), dtype=bool)
        first[1:] = (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])
        return s.filter(pa.array(first)).select([id_col])

    winners = (
        ds.map_batches(hash_only, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_bucket")
        .map_groups(min_id_per_hash, batch_format="pyarrow")
    )
    return _broadcast_winner_filter(
        ds, winners, id_col, buckets=buckets, unique_ids=unique_ids,
        mode=winner_filter,
    )


def incremental_dedup(
    new_ds,
    ingested_ds,
    col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 64,
    unique_ids: bool = False,
):
    """Ingest-only-novel: rows of ``new_ds`` whose content does not already
    exist in ``ingested_ds`` (the corpus loaded in earlier runs), deduped
    within the new batch itself (min-id per content).

    The incremental-crawl composition: each arriving shard is checked
    against everything already in the lake WITHOUT rescanning lake text —
    both sides reduce to (h1, h2[, id]) rows, so the shuffle carries
    24 bytes/row regardless of document size. Within each hash bucket the
    old side vetoes, the new side elects a min-id winner; winner ids are
    broadcast and the new shard filtered in place (same small-side
    assumption as exact_dedup)."""

    def hash_side(side: int):
        def f(t: pa.Table) -> pa.Table:
            c = t[col].combine_chunks()
            h1 = stable_hash(c, seed=42)
            h2 = stable_hash(c, seed=1337)
            n = len(t)
            ids = (
                pc.cast(t[id_col].combine_chunks(), pa.int64())
                if side == 1
                else pa.nulls(n, pa.int64())
            )
            return pa.table(
                {
                    "h1": pa.array(h1.view(np.int64)),
                    "h2": pa.array(h2.view(np.int64)),
                    id_col: ids,
                    "_side": pa.array(np.full(n, side, dtype=np.int8)),
                    "_bucket": pa.array(
                        (h1 % np.uint64(buckets)).astype(np.int32)
                    ),
                }
            )

        return f

    def novel_min_id(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t,
            sort_keys=[
                ("h1", "ascending"),
                ("h2", "ascending"),
                ("_side", "ascending"),  # old (0) first: vetoes the run
                (id_col, "ascending"),
            ],
        )
        s = t.take(idx)
        h1 = s["h1"].combine_chunks().to_numpy()
        h2 = s["h2"].combine_chunks().to_numpy()
        side = s["_side"].combine_chunks().to_numpy()
        first = np.ones(len(s), dtype=bool)
        first[1:] = (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])
        win = first & (side == 1)  # run starts with a NEW row -> novel
        return s.filter(pa.array(win)).select([id_col])

    hashed = new_ds.map_batches(
        hash_side(1), batch_format="pyarrow", zero_copy_batch=True
    ).union(
        ingested_ds.map_batches(
            hash_side(0), batch_format="pyarrow", zero_copy_batch=True
        )
    )
    winners = hashed.groupby("_bucket").map_groups(
        novel_min_id, batch_format="pyarrow"
    )
    return _broadcast_winner_filter(
        new_ds, winners, id_col, buckets=buckets, unique_ids=unique_ids
    )


# ---------------------------------------------------------------------------
# MinHash + LSH


_MERSENNE = np.uint64((1 << 61) - 1)


def _minhash_params(n_hashes: int, seed: int = 7) -> Tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 61, size=n_hashes, dtype=np.uint64)
    b = rng.integers(0, 1 << 61, size=n_hashes, dtype=np.uint64)
    return a, b


class MinHasher:
    """Batch-vectorized MinHash signatures + LSH banding.

    Per batch: one shingle pass (tokens.shingle_hashes — flat arrays, no
    per-doc loop), one (n_hashes x n_grams) universal-hash matrix, then
    np.minimum.reduceat per doc, then a vectorized polynomial band hash.
    Emits exploded (band, band_hash, doc_id) rows — the LSH groupby key."""

    def __init__(self, n_hashes: int = 64, bands: int = 32, shingle_k: int = 3):
        assert n_hashes % bands == 0
        self.n = n_hashes
        self.bands = bands
        self.r = n_hashes // bands
        self.k = shingle_k
        self.a, self.b = _minhash_params(n_hashes)

    def signatures(self, texts: pa.Array) -> Tuple[np.ndarray, np.ndarray]:
        """(n_docs, n_hashes) uint64 signature matrix + grams-per-doc."""
        g, glens = shingle_hashes(texts, self.k)
        n_docs = len(glens)
        sig = np.zeros((n_docs, self.n), dtype=np.uint64)
        if len(g) == 0:
            return sig, glens
        gstarts = np.zeros(n_docs, dtype=np.int64)
        np.cumsum(glens[:-1], out=gstarts[1:])
        nz = glens > 0
        starts_nz = gstarts[nz]
        with np.errstate(over="ignore"):
            # (n_hashes, n_grams) then min per doc segment — min over the
            # multiset equals min over the distinct set, so no dedup needed
            v = (self.a[:, None] * g[None, :] + self.b[:, None]) % _MERSENNE
        # sentinel column = uint64 max: keeps every reduceat start index
        # valid without perturbing the last doc's MIN segment
        sent = np.full((self.n, 1), np.uint64(0xFFFFFFFFFFFFFFFF), np.uint64)
        prod = np.concatenate([v, sent], axis=1)
        mins = np.minimum.reduceat(prod, starts_nz, axis=1)
        sig[nz, :] = mins.T
        return sig, glens

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        sig, _ = self.signatures(batch["text"].combine_chunks())
        n_docs = len(ids)
        # band hash: polynomial combine of the band's r signature values
        # (band b covers sig[:, b*r:(b+1)*r])
        C = np.uint64(0x9E3779B185EBCA87)
        bh = np.zeros((n_docs, self.bands), dtype=np.uint64)
        view = sig.reshape(n_docs, self.bands, self.r)
        with np.errstate(over="ignore"):
            for j in range(self.r):
                bh = bh * C + view[:, :, j]
        return pa.table(
            {
                "band": pa.array(
                    np.tile(np.arange(self.bands, dtype=np.int32), n_docs)
                ),
                "band_hash": pa.array(bh.reshape(-1).view(np.int64)),
                "doc_id": pa.array(np.repeat(ids, self.bands)),
            }
        )


def minhash_candidate_pairs(
    ds,
    n_hashes: int = 64,
    bands: int = 32,
    shingle_k: int = 3,
    buckets: int = 64,
    max_group: Optional[int] = None,
):
    """documents(doc_id, text) → candidate near-dup pairs (a < b) sharing
    >= 1 LSH band bucket. Pair expansion is vectorized per coarse bucket
    (never one Python call per LSH bucket — at web scale almost every LSH
    bucket is a singleton)."""
    exploded = ds.map_batches(
        MinHasher(n_hashes, bands, shingle_k),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.bit_wise_and(t["band_hash"], buckets - 1), pa.int32())
        return t.append_column("_bucket", b)

    def pairs_in_bucket(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t,
            sort_keys=[
                ("band", "ascending"),
                ("band_hash", "ascending"),
                ("doc_id", "ascending"),
            ],
        )
        s = t.take(idx)
        band = s["band"].combine_chunks().to_numpy()
        bh = s["band_hash"].combine_chunks().to_numpy().view(np.uint64)
        docs = s["doc_id"].combine_chunks().to_numpy()
        # composite group code (band, band_hash) → one uint64 via mix
        with np.errstate(over="ignore"):
            code = bh * np.uint64(0x9E3779B97F4A7C15) + band.astype(np.uint64)
        # drop duplicate (code, doc) rows so expansion sees distinct docs
        keep = np.ones(len(code), dtype=bool)
        keep[1:] = (code[1:] != code[:-1]) | (docs[1:] != docs[:-1])
        a, b = _pairs_within_groups(code[keep], docs[keep], max_group)
        return pa.table({"a": pa.array(a), "b": pa.array(b)})

    cand = (
        exploded.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_bucket")
        .map_groups(pairs_in_bucket, batch_format="pyarrow")
    )
    return _dedupe_pairs(cand)


# ---------------------------------------------------------------------------
# distributed exact-Jaccard verification (co-grouped join, no take_all)


class ShingleSets:
    """Per batch: (doc_id, sh: list<int64> DISTINCT sorted shingle hashes,
    n: distinct count)."""

    def __init__(self, k: int = 3, hasher: Callable = stable_hash):
        self.k = k
        self.hasher = hasher

    def __call__(self, batch: pa.Table) -> pa.Table:
        g, glens = shingle_hashes(
            batch["text"].combine_chunks(), self.k, self.hasher
        )
        dv, dc = distinct_per_doc(g, glens)
        offsets = np.zeros(len(dc) + 1, dtype=np.int64)
        np.cumsum(dc, out=offsets[1:])
        lists = pa.LargeListArray.from_arrays(
            pa.array(offsets), pa.array(dv.view(np.int64))
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "sh": lists,
                "n": pa.array(dc),
            }
        )


def verify_jaccard(
    pairs_ds,
    docs_ds,
    shingle_k: int = 3,
    threshold: float = 0.6,
    buckets: int = 32,
    hasher: Callable = stable_hash,
    score_mode: str = "jaccard",
):
    """Exact-Jaccard verify of candidate pairs — fully distributed.

    ``score_mode="containment"`` scores |A∩B| / min(|A|, |B|) instead —
    the asymmetric "is one side mostly inside the other" gauge that
    catches quote/extract near-dups symmetric Jaccard dilutes (a 100-
    shingle doc fully embedded in a 10000-shingle page has Jaccard
    ~0.01 but containment 1.0). Same shuffles, same intersection kernel;
    only the per-pair denominator and output column name change.

    Two co-grouped shuffles, both on small keys:
      stage 1 (doc buckets): shingle-set rows union pair-request rows,
        grouped by hash(doc_id) — each request picks up its doc's shingle
        list via one vectorized searchsorted+take;
      stage 2 (pair buckets): the two sides of each pair meet; intersection
        sizes for ALL pairs in a bucket come from one lexsort over the
        flattened (pair, shingle) values — no per-pair loop.
    Shingle data crosses the wire twice; nothing ever lands on the driver."""
    sh = docs_ds.map_batches(
        ShingleSets(shingle_k, hasher), batch_format="pyarrow", zero_copy_batch=True
    )

    def doc_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        d = t["doc_id"].combine_chunks()
        bucket = (stable_hash(d) % np.uint64(buckets)).astype(np.int32)
        return pa.table(
            {
                "doc_id": d,
                "a": pa.nulls(n, pa.int64()),
                "b": pa.nulls(n, pa.int64()),
                "sh": t["sh"],
                "n": t["n"],
                "_side": pa.array(np.zeros(n, np.int8)),
                "_bucket": pa.array(bucket),
            }
        )

    def pair_rows(t: pa.Table) -> pa.Table:
        a = t["a"].combine_chunks().to_numpy()
        b = t["b"].combine_chunks().to_numpy()
        doc = np.concatenate([a, b])
        aa = np.concatenate([a, a])
        bb = np.concatenate([b, b])
        n = len(doc)
        d_arr = pa.array(doc)
        bucket = (stable_hash(d_arr) % np.uint64(buckets)).astype(np.int32)
        return pa.table(
            {
                "doc_id": d_arr,
                "a": pa.array(aa),
                "b": pa.array(bb),
                "sh": pa.nulls(n, pa.large_list(pa.int64())),
                "n": pa.array(np.zeros(n, np.int64)),
                "_side": pa.array(np.ones(n, np.int8)),
                "_bucket": pa.array(bucket),
            }
        )

    side_a = sh.map_batches(doc_rows, batch_format="pyarrow", zero_copy_batch=True)
    side_b = pairs_ds.map_batches(pair_rows, batch_format="pyarrow", zero_copy_batch=True)
    unioned = side_a.union(side_b)

    def attach(group: pa.Table) -> pa.Table:
        side = group["_side"].combine_chunks().to_numpy()
        docs = group.filter(pa.array(side == 0))
        reqs = group.filter(pa.array(side == 1))
        if reqs.num_rows == 0:
            return pa.table(
                {
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "sh": pa.nulls(0, pa.large_list(pa.int64())),
                    "n": pa.array([], pa.int64()),
                }
            )
        ds_ids = docs["doc_id"].combine_chunks().to_numpy()
        order = np.argsort(ds_ids, kind="stable")
        ds_ids = ds_ids[order]
        sh_lists = docs["sh"].combine_chunks().take(pa.array(order))
        ns = docs["n"].combine_chunks().to_numpy()[order]
        want = reqs["doc_id"].combine_chunks().to_numpy()
        pos = np.searchsorted(ds_ids, want)
        pos = np.minimum(pos, max(len(ds_ids) - 1, 0))
        found = (ds_ids[pos] == want) if len(ds_ids) else np.zeros(len(want), bool)
        reqs = reqs.filter(pa.array(found))
        pos = pos[found]
        return pa.table(
            {
                "a": reqs["a"],
                "b": reqs["b"],
                "sh": sh_lists.take(pa.array(pos)),
                "n": pa.array(ns[pos]),
            }
        )

    attached = unioned.groupby("_bucket").map_groups(attach, batch_format="pyarrow")

    def add_pair_bucket(t: pa.Table) -> pa.Table:
        a = t["a"].combine_chunks().to_numpy()
        b = t["b"].combine_chunks().to_numpy()
        with np.errstate(over="ignore"):
            code = (
                a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                + b.astype(np.uint64)
            )
        return t.append_column(
            "_pbucket", pa.array((code % np.uint64(buckets)).astype(np.int32))
        )

    def jaccard_group(group: pa.Table) -> pa.Table:
        t = group.drop_columns(["_pbucket"])
        idx = pc.sort_indices(t, sort_keys=[("a", "ascending"), ("b", "ascending")])
        s = t.take(idx)
        a = s["a"].combine_chunks().to_numpy()
        b = s["b"].combine_chunks().to_numpy()
        n = s["n"].combine_chunks().to_numpy()
        sh_l = s["sh"].combine_chunks()
        lens = pc.list_value_length(sh_l).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = sh_l.flatten().to_numpy(zero_copy_only=False)
        # pair index per row: rows come in (a,b)-sorted order, 2 per pair
        newpair = np.ones(len(a), dtype=bool)
        newpair[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        pidx = np.cumsum(newpair) - 1
        npairs = int(pidx[-1]) + 1 if len(pidx) else 0
        # union sizes per pair
        nsum = np.bincount(pidx, weights=n, minlength=npairs)
        complete = np.bincount(pidx, minlength=npairs) == 2
        # intersection: flatten all shingles tagged by pair; a value present
        # on both (distinct) sides appears exactly twice within a pair
        row_of = np.repeat(np.arange(len(a)), lens)
        pair_of = pidx[row_of]
        order = np.lexsort((flat, pair_of))
        fv, fp = flat[order], pair_of[order]
        dup = np.zeros(len(fv), dtype=bool)
        dup[1:] = (fv[1:] == fv[:-1]) & (fp[1:] == fp[:-1])
        inter = np.bincount(fp[dup], minlength=npairs) if len(fv) else np.zeros(npairs)
        first_rows = np.nonzero(newpair)[0]
        pa_ = a[first_rows]
        pb_ = b[first_rows]
        if score_mode == "containment":
            # rows come 2-per-complete-pair; min over the pair's two set
            # sizes is order-free w.r.t. which side sorted first
            nmin = np.full(npairs, np.inf)
            np.minimum.at(nmin, pidx, n.astype(np.float64))
            with np.errstate(divide="ignore", invalid="ignore"):
                score = np.where(nmin > 0, inter / np.maximum(nmin, 1), 0.0)
        else:
            union = nsum - inter
            with np.errstate(divide="ignore", invalid="ignore"):
                score = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
        keep = complete & (score >= threshold)
        col = "containment" if score_mode == "containment" else "jaccard"
        return pa.table(
            {
                "a": pa.array(pa_[keep]),
                "b": pa.array(pb_[keep]),
                col: pa.array(np.round(score[keep], 6)),
            }
        )

    return (
        attached.map_batches(add_pair_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_pbucket")
        .map_groups(jaccard_group, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact candidates via shingle inverted index)


def ngram_candidate_pairs(
    ds,
    shingle_k: int = 3,
    buckets: int = 64,
    max_df: Optional[int] = None,
    hasher: Callable = stable_hash,
):
    """Exact candidate pairs: every pair sharing >= 1 shingle. The inverted
    index shuffles (shingle_hash, doc_id) rows only. ``max_df`` skips
    shingles appearing in more than max_df docs (the classic df cap — saves
    the quadratic blowup of stop-shingles at scale, at the cost of missing
    pairs that ONLY share hot shingles; None = exact)."""

    def explode(t: pa.Table) -> pa.Table:
        g, glens = shingle_hashes(t["text"].combine_chunks(), shingle_k, hasher)
        dv, dc = distinct_per_doc(g, glens)
        ids = np.repeat(t["doc_id"].to_numpy(), dc)
        return pa.table(
            {
                "g": pa.array(dv.view(np.int64)),
                "doc_id": pa.array(ids),
                "_bucket": pa.array((dv % np.uint64(buckets)).astype(np.int32)),
            }
        )

    def pairs_in_bucket(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t, sort_keys=[("g", "ascending"), ("doc_id", "ascending")]
        )
        s = t.take(idx)
        g = s["g"].combine_chunks().to_numpy().view(np.uint64)
        docs = s["doc_id"].combine_chunks().to_numpy()
        a, b = _pairs_within_groups(g, docs, max_df)
        return pa.table({"a": pa.array(a), "b": pa.array(b)})

    cand = (
        ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_bucket")
        .map_groups(pairs_in_bucket, batch_format="pyarrow")
    )
    return _dedupe_pairs(cand)


def ngram_jaccard_pairs(
    docs_ds,
    shingle_k: int = 3,
    threshold: float = 0.5,
    max_df: Optional[int] = None,
    buckets: int = 64,
    hasher: Callable = stable_hash,
    score_mode: str = "jaccard",
):
    """Exact all-pairs n-gram Jaccard >= threshold in ONE shuffle pass.

    ``score_mode="containment"`` scores c / min(na, nb) instead — the
    asymmetric quote/extract detector (a short doc fully embedded in a
    long page scores 1.0 where Jaccard is diluted by the size gap).
    Identical shuffles; only the denominator and column name change.

    The inverted index emits each (a, b) pair once PER SHARED DISTINCT
    shingle (every shingle value lives in exactly one hash bucket), so
    ``groupby(a, b).count`` IS the exact intersection size — no second
    pass over the documents and no shingle-list shipping. Each doc's
    distinct-shingle count rides along with the pair rows, so
    J = c / (na + nb - c) falls out of the aggregate directly.

    Shuffle volume = one 32-byte row per (shared shingle, pair) — the
    irreducible inverted-index cost; ``max_df`` caps stop-shingle blowup
    at scale (None = exact)."""

    def explode(t: pa.Table) -> pa.Table:
        g, glens = shingle_hashes(t["text"].combine_chunks(), shingle_k, hasher)
        dv, dc = distinct_per_doc(g, glens)
        ids = np.repeat(t["doc_id"].to_numpy(), dc)
        ns = np.repeat(dc, dc)  # owner doc's distinct-shingle count
        return pa.table(
            {
                "g": pa.array(dv.view(np.int64)),
                "doc_id": pa.array(ids),
                "n": pa.array(ns),
                "_bucket": pa.array((dv % np.uint64(buckets)).astype(np.int32)),
            }
        )

    def pairs_in_bucket(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t, sort_keys=[("g", "ascending"), ("doc_id", "ascending")]
        )
        s = t.take(idx)
        g = s["g"].combine_chunks().to_numpy().view(np.uint64)
        docs = s["doc_id"].combine_chunks().to_numpy()
        ns = s["n"].combine_chunks().to_numpy()
        # positions instead of ids: lets us gather the n's; within a group
        # positions ascend with doc_id, so a < b still holds
        ai, bi = _pairs_within_groups(g, np.arange(len(docs)), max_df)
        return pa.table(
            {
                "a": pa.array(docs[ai]),
                "b": pa.array(docs[bi]),
                "na": pa.array(ns[ai]),
                "nb": pa.array(ns[bi]),
            }
        )

    def jaccard_in_bucket(group: pa.Table) -> pa.Table:
        a = group["a"].combine_chunks().to_numpy()
        b = group["b"].combine_chunks().to_numpy()
        na = group["na"].combine_chunks().to_numpy()
        nb = group["nb"].combine_chunks().to_numpy()
        order, first, pidx = _pair_runs(a, b)
        firsts = order[first]  # one representative row per pair
        c = np.bincount(pidx).astype(np.float64)  # intersection size
        if score_mode == "containment":
            score = c / np.minimum(na[firsts], nb[firsts])
        else:
            score = c / (na[firsts] + nb[firsts] - c)
        keep = score >= threshold
        col = "containment" if score_mode == "containment" else "jaccard"
        return pa.table(
            {
                "a": pa.array(a[firsts][keep]),
                "b": pa.array(b[firsts][keep]),
                col: pa.array(np.round(score[keep], 6)),
            }
        )

    return (
        docs_ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_bucket")
        .map_groups(pairs_in_bucket, batch_format="pyarrow")
        .map_batches(
            lambda t: _add_pair_bucket(t, buckets),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("_pbucket")
        .map_groups(jaccard_in_bucket, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# SimHash


class SimHash:
    """Batch-vectorized 64-bit SimHash: per-token-hash bit matrix
    (np.unpackbits on the uint64 view) summed per doc via one reduceat —
    no per-doc loop, no 64-iteration inner loop. Token multiplicity counts
    (frequency weighting). Docs with zero tokens get signature 0.

    ``hasher`` selects the token hash: stable_hash (fast path) or
    tokens.md5_u64 (the DuckDB-verifiable bridge)."""

    def __init__(self, hasher: Callable = stable_hash):
        self.hasher = hasher

    def __call__(self, batch: pa.Table) -> pa.Table:
        h, lens = token_hashes(batch["text"].combine_chunks(), self.hasher)
        n_docs = len(lens)
        sig = np.zeros(n_docs, dtype=np.uint64)
        if len(h):
            # bits[t, j] = bit j (LSB-first) of token t's hash
            bits = np.unpackbits(
                h.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
            )  # (n_tokens, 64)
            starts = np.zeros(n_docs, dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            nz = lens > 0
            ones = np.add.reduceat(bits, starts[nz], axis=0)  # (nz_docs, 64)
            maj = (2 * ones) > lens[nz, None]  # strict majority of ones
            packed = np.packbits(maj.astype(np.uint8), axis=1, bitorder="little")
            sig[nz] = packed.copy().view(np.uint64).reshape(-1)
        return batch.append_column("simhash", pa.array(sig.view(np.int64)))


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a^b over int64/uint64 arrays."""
    x = a.astype(np.uint64) ^ b.astype(np.uint64)
    return np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1).astype(np.int64)


def simhash_near_dup_pairs(
    ds,
    max_hamming: int = 3,
    hasher: Callable = stable_hash,
    buckets: int = 32,
):
    """EXACT pairs with SimHash Hamming distance <= max_hamming (requires
    max_hamming <= 3): pigeonhole over 4 x 16-bit signature chunks — any
    pair within distance 3 shares at least one intact chunk, so bucketing
    by (chunk_idx, chunk_value) has recall 1. Verify = vectorized popcount
    inside each candidate bucket group."""
    assert max_hamming <= 3, "4-chunk pigeonhole covers hamming <= 3"
    signed = ds.map_batches(
        SimHash(hasher), batch_format="pyarrow", zero_copy_batch=True
    )

    def explode_chunks(t: pa.Table) -> pa.Table:
        sig = t["simhash"].combine_chunks().to_numpy().view(np.uint64)
        ids = t["doc_id"].combine_chunks().to_numpy()
        n = len(sig)
        chunk_idx = np.tile(np.arange(4, dtype=np.int32), n)
        chunks = np.empty(n * 4, dtype=np.int64)
        for c in range(4):
            chunks[c::4] = ((sig >> np.uint64(16 * c)) & np.uint64(0xFFFF)).astype(np.int64)
        return pa.table(
            {
                "chunk_idx": pa.array(chunk_idx),
                "chunk": pa.array(chunks),
                "doc_id": pa.array(np.repeat(ids, 4)),
                "sig": pa.array(np.repeat(sig.view(np.int64), 4)),
                "_bucket": pa.array(
                    ((chunks * 4 + chunk_idx) % buckets).astype(np.int32)
                ),
            }
        )

    def pairs_in_bucket(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t,
            sort_keys=[
                ("chunk_idx", "ascending"),
                ("chunk", "ascending"),
                ("doc_id", "ascending"),
            ],
        )
        s = t.take(idx)
        ci = s["chunk_idx"].combine_chunks().to_numpy().astype(np.uint64)
        cv = s["chunk"].combine_chunks().to_numpy().astype(np.uint64)
        docs = s["doc_id"].combine_chunks().to_numpy()
        sigs = s["sig"].combine_chunks().to_numpy()
        with np.errstate(over="ignore"):
            code = cv * np.uint64(4) + ci
        a, b = _pairs_within_groups(code, docs)
        if len(a) == 0:
            return pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                 "hamming": pa.array([], pa.int64())}
            )
        # signature lookup for the verify (docs sorted within group)
        order = np.argsort(docs, kind="stable")
        ds_sorted = docs[order]
        sg_sorted = sigs[order]
        sa = sg_sorted[np.searchsorted(ds_sorted, a)]
        sb = sg_sorted[np.searchsorted(ds_sorted, b)]
        hd = hamming64(sa, sb)
        keep = hd <= max_hamming
        return pa.table(
            {
                "a": pa.array(a[keep]),
                "b": pa.array(b[keep]),
                "hamming": pa.array(hd[keep]),
            }
        )

    cand = (
        signed.map_batches(explode_chunks, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_bucket")
        .map_groups(pairs_in_bucket, batch_format="pyarrow")
    )

    def min_hamming(group: pa.Table) -> pa.Table:
        a = group["a"].combine_chunks().to_numpy()
        b = group["b"].combine_chunks().to_numpy()
        h = group["hamming"].combine_chunks().to_numpy()
        order, first, pidx = _pair_runs(a, b)
        firsts = order[first]
        hmin = np.full(int(pidx[-1]) + 1 if len(pidx) else 0, 64, np.int64)
        np.minimum.at(hmin, pidx, h[order])
        return pa.table(
            {"a": pa.array(a[firsts]), "b": pa.array(b[firsts]),
             "hamming": pa.array(hmin)}
        )

    return (
        cand.map_batches(
            lambda t: _add_pair_bucket(t, buckets),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("_pbucket")
        .map_groups(min_hamming, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-dup (block-partitioned exact all-pairs)


def _write_block(group: pa.Table, work_dir: str, id_col: str, col: str) -> pa.Table:
    """map_groups stage: one embedding block → one staged .npz (normalized
    float64 matrix + ids); returns a tiny metadata row."""
    from debezium_incubator_ray.functions.ann import _batch_matrix, _normalize

    os.makedirs(work_dir, exist_ok=True)
    blk = int(group["_blk"][0].as_py())
    ids = group[id_col].combine_chunks().to_numpy()
    order = np.argsort(ids, kind="stable")
    M = _normalize(_batch_matrix(group, col))[order]
    path = os.path.join(work_dir, f"blk-{blk}-{uuid.uuid4().hex}.npz")
    np.savez(path, ids=ids[order], M=M)
    return pa.table(
        {"blk": pa.array([blk], pa.int32()), "path": pa.array([path]),
         "rows": pa.array([len(ids)], pa.int64())}
    )


class _BlockPairScorer:
    """One call per (i, j) block pair: load two staged blocks (LRU-cached
    per actor), one matmul, emit (a < b) pairs with cosine >= tau. Memory
    is bounded by two blocks, independent of corpus size."""

    def __init__(self, paths: dict, tau: float):
        self.paths = {int(k): v for k, v in paths.items()}
        self.tau = tau
        self.cache: dict = {}

    def _load(self, blk: int):
        if blk not in self.cache:
            if len(self.cache) >= 4:
                self.cache.pop(next(iter(self.cache)))
            z = np.load(self.paths[blk])
            self.cache[blk] = (z["ids"], z["M"])
        return self.cache[blk]

    def __call__(self, batch: pa.Table) -> pa.Table:
        outs_a, outs_b = [], []
        for i, j in zip(batch["i"].to_pylist(), batch["j"].to_pylist()):
            ids_i, Mi = self._load(int(i))
            ids_j, Mj = self._load(int(j))
            sims = Mi @ Mj.T
            bi, bj = np.nonzero(sims >= self.tau)
            a = ids_i[bi]
            b = ids_j[bj]
            if i == j:
                # both orders present within one block: keep a < b exactly
                keep = a < b
                outs_a.append(a[keep])
                outs_b.append(b[keep])
            else:
                # each cross-block pair appears once, in arbitrary id
                # order — normalize to (min, max), drop self-matches
                keep = a != b
                outs_a.append(np.minimum(a[keep], b[keep]))
                outs_b.append(np.maximum(a[keep], b[keep]))
        return pa.table(
            {
                "a": pa.array(np.concatenate(outs_a) if outs_a else np.empty(0, np.int64)),
                "b": pa.array(np.concatenate(outs_b) if outs_b else np.empty(0, np.int64)),
            }
        )


def embedding_near_dup_pairs(
    ds,
    tau: float = 0.4,
    id_col: str = "vec_id",
    col: str = "embedding",
    n_blocks: int = 8,
    work_dir: Optional[str] = None,
):
    """Exact pairs (a < b) with embedding cosine >= tau — block-partitioned
    all-pairs: the corpus is staged once as n_blocks normalized matrices,
    then one task per block pair runs one matmul. No driver materialization
    anywhere; per-task memory = 2 blocks. O(n^2) compute is inherent to the
    exact answer — the approximate scale path is LSH bucketing
    (ann.HyperplaneSigner) with in-bucket matmuls, which trades recall.

    Multi-node note: work_dir must be shared storage on a real cluster
    (same assumption as the staging exchange, stages/exchange.py)."""
    import ray
    import ray.data

    work_dir = work_dir or os.path.join("/tmp", f"dbzray-embdedup-{uuid.uuid4().hex}")

    def add_blk(t: pa.Table) -> pa.Table:
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        return t.append_column(
            "_blk", pa.array((ids % n_blocks).astype(np.int32))
        )

    import functools

    metas = (
        ds.map_batches(add_blk, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_blk")
        .map_groups(
            functools.partial(
                _write_block, work_dir=work_dir, id_col=id_col, col=col
            ),
            batch_format="pyarrow",
        )
        .take_all()  # tiny: one metadata row per block
    )
    paths = {int(m["blk"]): m["path"] for m in metas}
    items = [
        {"i": i, "j": j}
        for i in sorted(paths)
        for j in sorted(paths)
        if i <= j
    ]
    if not items:
        return ray.data.from_arrow(
            pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        )
    pairs = ray.data.from_items(items, override_num_blocks=len(items)).map_batches(
        _BlockPairScorer,
        fn_constructor_kwargs={"paths": paths, "tau": tau},
        batch_format="pyarrow",
        concurrency=(1, 8),
    )
    return pairs


def embedding_near_dup_pairs_lsh(
    ds,
    tau: float = 0.8,
    id_col: str = "vec_id",
    col: str = "embedding",
    dim: int = 64,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 13,
    buckets: int = 64,
    axis_aligned: bool = False,
):
    """APPROXIMATE near-dup pairs — the 100 TB scale path for high ``tau``.

    Banded random-hyperplane LSH: each vector gets n_planes sign bits,
    split into ``bands`` bands of r = n_planes/bands bits; a pair is a
    candidate iff some band's bits match, and every candidate is verified
    with the exact cosine INSIDE its bucket group (precision = 1; recall
    = 1 - (1 - (1 - theta/pi)^r)^bands, ~0.99 for cos >= 0.9 at 4x4).
    Unlike the exact block-pair operator (embedding_near_dup_pairs), total
    compute is O(sum of bucket sizes squared), not O(n^2) — buckets are
    the partition key at scale. Embeddings ship once per band (bands is
    small); nothing materializes on the driver.

    ``axis_aligned=True`` swaps the Gaussian planes for coordinate-sign
    planes (bit j = embedding[j] > 0, functions/ann.py HyperplaneSigner)
    — an equally valid LSH family whose band buckets plain SQL can
    recompute bit-for-bit; the driver-checked ``dedup_embedding_lsh``
    query pins this path against a DuckDB oracle."""
    from debezium_incubator_ray.functions.ann import HyperplaneSigner

    assert n_planes % bands == 0
    r = n_planes // bands
    signer = HyperplaneSigner(dim, n_planes, seed=seed, col=col,
                              axis_aligned=axis_aligned)

    def explode(t: pa.Table) -> pa.Table:
        from debezium_incubator_ray.functions.ann import _batch_matrix

        sig = signer.sign(_batch_matrix(t, col)).astype(np.uint64)
        n = len(sig)
        ids = t[id_col].combine_chunks()
        emb = t[col].combine_chunks()
        band_idx = np.tile(np.arange(bands, dtype=np.int32), n)
        rep = np.repeat(np.arange(n, dtype=np.int64), bands)
        mask = np.uint64((1 << r) - 1)
        band_bits = np.empty(n * bands, dtype=np.int64)
        for b in range(bands):
            band_bits[b::bands] = ((sig >> np.uint64(b * r)) & mask).astype(np.int64)
        take = pa.array(rep)
        with np.errstate(over="ignore"):
            code = (
                band_bits.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                + band_idx.astype(np.uint64)
            )
        return pa.table(
            {
                "band": pa.array(band_idx),
                "bits": pa.array(band_bits),
                id_col: pc.take(ids, take),
                col: pc.take(emb, take),
                "_bucket": pa.array((code % np.uint64(buckets)).astype(np.int32)),
            }
        )

    def verify_in_bucket(t: pa.Table) -> pa.Table:
        from debezium_incubator_ray.functions.ann import _batch_matrix, _normalize

        idx = pc.sort_indices(
            t, sort_keys=[("band", "ascending"), ("bits", "ascending"),
                          (id_col, "ascending")]
        )
        s = t.take(idx)
        band = s["band"].combine_chunks().to_numpy().astype(np.uint64)
        bits = s["bits"].combine_chunks().to_numpy().astype(np.uint64)
        docs = s[id_col].combine_chunks().to_numpy()
        with np.errstate(over="ignore"):
            code = bits * np.uint64(0x9E3779B97F4A7C15) + band
        keep = np.ones(len(code), dtype=bool)
        keep[1:] = (code[1:] != code[:-1]) | (docs[1:] != docs[:-1])
        a_pos, b_pos = _pairs_within_groups(
            code[keep], np.arange(len(docs))[keep]
        )
        if len(a_pos) == 0:
            return pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                 "cos": pa.array([], pa.float64())}
            )
        M = _normalize(_batch_matrix(s, col))
        cos = np.einsum("ij,ij->i", M[a_pos], M[b_pos])
        a = docs[a_pos]
        b = docs[b_pos]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        ok = (cos >= tau) & (lo < hi)
        return pa.table(
            {"a": pa.array(lo[ok]), "b": pa.array(hi[ok]),
             "cos": pa.array(np.round(cos[ok], 6))}
        )

    cand = (
        ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_bucket")
        .map_groups(verify_in_bucket, batch_format="pyarrow")
    )

    def max_cos(group: pa.Table) -> pa.Table:
        a = group["a"].combine_chunks().to_numpy()
        b = group["b"].combine_chunks().to_numpy()
        c = group["cos"].combine_chunks().to_numpy()
        order, first, pidx = _pair_runs(a, b)
        firsts = order[first]
        cmax = np.full(int(pidx[-1]) + 1 if len(pidx) else 0, -2.0)
        np.maximum.at(cmax, pidx, c[order])
        return pa.table(
            {"a": pa.array(a[firsts]), "b": pa.array(b[firsts]),
             "cos": pa.array(cmax)}
        )

    return (
        cand.map_batches(
            lambda t: _add_pair_bucket(t, buckets),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("_pbucket")
        .map_groups(max_cos, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# near-dup clustering (connected components over dup pairs)


def _cc_numpy(a: np.ndarray, b: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Vectorized union-find over int64 edge arrays → (nodes, cluster =
    min node id per component). Delegates to the shared graph kernel."""
    from debezium_incubator_ray.functions.graph import _block_cc

    nodes = np.unique(np.concatenate([a, b]))
    ai = np.searchsorted(nodes, a)
    bi = np.searchsorted(nodes, b)
    label = _block_cc(len(nodes), ai, bi)
    return nodes, nodes[label]


def connected_components(
    pairs_ds,
    buckets: int = 64,
    driver_cutover: int = 10_000_000,
):
    """(a, b) near-dup edges → (doc_id, cluster_id) with cluster_id = the
    MIN doc id in the connected component — the grouping step of cluster
    dedup (keep one canonical doc per cluster, drop the rest).

    The dup-pair graph is the SMALL side by construction (edges exist only
    between near-duplicates, a sliver of the corpus), so up to
    ``driver_cutover`` edges (16 B each — the default caps the pull at
    ~160 MB) the component labels come from one vectorized union-find over
    the collected edge array: one pass, no rounds. Above the cutover it
    delegates to the distributed contraction in
    functions/graph.py:cc_labels (per-block vectorized union + one
    mapping shuffle + driver-side root-graph finish — constant shuffle
    count, no O(diameter) rounds); both paths produce identical labels."""
    import ray.data
    from debezium_incubator_ray.functions.graph import cc_labels

    pairs_mat = pairs_ds.materialize()  # pair generation runs exactly once
    if pairs_mat.count() <= driver_cutover:
        chunks_a, chunks_b = [], []
        for t in pairs_mat.iter_batches(batch_format="pyarrow"):
            chunks_a.append(t["a"].combine_chunks().to_numpy(zero_copy_only=False))
            chunks_b.append(t["b"].combine_chunks().to_numpy(zero_copy_only=False))
        if not chunks_a:
            return ray.data.from_arrow(
                pa.table(
                    {"doc_id": pa.array([], pa.int64()),
                     "cluster_id": pa.array([], pa.int64())}
                )
            )
        nodes, cluster = _cc_numpy(
            np.concatenate(chunks_a), np.concatenate(chunks_b)
        )
        return ray.data.from_arrow(
            pa.table({"doc_id": pa.array(nodes), "cluster_id": pa.array(cluster)})
        )

    labels = cc_labels(pairs_mat, src_col="a", dst_col="b", buckets=buckets)

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["node"], "cluster_id": t["comp"]})

    return labels.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)


def near_dup_clusters(
    docs_ds,
    shingle_k: int = 3,
    threshold: float = 0.5,
    hasher: Callable = stable_hash,
):
    """documents → (doc_id, cluster_id, keep) over exact n-gram-Jaccard
    near-dup components: pairs (inverted index + distributed verify) →
    connected components → canonical = min doc_id per cluster. Docs in no
    pair are not emitted (they are their own singleton clusters)."""
    pairs = ngram_jaccard_pairs(docs_ds, shingle_k, threshold, hasher=hasher)
    comp = connected_components(pairs)

    def add_keep(t: pa.Table) -> pa.Table:
        return t.append_column(
            "keep", pc.equal(t["doc_id"], t["cluster_id"])
        )

    return comp.map_batches(add_keep, batch_format="pyarrow", zero_copy_batch=True)


def keep_best_per_cluster(
    docs_ds,
    score_col: str,
    id_col: str = "doc_id",
    shingle_k: int = 3,
    threshold: float = 0.5,
    label_mode: str = "auto",
    driver_cutover: int = 10_000_000,
    buckets: int = 64,
):
    """Quality-aware near-dup dedup: instead of the min-id canonical,
    keep the HIGHEST-``score_col`` document of every near-dup cluster
    (ties -> min id) — the production crawl-dedup policy (keep the
    longest / best-quality capture, drop the rest). Emits one row per
    cluster: (cluster_id, doc_id, score).

    Scale shape: clusters come from the distributed pair + component
    machinery. Label attachment has two modes under the same cutover
    discipline as connected_components, because on a web corpus the
    near-dup graph is NOT metadata-sized (30-40% of all docs carry a
    label — tens of GB at 10^10 docs):

    - ``broadcast`` (<= ``driver_cutover`` labeled nodes): the
      (doc -> cluster) map collects once as two sorted arrays, one
      ray.put, and the corpus streams ONCE to attach labels + scores —
      zero full-row shuffle.
    - ``shuffle`` (above the cutover, or forced): labels attach via the
      partitioned hash join (functions/joins.py shuffle_join, inner on
      id-hash buckets) — labels and doc (id, score) rows meet in their
      bucket, nothing ever materializes on the driver. Costs one shuffle
      of the (id, score) projection — 16 B/row, never the text.

    Both paths feed the same distributed winner election: one
    group_argmin combiner pass (per-block lexmin of (-score, id), one
    bucketed fold). ``label_mode="auto"`` picks by counting the labeled
    nodes (the component output is materialized either way). A pytest
    byte-compares the two branches on the same corpus."""
    import ray
    import ray.data
    from debezium_incubator_ray.functions.kernels import group_argmin

    pairs = ngram_jaccard_pairs(docs_ds, shingle_k, threshold)
    comp = connected_components(pairs).materialize()
    if label_mode == "auto":
        mode = "broadcast" if comp.count() <= driver_cutover else "shuffle"
    elif label_mode in ("broadcast", "shuffle"):
        mode = label_mode
    else:
        raise ValueError(f"unknown label_mode {label_mode!r}")

    # the election only needs (id, score) — never ship text/html columns
    # through either the broadcast filter or the join shuffle
    slim = docs_ds.select_columns([id_col, score_col])

    def election_rows(cluster_arr, score_arr, id_arr) -> pa.Table:
        # the ONE projection both label-attach branches feed group_argmin
        # — shared so the branches can never drift apart semantically
        return pa.table({
            "cluster_id": pc.cast(cluster_arr, pa.int64()),
            "_negscore": pc.multiply(pc.cast(score_arr, pa.float64()), -1.0),
            id_col: pc.cast(id_arr, pa.int64()),
        })

    if mode == "shuffle":
        from debezium_incubator_ray.functions.joins import shuffle_join

        joined = shuffle_join(
            slim, comp, on=id_col, right_on="doc_id",
            buckets=buckets, join_type="inner",
        )

        def to_neg(t: pa.Table) -> pa.Table:
            return election_rows(
                t["cluster_id"].combine_chunks(), t[score_col], t[id_col]
            )

        labeled = joined.map_batches(
            to_neg, batch_format="pyarrow", zero_copy_batch=True
        )
    else:
        rows = comp.take_all()  # under the cutover — bounded pull
        nodes = np.array([r["doc_id"] for r in rows], dtype=np.int64)
        clusters = np.array([r["cluster_id"] for r in rows], dtype=np.int64)
        order = np.argsort(nodes)
        map_ref = ray.put((nodes[order], clusters[order]))

        def attach(t: pa.Table) -> pa.Table:
            n_arr, c_arr = ray.get(map_ref)
            ids = pc.cast(t[id_col].combine_chunks(), pa.int64()).to_numpy(
                zero_copy_only=False
            )
            if len(n_arr) == 0:
                sel = np.zeros(len(ids), dtype=bool)
                cl = np.empty(0, np.int64)
            else:
                pos = np.minimum(np.searchsorted(n_arr, ids), len(n_arr) - 1)
                sel = n_arr[pos] == ids
                cl = c_arr[pos[sel]]  # positions already found — reuse
            sub = t.filter(pa.array(sel))
            return election_rows(pa.array(cl), sub[score_col], sub[id_col])

        labeled = slim.map_batches(
            attach, batch_format="pyarrow", zero_copy_batch=True
        )
    won = group_argmin(labeled, "cluster_id", "_negscore", id_col)

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "cluster_id": t["cluster_id"],
            id_col: t[id_col],
            "score": pc.multiply(t["_negscore"], -1.0),
        })

    return won.map_batches(finish, batch_format="pyarrow")

def ngram_novelty(docs_ds, shingle_k: int = 3, buckets: int = 64,
                  hasher: Callable = stable_hash):
    """Per-document n-gram NOVELTY: the fraction of a doc's distinct
    k-shingles that appear in NO other document (corpus df = 1) — the
    inverse boilerplate gauge a curation pipeline thresholds on (low
    novelty = templated/copied text, high = original prose).

    ONE shuffle: the distinct (shingle-hash, doc) inverted index routes
    by shingle-hash bucket, so a shingle's whole posting list meets in
    one group — df and the per-doc (seen, unique) partials fall out of
    a single run-length pass there; a narrow doc-id groupby folds the
    partials and the driver never sees a row. Empty docs (no tokens)
    are excluded, mirroring the SQL oracle's nonempty filter."""
    from ray.data.aggregate import Sum
    from debezium_incubator_ray.functions.tokens import (
        shingle_hashes, distinct_per_doc,
    )

    def explode(t: pa.Table) -> pa.Table:
        g, glens = shingle_hashes(t["text"].combine_chunks(), shingle_k,
                                  hasher)
        dv, dc = distinct_per_doc(g, glens)
        ids = np.repeat(t["doc_id"].to_numpy(), dc)
        return pa.table({
            "g": pa.array(dv.view(np.int64)),
            "doc_id": pa.array(ids),
            "_bucket": pa.array((dv % np.uint64(buckets)).astype(np.int32)),
        })

    def bucket_partials(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t, sort_keys=[("g", "ascending"), ("doc_id", "ascending")]
        )
        s = t.take(idx)
        g = s["g"].combine_chunks().to_numpy()
        docs = s["doc_id"].combine_chunks().to_numpy()
        if len(g) == 0:
            return pa.table({
                "doc_id": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "uniq": pa.array([], pa.int64()),
            })
        # df per shingle via run lengths (each shingle value lives
        # entirely in this bucket)
        new = np.ones(len(g), dtype=bool)
        new[1:] = g[1:] != g[:-1]
        starts = np.nonzero(new)[0]
        df = np.diff(np.append(starts, len(g)))
        is_unique = np.repeat(df == 1, df)
        tb = pa.table({
            "doc_id": pa.array(docs),
            "one": pa.array(np.ones(len(docs), np.int64)),
            "u": pa.array(is_unique.astype(np.int64)),
        })
        agg = tb.group_by("doc_id").aggregate([("one", "sum"), ("u", "sum")])
        return pa.table({
            "doc_id": agg["doc_id"],
            "n": pc.cast(agg["one_sum"], pa.int64()),
            "uniq": pc.cast(agg["u_sum"], pa.int64()),
        })

    def finish(t: pa.Table) -> pa.Table:
        n = pc.cast(t["n"], pa.float64())
        nov = pc.round(
            pc.divide(pc.cast(t["uniq"], pa.float64()), n), 6
        )
        return pa.table({
            "doc_id": t["doc_id"],
            "n_shingles": t["n"],
            "uniq_shingles": t["uniq"],
            "novelty": nov,
        })

    return (
        docs_ds.map_batches(explode, batch_format="pyarrow",
                            zero_copy_batch=True)
        .groupby("_bucket")
        .map_groups(bucket_partials, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("n", alias_name="n"), Sum("uniq", alias_name="uniq"))
        .map_batches(finish, batch_format="pyarrow")
    )


def md5_minhash_signatures(
    texts: "pa.Array | pa.ChunkedArray",
    ids: np.ndarray,
    n_hashes: int = 16,
    shingle_k: int = 3,
) -> tuple:
    """THE SQL-bridgeable minhash signature kernel — gram hash = md5 of
    the literal gram string (tokens.gram_string_hashes), hash family
    h_i(g) = ((2i+3)*g + 1000003*i+17 mod 2^64) mod (2^61-1), so DuckDB
    reproduces every signature bit-for-bit with HUGEINT arithmetic.
    Shared by ``minhash_estimate_pairs`` and the persisted near-dup
    index (functions/simindex.py) — both MUST hash identically or the
    index diverges from the in-memory estimates. Docs with zero grams
    are dropped. Returns (ids_nz int array, uint64 sig matrix
    [n_nz x n_hashes])."""
    from debezium_incubator_ray.functions.tokens import gram_string_hashes

    A = (2 * np.arange(n_hashes, dtype=np.uint64) + np.uint64(3))
    B = (np.uint64(1000003) * np.arange(n_hashes, dtype=np.uint64)
         + np.uint64(17))
    M = np.uint64((1 << 61) - 1)
    g, glens = gram_string_hashes(texts, shingle_k)
    ids = np.asarray(ids)
    nz = glens > 0
    n_docs = len(ids)
    sig = np.zeros((n_docs, n_hashes), dtype=np.uint64)
    if len(g):
        gstarts = np.zeros(n_docs, dtype=np.int64)
        np.cumsum(glens[:-1], out=gstarts[1:])
        with np.errstate(over="ignore"):
            v = (A[:, None] * g[None, :] + B[:, None]) % M
        sent = np.full((n_hashes, 1), np.uint64(0xFFFFFFFFFFFFFFFF),
                       np.uint64)
        prod = np.concatenate([v, sent], axis=1)
        mins = np.minimum.reduceat(prod, gstarts[nz], axis=1)
        sig[nz, :] = mins.T
    return ids[nz], sig[nz]


def minhash_estimate_pairs(
    docs_ds,
    n_hashes: int = 16,
    shingle_k: int = 3,
    min_matches: int = 8,
    buckets: int = 64,
):
    """MinHash-ESTIMATED Jaccard per candidate pair — the verification
    SKIP a 100 TB dedup takes when exact shingle-set intersection is too
    expensive: est_jaccard = (matching signature positions) / n_hashes,
    unbiased with sd ~ 1/sqrt(n_hashes).

    Fully SQL-bridgeable by construction (unlike MinHasher's seeded
    universal-hash matrix): gram hash = md5 of the literal gram STRING
    (tokens.gram_string_hashes) and hash family
    h_i(g) = ((2i+3)*g + 1000003*i+17 mod 2^64) mod (2^61-1) — plain
    HUGEINT arithmetic for the oracle, uint64 wrap for numpy.

    Candidates = pairs sharing >= 1 shingle (the one-shuffle inverted
    index, same as ngram_jaccard_pairs); signatures are
    n_hashes x 8 B/doc and broadcast once (ray.put) — at corpus sizes
    where the signature matrix exceeds node memory, attach them with the
    partitioned shuffle_join on (a) and (b) instead (the
    keep_best_per_cluster label pattern). Emits (a, b, n_match,
    est_jaccard) for pairs with n_match >= min_matches."""
    import ray
    import ray.data

    def signatures(t: pa.Table) -> pa.Table:
        ids_nz, sig = md5_minhash_signatures(
            t["text"].combine_chunks(),
            t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False),
            n_hashes=n_hashes, shingle_k=shingle_k,
        )
        return pa.table({
            "doc_id": pa.array(ids_nz),
            "sig": pa.array(list(sig.view(np.int64)),
                            pa.list_(pa.int64(), n_hashes)),
        })

    sig_rows = (
        docs_ds.map_batches(signatures, batch_format="pyarrow",
                            zero_copy_batch=True)
        .take_all()
    )  # n_hashes x 8 B per doc — the documented broadcast bound
    ids = np.array([r["doc_id"] for r in sig_rows], dtype=np.int64)
    mat = np.array([r["sig"] for r in sig_rows], dtype=np.int64)
    order = np.argsort(ids)
    ref = ray.put((ids[order], mat[order]))

    pairs = ngram_jaccard_pairs(docs_ds, shingle_k, threshold=0.0)

    def estimate(t: pa.Table) -> pa.Table:
        sid, smat = ray.get(ref)
        a = t["a"].combine_chunks().to_numpy(zero_copy_only=False)
        b = t["b"].combine_chunks().to_numpy(zero_copy_only=False)
        ia = np.clip(np.searchsorted(sid, a), 0, len(sid) - 1)
        ib = np.clip(np.searchsorted(sid, b), 0, len(sid) - 1)
        # candidate ids must all carry signatures; a miss means the pair
        # generator and the signature stage tokenized differently — fail
        # loudly rather than compare the wrong doc's signature
        if not (np.array_equal(sid[ia], a) and np.array_equal(sid[ib], b)):
            missing = np.union1d(a[sid[ia] != a], b[sid[ib] != b])
            raise ValueError(
                "minhash_estimate_pairs: candidate pair references doc_ids "
                f"with no signature (tokenization drift): {missing[:10]}"
            )
        m = (smat[ia] == smat[ib]).sum(axis=1).astype(np.int64)
        keep = m >= min_matches
        return pa.table({
            "a": pa.array(a[keep]),
            "b": pa.array(b[keep]),
            "n_match": pa.array(m[keep]),
            "est_jaccard": pa.array(
                np.round(m[keep] / float(n_hashes), 6)
            ),
        })

    return pairs.map_batches(estimate, batch_format="pyarrow",
                             zero_copy_batch=True)


def dup_substring_rate(
    docs_ds,
    k: int = 30,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 256,
):
    """Per-doc duplicate-substring rate — the EXACTSUBSTR signal of Lee
    et al., "Deduplicating Training Data Makes Language Models Better"
    (arXiv:2107.06499), simplified from suffix arrays to fixed-length
    windows: the fraction of a doc's DISTINCT char k-grams that occur in
    at least one OTHER doc. Docs shorter than k yield no windows and are
    excluded (mirroring the SQL oracle's HAVING).

    Scale shape: stage 1 is one vectorized rolling-hash pass per batch
    (tokens.char_gram_hashes — O(chars), no per-doc loop) deduped per doc
    (a doc is one row, so in-batch distinct is global distinct); only
    (gram_hash, doc_id) pairs shuffle, bucketed by gram hash into
    ``buckets`` groups — never millions of per-gram groups, and never the
    text. In-bucket df marking is a sort + run-length pass; the final
    per-doc fold is |buckets| x docs-touched tiny rows.

    Precision: grams are compared by a 64-bit rolling hash, not by
    string — a collision (birthday bound ~n_distinct²/2^65; ~1 expected
    around 10^10 distinct grams) merges two different grams, slightly
    inflating dup_rate. Exact for the corpora the oracle checks; at
    extreme scale this is a documented approximation (the exact path is
    a second verify pass over colliding buckets, same as minhash's).
    """
    import ray.data  # noqa: F401 (docs_ds is already a Dataset)
    from ray.data.aggregate import Sum

    from debezium_incubator_ray.functions.tokens import (
        char_gram_hashes, distinct_per_doc,
    )

    mask = np.uint64(buckets - 1)

    def explode(t: pa.Table) -> pa.Table:
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        h, per_doc = char_gram_hashes(t[text_col], k)
        hd, nd = distinct_per_doc(h, per_doc)
        doc_of = np.repeat(ids, nd)
        return pa.table({
            "g": pa.array(hd.view(np.int64)),
            "doc": pa.array(doc_of),
            "gb": pa.array((hd & mask).astype(np.int64)),
        })

    def bucket_fold(t: pa.Table) -> pa.Table:
        g = t["g"].combine_chunks().to_numpy(zero_copy_only=False)
        doc = t["doc"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(g, kind="stable")
        gs, ds = g[order], doc[order]
        new = np.ones(len(gs), dtype=bool)
        new[1:] = gs[1:] != gs[:-1]
        run_id = np.cumsum(new) - 1
        run_len = np.bincount(run_id)
        dup = run_len[run_id] >= 2  # the gram exists in >= 2 docs
        uids, inv = np.unique(ds, return_inverse=True)
        n = np.bincount(inv, minlength=len(uids)).astype(np.int64)
        ndup = np.bincount(inv, weights=dup.astype(np.float64),
                           minlength=len(uids)).astype(np.int64)
        return pa.table({
            id_col: pa.array(uids),
            "n": pa.array(n),
            "dup": pa.array(ndup),
        })

    folded = (
        docs_ds.map_batches(explode, batch_format="pyarrow",
                            zero_copy_batch=True)
        .groupby("gb")
        .map_groups(bucket_fold, batch_format="pyarrow")
        .groupby(id_col)
        .aggregate(Sum("n", alias_name="n"), Sum("dup", alias_name="dup"))
    )

    def finish(t: pa.Table) -> pa.Table:
        n = pc.cast(t["n"], pa.int64())
        dup = pc.cast(t["dup"], pa.float64())
        return pa.table({
            id_col: t[id_col],
            "n_grams": n,
            # half_towards_infinity (= half away from zero): dup/n hits
            # exact half-way values (e.g. 2/256) where DuckDB's round()
            # goes away from zero but numpy/arrow default to half-even
            "dup_rate": pc.round(
                pc.divide(dup, pc.cast(n, pa.float64())), 6,
                round_mode="half_towards_infinity"),
        })

    return folded.map_batches(finish, batch_format="pyarrow")


def dup_tile_coverage(
    docs_ds,
    tile: int = 24,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 64,
):
    """Duplicated-content COVERAGE per doc, at non-overlapping tile
    granularity: tile each doc's text into ``tile``-char windows at
    stride ``tile`` (positions 0, L, 2L, ...; the ragged tail is
    dropped), call a tile duplicated when its exact string occurs at
    >= 2 sites ANYWHERE in the corpus (other docs or the same doc), and
    report per doc how many of its tiles are duplicated and the covered
    fraction. This is the deployable tile-level form of the suffix-array
    duplicate-span measure of Lee et al. (arXiv:2107.06499) —
    ``dup_substring_rate`` answers "how much of my distinct content
    exists elsewhere", this answers "how much of my text positionally
    sits inside repeated spans".

    Scale shape: tiling is <= max_len/L vectorized slice kernels per
    batch (no per-doc loop); only (tile_md5_64, doc_id) pairs shuffle,
    bucketed by hash into ``buckets`` bounded groups; global site counts
    finish in-bucket (the bucket owns the hash), and per-doc partials
    fold through one tiny groupby. The text itself never moves. Tiles
    compare by the md5-64 used by every SQL-verifiable family here
    (tokens.md5_u64); the oracle applies the SAME hash, so even a
    collision cannot split engine from oracle.

    Character semantics: slicing uses utf8 codeunits — identical to SQL
    substring() on ASCII corpora (this corpus; asserted nowhere, noted
    here). dup_frac rounds half-away in exact integer micro space.
    """
    from ray.data.aggregate import Sum

    from debezium_incubator_ray.functions.tokens import md5_u64

    L = int(tile)
    if L < 1:
        raise ValueError("tile must be >= 1")

    def explode(t: pa.Table) -> pa.Table:
        txt = t[text_col].combine_chunks()
        ln = pc.fill_null(pc.utf8_length(txt), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        keep = ln >= L
        if not keep.any():
            return pa.table({
                "_b": pa.array([], pa.int32()),
                "h": pa.array([], pa.uint64()),
                id_col: pa.array([], t.schema.field(id_col).type),
            })
        t = t.filter(pa.array(keep))
        txt = t[text_col].combine_chunks()
        ids = t[id_col].combine_chunks()
        ln = ln[keep]
        max_k = int(ln.max()) // L
        hs, ds = [], []
        for kk in range(max_k):
            m = ln >= (kk + 1) * L
            sl = pc.utf8_slice_codeunits(
                txt.filter(pa.array(m)), kk * L, (kk + 1) * L
            )
            hs.append(md5_u64(sl))
            ds.append(ids.filter(pa.array(m)))
        h = np.concatenate(hs)
        return pa.table({
            "_b": pa.array((h % np.uint64(buckets)).astype(np.int32)),
            "h": pa.array(h),
            id_col: pa.concat_arrays(
                [d.combine_chunks() if isinstance(d, pa.ChunkedArray)
                 else d for d in ds]
            ),
        })

    def bucket_fold(g: pa.Table) -> pa.Table:
        h = g["h"].combine_chunks().to_numpy(zero_copy_only=False)
        _, inv, cnt = np.unique(h, return_inverse=True,
                                return_counts=True)
        dup = (cnt[inv] >= 2).astype(np.int64)
        agg = pa.table({
            id_col: g[id_col],
            "nt": pa.array(np.ones(len(h), np.int64)),
            "nd": pa.array(dup),
        }).group_by([id_col]).aggregate([("nt", "sum"), ("nd", "sum")])
        return pa.table({
            id_col: agg[id_col],
            "nt": agg["nt_sum"],
            "nd": agg["nd_sum"],
        })

    folded = (
        docs_ds.map_batches(explode, batch_format="pyarrow",
                            zero_copy_batch=True)
        .groupby("_b")
        .map_groups(bucket_fold, batch_format="pyarrow")
        .groupby(id_col)
        .aggregate(Sum("nt", alias_name="nt"), Sum("nd", alias_name="nd"))
    )

    def finish(t: pa.Table) -> pa.Table:
        nt = pc.cast(t["nt"], pa.int64()).to_numpy(zero_copy_only=False)
        nd = pc.cast(t["nd"], pa.int64()).to_numpy(zero_copy_only=False)
        # half-away rounding to 6dp in exact integer micro space
        frac = (2_000_000 * nd + nt) // (2 * nt) / 1e6
        return pa.table({
            id_col: t[id_col],
            "n_tiles": pa.array(nt),
            "n_dup_tiles": pa.array(nd),
            "dup_frac": pa.array(frac, pa.float64()),
        })

    return folded.map_batches(finish, batch_format="pyarrow")
