"""Persisted MinHash-LSH near-duplicate index.

Completes the persisted-index family (BM25 inverted index in
functions/text.py, IVF vector index in functions/ann.py): a banded
minhash signature index over a document corpus, so NEW batches can be
near-dup-screened against the whole corpus WITHOUT recomputing or even
reading corpus text — the FineWeb/CCNet per-snapshot dedup shape.

Layout (same manifest discipline as the text index — the shared
``_STATS.json`` + manifested-file helpers are imported from there):

    index_dir/bucket=<band_hash %% buckets>/*.parquet
        rows (band:int32, bh:uint64, doc_id:int64, sig:list<int64>[H])
    index_dir/_STATS.json
        {n_docs, n_hashes, shingle_k, bands, buckets, files, tombstones}

A doc emits one row per band; ``bh`` is the md5-64 of the band's
signature slice rendered as a decimal string — the same md5 bridge every
SQL-verifiable family here uses, so a DuckDB oracle reproduces the exact
candidate set. Two docs are candidates iff they share (band, bh) for
some band; the signature rides denormalized on every row so the match
count (the Jaccard estimate) is computed where the candidate is found —
query never joins a signature table.

Mutator semantics mirror the text index: build publishes atomically
(tmp dir + rename), append lands delta files invisibly and commits one
manifest replace, deletes are manifest tombstones filtered at query
time, and every mutator runs under the exclusive writer lock.

Scale posture (100 TB): query reads ONLY the bucket partitions its band
hashes touch (partition pruning); the per-band probe is a sorted-array
binary search against the broadcast query bands; candidate rows are
(ids + 8H bytes) — corpus text never moves. Signature computation is
the one corpus pass, at build time.
"""

from __future__ import annotations

import os
from typing import Iterable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from debezium_incubator_ray.functions.dedup import md5_minhash_signatures
from debezium_incubator_ray.functions.text import (
    _commit_stats,
    _index_files_on_disk,
    _index_write_lock,
    _promote_delta_files,
    _read_stats,
    vacuum_text_index,
)
from debezium_incubator_ray.functions.tokens import md5_u64


def _band_rows_fn(text_col: str, id_col: str, n_hashes: int,
                  shingle_k: int, bands: int, buckets: int):
    """THE row extractor — build and append must band and bucket
    identically; one closure, used by both."""
    if n_hashes % bands:
        raise ValueError("bands must divide n_hashes")
    r = n_hashes // bands

    def rows(t: pa.Table) -> pa.Table:
        ids, sig = md5_minhash_signatures(
            t[text_col].combine_chunks(),
            t[id_col].combine_chunks().to_numpy(zero_copy_only=False),
            n_hashes=n_hashes, shingle_k=shingle_k,
        )
        n = len(ids)
        out_band, out_bh, out_id, out_sig = [], [], [], []
        for b in range(bands):
            sl = sig[:, b * r:(b + 1) * r]
            # band key string "<band>_<v0>_<v1>_..." — decimal renders
            # match DuckDB's CAST(... AS VARCHAR) exactly
            parts = [pa.scalar(str(b))]
            for j in range(r):
                parts.append(pc.cast(pa.array(sl[:, j]), pa.string()))
            key = pc.binary_join_element_wise(*parts, pa.scalar("_"))
            bh = md5_u64(key)
            out_band.append(np.full(n, b, np.int32))
            out_bh.append(bh)
            out_id.append(ids)
            out_sig.append(sig)
        band = np.concatenate(out_band)
        bh = np.concatenate(out_bh)
        did = np.concatenate(out_id).astype(np.int64)
        smat = np.concatenate(out_sig).view(np.int64)
        return pa.table({
            "bucket": pa.array((bh % np.uint64(buckets)).astype(np.int32)),
            "band": pa.array(band),
            "bh": pa.array(bh),
            "doc_id": pa.array(did),
            "sig": pa.array(list(smat), pa.list_(pa.int64(), n_hashes)),
        })

    return rows


def build_minhash_index(
    ds,
    out_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    shingle_k: int = 3,
    bands: int = 4,
    buckets: int = 32,
) -> dict:
    """One streaming corpus pass → banded signature rows partitioned by
    band-hash bucket; publish is atomic (tmp dir + rename), so readers
    never observe a half-built index."""
    import shutil
    import uuid

    import ray.data

    tmp = f"{out_dir}.{uuid.uuid4().hex}.tmp"
    ds.map_batches(
        _band_rows_fn(text_col, id_col, n_hashes, shingle_k, bands,
                      buckets),
        batch_format="pyarrow", zero_copy_batch=True,
    ).write_parquet(tmp, partition_cols=["bucket"])

    n_rows = ray.data.read_parquet(tmp).count()  # metadata-only
    n_docs = n_rows // bands
    _commit_stats(tmp, {
        "n_docs": int(n_docs), "n_hashes": int(n_hashes),
        "shingle_k": int(shingle_k), "bands": int(bands),
        "buckets": int(buckets), "files": _index_files_on_disk(tmp),
        "tombstones": [],
    })
    shutil.rmtree(out_dir, ignore_errors=True)
    os.rename(tmp, out_dir)  # the visibility point
    return {"n_docs": int(n_docs), "buckets": int(buckets)}


def append_to_minhash_index(
    index_dir: str,
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict:
    """Incrementally index NEW documents: delta files land inside the
    bucket dirs but stay INVISIBLE (readers open only manifested files)
    until one atomic manifest replace. The caller owns doc-id
    disjointness against the live set (same contract as the text
    index's append)."""
    import shutil
    import uuid

    with _index_write_lock(index_dir):
        stats = _read_stats(index_dir)
        tag = uuid.uuid4().hex
        tmp = os.path.join(index_dir, f"_append-{tag}.tmp")
        delta = ds.map_batches(
            _band_rows_fn(text_col, id_col, int(stats["n_hashes"]),
                          int(stats["shingle_k"]), int(stats["bands"]),
                          int(stats["buckets"])),
            batch_format="pyarrow", zero_copy_batch=True,
        ).materialize()
        if delta.count() == 0:
            # Empty delta: write_parquet creates no tmp dir for a
            # zero-block dataset, so promoting would crash — an idle
            # incremental cycle is a no-op (same guard as the IVF
            # index's append, ann.py).
            return {"appended_docs": 0, "n_docs": int(stats["n_docs"])}
        delta.write_parquet(tmp, partition_cols=["bucket"])
        d_docs = delta.count() // int(stats["bands"])

        files = {k: list(v) for k, v in stats["files"].items()}
        _promote_delta_files(index_dir, tmp, files, tag)
        shutil.rmtree(tmp, ignore_errors=True)

        stats["n_docs"] = int(stats["n_docs"]) + int(d_docs)
        stats["files"] = files
        _commit_stats(index_dir, stats)
        return {"appended_docs": int(d_docs), "n_docs": stats["n_docs"]}


def delete_from_minhash_index(index_dir: str, doc_ids: Iterable) -> dict:
    """Tombstone deletion: one atomic manifest commit; queries filter
    the tombstoned docs immediately, bytes remain until a rebuild."""
    with _index_write_lock(index_dir):
        stats = _read_stats(index_dir)
        tomb = set(stats["tombstones"])
        tomb.update(int(d) for d in doc_ids)
        stats["tombstones"] = sorted(tomb)
        _commit_stats(index_dir, stats)
        return {"tombstones": len(tomb)}


def minhash_index_query(
    index_dir: str,
    query_ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_matches: int = 8,
    exclude_self: bool = True,
):
    """Near-dup candidates of the query docs against the INDEXED corpus:
    reads only the bucket partitions the query band hashes touch, probes
    each band with a sorted binary search against the broadcast query
    bands, estimates Jaccard from matching signature positions where the
    candidate is found, and dedupes (a, b) across bands in one narrow
    groupby. Returns a Dataset of (a=query id, b=indexed id, n_match,
    est_jaccard) with ``n_match >= min_matches``."""
    import ray
    import ray.data
    from ray.data.aggregate import Max

    stats = _read_stats(index_dir)
    n_hashes = int(stats["n_hashes"])
    bands = int(stats["bands"])
    buckets = int(stats["buckets"])

    q = (
        query_ds.map_batches(
            _band_rows_fn(text_col, id_col, n_hashes,
                          int(stats["shingle_k"]), bands, buckets),
            batch_format="pyarrow", zero_copy_batch=True,
        ).take_all()
    )  # query-sized: bands x 8 B + one signature per query doc
    empty = pa.table({
        "a": pa.array([], pa.int64()),
        "b": pa.array([], pa.int64()),
        "n_match": pa.array([], pa.int64()),
        "est_jaccard": pa.array([], pa.float64()),
    })
    if not q:
        return ray.data.from_arrow(empty)
    q_band = np.array([r["band"] for r in q], np.int32)
    q_bh = np.array([r["bh"] for r in q], np.uint64)
    q_id = np.array([r["doc_id"] for r in q], np.int64)
    q_sig = np.array([r["sig"] for r in q], np.int64)
    # per-band sorted probe arrays (bands is small; each sort is query-
    # sized) — (band, bh, qrow) triples broadcast once
    per_band = []
    for b in range(bands):
        m = q_band == b
        o = np.argsort(q_bh[m])
        per_band.append((q_bh[m][o], np.nonzero(m)[0][o]))
    # query docs are distinct per band, so their per-band dedup of
    # signatures is q_sig itself, indexed through the probe rows
    probe_ref = ray.put((per_band, q_id, q_sig))

    needed = sorted({int(h % np.uint64(buckets)) for h in q_bh})
    manifest = stats["files"]
    paths = []
    for bb in needed:
        d = os.path.join(index_dir, f"bucket={bb}")
        if not os.path.isdir(d):
            continue
        paths.extend(os.path.join(d, f) for f in manifest.get(str(bb), []))
    if not paths:
        return ray.data.from_arrow(empty)

    tomb = np.array(sorted(int(x) for x in stats["tombstones"]), np.int64)

    EMPTY_CAND = pa.table({
        "a": pa.array([], pa.int64()),
        "b": pa.array([], pa.int64()),
        "n_match": pa.array([], pa.int64()),
    })

    def probe(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return EMPTY_CAND
        pb, qid, qsig = ray.get(probe_ref)
        band = t["band"].combine_chunks().to_numpy(zero_copy_only=False)
        bh = t["bh"].combine_chunks().to_numpy(zero_copy_only=False)
        did = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        smat = np.asarray(
            t["sig"].combine_chunks().flatten().to_numpy(
                zero_copy_only=False
            ).reshape(len(did), -1)
        )
        if len(tomb):
            pos = np.clip(np.searchsorted(tomb, did), 0, len(tomb) - 1)
            alive = tomb[pos] != did
            band, bh, did, smat = (band[alive], bh[alive], did[alive],
                                   smat[alive])
        outs_a, outs_b, outs_m = [], [], []
        for b, (sb, qrows) in enumerate(pb):
            if not len(sb):
                continue
            m = band == b
            if not m.any():
                continue
            # SPAN expansion: several query docs can share one band
            # hash (near-identical queries) — every one of them owns
            # the candidate, not just the first sorted position
            lo = np.searchsorted(sb, bh[m], side="left")
            hi = np.searchsorted(sb, bh[m], side="right")
            cnt = hi - lo
            hit = cnt > 0
            if not hit.any():
                continue
            chit = cnt[hit]
            total = int(chit.sum())
            irows = np.repeat(np.nonzero(m)[0][hit], chit)
            starts = np.cumsum(chit) - chit
            qpos = (np.repeat(lo[hit], chit)
                    + np.arange(total) - np.repeat(starts, chit))
            qr = qrows[qpos]
            a = qid[qr]
            bdoc = did[irows]
            nm = (qsig[qr] == smat[irows]).sum(axis=1).astype(np.int64)
            keep = nm >= min_matches
            if exclude_self:
                keep &= a != bdoc
            outs_a.append(a[keep])
            outs_b.append(bdoc[keep])
            outs_m.append(nm[keep])
        if not outs_a:
            return EMPTY_CAND
        return pa.table({
            "a": pa.array(np.concatenate(outs_a)),
            "b": pa.array(np.concatenate(outs_b)),
            "n_match": pa.array(np.concatenate(outs_m)),
        })

    found = (
        ray.data.read_parquet(paths)
        .map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["a", "b"])
        # n_match is identical wherever the pair is found; Max dedupes
        .aggregate(Max("n_match", alias_name="n_match"))
    )

    def finish(t: pa.Table) -> pa.Table:
        nm = t["n_match"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table({
            "a": t["a"],
            "b": t["b"],
            "n_match": t["n_match"],
            "est_jaccard": pa.array(
                np.round(nm / float(n_hashes), 6), pa.float64()),
        })

    return found.map_batches(finish, batch_format="pyarrow")


def compact_minhash_index(index_dir: str) -> dict:
    """Rewrite every manifested signature file dropping tombstoned docs
    (one Ray task per bucket — embarrassingly parallel), adjust n_docs
    arithmetically from the distinct removed ids the rewrite tasks
    return, and commit files + stats + empty tombstone set atomically.
    Old files stay on disk for in-flight readers of the previous
    manifest; vacuum_minhash_index reclaims them (the same contract as
    the text index and lake compaction)."""
    import uuid

    import ray

    with _index_write_lock(index_dir):
        stats = _read_stats(index_dir)
        tomb = set(stats["tombstones"])
        if not tomb:
            return {"rewritten": 0, "n_docs": int(stats["n_docs"])}
        tag = uuid.uuid4().hex
        tomb_ref = ray.put(pa.array(sorted(tomb), pa.int64()))

        @ray.remote
        def rewrite_bucket(bdir: str, names: list, tag: str):
            import os as _os

            import pyarrow.compute as _pc
            import pyarrow.parquet as _pq

            t_arr = ray.get(tomb_ref)
            kept, removed = [], set()
            for i, name in enumerate(names):
                t = _pq.read_table(_os.path.join(bdir, name))
                hit = _pc.is_in(t["doc_id"], value_set=t_arr)
                removed.update(
                    int(d) for d in t.filter(hit)["doc_id"].to_pylist()
                )
                t = t.filter(_pc.invert(hit))
                if t.num_rows == 0:
                    continue
                out = f"compact-{tag}-{i:04d}.parquet"
                _pq.write_table(t, _os.path.join(bdir, out))
                kept.append(out)
            return kept, removed

        items = sorted(stats["files"].items())
        futs = [
            rewrite_bucket.remote(
                os.path.join(index_dir, f"bucket={bb}"), names, tag
            )
            for bb, names in items
        ]
        results = ray.get(futs)
        new_files = {
            bb: kept
            for (bb, _n), (kept, _r) in zip(items, results) if kept
        }
        gone: set = set()
        for _kept, removed in results:
            gone |= removed  # tombstone-bounded, tiny
        n_old = sum(len(names) for _bb, names in items)
        stats["n_docs"] = int(stats["n_docs"]) - len(gone)
        stats["files"] = new_files
        stats["tombstones"] = []
        _commit_stats(index_dir, stats)
        return {"rewritten": n_old, "n_docs": stats["n_docs"]}


def vacuum_minhash_index(index_dir: str) -> dict:
    """Remove signature files the manifest no longer lists (compaction
    leftovers, crashed-append orphans). The layouts are identical, so
    this IS the text index's vacuum — one implementation of the
    readers-drain contract."""
    return vacuum_text_index(index_dir)
