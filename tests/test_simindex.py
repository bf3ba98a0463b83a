"""Persisted MinHash-LSH index laws: query parity with the in-memory
banded signatures, append == rebuild, un-manifested files invisible,
single-writer lock, tombstone filtering."""

import os

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data

from debezium_incubator_ray.functions.dedup import md5_minhash_signatures
from debezium_incubator_ray.functions.simindex import (
    append_to_minhash_index,
    build_minhash_index,
    delete_from_minhash_index,
    minhash_index_query,
)
from debezium_incubator_ray.functions.text import TextIndexLockedError


def _docs(ids_texts):
    return pa.table({
        "doc_id": [i for i, _ in ids_texts],
        "text": [t for _, t in ids_texts],
    })


CORPUS = _docs([
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy cat"),
    (2, "completely different words entirely here now"),
    (3, "another unrelated document about spark engines"),
    (4, "the quick brown fox jumps over the lazy dog"),
    (5, "spark engines process data in parallel stages"),
    (6, ""),
    (7, "one two three"),
])


def _brute_pairs(docs, query_ids, min_matches=8, bands=4, n_hashes=16):
    ids, sig = md5_minhash_signatures(docs["text"], np.array(
        docs["doc_id"].to_pylist()), n_hashes=n_hashes)
    r = n_hashes // bands
    out = []
    for i in range(len(ids)):
        if int(ids[i]) not in query_ids:
            continue
        for j in range(len(ids)):
            if i == j:
                continue
            cand = any(
                (sig[i, b * r:(b + 1) * r]
                 == sig[j, b * r:(b + 1) * r]).all()
                for b in range(bands)
            )
            nm = int((sig[i] == sig[j]).sum())
            if cand and nm >= min_matches:
                out.append((int(ids[i]), int(ids[j]), nm))
    return sorted(out)


def _got(res):
    df = res.to_pandas()
    return sorted(map(tuple, df[["a", "b", "n_match"]].values.tolist()))


def test_query_parity_vs_brute(tmp_path, ray_session):
    idx = str(tmp_path / "idx")
    build_minhash_index(ray.data.from_arrow(CORPUS), idx, buckets=8)
    res = minhash_index_query(idx, ray.data.from_arrow(CORPUS),
                              min_matches=8)
    want = _brute_pairs(CORPUS, set(CORPUS["doc_id"].to_pylist()))
    assert _got(res) == want
    assert want  # the fixture must actually exercise matches


def test_append_equals_rebuild(tmp_path, ray_session):
    half_a = CORPUS.slice(0, 4)
    half_b = CORPUS.slice(4)
    inc = str(tmp_path / "inc")
    build_minhash_index(ray.data.from_arrow(half_a), inc, buckets=8)
    append_to_minhash_index(inc, ray.data.from_arrow(half_b))
    full = str(tmp_path / "full")
    build_minhash_index(ray.data.from_arrow(CORPUS), full, buckets=8)
    q = ray.data.from_arrow(CORPUS)
    assert _got(minhash_index_query(inc, q, min_matches=6)) == \
        _got(minhash_index_query(full, q, min_matches=6))


def test_append_empty_delta_is_noop(tmp_path, ray_session):
    """An idle incremental cycle (zero new docs) must not abort the
    pipeline: append with an empty dataset is a committed no-op and the
    index answers identically afterwards."""
    idx = str(tmp_path / "idx")
    info = build_minhash_index(ray.data.from_arrow(CORPUS), idx, buckets=8)
    before = _got(minhash_index_query(
        idx, ray.data.from_arrow(CORPUS), min_matches=8))
    empty = ray.data.from_arrow(CORPUS.slice(0, 0))
    out = append_to_minhash_index(idx, empty)
    assert out == {"appended_docs": 0, "n_docs": info["n_docs"]}
    after = _got(minhash_index_query(
        idx, ray.data.from_arrow(CORPUS), min_matches=8))
    assert after == before
    # the lock must have been released — a real append still works
    append_to_minhash_index(idx, ray.data.from_arrow(
        _docs([(99, "fresh doc after the idle cycle")])))


def test_unmanifested_files_invisible(tmp_path, ray_session):
    idx = str(tmp_path / "idx")
    build_minhash_index(ray.data.from_arrow(CORPUS), idx, buckets=8)
    before = _got(minhash_index_query(
        idx, ray.data.from_arrow(CORPUS), min_matches=8))
    # a crashed append leaves files no manifest names — readers skip them
    bdir = next(
        os.path.join(idx, d) for d in os.listdir(idx)
        if d.startswith("bucket=")
    )
    with open(os.path.join(bdir, "append-dead-0000.parquet"), "wb") as f:
        f.write(b"garbage")
    after = _got(minhash_index_query(
        idx, ray.data.from_arrow(CORPUS), min_matches=8))
    assert after == before


def test_mutators_are_single_writer(tmp_path, ray_session):
    from debezium_incubator_ray.functions.text import _index_write_lock

    idx = str(tmp_path / "idx")
    build_minhash_index(ray.data.from_arrow(CORPUS), idx, buckets=8)
    with _index_write_lock(idx):
        with pytest.raises(TextIndexLockedError):
            append_to_minhash_index(
                idx, ray.data.from_arrow(_docs([(99, "x y z")])))
        with pytest.raises(TextIndexLockedError):
            delete_from_minhash_index(idx, [0])


def test_tombstoned_docs_never_returned(tmp_path, ray_session):
    idx = str(tmp_path / "idx")
    build_minhash_index(ray.data.from_arrow(CORPUS), idx, buckets=8)
    delete_from_minhash_index(idx, [0, 4])
    res = minhash_index_query(idx, ray.data.from_arrow(CORPUS),
                              min_matches=6).to_pandas()
    assert not ({0, 4} & set(res["b"]))


def test_compact_then_vacuum(tmp_path, ray_session):
    """Compaction drops tombstoned docs' rows, fixes n_docs, empties the
    tombstone set; superseded bytes survive until vacuum; query results
    are IDENTICAL before and after compaction."""
    from debezium_incubator_ray.functions.simindex import (
        compact_minhash_index, vacuum_minhash_index,
    )
    from debezium_incubator_ray.functions.text import _read_stats

    idx = str(tmp_path / "idx")
    build_minhash_index(ray.data.from_arrow(CORPUS), idx, buckets=8)
    delete_from_minhash_index(idx, [0, 4])
    q = ray.data.from_arrow(CORPUS)
    before = _got(minhash_index_query(idx, q, min_matches=6))

    r = compact_minhash_index(idx)
    assert r["n_docs"] == _read_stats(idx)["n_docs"]
    assert _read_stats(idx)["tombstones"] == []
    after = _got(minhash_index_query(idx, q, min_matches=6))
    assert after == before
    assert not any(b in (0, 4) for _a, b, _m in after)

    # compaction left the old files for in-flight readers; vacuum reclaims
    v = vacuum_minhash_index(idx)
    assert v["removed_files"] > 0
    assert _got(minhash_index_query(idx, q, min_matches=6)) == after
    # idempotent
    assert vacuum_minhash_index(idx)["removed_files"] == 0
    assert compact_minhash_index(idx)["rewritten"] == 0
