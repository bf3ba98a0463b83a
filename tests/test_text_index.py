"""Laws of the persisted BM25 inverted index (functions/text.py
build_text_index / text_index_topk) — the text sibling of the
persisted-IVF-index laws in test_ann_scale.py."""

import os
import shutil

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from debezium_incubator_ray.functions.text import (
    bm25_topk, build_text_index, text_index_topk,
)
from debezium_incubator_ray.functions.tokens import md5_u64

SF = "/root/testdata/sf0.001"
TERMS = ("join", "vector", "stream")


def _docs():
    return ray.data.read_parquet(
        os.path.join(SF, "documents.parquet"),
        columns=["doc_id", "text"],
    )


def _mem_table(res):
    if isinstance(res, pa.Table):
        return res
    return pa.concat_tables(list(res.iter_batches(batch_format="pyarrow")))


def test_index_search_equals_in_memory(ray_session, tmp_path):
    """Pruned search through the persisted index ranks EXACTLY like the
    in-memory bm25_topk — same docs, same rounded scores, same order."""
    idx = str(tmp_path / "tix")
    info = build_text_index(_docs(), idx, buckets=32)
    assert info["n_docs"] == 500
    got = text_index_topk(idx, TERMS, k=20)
    want = _mem_table(bm25_topk(_docs(), TERMS, k=20))
    assert got["doc_id"].to_pylist() == want["doc_id"].to_pylist()
    assert got["score"].to_pylist() == want["score"].to_pylist()


def test_index_pruning_reads_only_needed_buckets(ray_session, tmp_path):
    """Corrupting every bucket the query does NOT hash to leaves the
    search untouched; corrupting a needed bucket breaks it — proof the
    reader opens exactly the needed partitions."""
    idx = str(tmp_path / "tix")
    build_text_index(_docs(), idx, buckets=32)
    baseline = text_index_topk(idx, TERMS, k=20)

    needed = {int(h % np.uint64(32))
              for h in md5_u64(pa.array(list(TERMS)))}
    all_buckets = {
        int(d.split("=")[1]) for d in os.listdir(idx)
        if d.startswith("bucket=")
    }
    assert needed < all_buckets  # strict subset — pruning is non-trivial

    for bb in all_buckets - needed:
        for f in os.listdir(os.path.join(idx, f"bucket={bb}")):
            with open(os.path.join(idx, f"bucket={bb}", f), "wb") as fh:
                fh.write(b"garbage")  # unreadable as parquet
    again = text_index_topk(idx, TERMS, k=20)
    assert again["doc_id"].to_pylist() == baseline["doc_id"].to_pylist()
    assert again["score"].to_pylist() == baseline["score"].to_pylist()

    bb = sorted(needed)[0]
    for f in os.listdir(os.path.join(idx, f"bucket={bb}")):
        with open(os.path.join(idx, f"bucket={bb}", f), "wb") as fh:
            fh.write(b"garbage")
    with pytest.raises(Exception):
        text_index_topk(idx, TERMS, k=20)


def test_index_rebuild_is_atomic_and_stable(ray_session, tmp_path):
    """Rebuilding over a live index atomically replaces it (no .tmp
    residue, stats consistent) and reproduces the identical ranking."""
    idx = str(tmp_path / "tix")
    build_text_index(_docs(), idx, buckets=32)
    first = text_index_topk(idx, TERMS, k=20)
    build_text_index(_docs(), idx, buckets=32)  # rebuild over live
    second = text_index_topk(idx, TERMS, k=20)
    assert first.equals(second)
    parent = os.path.dirname(idx)
    assert not [d for d in os.listdir(parent) if ".tmp" in d]
    assert os.path.exists(os.path.join(idx, "_STATS.json"))


def test_index_empty_and_miss_terms(ray_session, tmp_path):
    """Query terms absent from the corpus (or hashing to missing
    buckets) return an empty result, not an error."""
    idx = str(tmp_path / "tix")
    build_text_index(_docs(), idx, buckets=32)
    out = text_index_topk(idx, ("zzqqxx_not_a_token",), k=5)
    assert out.num_rows == 0
    assert out.column_names == ["doc_id", "score"]


def test_index_append_empty_delta_is_noop(ray_session, tmp_path):
    """An idle incremental cycle (zero new docs) is a committed no-op:
    no crash, stats untouched, identical ranking, lock released."""
    from debezium_incubator_ray.functions.text import (
        append_to_text_index,
    )

    idx = str(tmp_path / "tix")
    build_text_index(_docs(), idx, buckets=32)
    before = text_index_topk(idx, TERMS, k=20)
    empty = _docs().filter(lambda r: False)
    out = append_to_text_index(idx, empty)
    assert out == {"appended_docs": 0, "n_docs": 500}
    assert text_index_topk(idx, TERMS, k=20).equals(before)
    # lock released — a real append still works afterwards
    append_to_text_index(
        idx, ray.data.from_arrow(pa.table({
            "doc_id": pa.array([100000], pa.int64()),
            "text": ["fresh doc after the idle cycle"],
        })))


def test_index_append_matches_full_rebuild(ray_session, tmp_path):
    """The lake commit protocol on the index: append half the corpus to
    an index built from the other half — the final ranking equals a
    full-corpus rebuild; and BEFORE the manifest swap, staged posting
    files are invisible (a reader sees the old view byte-identical)."""
    import json

    docs = _docs()
    half_a = docs.filter(lambda r: r["doc_id"] % 2 == 0)
    half_b = docs.filter(lambda r: r["doc_id"] % 2 == 1)

    from debezium_incubator_ray.functions.text import (
        append_to_text_index,
    )

    idx = str(tmp_path / "tix")
    build_text_index(half_a, idx, buckets=32)
    before = text_index_topk(idx, TERMS, k=20)

    # crash-sim: drop un-manifested posting files into a needed bucket —
    # the reader must not open them
    needed = sorted({int(h % np.uint64(32))
                     for h in md5_u64(pa.array(list(TERMS)))})
    bdir = os.path.join(idx, f"bucket={needed[0]}")
    with open(os.path.join(bdir, "append-orphan-0000.parquet"),
              "wb") as fh:
        fh.write(b"not parquet at all")
    unchanged = text_index_topk(idx, TERMS, k=20)
    assert unchanged.equals(before)
    os.remove(os.path.join(bdir, "append-orphan-0000.parquet"))

    info = append_to_text_index(idx, half_b)
    assert info["n_docs"] == 500
    with open(os.path.join(idx, "_STATS.json")) as f:
        st = json.load(f)
    assert st["n_docs"] == 500

    full = str(tmp_path / "tix-full")
    build_text_index(docs, full, buckets=32)
    got = text_index_topk(idx, TERMS, k=20)
    want = text_index_topk(full, TERMS, k=20)
    assert got["doc_id"].to_pylist() == want["doc_id"].to_pylist()
    assert got["score"].to_pylist() == want["score"].to_pylist()


def test_index_delete_and_compact(ray_session, tmp_path):
    """Tombstoned docs vanish from search immediately; compaction
    rewrites them away (per-bucket Ray tasks), recomputes the BM25
    globals from survivors, and the compacted index ranks EXACTLY
    like a fresh build over the surviving corpus. The documented
    update contract (delete -> compact -> append) converges to the
    rebuild of the final corpus."""
    import json

    from debezium_incubator_ray.functions.text import (
        append_to_text_index, compact_text_index,
        delete_from_text_index,
    )

    docs = _docs()
    idx = str(tmp_path / "tix")
    build_text_index(docs, idx, buckets=32)
    base = text_index_topk(idx, TERMS, k=20)
    victims = base["doc_id"].to_pylist()[:3]

    delete_from_text_index(idx, victims)
    hidden = text_index_topk(idx, TERMS, k=20)
    assert not set(victims) & set(hidden["doc_id"].to_pylist())

    info = compact_text_index(idx)
    assert info["n_docs"] == 500 - len(victims)
    with open(os.path.join(idx, "_STATS.json")) as f:
        st = json.load(f)
    assert st["tombstones"] == []
    after = text_index_topk(idx, TERMS, k=20)

    survivors = docs.filter(
        lambda r, v=set(victims): r["doc_id"] not in v
    )
    ref = str(tmp_path / "tix-ref")
    build_text_index(survivors, ref, buckets=32)
    want = text_index_topk(ref, TERMS, k=20)
    assert after["doc_id"].to_pylist() == want["doc_id"].to_pylist()
    assert after["score"].to_pylist() == want["score"].to_pylist()

    # update contract: re-add the victims (post-compact) == full corpus
    victims_ds = docs.filter(
        lambda r, v=set(victims): r["doc_id"] in v
    )
    append_to_text_index(idx, victims_ds)
    full = str(tmp_path / "tix-full")
    build_text_index(docs, full, buckets=32)
    got = text_index_topk(idx, TERMS, k=20)
    want2 = text_index_topk(full, TERMS, k=20)
    assert got["doc_id"].to_pylist() == want2["doc_id"].to_pylist()
    assert got["score"].to_pylist() == want2["score"].to_pylist()


def test_index_tombstones_survive_append_and_lock_excludes(
    ray_session, tmp_path
):
    """A delete committed before an append stays in force after it
    (tombstones carry forward through the append's manifest swap);
    concurrent mutators are excluded loudly by the writer lock; and
    vacuum removes exactly the un-manifested files."""
    import pytest as _pytest

    from debezium_incubator_ray.functions.text import (
        TextIndexLockedError, append_to_text_index,
        compact_text_index, delete_from_text_index, vacuum_text_index,
    )

    docs = _docs()
    half_a = docs.filter(lambda r: r["doc_id"] % 2 == 0)
    half_b = docs.filter(lambda r: r["doc_id"] % 2 == 1)
    idx = str(tmp_path / "tix")
    build_text_index(half_a, idx, buckets=32)
    base = text_index_topk(idx, TERMS, k=20)
    victim = base["doc_id"].to_pylist()[0]

    delete_from_text_index(idx, [victim])
    append_to_text_index(idx, half_b)
    after = text_index_topk(idx, TERMS, k=20)
    assert victim not in after["doc_id"].to_pylist()  # NOT resurrected

    # single-writer lock: a held lock makes any mutator raise
    with open(os.path.join(idx, "_LOCK"), "w") as fh:
        fh.write("999999")
    with _pytest.raises(TextIndexLockedError):
        delete_from_text_index(idx, [1])
    os.remove(os.path.join(idx, "_LOCK"))

    # compact leaves old bytes for in-flight readers; vacuum reclaims
    # exactly the un-manifested files and does NOT change results
    # (compaction itself legitimately shifts scores — it updates the
    # BM25 globals the tombstones had been drifting)
    compact_text_index(idx)
    after_compact = text_index_topk(idx, TERMS, k=20)
    n_files_all = sum(
        len([f for f in os.listdir(os.path.join(idx, d))
             if f.endswith(".parquet")])
        for d in os.listdir(idx) if d.startswith("bucket=")
    )
    info = vacuum_text_index(idx)
    assert info["removed_files"] > 0
    n_files_live = sum(
        len([f for f in os.listdir(os.path.join(idx, d))
             if f.endswith(".parquet")])
        for d in os.listdir(idx) if d.startswith("bucket=")
    )
    assert n_files_live == n_files_all - info["removed_files"]
    assert text_index_topk(idx, TERMS, k=20).equals(after_compact)
