"""Object-store manifest backend: conditional-put-then-pointer-swap law.

The reference enforces single-writer offset stores with an exclusive file
lock (CAS/FileOffsetWriter.java:60-76; FileOffsetWriterTest.java:38-125
proves a second writer cannot acquire the store). Object stores have no
locks, so the law becomes: a racing second writer is REJECTED at the
conditional put (ConcurrentCommitError), never silently last-write-wins;
and a writer whose put LANDED but whose response was lost can retry
idempotently."""

import json

import pytest

from debezium_incubator_ray.state.manifest import Manifest
from debezium_incubator_ray.state.store import (
    ConcurrentCommitError,
    FakeObjectStore,
    ObjectStoreStore,
)


def _mk(tmp_path, client):
    return Manifest.create(
        str(tmp_path / "lake"), "pages", "url", 4, schema_b64="c2NoZW1h",
        store=ObjectStoreStore(client),
    )


def test_create_commit_load_roundtrip(tmp_path):
    client = FakeObjectStore()
    m = _mk(tmp_path, client)
    m2 = m.commit({0: {"watermark": 10, "files": [{"path": "f0", "rows": 1}]}})
    m3 = m2.commit({1: {"watermark": 5}})
    assert m3.version == 2
    loaded = Manifest.load(str(tmp_path / "lake"), store=ObjectStoreStore(client))
    assert loaded.version == 2
    assert loaded.watermark(0) == 10 and loaded.watermark(1) == 5
    assert loaded.versions() == [0, 1, 2]
    assert Manifest.exists(str(tmp_path / "lake"), store=ObjectStoreStore(client))


def test_double_writer_race_rejected(tmp_path):
    """Two writers load the same version and both commit: exactly one
    publishes; the loser gets ConcurrentCommitError at the version-doc
    put and the winner's update is never overwritten."""
    client = FakeObjectStore()
    _mk(tmp_path, client)
    a = Manifest.load(str(tmp_path / "lake"), store=ObjectStoreStore(client))
    b = Manifest.load(str(tmp_path / "lake"), store=ObjectStoreStore(client))

    a.commit({0: {"watermark": 100}})
    with pytest.raises(ConcurrentCommitError):
        b.commit({0: {"watermark": 999}})

    cur = Manifest.load(str(tmp_path / "lake"), store=ObjectStoreStore(client))
    assert cur.version == 1
    assert cur.watermark(0) == 100  # the lost update never landed
    # exactly one v1 document exists, and it is the winner's
    assert json.loads(client.get("v1.json")[1])["partitions"]["0"]["watermark"] == 100


def test_stale_pointer_swap_rejected(tmp_path):
    """Even with distinct version numbers, a writer holding a stale
    CURRENT etag cannot swap the pointer (CAS failure -> conflict)."""
    client = FakeObjectStore()
    m = _mk(tmp_path, client)
    stale = ObjectStoreStore(client)
    stale.read("CURRENT")  # observe etag at v0
    # another writer advances CURRENT twice
    m.commit({0: {"watermark": 1}}).commit({0: {"watermark": 2}})
    # the stale holder tries to publish a DIFFERENT pointer value
    with pytest.raises(ConcurrentCommitError):
        stale.write_atomic("CURRENT", "9")


def test_lost_response_on_version_doc_absorbed(tmp_path):
    """The v-doc put LANDS but the response is lost: the store's
    read-back recognizes its own content and the publish completes
    transparently — no duplicate version, no error to the caller."""
    client = FakeObjectStore()
    m = _mk(tmp_path, client)
    m.doc["version"] += 1
    m.doc["partitions"]["0"]["watermark"] = 42
    client.fail_response_after_puts = 1  # the v1.json put lands, response lost
    m._write()
    got = Manifest.load(str(tmp_path / "lake"), store=ObjectStoreStore(client))
    assert got.version == 1 and got.watermark(0) == 42


def test_lost_response_on_pointer_swap_absorbed(tmp_path):
    client = FakeObjectStore()
    m = _mk(tmp_path, client)
    m.doc["version"] += 1
    client.fail_response_after_puts = 2  # put 1 = v1.json OK; put 2 = CURRENT lands, response lost
    m._write()
    got = Manifest.load(str(tmp_path / "lake"), store=ObjectStoreStore(client))
    assert got.version == 1
    # and a FOLLOW-UP commit from the same writer still swaps cleanly
    # (its cached etag was refreshed by the read-back)
    m.doc["version"] += 1
    m._write()
    assert Manifest.load(str(tmp_path / "lake"),
                         store=ObjectStoreStore(client)).version == 2


def test_clean_failure_before_put_leaves_previous_version_current(tmp_path):
    """A network failure BEFORE the version doc lands must leave the old
    CURRENT fully intact (crash-anywhere safety of the publish order)."""
    client = FakeObjectStore()
    m = _mk(tmp_path, client)
    m.commit({0: {"watermark": 7}})
    m.doc["version"] += 1
    client.fail_before_puts = 1
    with pytest.raises(TimeoutError):
        m._write()
    got = Manifest.load(str(tmp_path / "lake"), store=ObjectStoreStore(client))
    assert got.version == 1 and got.watermark(0) == 7
    assert "v2.json" not in client.list_prefix("")


def test_loser_reloads_and_replays(tmp_path):
    """The documented recovery: after ConcurrentCommitError the loser
    reloads CURRENT and replays its epoch on top of the winner's state."""
    client = FakeObjectStore()
    _mk(tmp_path, client)
    a = Manifest.load(str(tmp_path / "lake"), store=ObjectStoreStore(client))
    b = Manifest.load(str(tmp_path / "lake"), store=ObjectStoreStore(client))
    a.commit({0: {"watermark": 100}}, segments_done=["s1"])
    with pytest.raises(ConcurrentCommitError):
        b.commit({1: {"watermark": 50}}, segments_done=["s2"])
    b2 = Manifest.load(str(tmp_path / "lake"), store=ObjectStoreStore(client))
    b3 = b2.commit({1: {"watermark": 50}}, segments_done=["s2"])
    assert b3.version == 2
    got = Manifest.load(str(tmp_path / "lake"), store=ObjectStoreStore(client))
    assert got.watermark(0) == 100 and got.watermark(1) == 50
    assert set(got.doc["segments_done"]) == {"s1", "s2"}


def test_engine_end_to_end_on_object_store(tmp_path, ray_session):
    """Full CDC drive with the control plane on the object-store backend:
    snapshot -> stream -> oracle equality -> replay no-op -> reopen from
    the store; and a second engine instance racing a commit is rejected."""
    from debezium_incubator_ray import gen
    from debezium_incubator_ray import schema as S
    from debezium_incubator_ray.config import EngineConfig
    from debezium_incubator_ray.pipelines.cdc import CdcEngine

    client = FakeObjectStore()
    spec = gen.BinlogSpec(n_events=600, n_initial=80, num_partitions=4,
                          seed=11)
    ev = gen.gen_events(spec)
    binlog = str(tmp_path / "binlog")
    gen.write_binlog(binlog, spec, ev)
    lake = str(tmp_path / "lake")

    eng = CdcEngine(lake, EngineConfig(num_partitions=4,
                                       target_rows_per_file=64,
                                       apply_concurrency=2),
                    payload_schema=S.pages_schema(),
                    manifest_store=ObjectStoreStore(client))
    eng.snapshot(gen.make_pages(spec.n_initial), snapshot_lsn=0)
    stats = eng.run(binlog)
    assert sum(s["events"] for s in stats) == spec.n_events
    lt = eng.lake_table().sort_by("url")
    want = gen.oracle_final_state(spec, ev)
    assert lt.num_rows == want.num_rows
    for col in want.column_names:
        assert lt[col].to_pylist() == want[col].to_pylist(), col

    # replay is a no-op and reopen resumes purely from the object store
    assert sum(s["events"] for s in eng.run(binlog)) == 0
    eng2 = CdcEngine(lake, manifest_store=ObjectStoreStore(client))
    assert eng2.manifest.version == eng.manifest.version
    assert eng2.lake_table().num_rows == want.num_rows

    # double-writer at the engine level: eng2 (same CURRENT) committed
    # behind eng's back -> eng's next publish is rejected, not lost
    eng2.manifest = eng2.manifest.commit({0: {"watermark": 10**9}})
    with pytest.raises(ConcurrentCommitError):
        eng.manifest.commit({1: {"watermark": 10**9}})


def test_many_threads_one_winner_per_version(tmp_path):
    """N threads committing concurrently against one object store: every
    version number gets exactly ONE winner, losers always see
    ConcurrentCommitError (never silent loss), and replay-on-conflict
    serializes all N updates."""
    import threading

    client = FakeObjectStore()
    _mk(tmp_path, client)
    lake = str(tmp_path / "lake")
    n_threads, per_thread = 8, 5
    conflicts = []
    lock = threading.Lock()

    def worker(tid):
        for i in range(per_thread):
            while True:
                m = Manifest.load(lake, store=ObjectStoreStore(client))
                try:
                    m.commit({tid % 4: {"watermark": tid * 1000 + i}},
                             segments_done=[f"s-{tid}-{i}"])
                    break
                except ConcurrentCommitError:
                    with lock:
                        conflicts.append(tid)
                    continue  # reload and replay — the documented recovery

    threads = [threading.Thread(target=worker, args=(t,))
               for t in range(n_threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)

    final = Manifest.load(lake, store=ObjectStoreStore(client))
    # all 40 updates serialized: every segment recorded exactly once
    want = {f"s-{t}-{i}" for t in range(n_threads) for i in range(per_thread)}
    assert set(final.doc["segments_done"]) == want
    assert final.version == n_threads * per_thread
    # every version doc v1..v40 exists and is unique by construction
    assert len([n for n in client.list_prefix("") if n.startswith("v")]) \
        == n_threads * per_thread + 1
