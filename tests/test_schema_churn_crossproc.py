"""Cross-process schema churn under a live tail — the reference's
external-schema-registry model (CAS/SchemaProcessor.java:24-27: a timer
re-reads the schema source while the connector streams; the connector
itself owns its state writes).

Three laws:
1. a SECOND PROCESS evolves the schema through the binlog control
   channel (sources/binlog.py append_schema_changes) while tail()
   streams; the tail polls the channel every epoch and commits the
   change itself — both orderings (DDL before later events, DDL after
   all events) end in the exact expected state;
2. calling apply_schema_changes DIRECTLY from a second same-node process
   while the tail holds the writer lock is REJECTED
   (ConcurrentWriterError), and applies cleanly once the tail closes;
3. on an object-store control plane (where a second NODE's flock is
   invisible), a stale DDL writer racing the streaming engine loses the
   manifest conditional put and recovers by reload+replay
   (apply_schema_changes' ConcurrentCommitError loop) — both effects
   land, nothing is lost.
"""

import json
import os
import subprocess
import sys
import textwrap
import threading
import time

import numpy as np
import pyarrow as pa

from debezium_incubator_ray import gen
from debezium_incubator_ray import schema as S
from debezium_incubator_ray.config import EngineConfig
from debezium_incubator_ray.pipelines.cdc import CdcEngine
from debezium_incubator_ray.sources.binlog import append_schema_changes

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ADD_COL = {"change": "add_column", "column": "churn_col",
           "type": "int64", "default": 7, "at_lsn": 0}


def _spec(**kw):
    kw.setdefault("n_events", 600)
    kw.setdefault("n_initial", 100)
    kw.setdefault("seg_rows", 100)
    kw.setdefault("num_partitions", 4)
    kw.setdefault("seed", 5)
    return gen.BinlogSpec(**kw)


def _cfg(spec):
    return EngineConfig(num_partitions=spec.num_partitions,
                        target_rows_per_file=256, apply_concurrency=2)


def test_control_channel_churn_from_second_process_under_tail(tmp_path):
    """Law 1, ordering A (DDL lands while events still stream) and
    ordering B (a second DDL lands after the stream drains): the tail
    absorbs both without ever sharing the manifest writer role."""
    spec = _spec()
    ev = gen.gen_events(spec)
    binlog = str(tmp_path / "binlog")
    gen.write_binlog(binlog, spec, ev)
    # hold back half the segments: the producer (below) releases them
    # while the tail runs, so the DDL genuinely interleaves the stream
    held = []
    for p in range(spec.num_partitions):
        pdir = os.path.join(binlog, f"p={p}")
        segs = sorted(os.listdir(pdir))
        for s in segs[len(segs) // 2:]:
            src = os.path.join(pdir, s)
            dst = os.path.join(str(tmp_path), f"held-{p}-{s}")
            os.rename(src, dst)
            held.append((dst, src))

    lake = str(tmp_path / "lake")
    eng = CdcEngine(lake, _cfg(spec), payload_schema=S.pages_schema())
    eng.snapshot(gen.make_pages(spec.n_initial), snapshot_lsn=0)

    applied_ddl = threading.Event()

    def producer():
        # ordering A: a SECOND PROCESS appends the DDL to the control
        # channel mid-stream...
        subprocess.run(
            [sys.executable, "-c", textwrap.dedent("""
                import sys
                from debezium_incubator_ray.sources.binlog import (
                    append_schema_changes,
                )
                import json
                append_schema_changes(sys.argv[1], [json.loads(sys.argv[2])])
            """), binlog, json.dumps(ADD_COL)],
            check=True, env=dict(os.environ, PYTHONPATH=REPO),
        )
        applied_ddl.set()
        # ...then releases the held segments so post-DDL events stream
        for src, dst in held:
            os.rename(src, dst)

    stop = threading.Event()
    stats: list = []

    def run_tail():
        stats.extend(eng.tail(binlog, poll_interval_s=0.1,
                              idle_polls=None, stop=stop))

    t = threading.Thread(target=producer)
    tt = threading.Thread(target=run_tail)
    t.start()
    tt.start()
    try:
        t.join()
        n_segs = sum(
            1 for p in range(spec.num_partitions)
            for s in os.listdir(os.path.join(binlog, f"p={p}"))
            if s.endswith(".parquet")
        )
        deadline = time.time() + 60
        # stats fills only when tail() returns — watch the live manifest
        while len(eng.manifest.doc["segments_done"]) < n_segs:
            assert time.time() < deadline, eng.manifest.doc["segments_done"]
            time.sleep(0.1)
    finally:
        stop.set()
        tt.join(timeout=120)
    assert applied_ddl.is_set()
    assert sum(s.get("events", 0) for s in stats) == spec.n_events

    # the externally-appended column is in the active schema, defaulted
    lt = eng.lake_table()
    assert "churn_col" in lt.column_names
    assert set(lt["churn_col"].to_pylist()) == {7}
    want = gen.oracle_final_state(spec, ev)
    assert lt.num_rows == want.num_rows
    lt_s = lt.sort_by("url")
    for col in want.column_names:
        assert lt_s[col].combine_chunks().equals(
            want.sort_by("url")[col].combine_chunks()), col

    # ordering B: another external DDL lands AFTER the stream drained —
    # the next (heartbeat) epoch still picks it up
    append_schema_changes(binlog, [
        {"change": "add_column", "column": "churn_col2",
         "type": "string", "default": "x", "at_lsn": 0},
    ])
    eng.apply_epoch(binlog)
    lt2 = eng.lake_table()
    assert "churn_col2" in lt2.column_names
    assert set(lt2["churn_col2"].to_pylist()) == {"x"}
    # replaying the whole control file is a no-op (dedup by triple)
    v = eng.manifest.version
    eng.apply_epoch(binlog)
    assert len(eng.manifest.doc["schemas"]) == 3  # base + 2 churn commits
    assert eng.manifest.version >= v


_DDL_PROC = textwrap.dedent("""
    import sys
    from debezium_incubator_ray import schema as S
    from debezium_incubator_ray.pipelines.cdc import (
        CdcEngine, ConcurrentWriterError,
    )
    lake = sys.argv[1]
    eng = CdcEngine(lake)
    try:
        eng.apply_schema_changes([S.SchemaChange(
            "add_column", "proc_col", "int64", default=3, at_lsn=0)])
    except ConcurrentWriterError:
        print("REJECTED")
        sys.exit(0)
    eng.close()
    print("RAN")
""")


def test_direct_ddl_from_second_process_rejected_while_tail_live(tmp_path):
    """Law 2: the writer lock makes direct out-of-band DDL from a second
    same-node process impossible while the tail streams; after close it
    serializes cleanly and the column appears."""
    spec = _spec(n_events=300)
    ev = gen.gen_events(spec)
    binlog = str(tmp_path / "binlog")
    gen.write_binlog(binlog, spec, ev)
    lake = str(tmp_path / "lake")
    eng = CdcEngine(lake, _cfg(spec), payload_schema=S.pages_schema())
    eng.snapshot(gen.make_pages(spec.n_initial), snapshot_lsn=0)

    stop = threading.Event()
    results: list = []

    def run_tail():
        results.extend(eng.tail(binlog, poll_interval_s=0.1,
                                idle_polls=None, stop=stop))

    t = threading.Thread(target=run_tail)
    t.start()
    try:
        deadline = time.time() + 30
        # results only fills when tail() returns; watch the live manifest
        while not eng.manifest.doc.get("segments_done"):
            assert time.time() < deadline
            time.sleep(0.05)
        env = dict(os.environ, PYTHONPATH=REPO, RAY_ADDRESS="local")
        r = subprocess.run([sys.executable, "-c", _DDL_PROC, lake],
                           capture_output=True, text=True, env=env,
                           timeout=300)
        assert r.returncode == 0, r.stderr[-2000:]
        assert r.stdout.strip().splitlines()[-1] == "REJECTED"
    finally:
        stop.set()
        t.join(timeout=120)
    eng.close()  # release the lock: now the second process serializes
    r = subprocess.run([sys.executable, "-c", _DDL_PROC, lake],
                       capture_output=True, text=True,
                       env=dict(os.environ, PYTHONPATH=REPO,
                                RAY_ADDRESS="local"),
                       timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert r.stdout.strip().splitlines()[-1] == "RAN"
    eng2 = CdcEngine(lake)
    assert "proc_col" in eng2.lake_table().column_names


def test_stale_ddl_writer_loses_conditional_put_and_replays(tmp_path):
    """Law 3: object-store control plane, simulated second NODE (its
    flock is invisible — monkeypatched away). The streaming engine
    commits an epoch first; the DDL writer, holding a STALE manifest,
    loses the conditional put and must reload+replay — after which BOTH
    the epoch's effects and the schema change are present, serialized,
    nothing lost."""
    from debezium_incubator_ray.state.store import ObjectStoreStore
    from tests.test_objectstore import FakeObjectStore

    client = FakeObjectStore()
    spec = _spec(n_events=200, n_initial=40, num_partitions=2)
    ev = gen.gen_events(spec)
    binlog = str(tmp_path / "binlog")
    gen.write_binlog(binlog, spec, ev)
    lake = str(tmp_path / "lake")

    eng = CdcEngine(lake, _cfg(spec), payload_schema=S.pages_schema(),
                    manifest_store=ObjectStoreStore(client))
    eng.snapshot(gen.make_pages(spec.n_initial), snapshot_lsn=0)

    # "second node": same store, no visible flock
    ddl_eng = CdcEngine(lake, manifest_store=ObjectStoreStore(client))
    ddl_eng._acquire_lock = lambda: None  # its node cannot see eng's lock
    stale_version = ddl_eng.manifest.version

    # the streaming engine advances first -> ddl_eng's manifest is stale
    stats = eng.run(binlog)
    assert sum(s.get("events", 0) for s in stats) == spec.n_events
    assert eng.manifest.version > stale_version

    upd = ddl_eng.apply_schema_changes([S.SchemaChange(
        "add_column", "node2_col", "int64", default=9, at_lsn=0)])
    assert upd is not None
    # serialized: the DDL landed ON TOP of the winner's epoch commits
    assert ddl_eng.manifest.version > eng.manifest.version
    final = CdcEngine(lake, manifest_store=ObjectStoreStore(client))
    lt = final.lake_table()
    assert "node2_col" in lt.column_names
    assert set(lt["node2_col"].to_pylist()) == {9}
    want = gen.oracle_final_state(spec, ev)
    assert lt.num_rows == want.num_rows  # the epoch's effects survived


def test_append_schema_changes_concurrent_no_lost_update(tmp_path):
    """The control-channel append serializes its read-modify-write:
    N concurrent appenders (threads — same flock semantics as
    processes) each land exactly one entry, none lost."""
    binlog = str(tmp_path / "binlog")
    os.makedirs(binlog)
    n = 16
    errs = []

    def worker(k):
        try:
            append_schema_changes(binlog, [
                {"change": "add_column", "column": f"c{k}",
                 "type": "int32", "default": k, "at_lsn": 0},
            ])
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    ts = [threading.Thread(target=worker, args=(k,)) for k in range(n)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    with open(os.path.join(binlog, "_schema_changes.json")) as f:
        entries = json.load(f)
    assert sorted(e["column"] for e in entries) == sorted(
        f"c{k}" for k in range(n))


def test_idempotent_ddl_replay_is_noop_even_while_tail_holds_lock(tmp_path):
    """Re-running ALREADY-APPLIED DDL must return None without touching
    the writer lock — a second process's idempotent retry cannot fail
    just because a tail is streaming."""
    from debezium_incubator_ray.pipelines.cdc import ConcurrentWriterError

    spec = _spec(n_events=100)
    ev = gen.gen_events(spec)
    binlog = str(tmp_path / "binlog")
    gen.write_binlog(binlog, spec, ev)
    lake = str(tmp_path / "lake")
    eng = CdcEngine(lake, _cfg(spec), payload_schema=S.pages_schema())
    eng.snapshot(gen.make_pages(spec.n_initial), snapshot_lsn=0)
    eng.run(binlog)
    ch = S.SchemaChange("add_column", "idem_col", "int64", default=1,
                        at_lsn=0)
    assert eng.apply_schema_changes([ch]) is not None  # applied, lock held

    eng2 = CdcEngine(lake)  # second engine: fresh manifest, no lock yet
    # fresh DDL from the second engine IS rejected (eng holds the lock)…
    import pytest as _pytest
    with _pytest.raises(ConcurrentWriterError):
        eng2.apply_schema_changes([S.SchemaChange(
            "add_column", "fresh_col", "int64", default=2, at_lsn=0)])
    # …but replaying the already-applied change is a clean no-op
    assert eng2.apply_schema_changes([ch]) is None
    eng.close()
