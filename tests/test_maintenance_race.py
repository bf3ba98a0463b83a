"""Maintenance vs writer race: the double-writer law
(CAS/FileOffsetWriterTest.java:38-125) extended to the maintenance
surface — compact()/vacuum() from a SECOND engine process racing a live
writer must be rejected by the writer lock; once the writer releases,
maintenance serializes cleanly and the lake stays byte-equal to a serial
(never-maintained) twin."""

import os
import subprocess
import sys
import textwrap

import numpy as np

from debezium_incubator_ray import gen
from debezium_incubator_ray import schema as S
from debezium_incubator_ray.config import EngineConfig
from debezium_incubator_ray.pipelines.cdc import CdcEngine

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_MAINT = textwrap.dedent("""
    import sys
    from debezium_incubator_ray.pipelines.cdc import (
        CdcEngine, ConcurrentWriterError,
    )
    lake, op = sys.argv[1], sys.argv[2]
    eng = CdcEngine(lake)
    try:
        getattr(eng, op)()
    except ConcurrentWriterError:
        print("REJECTED")
        sys.exit(0)
    eng.close()
    print("RAN")
""")


def _maint(lake: str, op: str, timeout=300) -> str:
    env = dict(os.environ, PYTHONPATH=REPO, RAY_ADDRESS="local")
    r = subprocess.run(
        [sys.executable, "-c", _MAINT, lake, op],
        capture_output=True, text=True, timeout=timeout, env=env, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    return r.stdout.strip().splitlines()[-1]


def _ev(url_id, base_lsn):
    n = len(url_id)
    return {
        "op": np.full(n, "c", dtype="U1"),
        "url_id": np.asarray(url_id, dtype=np.int64),
        "lsn": base_lsn + 1 + np.arange(n, dtype=np.int64),
        "prev_lsn": np.full(n, -1, dtype=np.int64),
    }


def _cfg():
    # tiny runs so every epoch splits files and compaction has real work
    return EngineConfig(num_partitions=2, target_rows_per_file=64)


def test_maintenance_rejected_while_writer_live_then_serializes(tmp_path):
    rng = np.random.default_rng(3)
    ids = np.arange(400, dtype=np.int64)
    ev1 = _ev(ids, 0)
    ev2 = _ev(ids[rng.integers(0, len(ids), 300)], len(ids))
    spec1 = gen.BinlogSpec(n_events=len(ev1["lsn"]), n_initial=0,
                           num_partitions=2, seg_rows=64, emit_before=False)
    spec2 = gen.BinlogSpec(n_events=len(ev2["lsn"]), n_initial=0,
                           num_partitions=2, seg_rows=64, emit_before=False,
                           base_lsn=len(ids))
    b1, b2 = str(tmp_path / "b1"), str(tmp_path / "b2")
    gen.write_binlog(b1, spec1, ev1)
    gen.write_binlog(b2, spec2, ev2)

    lake = str(tmp_path / "lake")
    eng = CdcEngine(lake, _cfg(), payload_schema=S.pages_schema())
    eng.run(b1)  # writer lock now held by this process

    # the double-writer law, maintenance surface: both ops rejected
    assert _maint(lake, "compact") == "REJECTED"
    assert _maint(lake, "vacuum") == "REJECTED"

    before = eng.lake_table().sort_by([("url", "ascending")])
    eng.close()  # release -> maintenance may now run

    assert _maint(lake, "compact") == "RAN"

    # compaction is state-preserving, and the lock is free again for the
    # writer: reopen, apply epoch 2, compare against a serial twin that
    # never compacted
    eng = CdcEngine(lake)
    mid = eng.lake_table().sort_by([("url", "ascending")])
    assert mid.equals(before), "compaction changed lake state"
    eng.run(b2)
    final = eng.lake_table().sort_by([("url", "ascending")])
    eng.close()

    twin_dir = str(tmp_path / "twin")
    twin = CdcEngine(twin_dir, _cfg(), payload_schema=S.pages_schema())
    twin.run(b1)
    twin.run(b2)
    assert final.equals(twin.lake_table().sort_by([("url", "ascending")]))
    twin.close()

    # vacuum also serializes cleanly after release and preserves state
    assert _maint(lake, "vacuum") == "RAN"
    eng = CdcEngine(lake)
    assert final.equals(eng.lake_table().sort_by([("url", "ascending")]))
    eng.close()


def test_writer_rejected_while_maintenance_live(tmp_path):
    """The mirror image: while a maintenance process holds the lock, a
    writer's mutation entry points are rejected."""
    ids = np.arange(300, dtype=np.int64)
    spec = gen.BinlogSpec(n_events=len(ids), n_initial=0, num_partitions=2,
                          seg_rows=64, emit_before=False)
    b1 = str(tmp_path / "b1")
    gen.write_binlog(b1, spec, _ev(ids, 0))
    lake = str(tmp_path / "lake")
    eng = CdcEngine(lake, _cfg(), payload_schema=S.pages_schema())
    eng.run(b1)
    eng.close()

    import fcntl

    import pytest

    from debezium_incubator_ray.pipelines.cdc import ConcurrentWriterError

    # simulate the maintenance process holding the lock
    fd = os.open(os.path.join(lake, "_manifest", "LOCK"),
                 os.O_CREAT | os.O_RDWR, 0o644)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
        eng2 = CdcEngine(lake)
        with pytest.raises(ConcurrentWriterError):
            eng2.compact()
        with pytest.raises(ConcurrentWriterError):
            eng2.run(b1)
    finally:
        os.close(fd)
