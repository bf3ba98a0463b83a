"""Processed-segment relocation (CommitLogTransfer parity) + health check."""

import glob
import os

import pyarrow.parquet as pq
import pytest

from debezium_incubator_ray import gen
from debezium_incubator_ray import schema as S
from debezium_incubator_ray.config import EngineConfig
from debezium_incubator_ray.pipelines.cdc import CdcEngine

from tests.conftest import assert_tables_equal


def _spec(**kw):
    kw.setdefault("n_events", 400)
    kw.setdefault("n_initial", 80)
    kw.setdefault("seg_rows", 100)
    kw.setdefault("num_partitions", 4)
    kw.setdefault("seed", 11)
    return gen.BinlogSpec(**kw)


def _cfg(spec, **kw):
    kw.setdefault("num_partitions", spec.num_partitions)
    kw.setdefault("target_rows_per_file", 64)
    kw.setdefault("apply_concurrency", 2)
    return EngineConfig(**kw)


def test_archive_transfer_moves_done_segments(tmp_path):
    spec = _spec()
    ev = gen.gen_events(spec)
    binlog = str(tmp_path / "binlog")
    gen.write_binlog(binlog, spec, ev)
    lake = str(tmp_path / "lake")
    eng = CdcEngine(
        lake, _cfg(spec, segment_transfer="archive"),
        payload_schema=S.pages_schema(),
    )
    eng.snapshot(gen.make_pages(spec.n_initial))
    eng.run(binlog)
    # every segment left the live layout and landed under _relocation/archive
    live = glob.glob(os.path.join(binlog, "p=*", "*.parquet"))
    assert live == []
    archived = glob.glob(
        os.path.join(binlog, "_relocation", "archive", "p=*", "*.parquet")
    )
    assert len(archived) > 0
    # final state is still the oracle state
    assert_tables_equal(
        eng.lake_table(), gen.oracle_final_state(spec, ev), sort_by="url"
    )
    # a fresh epoch over the emptied dir is a heartbeat, and the archived
    # files are NOT re-listed as new segments
    st = eng.apply_epoch(binlog)
    assert st["segments"] == 0 and st["events"] == 0


def test_delete_transfer_and_error_relocation(tmp_path):
    spec = _spec()
    ev = gen.gen_events(spec)
    binlog = str(tmp_path / "binlog")
    gen.write_binlog(binlog, spec, ev)
    # corrupt one segment -> quarantine -> error folder (archive mode)
    segs = sorted(glob.glob(os.path.join(binlog, "p=*", "*.parquet")))
    with open(segs[0], "wb") as f:
        f.write(b"not a parquet file")
    lake = str(tmp_path / "lake")
    eng = CdcEngine(
        lake,
        _cfg(spec, segment_transfer="archive", aligned_binlog="never"),
        payload_schema=S.pages_schema(),
    )
    eng.snapshot(gen.make_pages(spec.n_initial))
    stats = eng.run(binlog)
    assert sum(s.get("quarantined", 0) for s in stats) == 1
    err = glob.glob(
        os.path.join(binlog, "_relocation", "error", "p=*", "*.parquet")
    )
    assert len(err) == 1
    assert not os.path.exists(segs[0])

    # delete mode: a second lake over a fresh copy leaves nothing behind
    binlog2 = str(tmp_path / "binlog2")
    gen.write_binlog(binlog2, spec, ev)
    lake2 = str(tmp_path / "lake2")
    eng2 = CdcEngine(
        lake2, _cfg(spec, segment_transfer="delete"),
        payload_schema=S.pages_schema(),
    )
    eng2.snapshot(gen.make_pages(spec.n_initial))
    eng2.run(binlog2)
    assert glob.glob(os.path.join(binlog2, "p=*", "*.parquet")) == []
    assert not os.path.isdir(os.path.join(binlog2, "_relocation"))
    assert_tables_equal(
        eng2.lake_table(), gen.oracle_final_state(spec, ev), sort_by="url"
    )


def test_transfer_only_after_flush_recorded(tmp_path):
    """The manifest that persisted must already list the moved segments —
    a reopened engine sees them done and never looks for the files."""
    spec = _spec()
    ev = gen.gen_events(spec)
    binlog = str(tmp_path / "binlog")
    gen.write_binlog(binlog, spec, ev)
    lake = str(tmp_path / "lake")
    eng = CdcEngine(
        lake,
        _cfg(spec, segment_transfer="archive", offset_flush="periodic",
             offset_flush_interval_s=9999.0, offset_flush_max_events=10**9),
        payload_schema=S.pages_schema(),
    )
    eng.snapshot(gen.make_pages(spec.n_initial))
    eng.run(binlog)
    # periodic policy would have deferred the flush; transfer forced it
    reopened = CdcEngine(lake)
    moved = glob.glob(
        os.path.join(binlog, "_relocation", "archive", "p=*", "*.parquet")
    )
    done = set(reopened.manifest.doc["segments_done"])
    assert len(moved) > 0
    for f in moved:
        rel = os.path.relpath(
            f, os.path.join(binlog, "_relocation", "archive")
        )
        assert rel in done


def test_health_reports_checks(tmp_path):
    spec = _spec(n_events=200)
    ev = gen.gen_events(spec)
    binlog = str(tmp_path / "binlog")
    gen.write_binlog(binlog, spec, ev)
    lake = str(tmp_path / "lake")
    eng = CdcEngine(lake, _cfg(spec), payload_schema=S.pages_schema())
    h0 = eng.health()
    assert h0["healthy"] and not h0["checks"]["snapshot-complete"]
    eng.snapshot(gen.make_pages(spec.n_initial))
    eng.run(binlog)
    h = eng.health()
    assert h["healthy"] and h["checks"] == {
        "manifest-current": True, "lake-files": True,
        "snapshot-complete": True,
    }
    # losing a committed run file flips lake-files and healthy
    victim = [
        f for f in eng.manifest.all_files()
        if os.path.exists(os.path.join(lake, f))
    ][0]
    os.rename(os.path.join(lake, victim), os.path.join(lake, victim) + ".gone")
    h2 = eng.health()
    assert not h2["healthy"] and not h2["checks"]["lake-files"]
