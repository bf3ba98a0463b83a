"""Chaos: an applier actor dies mid-epoch (process kill, not a Python
exception) — Ray retries the task on a fresh actor and the manifest
protocol must still produce exactly-once results (no dup/missing rows).

This is the Ray translation of "a retried apply task must not
double-write" (SURVEY §7.3): the first attempt's staging-referenced data
files are written again under new uuids by the retry; only the returned
metadata is committed.
"""

import os

import pytest

from debezium_incubator_ray import gen
from debezium_incubator_ray import schema as S
from debezium_incubator_ray.config import EngineConfig
from debezium_incubator_ray.pipelines.cdc import CdcEngine

from tests.conftest import assert_tables_equal


def test_applier_actor_death_is_retried_exactly_once(tmp_path, monkeypatch):
    from debezium_incubator_ray.stages import exchange as EX

    kill_marker = str(tmp_path / "killed-once")
    real = EX.StagedApplier

    class FlakyApplier(real):
        def __call__(self, batch):
            # first actor to get here dies abruptly (simulates node loss);
            # the marker file makes every later attempt succeed
            try:
                fd = os.open(kill_marker, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.close(fd)
                os._exit(1)
            except FileExistsError:
                pass
            return real.__call__(self, batch)

    monkeypatch.setattr(EX, "StagedApplier", FlakyApplier)

    spec = gen.BinlogSpec(
        n_events=400, n_initial=80, seg_rows=64, num_partitions=4, seed=17
    )
    ev = gen.gen_events(spec)
    binlog = str(tmp_path / "binlog")
    gen.write_binlog(binlog, spec, ev)
    lake = str(tmp_path / "lake")
    eng = CdcEngine(
        lake,
        EngineConfig(num_partitions=4, target_rows_per_file=64, apply_concurrency=2),
        payload_schema=S.pages_schema(),
    )
    eng.snapshot(gen.make_pages(spec.n_initial))
    eng.run(binlog)

    assert os.path.exists(kill_marker), "the chaos kill never fired"
    oracle = gen.oracle_final_state(spec, ev)
    assert_tables_equal(eng.lake_table(), oracle, sort_by="url")
    # keys unique — no double-apply from the retried task
    lt = eng.lake_table()
    urls = lt["url"].to_pylist()
    assert len(urls) == len(set(urls))


def test_aligned_applier_death_is_retried_exactly_once(tmp_path, monkeypatch):
    """Same law on the aligned fast path: the retried partition task
    re-reads its segments and re-writes new uuid files; only its returned
    metadata commits — the first attempt's orphans stay invisible."""
    from debezium_incubator_ray.stages import apply as AP

    kill_marker = str(tmp_path / "killed-once")
    real = AP.AlignedSegmentApplier

    class FlakyAligned(real):
        def __call__(self, batch):
            try:
                fd = os.open(kill_marker, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.close(fd)
                os._exit(1)
            except FileExistsError:
                pass
            return real.__call__(self, batch)

    monkeypatch.setattr(AP, "AlignedSegmentApplier", FlakyAligned)

    spec = gen.BinlogSpec(
        n_events=400, n_initial=80, seg_rows=64, num_partitions=4, seed=23
    )
    ev = gen.gen_events(spec)
    binlog = str(tmp_path / "binlog")
    gen.write_binlog(binlog, spec, ev)
    lake = str(tmp_path / "lake")
    eng = CdcEngine(
        lake,
        EngineConfig(num_partitions=4, target_rows_per_file=64, apply_concurrency=2),
        payload_schema=S.pages_schema(),
    )
    eng.snapshot(gen.make_pages(spec.n_initial))
    st = eng.apply_epoch(binlog)
    assert st["aligned"] is True
    assert os.path.exists(kill_marker), "the chaos kill never fired"
    oracle = gen.oracle_final_state(spec, ev)
    assert_tables_equal(eng.lake_table(), oracle, sort_by="url")
    lt = eng.lake_table()
    urls = lt["url"].to_pylist()
    assert len(urls) == len(set(urls))


def test_mor_crash_between_delta_write_and_commit_invisible(tmp_path, ray_session):
    """MoR epochs write delta files BEFORE the manifest swap: a crash in
    between must leave the lake byte-identical (uncommitted deltas are
    orphans) and a clean retry must apply exactly once."""
    import pyarrow.parquet as pq

    from debezium_incubator_ray.pipelines import cdc as C

    spec = gen.BinlogSpec(n_events=400, n_initial=80, seg_rows=80,
                          num_partitions=4, seed=17)
    ev = gen.gen_events(spec)
    binlog = str(tmp_path / "binlog")
    gen.write_binlog(binlog, spec, ev)
    lake = str(tmp_path / "lake")
    eng = CdcEngine(
        lake,
        EngineConfig(num_partitions=4, sink_mode="mor", apply_concurrency=2),
        payload_schema=S.pages_schema(),
    )
    eng.snapshot(gen.make_pages(spec.n_initial))
    state0 = eng.lake_table(include_lsn=True)

    # crash INSIDE apply_epoch after the parallel apply, before the commit
    real = C.CdcEngine._partition_updates

    def boom(commits):
        raise RuntimeError("crash before manifest commit")

    C.CdcEngine._partition_updates = staticmethod(boom)
    try:
        with pytest.raises(RuntimeError, match="crash before"):
            eng.apply_epoch(binlog)
    finally:
        C.CdcEngine._partition_updates = staticmethod(real)

    # delta files hit disk but are INVISIBLE: manifest unchanged
    assert eng.lake_table(include_lsn=True).equals(state0)
    assert all(not eng.manifest.deltas(p) for p in range(4))

    # clean retry applies exactly once and matches the oracle
    eng.run(binlog)
    oracle = gen.oracle_final_state(spec, ev)
    assert_tables_equal(eng.lake_table(), oracle, sort_by="url")
    # the orphaned first-attempt files are gone after vacuum
    eng.vacuum(keep_versions=1)
    live = {
        f["path"]
        for p in range(4)
        for f in (eng.manifest.files(p) + eng.manifest.deltas(p))
    }
    on_disk = set()
    for dirpath, _d, names in os.walk(os.path.join(lake, "data")):
        for n in names:
            on_disk.add(os.path.relpath(os.path.join(dirpath, n), lake))
    assert on_disk == live


def test_objref_apply_task_death_is_retried_exactly_once(
        tmp_path, monkeypatch):
    """The fused objref exchange's stage-2 task dies abruptly mid-epoch
    (process kill): Ray retries it, the slice objects are still
    resident, and the manifest protocol keeps the result exactly-once
    (no dup/missing rows vs the oracle)."""
    import ray

    from debezium_incubator_ray.stages import exchange as EX

    kill_marker = str(tmp_path / "killed-once")

    @ray.remote
    def flaky_apply(ctor, p, *payloads):
        import os as _os

        import pyarrow as _pa

        from debezium_incubator_ray.stages.apply import PartitionApplier
        from debezium_incubator_ray.stages.exchange import (
            _flatten_payloads, _ipc_bytes_to_table,
        )
        try:
            fd = _os.open(kill_marker,
                          _os.O_CREAT | _os.O_EXCL | _os.O_WRONLY)
            _os.close(fd)
            _os._exit(1)  # abrupt worker death, not an exception
        except FileExistsError:
            pass
        events = _pa.concat_tables(
            [_ipc_bytes_to_table(b) for b in _flatten_payloads(payloads)]
        )
        return PartitionApplier(**ctor)(events)

    monkeypatch.setattr(EX, "apply_partition_slices", flaky_apply)

    spec = gen.BinlogSpec(
        n_events=400, n_initial=80, seg_rows=64, num_partitions=4, seed=19
    )
    ev = gen.gen_events(spec)
    binlog = str(tmp_path / "binlog")
    gen.write_binlog(binlog, spec, ev)
    lake = str(tmp_path / "lake")
    eng = CdcEngine(
        lake,
        EngineConfig(num_partitions=4, target_rows_per_file=64,
                     exchange="objref", aligned_binlog="never"),
        payload_schema=S.pages_schema(),
    )
    eng.snapshot(gen.make_pages(spec.n_initial))
    eng.run(binlog)

    assert os.path.exists(kill_marker), "the chaos kill never fired"
    oracle = gen.oracle_final_state(spec, ev)
    assert_tables_equal(eng.lake_table(), oracle, sort_by="url")
    lt = eng.lake_table()
    urls = lt["url"].to_pylist()
    assert len(urls) == len(set(urls))


def test_objref_split_task_death_is_retried_exactly_once(
        tmp_path, monkeypatch):
    """Stage-1 (the fused read+normalize+split task) dies abruptly:
    the retry recomputes the slices from the segment files and the
    epoch still lands exactly-once."""
    import numpy as np
    import pyarrow as pa
    import ray

    from debezium_incubator_ray.stages import exchange as EX

    kill_marker = str(tmp_path / "killed-once")

    @ray.remote
    def flaky_split(paths, norm_kwargs, key, merge_partial,
                    read_batch, P):
        import os as _os

        from debezium_incubator_ray.stages.exchange import (
            _partition_slices, _table_to_ipc_bytes,
            read_normalize_combine,
        )
        from debezium_incubator_ray.stages.normalize import (
            NormalizeEnvelope,
        )
        try:
            fd = _os.open(kill_marker,
                          _os.O_CREAT | _os.O_EXCL | _os.O_WRONLY)
            _os.close(fd)
            _os._exit(1)
        except FileExistsError:
            pass
        norm = NormalizeEnvelope(**norm_kwargs)
        t = read_normalize_combine(paths, norm, key, merge_partial,
                                   read_batch)
        counts = np.zeros(P, dtype=np.int64)
        slices = [None] * P
        if t is not None and t.num_rows:
            for p, sl in _partition_slices(t, P):
                counts[p] = sl.num_rows
                slices[p] = _table_to_ipc_bytes(sl)
        meta = (counts.tolist(),
                ray.get_runtime_context().get_node_id())
        return (meta, *slices)

    monkeypatch.setattr(EX, "read_split_block", flaky_split)

    spec = gen.BinlogSpec(
        n_events=400, n_initial=80, seg_rows=64, num_partitions=4, seed=23
    )
    ev = gen.gen_events(spec)
    binlog = str(tmp_path / "binlog")
    gen.write_binlog(binlog, spec, ev)
    lake = str(tmp_path / "lake")
    eng = CdcEngine(
        lake,
        EngineConfig(num_partitions=4, target_rows_per_file=64,
                     exchange="objref", aligned_binlog="never"),
        payload_schema=S.pages_schema(),
    )
    eng.snapshot(gen.make_pages(spec.n_initial))
    eng.run(binlog)

    assert os.path.exists(kill_marker), "the chaos kill never fired"
    oracle = gen.oracle_final_state(spec, ev)
    assert_tables_equal(eng.lake_table(), oracle, sort_by="url")
