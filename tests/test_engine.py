"""End-to-end CdcEngine tests against the pyarrow oracle.

Mirrors the reference's integration layer (OracleConnectorIT.java:82-587):
snapshot correctness, snapshot→streaming continuation, restart-resume
(shouldStreamAfterRestart, ~294-367), duplicate re-delivery no-op,
delete/tombstone sequences, empty-table snapshot completion.
"""

import os

import numpy as np
import pyarrow as pa
import pytest

from debezium_incubator_ray import gen
from debezium_incubator_ray import schema as S
from debezium_incubator_ray.config import EngineConfig
from debezium_incubator_ray.pipelines.cdc import CdcEngine
from debezium_incubator_ray.state.manifest import Manifest

from tests.conftest import assert_tables_equal


def _spec(tmp, **kw):
    kw.setdefault("n_events", 600)
    kw.setdefault("n_initial", 120)
    kw.setdefault("seg_rows", 100)
    kw.setdefault("num_partitions", 4)
    kw.setdefault("seed", 5)
    return gen.BinlogSpec(**kw)


def _cfg(spec, **kw):
    kw.setdefault("num_partitions", spec.num_partitions)
    kw.setdefault("target_rows_per_file", 64)
    kw.setdefault("apply_concurrency", 2)
    return EngineConfig(**kw)


@pytest.fixture()
def world(tmp_path):
    spec = _spec(tmp_path)
    ev = gen.gen_events(spec)
    binlog = str(tmp_path / "binlog")
    gen.write_binlog(binlog, spec, ev)
    return spec, ev, binlog, str(tmp_path / "lake")


def test_snapshot_then_stream_matches_oracle(world):
    spec, ev, binlog, lake = world
    eng = CdcEngine(lake, _cfg(spec), payload_schema=S.pages_schema())
    st = eng.snapshot(gen.make_pages(spec.n_initial), snapshot_lsn=0)
    assert st["events"] == spec.n_initial
    assert eng.manifest.doc["snapshot_complete"]
    stats = eng.run(binlog)
    assert sum(s["events"] for s in stats) == spec.n_events
    oracle = gen.oracle_final_state(spec, ev)
    assert_tables_equal(eng.lake_table(), oracle, sort_by="url")
    # per-url byte-identical text invariant: re-extract from html
    lt = eng.lake_table()
    assert gen.extract_text(lt["html"]).to_pylist() == lt["text"].to_pylist()


def test_duplicate_replay_is_noop(world):
    spec, ev, binlog, lake = world
    eng = CdcEngine(lake, _cfg(spec), payload_schema=S.pages_schema())
    eng.snapshot(gen.make_pages(spec.n_initial))
    eng.run(binlog)
    v1 = eng.manifest.version
    state1 = eng.lake_table(include_lsn=True)

    # re-deliver every segment (F2a): wipe segments_done to force re-read;
    # the per-partition watermark must make the replay a no-op
    eng.manifest.doc["segments_done"] = []
    st = eng.apply_epoch(binlog)
    assert st["events"] > 0 and st["applied"] == 0
    assert_tables_equal(eng.lake_table(include_lsn=True), state1, sort_by="url")


def test_restart_resume_from_manifest(world):
    spec, ev, binlog, lake = world
    eng = CdcEngine(lake, _cfg(spec), payload_schema=S.pages_schema())
    eng.snapshot(gen.make_pages(spec.n_initial))
    eng.apply_epoch(binlog, max_segments=3)  # partial progress, then "crash"
    del eng

    eng2 = CdcEngine(lake, _cfg(spec))  # resume: schema comes from manifest
    assert eng2.manifest.doc["snapshot_complete"]
    eng2.run(binlog)
    oracle = gen.oracle_final_state(spec, ev)
    assert_tables_equal(eng2.lake_table(), oracle, sort_by="url")


def test_mid_epoch_crash_uncommitted_files_invisible(world):
    """Files written by apply tasks whose epoch never committed must not be
    visible; rerunning the epoch converges to the oracle (exactly-once)."""
    spec, ev, binlog, lake = world
    eng = CdcEngine(lake, _cfg(spec), payload_schema=S.pages_schema())
    eng.snapshot(gen.make_pages(spec.n_initial))

    # simulate a mid-epoch crash: run the shuffle/apply but skip the commit
    import ray.data
    from debezium_incubator_ray.stages.normalize import NormalizeEnvelope
    from debezium_incubator_ray.sources import binlog as bsrc

    segs = bsrc.plan_epoch(binlog, eng.manifest.doc["segments_done"], 3)
    paths = [os.path.join(binlog, s) for s in segs]
    norm = NormalizeEnvelope(
        eng.manifest.doc["schemas"][-1]["schema"], "url", spec.num_partitions
    )
    flat = ray.data.read_parquet(paths).map_batches(
        norm, batch_format="pyarrow", zero_copy_batch=True
    )
    eng._apply_shuffle(flat)  # writes orphan files, NO manifest commit

    manifest_before = Manifest.load(lake).doc
    assert manifest_before["segments_done"] == []  # nothing visible

    eng.close()  # the "crashed" writer's lock is released
    eng2 = CdcEngine(lake, _cfg(spec))
    eng2.run(binlog)
    oracle = gen.oracle_final_state(spec, ev)
    assert_tables_equal(eng2.lake_table(), oracle, sort_by="url")


def test_groupby_exchange_matches_oracle(world):
    """The object-store groupby exchange (exchange='groupby') must produce
    the same lake as the default staging exchange."""
    spec, ev, binlog, lake = world
    cfg = _cfg(spec, exchange="groupby")
    eng = CdcEngine(lake, cfg, payload_schema=S.pages_schema())
    eng.snapshot(gen.make_pages(spec.n_initial))
    eng.run(binlog)
    oracle = gen.oracle_final_state(spec, ev)
    assert_tables_equal(eng.lake_table(), oracle, sort_by="url")


def test_skew_reported_in_lineage(world):
    """Zipfian updates → per-partition row-count skew surfaces in lineage
    (M7: hot-url detection feeds the salting decision)."""
    spec, ev, binlog, lake = world
    eng = CdcEngine(lake, _cfg(spec), payload_schema=S.pages_schema())
    eng.snapshot(gen.make_pages(spec.n_initial))
    eng.run(binlog)
    epochs = [l for l in eng.manifest.doc["lineage"] if l["kind"] == "epoch"]
    assert epochs and epochs[-1]["skew_ratio"] >= 1.0
    assert epochs[-1]["partitions_touched"] == spec.num_partitions


def test_salted_prereduce_matches_oracle(world):
    """salt_buckets>1 adds the full salted combiner shuffle (hot-key
    splitting per the north rule); final state must be unchanged."""
    spec, ev, binlog, lake = world
    cfg = _cfg(spec, salt_buckets=4)
    eng = CdcEngine(lake, cfg, payload_schema=S.pages_schema())
    eng.snapshot(gen.make_pages(spec.n_initial))
    eng.run(binlog)
    oracle = gen.oracle_final_state(spec, ev)
    assert_tables_equal(eng.lake_table(), oracle, sort_by="url")


def test_empty_snapshot_marks_complete(tmp_path):
    cfg = EngineConfig(num_partitions=2)
    eng = CdcEngine(str(tmp_path / "lake"), cfg, payload_schema=S.pages_schema())
    st = eng.snapshot(None)
    assert not st["skipped"]
    assert eng.manifest.doc["snapshot_complete"]
    # INITIAL mode skips a second snapshot (getSnapshottingTask semantics)
    assert eng.snapshot(gen.make_pages(5))["skipped"]


def test_empty_epoch_heartbeat_advances_manifest(tmp_path):
    cfg = EngineConfig(num_partitions=2)
    lake = str(tmp_path / "lake")
    binlog = str(tmp_path / "binlog")
    os.makedirs(binlog)
    eng = CdcEngine(lake, cfg, payload_schema=S.pages_schema())
    v0 = eng.manifest.version
    st = eng.apply_epoch(binlog)
    assert st["segments"] == 0
    assert eng.manifest.version == v0 + 1  # heartbeat commit


def test_stream_without_snapshot_creates_from_events(world):
    """c-only bootstrap: applying the stream to an empty lake yields the
    stream-only LWW state (no snapshot rows)."""
    spec, ev, binlog, lake = world
    cfg = _cfg(spec, snapshot_mode="NEVER")
    eng = CdcEngine(lake, cfg, payload_schema=S.pages_schema())
    eng.run(binlog)
    # oracle without the snapshot universe: only events
    spec0 = gen.BinlogSpec(**{**spec.__dict__, "n_initial": 0})
    oracle = gen.oracle_final_state(spec0, ev)
    assert_tables_equal(eng.lake_table(), oracle, sort_by="url")


def test_metrics_endpoint(world):
    """T6 parity: gauge/counter names mirror the reference's Dropwizard
    registry (SnapshotProcessorMetrics.java:30-36,
    CommitLogProcessorMetrics.java:22-44)."""
    spec, ev, binlog, lake = world
    eng = CdcEngine(lake, _cfg(spec), payload_schema=S.pages_schema())
    m0 = eng.metrics()
    assert m0["snapshot-completed"] is False
    assert m0["remaining-table-count"] == 1
    assert m0["commitlog-position"] == -1

    eng.snapshot(gen.make_pages(spec.n_initial))
    stats = eng.run(binlog)
    m = eng.metrics()
    assert m["snapshot-completed"] is True
    assert m["snapshot-running"] is False
    assert m["snapshot-duration-in-seconds"] > 0
    assert m["remaining-table-count"] == 0
    assert m["row-scanned"] == {eng.cfg.table: spec.n_initial}
    assert m["number-of-processed-mutations"] == spec.n_events
    assert m["commitlog-filename"] is not None
    assert m["commitlog-position"] == int(ev["lsn"].max())
    assert m["manifest-version"] == eng.manifest.version
    assert "number-of-unrecoverable-errors" not in m  # never incremented

    # gauges must not pin the engine: del releases the writer lock promptly
    del eng
    eng2 = CdcEngine(lake, _cfg(spec))
    assert eng2.metrics()["snapshot-completed"] is True


def test_snapshot_schema_only_mode(tmp_path, world):
    spec, ev, binlog, lake = world
    cfg = _cfg(spec, snapshot_mode="INITIAL_SCHEMA_ONLY")
    eng = CdcEngine(lake, cfg, payload_schema=S.pages_schema())
    st = eng.snapshot(gen.make_pages(spec.n_initial))
    assert st["skipped"] and st.get("schema_only")
    assert eng.manifest.doc["snapshot_complete"]
    assert eng.lake_table().num_rows == 0  # structure only, no data
    # streaming proceeds from the current position
    eng.run(binlog)
    assert eng.lake_table().num_rows > 0
