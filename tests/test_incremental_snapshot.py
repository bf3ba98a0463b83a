"""Watermark-based incremental snapshot (Debezium DDD-3 read-repair):
chunked backfill of a live source interleaved with streaming, resumable
from the manifest chunk cursor, exactly-once under crash."""

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from debezium_incubator_ray import gen
from debezium_incubator_ray import schema as S
from debezium_incubator_ray.config import EngineConfig
from debezium_incubator_ray.pipelines.cdc import CdcEngine

from tests.conftest import assert_tables_equal


def _setup(tmp_path, n_events=2500, h_frac=0.5):
    """Binlog carries only events with lsn > H (CDC started late); the
    'database' is at final state — chunk reads reflect it."""
    spec = gen.BinlogSpec(
        n_events=n_events, n_initial=250, seg_rows=256, num_partitions=4,
        seed=17,
    )
    ev = gen.gen_events(spec)
    H = int(ev["lsn"][int(len(ev["lsn"]) * h_frac)])
    mask = ev["lsn"] > H
    ev_stream = {k: v[mask] for k, v in ev.items()}
    binlog = str(tmp_path / "binlog")
    gen.write_binlog(binlog, spec, ev_stream)
    oracle = gen.oracle_final_state(spec, ev)

    def chunk_source(last_key, n):
        state = oracle
        if last_key is not None:
            state = state.filter(pc.greater(state["url"], last_key))
        return state.slice(0, n)

    lake = str(tmp_path / "lake")
    eng = CdcEngine(
        lake,
        EngineConfig(num_partitions=4, target_rows_per_file=100_000),
        payload_schema=S.pages_schema(),
    )
    return eng, binlog, oracle, chunk_source, lake


def test_incremental_snapshot_backfills_to_exact_state(tmp_path):
    eng, binlog, oracle, chunk_source, _ = _setup(tmp_path)
    st = eng.snapshot_incremental(chunk_source, binlog, chunk_rows=64)
    assert not st["skipped"] and st["chunks"] >= 3
    assert eng.manifest.doc["inc_snapshot"]["complete"] is True
    assert_tables_equal(eng.lake_table(), oracle, sort_by="url")

    # exactly-once stands: re-delivering every stream segment applies 0
    eng.manifest.doc["segments_done"] = []
    rep = eng.apply_epoch(binlog)
    assert rep["applied"] == 0

    # idempotent completion: a second call is a no-op
    assert eng.snapshot_incremental(chunk_source, binlog)["skipped"] is True


def test_incremental_snapshot_resumes_after_crash(tmp_path):
    eng, binlog, oracle, chunk_source, lake = _setup(tmp_path)
    calls = {"n": 0}

    def flaky(last_key, n):
        calls["n"] += 1
        if calls["n"] == 3:
            raise RuntimeError("source connection lost")
        return chunk_source(last_key, n)

    with pytest.raises(RuntimeError, match="connection lost"):
        eng.snapshot_incremental(flaky, binlog, chunk_rows=64)
    committed = eng.manifest.doc["inc_snapshot"]
    assert committed["complete"] is False and committed["last_key"] is not None
    eng.close()

    # reopen: cursor resumes from the last COMMITTED chunk; final state is
    # exact and every url appears exactly once (no chunk double-apply)
    eng2 = CdcEngine(lake)
    st = eng2.snapshot_incremental(chunk_source, binlog, chunk_rows=64)
    assert st["chunks"] >= 1
    lt = eng2.lake_table()
    assert lt["url"].to_pandas().is_unique
    assert_tables_equal(lt, oracle, sort_by="url")


def test_chunk_loses_to_newer_stream_event(tmp_path):
    """LWW window semantics: a stream event with lsn > read_lsn applied
    AFTER a chunk covered the same key must win."""
    eng, binlog, oracle, chunk_source, _ = _setup(tmp_path)
    eng.snapshot_incremental(chunk_source, binlog, chunk_rows=64)
    # synthesize a late update for the first url in the lake
    lt = eng.lake_table(include_lsn=True)
    url0 = lt["url"][0].as_py()
    top = max(
        e["watermark"] for e in eng.manifest.doc["partitions"].values()
    )
    import numpy as np

    uid = np.array([int(url0.rsplit("/", 1)[-1])], dtype=np.int64)
    late = gen.events_to_envelopes(
        {"op": np.array(["u"]), "url_id": uid,
         "lsn": np.array([top + 1000], dtype=np.int64),
         "prev_lsn": np.array([-1], dtype=np.int64)},
        slice(None),
        gen.BinlogSpec(num_partitions=4),
        emit_before=False,
    )
    import os
    import pyarrow.parquet as pq
    from debezium_incubator_ray.hashing import partition_ids

    p = int(partition_ids(pa.array([url0]), 4, "hash")[0])
    pq.write_table(
        late, os.path.join(binlog, f"p={p}", "seg-99999.parquet")
    )
    eng.run(binlog)
    row = eng.lake_table(include_lsn=True).filter(
        pc.equal(pc.field("url"), url0)
    )
    assert row[S.LSN][0].as_py() == top + 1000
