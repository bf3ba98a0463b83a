"""Transaction-boundary apply (EngineConfig.transactional): an epoch applies
only the per-partition LSN prefix of COMPLETE transactions; segments holding
incomplete-transaction rows stay un-done and redeliver until the missing
events arrive."""

import numpy as np
import pyarrow as pa

from debezium_incubator_ray.config import EngineConfig
from debezium_incubator_ray.envelope import build_envelopes
from debezium_incubator_ray.pipelines.cdc import CdcEngine
from debezium_incubator_ray.pipelines.events_cdc import write_env_binlog

P = 2
PAYLOAD = pa.schema([pa.field("k", pa.int64()), pa.field("v", pa.float64())])


def _env(rows):
    """rows: (k, v, lsn, tx_id, tx_events); all ops are upserts."""
    after = pa.table(
        {
            "k": pa.array([r[0] for r in rows], pa.int64()),
            "v": pa.array([r[1] for r in rows], pa.float64()),
        }
    )
    env = build_envelopes(
        pa.array(["c"] * len(rows), pa.string()),
        after,
        None,
        (np.array([r[0] for r in rows]) % P).astype(np.int32),
        np.array([r[2] for r in rows], dtype=np.int64),
        table="tx",
    )
    env = env.append_column("tx_id", pa.array([r[3] for r in rows], pa.int64()))
    return env.append_column(
        "tx_events", pa.array([r[4] for r in rows], pa.int32())
    )


def _eng(lake):
    return CdcEngine(
        lake,
        EngineConfig(
            table="tx", key="k", num_partitions=P, partitioner="mod",
            transactional=True, apply_concurrency=2,
        ),
        payload_schema=PAYLOAD,
    )


def test_incomplete_tx_defers_then_completes(tmp_path):
    binlog = str(tmp_path / "binlog")
    lake = str(tmp_path / "lake")
    # partition 0 (even k): tx 100 complete (2 events), tx 101 missing one
    # of its declared 2 events; partition 1 (odd k): tx 200 complete
    rows1 = [
        (0, 1.0, 1, 100, 2),
        (2, 2.0, 2, 100, 2),
        (4, 3.0, 3, 101, 2),   # tx 101: only 1 of 2 delivered
        (1, 9.0, 4, 200, 1),
    ]
    write_env_binlog(_env(rows1), binlog, seg_rows=2, num_partitions=P)
    eng = _eng(lake)
    stats = eng.run(binlog)
    lt = eng.lake_table()
    got = dict(zip(lt["k"].to_pylist(), lt["v"].to_pylist()))
    # tx 101's row (k=4) must NOT be applied yet
    assert got == {0: 1.0, 2: 2.0, 1: 9.0}
    assert any(s["deferred"] > 0 for s in stats)
    # the deferred segment is not in segments_done
    assert len(eng.manifest.doc["segments_done"]) < 3

    # the missing event arrives → tx 101 completes → both rows apply
    rows2 = [(6, 4.0, 5, 101, 2)]
    write_env_binlog(_env(rows2), binlog, seg_rows=2, append=True, num_partitions=P)
    eng.run(binlog)
    lt = eng.lake_table()
    got = dict(zip(lt["k"].to_pylist(), lt["v"].to_pylist()))
    assert got == {0: 1.0, 2: 2.0, 4: 3.0, 6: 4.0, 1: 9.0}

    # redelivery after completion is a no-op (watermark dedup)
    eng.manifest.doc["segments_done"] = []
    st = eng.apply_epoch(binlog)
    assert st["applied"] == 0


def test_watermark_never_passes_deferred_rows(tmp_path):
    binlog = str(tmp_path / "binlog")
    lake = str(tmp_path / "lake")
    # one partition-0 segment: complete tx at lsn 1, incomplete at lsn 2,
    # complete tx LATER at lsn 3 — the cutoff must hold back lsn 3 too
    # (applying it would advance the watermark past the unapplied lsn 2)
    rows = [
        (0, 1.0, 1, 100, 1),
        (2, 2.0, 2, 101, 2),   # incomplete
        (4, 3.0, 3, 102, 1),   # complete but AFTER the incomplete tx
    ]
    write_env_binlog(_env(rows), binlog, seg_rows=8, num_partitions=P)
    eng = _eng(lake)
    eng.run(binlog)
    lt = eng.lake_table()
    assert dict(zip(lt["k"].to_pylist(), lt["v"].to_pylist())) == {0: 1.0}
    assert eng.manifest.watermark(0) == 1

    # completion arrives: everything applies exactly once
    write_env_binlog(_env([(6, 9.0, 4, 101, 2)]), binlog, seg_rows=8, append=True, num_partitions=P)
    eng.run(binlog)
    lt = eng.lake_table()
    assert dict(zip(lt["k"].to_pylist(), lt["v"].to_pylist())) == {
        0: 1.0, 2: 2.0, 4: 3.0, 6: 9.0,
    }


def test_transactional_requires_aligned(tmp_path):
    import pytest

    binlog = str(tmp_path / "binlog")
    lake = str(tmp_path / "lake")
    write_env_binlog(_env([(0, 1.0, 1, 100, 1)]), binlog, seg_rows=8, num_partitions=P)
    cfg = EngineConfig(
        table="tx", key="k", num_partitions=P, partitioner="mod",
        transactional=True, aligned_binlog="never",
    )
    eng = CdcEngine(lake, cfg, payload_schema=PAYLOAD)
    with pytest.raises(ValueError, match="partition-aligned"):
        eng.apply_epoch(binlog)


def test_complete_tx_straddling_done_and_deferred_segments(tmp_path):
    """Reviewer repro: tx 101 straddles a done segment and a deferred
    segment. On redelivery only part of its rows are visible — the cutoff
    must NOT treat the already-applied tx as incomplete (that would defer
    fresh rows forever: permanent data loss)."""
    binlog = str(tmp_path / "binlog")
    lake = str(tmp_path / "lake")
    rows1 = [
        (0, 1.0, 1, 100, 1),
        (2, 2.0, 2, 101, 2),
        (4, 3.0, 3, 101, 2),   # tx101 completes across the 2-row boundary
        (6, 4.0, 4, 102, 2),   # tx102: 1 of 2 → deferred
    ]
    write_env_binlog(_env(rows1), binlog, seg_rows=2, num_partitions=P)
    eng = _eng(lake)
    eng.run(binlog)
    lt = eng.lake_table()
    assert dict(zip(lt["k"].to_pylist(), lt["v"].to_pylist())) == {
        0: 1.0, 2: 2.0, 4: 3.0,
    }
    # tx102 completes; the redelivered straddling segment shows tx101 with
    # only 1 of its 2 rows — must not stall the cutoff
    write_env_binlog(_env([(8, 5.0, 5, 102, 2)]), binlog, seg_rows=2,
                     append=True, num_partitions=P)
    eng.run(binlog)
    lt = eng.lake_table()
    assert dict(zip(lt["k"].to_pylist(), lt["v"].to_pylist())) == {
        0: 1.0, 2: 2.0, 4: 3.0, 6: 4.0, 8: 5.0,
    }
    # everything drained: nothing left un-done
    assert eng.apply_epoch(binlog)["segments"] == 0


def test_run_continues_past_quarantine_only_epoch(tmp_path):
    """A corrupt segment alone in an epoch (applied=0, done=0) must not
    stop the drain — healthy later segments still apply."""
    import os

    binlog = str(tmp_path / "binlog")
    lake = str(tmp_path / "lake")
    write_env_binlog(
        _env([(0, 1.0, 1, 100, 1), (2, 2.0, 2, 200, 1)]), binlog,
        seg_rows=1, num_partitions=P,
    )
    # corrupt the FIRST segment of partition 0
    seg0 = os.path.join(binlog, "p=0", "seg-00000.parquet")
    with open(seg0, "wb") as f:
        f.write(b"not parquet")
    cfg = EngineConfig(
        table="tx", key="k", num_partitions=P, partitioner="mod",
        transactional=False, aligned_binlog="never",  # exchange path probes
    )
    eng = CdcEngine(lake, cfg, payload_schema=PAYLOAD)
    eng.run(binlog, max_segments_per_epoch=1)
    lt = eng.lake_table()
    assert 2 in lt["k"].to_pylist()  # the healthy segment applied
    assert len(eng.manifest.doc.get("segments_error", {})) == 1
