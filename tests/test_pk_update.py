"""PK-update (rekey) law — the reference's key-change event sequence
(OracleConnectorIT.java:~420-456): a primary-key change arrives as
DELETE(old key) + CREATE(new key) inside ONE transaction whose halves land
in DIFFERENT partitions (old % P != new % P). The engine must apply the
pair atomically across those partitions: at every commit point exactly one
of {old, new} is visible — never neither, never both. Transaction
completeness is judged EPOCH-GLOBALLY (pipelines/cdc.py
_global_pending_txs + stages/apply.py tx_pending_cutoff); a per-partition
count would see each half as permanently incomplete."""

import numpy as np
import pyarrow as pa

from debezium_incubator_ray.config import EngineConfig
from debezium_incubator_ray.envelope import build_envelopes
from debezium_incubator_ray.pipelines.cdc import CdcEngine
from debezium_incubator_ray.pipelines.events_cdc import write_env_binlog

P = 2
PAYLOAD = pa.schema([pa.field("k", pa.int64()), pa.field("v", pa.float64())])


def _env(rows):
    """rows: (op, k, v, lsn, tx_id, tx_events); 'd' rows carry the key in
    the before image (the only place a delete's key lives)."""
    tbl = pa.table({
        "k": pa.array([r[1] for r in rows], pa.int64()),
        "v": pa.array([r[2] for r in rows], pa.float64()),
    })
    env = build_envelopes(
        pa.array([r[0] for r in rows], pa.string()),
        tbl,
        tbl,  # before = same payload; build_envelopes masks it for c/r
        (np.array([r[1] for r in rows]) % P).astype(np.int32),
        np.array([r[3] for r in rows], dtype=np.int64),
        table="tx",
    )
    env = env.append_column(
        "tx_id", pa.array([r[4] for r in rows], pa.int64()))
    return env.append_column(
        "tx_events", pa.array([r[5] for r in rows], pa.int32()))


def _eng(lake):
    return CdcEngine(
        lake,
        EngineConfig(
            table="tx", key="k", num_partitions=P, partitioner="mod",
            transactional=True, apply_concurrency=2,
        ),
        payload_schema=PAYLOAD,
    )


def _state(eng):
    lt = eng.lake_table()
    return dict(zip(lt["k"].to_pylist(), lt["v"].to_pylist()))


def test_rekey_atomic_d_half_first(tmp_path):
    """The d(old) half arrives alone: the WHOLE transaction defers — the
    old key stays visible (no window where it is deleted but the new key
    missing). When the c(new) half arrives, both apply in one epoch."""
    binlog = str(tmp_path / "binlog")
    lake = str(tmp_path / "lake")
    # base: k=0 -> p0, k=1 -> p1 (singleton txs)
    write_env_binlog(_env([
        ("c", 0, 1.0, 1, 100, 1),
        ("c", 1, 2.0, 2, 101, 1),
    ]), binlog, seg_rows=4, num_partitions=P)
    eng = _eng(lake)
    eng.run(binlog)
    assert _state(eng) == {0: 1.0, 1: 2.0}

    # rekey tx 500: d(k=0) in p0; its c(k=5) half (p1) NOT yet delivered
    write_env_binlog(_env([("d", 0, 1.0, 3, 500, 2)]), binlog,
                     seg_rows=4, append=True, num_partitions=P)
    stats = eng.run(binlog)
    assert any(s.get("deferred", 0) > 0 for s in stats), stats
    # atomicity: old key STILL visible at this commit point
    assert _state(eng) == {0: 1.0, 1: 2.0}

    # the c half arrives -> the pair applies atomically in one epoch
    write_env_binlog(_env([("c", 5, 1.0, 4, 500, 2)]), binlog,
                     seg_rows=4, append=True, num_partitions=P)
    eng.run(binlog)
    assert _state(eng) == {1: 2.0, 5: 1.0}

    # replay is a no-op (watermark dedup across both partitions)
    eng.manifest.doc["segments_done"] = []
    st = eng.apply_epoch(binlog)
    assert st["applied"] == 0
    assert _state(eng) == {1: 2.0, 5: 1.0}


def test_rekey_atomic_c_half_first(tmp_path):
    """Reverse delivery: the c(new) half alone must NOT surface the new
    key early (no window where both keys are visible)."""
    binlog = str(tmp_path / "binlog")
    lake = str(tmp_path / "lake")
    write_env_binlog(_env([
        ("c", 0, 1.0, 1, 100, 1),
        ("c", 1, 2.0, 2, 101, 1),
    ]), binlog, seg_rows=4, num_partitions=P)
    eng = _eng(lake)
    eng.run(binlog)

    write_env_binlog(_env([("c", 5, 1.0, 4, 500, 2)]), binlog,
                     seg_rows=4, append=True, num_partitions=P)
    stats = eng.run(binlog)
    assert any(s.get("deferred", 0) > 0 for s in stats), stats
    assert _state(eng) == {0: 1.0, 1: 2.0}  # new key not visible yet

    write_env_binlog(_env([("d", 0, 1.0, 3, 500, 2)]), binlog,
                     seg_rows=4, append=True, num_partitions=P)
    eng.run(binlog)
    assert _state(eng) == {1: 2.0, 5: 1.0}


def test_rekey_defers_later_events_in_both_partitions(tmp_path):
    """The prefix rule under a pending cross-partition tx: later COMPLETE
    transactions whose LSNs sit above the pending tx's rows defer in the
    partitions that hold pending rows (the watermark must never advance
    past an unapplied row), and apply exactly once on completion."""
    binlog = str(tmp_path / "binlog")
    lake = str(tmp_path / "lake")
    write_env_binlog(_env([
        ("c", 0, 1.0, 1, 100, 1),
        ("c", 1, 2.0, 2, 101, 1),
    ]), binlog, seg_rows=4, num_partitions=P)
    eng = _eng(lake)
    eng.run(binlog)

    # pending rekey d(k=0) at lsn 3 in p0; later complete singleton tx
    # ("u" on k=2 -> p0) at lsn 5 must defer behind it
    write_env_binlog(_env([
        ("d", 0, 1.0, 3, 500, 2),
        ("c", 2, 9.0, 5, 600, 1),
    ]), binlog, seg_rows=4, append=True, num_partitions=P)
    eng.run(binlog)
    assert _state(eng) == {0: 1.0, 1: 2.0}

    write_env_binlog(_env([("c", 5, 1.0, 4, 500, 2)]), binlog,
                     seg_rows=4, append=True, num_partitions=P)
    eng.run(binlog)
    assert _state(eng) == {1: 2.0, 2: 9.0, 5: 1.0}
