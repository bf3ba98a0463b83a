"""Composite primary keys (EngineConfig.key_cols): the reference keys
records on ALL pk cells (partition + clustering columns,
RecordMaker.java:36-58); here the engine derives an internal ``_key``
routing/sort column and everything else (watermarks, sorted runs, LWW,
deletes-from-before, MoR) is unchanged."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from debezium_incubator_ray import schema as S
from debezium_incubator_ray.config import EngineConfig
from debezium_incubator_ray.envelope import build_envelopes
from debezium_incubator_ray.pipelines.cdc import CdcEngine
from debezium_incubator_ray.pipelines.events_cdc import write_env_binlog


PAYLOAD = pa.schema(
    [
        pa.field("uid", pa.int64()),
        pa.field("kind", pa.string()),
        pa.field("val", pa.float64()),
    ]
)
P = 4


def _env(rows):
    """rows: (uid, kind, val, op, before_uid, before_kind, before_val, lsn)"""
    after = pa.table(
        {
            "uid": pa.array([r[0] for r in rows], pa.int64()),
            "kind": pa.array([r[1] for r in rows], pa.string()),
            "val": pa.array([r[2] for r in rows], pa.float64()),
        }
    )
    before = pa.table(
        {
            "uid": pa.array([r[4] for r in rows], pa.int64()),
            "kind": pa.array([r[5] for r in rows], pa.string()),
            "val": pa.array([r[6] for r in rows], pa.float64()),
        }
    )
    # partition by hash of the composite — same rule the engine uses, so
    # the binlog layout is lake-aligned
    from debezium_incubator_ray.hashing import partition_ids

    joined = pc.binary_join_element_wise(
        pc.cast(pc.coalesce(after["uid"], before["uid"]), pa.string()),
        pc.cast(pc.coalesce(after["kind"], before["kind"]), pa.string()),
        "|",
    )
    parts = partition_ids(joined, P, "hash").astype(np.int32)
    return build_envelopes(
        pa.array([r[3] for r in rows], pa.string()),
        after,
        before,
        parts,
        np.array([r[7] for r in rows], dtype=np.int64),
        table="ck",
    )


def _drive(tmp_path, rows, **cfg_kw):
    binlog = str(tmp_path / "binlog")
    lake = str(tmp_path / "lake")
    write_env_binlog(_env(rows), binlog, seg_rows=3)
    cfg = EngineConfig(
        table="ck", key_cols=("uid", "kind"), num_partitions=P,
        apply_concurrency=2, target_rows_per_file=16, **cfg_kw,
    )
    eng = CdcEngine(lake, cfg, payload_schema=PAYLOAD)
    eng.run(binlog)
    return eng


ROWS = [
    # (1,a) created then updated; (1,b) created then deleted;
    # (2,a) created; (2,b) create→delete→recreate
    (1, "a", 1.0, "c", None, None, None, 1),
    (1, "b", 2.0, "c", None, None, None, 2),
    (2, "a", 3.0, "c", None, None, None, 3),
    (2, "b", 4.0, "c", None, None, None, 4),
    (1, "a", 10.0, "u", 1, "a", 1.0, 5),
    (None, None, None, "d", 1, "b", 2.0, 6),     # delete keys via before
    (None, None, None, "d", 2, "b", 4.0, 7),
    (2, "b", 40.0, "c", None, None, None, 8),    # recreate after delete
]
FINAL = {(1, "a"): 10.0, (2, "a"): 3.0, (2, "b"): 40.0}


def _check_final(eng):
    lt = eng.lake_table(include_lsn=True)
    got = {
        (u, k): v
        for u, k, v in zip(
            lt["uid"].to_pylist(), lt["kind"].to_pylist(), lt["val"].to_pylist()
        )
    }
    assert got == FINAL
    assert "_key" not in lt.column_names  # internal column never leaks


def test_composite_lww_and_delete_from_before(tmp_path):
    eng = _drive(tmp_path, ROWS)
    _check_final(eng)
    assert eng.manifest.doc["key_cols"] == ["uid", "kind"]


def test_composite_restart_and_replay(tmp_path):
    eng = _drive(tmp_path, ROWS)
    lake = eng.lake_dir
    state = eng.lake_table(include_lsn=True)
    del eng
    eng2 = CdcEngine(lake)  # key_cols restored from the manifest
    assert eng2.cfg.key_cols == ["uid", "kind"]
    assert eng2.cfg.key == "_key"
    eng2.manifest.doc["segments_done"] = []
    st = eng2.apply_epoch(str(tmp_path / "binlog"))
    assert st["applied"] == 0
    assert eng2.lake_table(include_lsn=True).equals(state)


def test_composite_lookup_tuples(tmp_path):
    eng = _drive(tmp_path, ROWS)
    hit = eng.lookup([(1, "a"), (2, "b"), (1, "b")])  # last one deleted
    got = set(zip(hit["uid"].to_pylist(), hit["kind"].to_pylist()))
    assert got == {(1, "a"), (2, "b")}
    assert "_key" not in hit.column_names


def test_composite_mor_matches_cow(tmp_path):
    cow = _drive(tmp_path / "cow", ROWS)
    mor = _drive(tmp_path / "mor", ROWS, sink_mode="mor", mor_compact_deltas=None)
    _check_final(mor)
    assert mor.lake_table(include_lsn=True).equals(cow.lake_table(include_lsn=True))
    mor.compact()
    assert mor.lake_table(include_lsn=True).equals(cow.lake_table(include_lsn=True))


def test_composite_snapshot(tmp_path):
    binlog = str(tmp_path / "binlog")
    lake = str(tmp_path / "lake")
    write_env_binlog(_env(ROWS), binlog, seg_rows=3)
    cfg = EngineConfig(
        table="ck", key_cols=("uid", "kind"), num_partitions=P,
        apply_concurrency=2,
    )
    eng = CdcEngine(lake, cfg, payload_schema=PAYLOAD)
    snap = pa.table(
        {
            "uid": pa.array([9], pa.int64()),
            "kind": pa.array(["z"], pa.string()),
            "val": pa.array([0.5], pa.float64()),
        }
    )
    eng.snapshot(snap, snapshot_lsn=0)
    eng.run(binlog)
    lt = eng.lake_table()
    got = set(zip(lt["uid"].to_pylist(), lt["kind"].to_pylist()))
    assert got == set(FINAL) | {(9, "z")}
    with pytest.raises(NotImplementedError):
        eng.snapshot_incremental(lambda last, n: None)


def test_lookup_prefix_partition_read(tmp_path):
    """Cassandra-style partition read: lookup_prefix((uid,)) returns all
    live clustering rows of that uid, exactly filtered (numeric
    components never false-match string ordering), identical to the
    lake_table projection; full-length prefixes delegate to lookup()."""
    eng = _drive(tmp_path, ROWS + [
        (11, "a", 7.0, "c", None, None, None, 9),   # uid 11 vs prefix "1"
        (1, "c", 8.0, "c", None, None, None, 10),
    ])
    lt = eng.lake_table()
    got = eng.lookup_prefix((1,))
    want = lt.filter(pc.equal(lt["uid"], 1)).sort_by([("kind", "ascending")])
    assert got.num_rows == want.num_rows == 2  # (1,a), (1,c) — NOT 11
    assert got.sort_by([("kind", "ascending")])["kind"].to_pylist() == \
        want["kind"].to_pylist()
    assert set(got["uid"].to_pylist()) == {1}
    # full-length prefix == point lookup
    one = eng.lookup_prefix((2, "b"))
    assert one.num_rows == 1 and one["val"][0].as_py() == 40.0
    # absent prefix -> empty with the lake schema
    assert eng.lookup_prefix((999,)).num_rows == 0
    import pytest as _pt
    with _pt.raises(ValueError):
        eng.lookup_prefix((1, "a", "x"))
