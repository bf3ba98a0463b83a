"""Sharded fan-in: several binlogs with INDEPENDENT LSN domains and
disjoint key spaces feed one lake table through named offset channels."""

import os

import numpy as np
import pyarrow as pa

from debezium_incubator_ray.envelope import build_envelopes
from debezium_incubator_ray.pipelines import events_cdc as EC

P = EC.NUM_PARTITIONS


def _env(ops, uids, lsns, values, binlog_parts=P):
    after = pa.table({
        "ts": pa.nulls(len(uids), pa.timestamp("us")),
        "user_id": pa.array(uids, pa.int64()),
        "event_type": pa.array(["t"] * len(uids), pa.string()),
        "value": pa.array(values, pa.float64()),
        "props": pa.nulls(len(uids), pa.string()),
    })
    part = (np.asarray(uids) % binlog_parts).astype(np.int32)
    return build_envelopes(
        pa.array(ops, pa.string()), after, after, part,
        np.asarray(lsns, dtype=np.int64), table="events",
    )


def test_fan_in_lagging_source_not_dropped(tmp_path):
    """The killer case for a single scalar watermark: source B's LSNs are
    all LOWER than source A's already-applied LSNs. Per-source channels
    must still apply them; one shared watermark would silently drop B."""
    lake = str(tmp_path / "lake")
    dir_a, dir_b = str(tmp_path / "a"), str(tmp_path / "b")

    # source A: keys 0..15, lsns 100..115 (drained first)
    EC.write_env_binlog(
        _env(["c"] * 16, list(range(16)), range(100, 116), [1.0] * 16), dir_a
    )
    eng = EC.make_engine(lake)
    out_a = eng.run(dir_a, source="A")
    assert sum(e.get("applied", 0) for e in out_a) == 16

    # source B: keys 1000..1015, lsns 1..16 — BELOW A's watermarks
    EC.write_env_binlog(
        _env(["c"] * 16, list(range(1000, 1016)), range(1, 17), [2.0] * 16),
        dir_b,
    )
    out_b = eng.run(dir_b, source="B")
    assert sum(e.get("applied", 0) for e in out_b) == 16, (
        "a lagging source's lower LSNs were dropped by another source's "
        "watermark"
    )
    assert eng.lake_table().num_rows == 32

    # replay both: exactly-once per channel
    fan = eng.run_fan_in({"A": dir_a, "B": dir_b})
    assert sum(e.get("applied", 0) for st in fan.values() for e in st) == 0

    # updates flow per channel: A updates key 3, B deletes key 1000
    EC.write_env_binlog(
        _env(["u"], [3], [116], [9.0]), dir_a, append=True
    )
    EC.write_env_binlog(
        _env(["d"], [1000], [17], [0.0]), dir_b, append=True
    )
    eng.run_fan_in({"A": dir_a, "B": dir_b})
    lt = eng.lake_table()
    assert lt.num_rows == 31  # one delete
    vals = {r["user_id"]: r["value"] for r in lt.to_pylist()}
    assert vals[3] == 9.0 and 1000 not in vals

    # restart: channels persist in the manifest
    eng.manifest.persist()
    eng.close()
    from debezium_incubator_ray.pipelines.cdc import CdcEngine

    eng2 = CdcEngine(lake)
    fan2 = eng2.run_fan_in({"A": dir_a, "B": dir_b})
    assert sum(e.get("applied", 0) for st in fan2.values() for e in st) == 0
    assert eng2.lake_table().num_rows == 31


def test_default_channel_unchanged(tmp_path):
    """source='' keeps the legacy scalar-watermark behavior untouched."""
    lake = str(tmp_path / "lake")
    d = str(tmp_path / "bl")
    EC.write_env_binlog(
        _env(["c"] * 8, list(range(8)), range(1, 9), [1.0] * 8), d
    )
    eng = EC.make_engine(lake)
    eng.run(d)
    doc = eng.manifest.doc
    assert "segments_done_by_source" not in doc
    assert all("watermarks" not in e for e in doc["partitions"].values())
    assert eng.lake_table().num_rows == 8


def test_fan_in_exchange_path(tmp_path):
    """Channels work through the exchange (non-aligned) path too: a
    single-partition binlog against an 8-partition lake forces the
    shuffle; per-source watermarks still dedup replays."""
    lake = str(tmp_path / "lake")
    dir_a, dir_b = str(tmp_path / "a"), str(tmp_path / "b")
    EC.write_env_binlog(
        _env(["c"] * 8, list(range(8)), range(100, 108), [1.0] * 8,
             binlog_parts=1),
        dir_a, num_partitions=1,
    )
    EC.write_env_binlog(
        _env(["c"] * 8, list(range(100, 108)), range(1, 9), [2.0] * 8,
             binlog_parts=1),
        dir_b, num_partitions=1,
    )
    eng = EC.make_engine(lake)
    fan = eng.run_fan_in({"A": dir_a, "B": dir_b})
    assert all(not e.get("aligned", True) or e["segments"] == 0
               for st in fan.values() for e in st)
    assert eng.lake_table().num_rows == 16
    fan2 = eng.run_fan_in({"A": dir_a, "B": dir_b})
    assert sum(e.get("applied", 0) for st in fan2.values() for e in st) == 0
