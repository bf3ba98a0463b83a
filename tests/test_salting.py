"""Auto-salting from lineage skew stats (north-rule skew handling as a
feedback loop): an epoch whose committed lineage shows partition skew
above EngineConfig.salt_auto_threshold makes the NEXT exchange epoch
engage the salted pre-reduce automatically; the decision is recorded in
that epoch's lineage row, and the salted output is byte-equal to an
unsalted twin. Manual salt_buckets remains the always-on override."""

import numpy as np
import pytest

from debezium_incubator_ray import gen
from debezium_incubator_ray import schema as S
from debezium_incubator_ray.config import EngineConfig
from debezium_incubator_ray.hashing import partition_ids
from debezium_incubator_ray.pipelines.cdc import CdcEngine

P = 8


def _skewed_ids(n_hot: int, n_cold: int):
    """url_ids whose urls hash mostly into ONE lake partition: scan
    candidates with the engine's own partitioner and take n_hot ids from
    partition 3 plus n_cold spread over the rest."""
    cand = np.arange(200_000, dtype=np.int64)
    part = np.asarray(partition_ids(gen.urls_for(cand), P, "hash"))
    hot = cand[part == 3][:n_hot]
    cold = cand[part != 3][:n_cold]
    assert len(hot) == n_hot and len(cold) == n_cold
    return np.concatenate([hot, cold])


def _ev(url_id: np.ndarray, base_lsn: int):
    n = len(url_id)
    return {
        "op": np.full(n, "c", dtype="U1"),
        "url_id": url_id.astype(np.int64),
        "lsn": base_lsn + 1 + np.arange(n, dtype=np.int64),
        "prev_lsn": np.full(n, -1, dtype=np.int64),
    }


def _spec(n, base_lsn=0):
    # binlog partitions (4) != lake partitions (8) -> exchange path
    return gen.BinlogSpec(n_events=n, n_initial=0, num_partitions=4,
                          seg_rows=512, base_lsn=base_lsn, emit_before=False)


def _run_epochs(tmp_path, tag, **cfg_kw):
    ids = _skewed_ids(900, 100)
    ev1 = _ev(ids, 0)
    spec1 = _spec(len(ids))
    binlog1 = str(tmp_path / f"binlog1-{tag}")
    gen.write_binlog(binlog1, spec1, ev1)

    # epoch 2: hot-key update storm over the same skewed universe
    rng = np.random.default_rng(7)
    upd = ids[rng.integers(0, len(ids), 3000)]
    ev2 = _ev(upd, base_lsn=len(ids))
    spec2 = _spec(len(upd), base_lsn=len(ids))
    binlog2 = str(tmp_path / f"binlog2-{tag}")
    gen.write_binlog(binlog2, spec2, ev2)

    eng = CdcEngine(
        str(tmp_path / f"lake-{tag}"),
        EngineConfig(num_partitions=P, aligned_binlog="never",
                     target_rows_per_file=512, **cfg_kw),
        payload_schema=S.pages_schema(),
    )
    eng.run(binlog1)
    eng.run(binlog2)
    return eng


def test_auto_salt_engages_and_is_byte_equal(tmp_path):
    eng = _run_epochs(tmp_path, "auto")  # defaults: threshold 4.0
    epochs = [e for e in eng.manifest.doc["lineage"] if e["kind"] == "epoch"]
    assert len(epochs) == 2
    # epoch 1 had no prior skew signal -> not salted, but its commit
    # records the skew that will trigger epoch 2
    assert epochs[0]["salt"] == {"engaged": False, "mode": "auto",
                                 "prev_skew_ratio": None}
    assert epochs[0]["skew_ratio"] >= 4.0
    # epoch 2 auto-engaged off epoch 1's lineage
    s = epochs[1]["salt"]
    assert s["engaged"] and s["mode"] == "auto"
    assert s["buckets"] == EngineConfig().salt_auto_buckets
    assert s["prev_skew_ratio"] == round(epochs[0]["skew_ratio"], 3)

    off = _run_epochs(tmp_path, "off", salt_auto_threshold=None)
    assert all(not e["salt"]["engaged"]
               for e in off.manifest.doc["lineage"] if e["kind"] == "epoch")
    a = eng.lake_table().sort_by([("url", "ascending")])
    b = off.lake_table().sort_by([("url", "ascending")])
    assert a.equals(b)


def test_manual_salt_buckets_still_wins(tmp_path):
    eng = _run_epochs(tmp_path, "manual", salt_buckets=8,
                      salt_auto_threshold=None)
    epochs = [e for e in eng.manifest.doc["lineage"] if e["kind"] == "epoch"]
    assert all(e["salt"] == {"engaged": True, "buckets": 8, "mode": "manual"}
               for e in epochs)


def test_below_threshold_does_not_engage(tmp_path):
    eng = _run_epochs(tmp_path, "cool", salt_auto_threshold=1000.0)
    epochs = [e for e in eng.manifest.doc["lineage"] if e["kind"] == "epoch"]
    assert not epochs[1]["salt"]["engaged"]
    assert epochs[1]["salt"]["prev_skew_ratio"] is not None
