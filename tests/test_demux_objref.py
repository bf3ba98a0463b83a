"""Demux (multi-table) epoch over the objref exchange: byte-equal to
the staging exchange, derived automatically from the engines' configs,
and leaving no shared staging root behind."""

import os

from debezium_incubator_ray.config import EngineConfig
from debezium_incubator_ray.pipelines.events_cdc import (
    EVENTS_PAYLOAD, NUM_PARTITIONS as P, write_events_binlog,
)
from debezium_incubator_ray.pipelines.lake import Lake

SF = os.environ.get("GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


def _run(tmp_path, tag, exchange_cfg, explicit=None):
    binlog = str(tmp_path / f"binlog-{tag}")
    write_events_binlog(SF, binlog, table_name_by_parity=True)
    lake = Lake(str(tmp_path / f"lake-{tag}"))
    for t in ("events_a", "events_b"):
        lake.create_table(
            t, EVENTS_PAYLOAD,
            EngineConfig(key="user_id", num_partitions=P, partitioner="mod",
                         apply_concurrency=4, target_rows_per_file=100_000,
                         exchange=exchange_cfg),
        )
    st = lake.apply_epoch_demux(binlog, exchange=explicit)
    outs = {t: lake[t].lake_table(include_lsn=True).sort_by(
        [("user_id", "ascending")]) for t in ("events_a", "events_b")}
    return st, outs, lake


def test_demux_objref_matches_staging(tmp_path):
    st_s, out_s, _ = _run(tmp_path, "staging", "staging")
    # objref derived from the engines' configs (no explicit arg)
    st_o, out_o, lake_o = _run(tmp_path, "objref", "objref")
    assert st_s["events"] == st_o["events"] > 0
    for t in out_s:
        assert out_s[t].equals(out_o[t]), t
    # no shared staging root was created in objref mode
    assert not os.path.exists(
        os.path.join(str(tmp_path / "lake-objref"), "_staging"))

    # replay no-op holds on the objref path too
    binlog = str(tmp_path / "binlog-objref")
    st2 = lake_o.apply_epoch_demux(binlog)
    assert st2["events"] == 0


def test_demux_explicit_exchange_overrides_config(tmp_path):
    # engines configured staging, explicit objref arg wins
    st, outs, _ = _run(tmp_path, "explicit", "staging", explicit="objref")
    assert st["events"] > 0
    st_ref, outs_ref, _ = _run(tmp_path, "ref", "staging")
    for t in outs:
        assert outs[t].equals(outs_ref[t]), t
