"""Merge-on-read sink mode (EngineConfig.sink_mode="mor").

Epochs append key-sorted delta runs instead of rewriting base runs; readers
LWW-merge base ⊕ deltas; compact() folds deltas back into base files. The
contract: a MoR lake reads byte-identically to the same history applied
through copy-on-write, before AND after compaction, across restart and
duplicate re-delivery.
"""

import pyarrow as pa

from debezium_incubator_ray import gen
from debezium_incubator_ray import schema as S
from debezium_incubator_ray.config import EngineConfig
from debezium_incubator_ray.pipelines.cdc import CdcEngine

from tests.conftest import assert_tables_equal
from tests.test_engine import _cfg, _spec, world  # noqa: F401 (fixture)


def _mor_cfg(spec, **kw):
    kw.setdefault("sink_mode", "mor")
    return _cfg(spec, **kw)


def _drive(lake, cfg, spec, binlog, max_segments=None):
    eng = CdcEngine(lake, cfg, payload_schema=S.pages_schema())
    eng.snapshot(gen.make_pages(spec.n_initial), snapshot_lsn=0)
    if max_segments is None:
        eng.run(binlog)
    else:
        eng.apply_epoch(binlog, max_segments=max_segments)
    return eng


def test_mor_matches_cow_and_oracle(world, tmp_path):  # noqa: F811
    spec, ev, binlog, lake = world
    mor = _drive(str(tmp_path / "mor"), _mor_cfg(spec), spec, binlog)
    cow = _drive(lake, _cfg(spec), spec, binlog)
    oracle = gen.oracle_final_state(spec, ev)
    assert_tables_equal(mor.lake_table(), oracle, sort_by="url")
    assert_tables_equal(
        mor.lake_table(include_lsn=True),
        cow.lake_table(include_lsn=True),
        sort_by="url",
    )
    # epochs after the snapshot appended deltas, never rewrote the base
    assert any(
        mor.manifest.deltas(p) for p in range(mor.manifest.num_partitions)
    )
    snap_files = {
        f["path"]
        for p in range(mor.manifest.num_partitions)
        for f in mor.manifest.files(p)
    }
    assert all("delta-" not in f for f in snap_files)


def test_mor_compact_folds_deltas_preserving_state(world, tmp_path):  # noqa: F811
    spec, ev, binlog, lake = world
    eng = _drive(str(tmp_path / "mor"), _mor_cfg(spec), spec, binlog)
    before = eng.lake_table(include_lsn=True)
    st = eng.compact()
    assert st["partitions_compacted"] > 0
    assert all(
        not eng.manifest.deltas(p) for p in range(eng.manifest.num_partitions)
    )
    assert_tables_equal(eng.lake_table(include_lsn=True), before, sort_by="url")
    # post-compaction reads take the plain base-scan path again
    assert_tables_equal(
        pa.Table.from_pandas(
            eng.read_lake(include_lsn=True).to_pandas()
        ),
        before,
        sort_by="url",
    )


def test_mor_duplicate_replay_noop(world, tmp_path):  # noqa: F811
    spec, ev, binlog, lake = world
    eng = _drive(str(tmp_path / "mor"), _mor_cfg(spec), spec, binlog)
    state1 = eng.lake_table(include_lsn=True)
    n_deltas = sum(
        len(eng.manifest.deltas(p)) for p in range(eng.manifest.num_partitions)
    )
    eng.manifest.doc["segments_done"] = []
    st = eng.apply_epoch(binlog)
    assert st["events"] > 0 and st["applied"] == 0
    # a pure-duplicate epoch appends NO deltas
    assert (
        sum(len(eng.manifest.deltas(p)) for p in range(eng.manifest.num_partitions))
        == n_deltas
    )
    assert_tables_equal(eng.lake_table(include_lsn=True), state1, sort_by="url")


def test_mor_restart_resume(world, tmp_path):  # noqa: F811
    spec, ev, binlog, lake = world
    mlake = str(tmp_path / "mor")
    eng = _drive(mlake, _mor_cfg(spec), spec, binlog, max_segments=3)
    del eng
    eng2 = CdcEngine(mlake)  # resume: sink_mode comes from the manifest
    assert eng2.cfg.sink_mode == "mor"
    eng2.run(binlog)
    assert_tables_equal(
        eng2.lake_table(), gen.oracle_final_state(spec, ev), sort_by="url"
    )


def test_mor_read_lake_and_lookup_merge_deltas(world, tmp_path):  # noqa: F811
    spec, ev, binlog, lake = world
    eng = _drive(str(tmp_path / "mor"), _mor_cfg(spec), spec, binlog)
    oracle = gen.oracle_final_state(spec, ev)
    got = pa.Table.from_pandas(eng.read_lake().to_pandas())
    assert_tables_equal(got, oracle, sort_by="url")
    # point reads through the delta overlay: live keys resolve to the
    # merged winner, deleted keys are absent
    urls = oracle["url"].to_pylist()
    some = urls[:5] + urls[-5:]
    hit = eng.lookup(some)
    assert sorted(hit["url"].to_pylist()) == sorted(some)
    all_ev_urls = set(gen.urls_for(ev["url_id"]).to_pylist())
    deleted = sorted(all_ev_urls - set(urls))[:5]
    if deleted:
        miss = eng.lookup(deleted)
        assert miss.num_rows == 0


def test_mor_changes_between_versions(world, tmp_path):  # noqa: F811
    spec, ev, binlog, lake = world
    mlake = str(tmp_path / "mor")
    eng = CdcEngine(mlake, _mor_cfg(spec), payload_schema=S.pages_schema())
    eng.snapshot(gen.make_pages(spec.n_initial), snapshot_lsn=0)
    v0 = eng.manifest.version
    eng.run(binlog)
    v1 = eng.manifest.version
    eng.flush()
    feed = pa.Table.from_pandas(eng.changes_between(v0, v1).to_pandas())
    # every op=d key is absent at v1; every c/u key matches the final state
    final = {u: l for u, l in zip(
        eng.lake_table(include_lsn=True)["url"].to_pylist(),
        eng.lake_table(include_lsn=True)["_lsn"].to_pylist(),
    )}
    for url, op, lsn in zip(
        feed["url"].to_pylist(), feed["op"].to_pylist(), feed["_lsn"].to_pylist()
    ):
        if op == "d":
            assert url not in final
        else:
            assert final[url] == lsn


def test_mor_schema_evolution_mid_stream(tmp_path):
    """add_column lands mid-stream: pre-change deltas hold the old payload
    schema, post-change deltas the new one; the read-side merge (and a
    compaction fold) must upgrade lazily and match the oracle."""
    spec = gen.BinlogSpec(
        n_events=500, n_initial=100, seg_rows=80, num_partitions=4, seed=21,
        schema_changes=[
            S.SchemaChange("add_column", "fetch_status", "int32", 200, at_lsn=250)
        ],
    )
    ev = gen.gen_events(spec)
    binlog = str(tmp_path / "binlog")
    gen.write_binlog(binlog, spec, ev)
    cfg = _mor_cfg(spec)
    eng = CdcEngine(str(tmp_path / "mor"), cfg, payload_schema=S.pages_schema())
    eng.snapshot(gen.make_pages(spec.n_initial))
    eng.run(binlog)
    oracle = gen.oracle_final_state(spec, ev)
    got = eng.lake_table()
    assert got.schema.field("fetch_status").type == pa.int32()
    assert_tables_equal(got, oracle, sort_by="url")
    eng.compact()
    assert_tables_equal(eng.lake_table(), oracle, sort_by="url")


def test_mor_auto_compaction(world, tmp_path):  # noqa: F811
    spec, ev, binlog, lake = world
    cfg = _mor_cfg(spec, mor_compact_deltas=1)  # fold after every epoch
    eng = _drive(str(tmp_path / "mor"), cfg, spec, binlog)
    # the threshold is a table policy: restart restores it from the manifest
    mlake = eng.lake_dir
    del eng
    eng = CdcEngine(mlake)
    assert eng.cfg.mor_compact_deltas == 1
    # every epoch's deltas were folded right back into the base
    assert all(
        not eng.manifest.deltas(p) for p in range(eng.manifest.num_partitions)
    )
    assert_tables_equal(
        eng.lake_table(), gen.oracle_final_state(spec, ev), sort_by="url"
    )


def test_mor_tombstone_retention(world, tmp_path):  # noqa: F811
    spec, ev, binlog, lake = world
    cfgm = _mor_cfg(spec, tombstones=False)
    cfgc = _cfg(spec, tombstones=False)
    mor = _drive(str(tmp_path / "mor"), cfgm, spec, binlog)
    cow = _drive(str(tmp_path / "cow"), cfgc, spec, binlog)
    assert_tables_equal(
        mor.lake_table(include_lsn=True),
        cow.lake_table(include_lsn=True),
        sort_by="url",
    )
    mor.compact()
    assert_tables_equal(
        mor.lake_table(include_lsn=True),
        cow.lake_table(include_lsn=True),
        sort_by="url",
    )
