"""Lake maintenance: compaction, time-travel reads, vacuum.

Compaction is state-preserving re-chunking of each partition's disjoint
sorted runs (stages/apply.py Compactor); time-travel reads any retained
manifest version (CoW never deletes data files); vacuum expires history.
The reference has no lake, so these extend its semantics to the sink this
engine adds — the invariants under test are the engine's own exactly-once
contract (manifest swap atomicity, watermark preservation).
"""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from debezium_incubator_ray import gen
from debezium_incubator_ray import schema as S
from debezium_incubator_ray.config import EngineConfig
from debezium_incubator_ray.pipelines.cdc import CdcEngine
from debezium_incubator_ray.state.manifest import Manifest

from tests.conftest import assert_tables_equal


def _build_fragmented_lake(tmp_path, n_events=4000, seg_rows=128):
    """Many small segments + tiny target_rows_per_file → many runs/partition."""
    spec = gen.BinlogSpec(
        n_events=n_events, n_initial=300, seg_rows=seg_rows,
        num_partitions=4, seed=29,
    )
    ev = gen.gen_events(spec)
    binlog = str(tmp_path / "binlog")
    gen.write_binlog(binlog, spec, ev)
    lake = str(tmp_path / "lake")
    eng = CdcEngine(
        lake,
        EngineConfig(num_partitions=4, target_rows_per_file=100),
        payload_schema=S.pages_schema(),
    )
    eng.snapshot(gen.make_pages(spec.n_initial))
    eng.run(binlog)
    return eng, spec, ev


def test_compaction_preserves_state_and_reduces_files(tmp_path):
    eng, spec, ev = _build_fragmented_lake(tmp_path)
    before_tbl = eng.lake_table(include_lsn=True)
    files_before = sum(len(eng.manifest.files(p)) for p in range(4))
    wm_before = {p: eng.manifest.watermark(p) for p in range(4)}
    assert files_before > 4  # fragmented, else the test is vacuous

    # raise the file-size target so compaction actually coalesces
    eng.cfg.target_rows_per_file = 1_000_000
    st = eng.compact()
    assert st["partitions_compacted"] == 4
    assert st["files_after"] == 4  # one run per partition now
    assert {p: eng.manifest.watermark(p) for p in range(4)} == wm_before

    after_tbl = eng.lake_table(include_lsn=True)
    assert_tables_equal(after_tbl, before_tbl, sort_by="url")
    # oracle still holds end-to-end
    oracle = gen.oracle_final_state(spec, ev)
    assert_tables_equal(
        eng.lake_table(), oracle, sort_by="url"
    )

    # idempotent: nothing left to compact
    st2 = eng.compact()
    assert st2["partitions_compacted"] == 0


def test_compaction_upgrades_stale_schema_files(tmp_path):
    """A partition whose only run predates a schema change is still
    compacted (stale-version trigger) and comes out at the current
    version with the default backfilled."""
    eng, spec, ev = _build_fragmented_lake(tmp_path, n_events=1500)
    import json

    binlog2 = str(tmp_path / "binlog2")
    os.makedirs(binlog2, exist_ok=True)
    with open(os.path.join(binlog2, "_schema_changes.json"), "w") as f:
        json.dump(
            [S.SchemaChange(
                "add_column", "tier", "int32", 7, 10**12
            ).to_json()],
            f,
        )
    eng.run(binlog2)  # heartbeat epoch activates schema v2; no data rewritten
    assert all(
        f.get("schema_version", 1) == 1
        for p in range(4) for f in eng.manifest.files(p)
    )
    eng.cfg.target_rows_per_file = 1_000_000
    eng.compact()
    assert all(
        f["schema_version"] == 2
        for p in range(4) for f in eng.manifest.files(p)
    )
    lt = eng.lake_table()
    assert set(lt["tier"].to_pylist()) == {7}
    assert_tables_equal(
        lt.drop_columns(["tier"]), gen.oracle_final_state(spec, ev),
        sort_by="url",
    )


def test_time_travel_reads_and_vacuum(tmp_path):
    spec = gen.BinlogSpec(
        n_events=3000, n_initial=200, seg_rows=256, num_partitions=4, seed=31
    )
    ev = gen.gen_events(spec)
    binlog = str(tmp_path / "binlog")
    gen.write_binlog(binlog, spec, ev)
    lake = str(tmp_path / "lake")
    eng = CdcEngine(
        lake,
        EngineConfig(num_partitions=4, target_rows_per_file=500),
        payload_schema=S.pages_schema(),
    )
    eng.snapshot(gen.make_pages(spec.n_initial))
    v_snap = eng.manifest.version
    snap_tbl = eng.lake_table(include_lsn=True)
    eng.run(binlog)
    final_tbl = eng.lake_table(include_lsn=True)

    # time-travel to the post-snapshot version reproduces that state exactly
    assert v_snap in eng.manifest.versions()
    tt = eng.lake_table(include_lsn=True, version=v_snap)
    assert_tables_equal(tt, snap_tbl, sort_by="url")
    # Dataset variant too
    ds_rows = eng.read_lake(version=v_snap).count()
    assert ds_rows == snap_tbl.num_rows
    # current read unaffected
    assert_tables_equal(eng.lake_table(include_lsn=True), final_tbl, sort_by="url")

    # compaction supersedes files but time-travel still works (CoW)
    eng.cfg.target_rows_per_file = 1_000_000
    v_pre_compact = eng.manifest.version
    eng.compact()
    assert_tables_equal(
        eng.lake_table(include_lsn=True, version=v_pre_compact),
        final_tbl, sort_by="url",
    )
    assert_tables_equal(eng.lake_table(include_lsn=True), final_tbl, sort_by="url")

    # vacuum: keep only the newest version; old reads die, current survives,
    # superseded files are physically gone
    def count_data_files():
        n = 0
        for dirpath, _d, names in os.walk(os.path.join(lake, "data")):
            n += len(names)
        return n

    files_on_disk_before = count_data_files()
    live = sum(len(eng.manifest.files(p)) for p in range(4))
    assert files_on_disk_before > live
    st = eng.vacuum(keep_versions=1)
    assert st["removed_files"] == files_on_disk_before - live
    assert count_data_files() == live
    assert_tables_equal(eng.lake_table(include_lsn=True), final_tbl, sort_by="url")
    with pytest.raises(FileNotFoundError):
        eng.lake_table(version=v_snap)

    # reopen from disk: manifest still loads, state intact
    eng.close()
    eng2 = CdcEngine(lake)
    assert_tables_equal(eng2.lake_table(include_lsn=True), final_tbl, sort_by="url")


def test_vacuum_never_removes_current_version(tmp_path):
    spec = gen.BinlogSpec(
        n_events=400, n_initial=50, seg_rows=128, num_partitions=2, seed=5
    )
    ev = gen.gen_events(spec)
    binlog = str(tmp_path / "binlog")
    gen.write_binlog(binlog, spec, ev)
    lake = str(tmp_path / "lake")
    eng = CdcEngine(
        lake, EngineConfig(num_partitions=2), payload_schema=S.pages_schema()
    )
    eng.run(binlog)
    cur = eng.manifest.version
    eng.vacuum(keep_versions=1)
    assert eng.manifest.versions()[-1] == cur
    assert Manifest.load(lake).version == cur


def test_changes_between_versions(tmp_path):
    """Self-diff is empty; snapshot->final diff classifies c/u/d exactly
    (checked against the generator's two oracle states)."""
    import numpy as np
    import ray

    spec = gen.BinlogSpec(
        n_events=1200, n_initial=150, seg_rows=256, num_partitions=2, seed=9
    )
    ev = gen.gen_events(spec)
    binlog = str(tmp_path / "binlog")
    gen.write_binlog(binlog, spec, ev)
    lake = str(tmp_path / "lake")
    eng = CdcEngine(
        lake, EngineConfig(num_partitions=2), payload_schema=S.pages_schema()
    )
    eng.snapshot(gen.make_pages(spec.n_initial))
    v_snap = eng.manifest.version
    eng.run(binlog)

    assert eng.changes_between(eng.manifest.version).count() == 0

    diff = pa.concat_tables(
        ray.get(eng.changes_between(v_snap).to_arrow_refs()),
        promote_options="permissive",
    )
    old_urls = set(gen.make_pages(spec.n_initial)["url"].to_pylist())
    new_tbl = gen.oracle_final_state(spec, ev)
    new_lsn = dict(zip(new_tbl["url"].to_pylist(),
                       [0] * new_tbl.num_rows))
    new_urls = set(new_tbl["url"].to_pylist())
    ops = dict(zip(diff["url"].to_pylist(), diff["op"].to_pylist()))
    # every url in exactly one class, classes correct
    exp_c = new_urls - old_urls
    exp_d = old_urls - new_urls
    got_c = {u for u, o in ops.items() if o == "c"}
    got_d = {u for u, o in ops.items() if o == "d"}
    got_u = {u for u, o in ops.items() if o == "u"}
    assert got_c == exp_c
    assert got_d == exp_d
    # u = survived urls whose winner lsn moved off the snapshot lsn (0)
    final_lsn = dict(zip(new_tbl["url"].to_pylist(),
                         [None] * new_tbl.num_rows))
    surv = old_urls & new_urls
    lt = eng.lake_table(include_lsn=True)
    lsn_by_url = dict(zip(lt["url"].to_pylist(), lt[S.LSN].to_pylist()))
    exp_u = {u for u in surv if lsn_by_url[u] != 0}
    assert got_u == exp_u
    # d rows carry null payload and the old winner lsn
    drows = diff.filter(pa.array(np.array(
        [o == "d" for o in diff["op"].to_pylist()])))
    assert drows["text"].null_count == drows.num_rows


def test_point_lookup_prunes_runs(tmp_path, monkeypatch):
    """lookup returns exactly the requested live keys and opens only
    range-matching runs (counted via a read_table spy)."""
    eng, spec, ev = _build_fragmented_lake(tmp_path, n_events=2000)
    lt = eng.lake_table(include_lsn=True)
    urls = lt["url"].to_pylist()
    want = urls[:3] + ["https://nope.example/x"]
    import pyarrow.parquet as pq_mod

    calls = {"n": 0}
    orig = pq_mod.read_table

    def spy(path, *a, **kw):
        calls["n"] += 1
        return orig(path, *a, **kw)

    monkeypatch.setattr(
        "debezium_incubator_ray.pipelines.cdc.pq.read_table", spy
    )
    got = eng.lookup(want)
    total_runs = sum(len(eng.manifest.files(p)) for p in range(4))
    assert calls["n"] < total_runs  # pruning really skipped runs
    assert sorted(got["url"].to_pylist()) == sorted(urls[:3])
    exp = lt.filter(
        pc.is_in(lt["url"], value_set=pa.array(urls[:3]))
    )
    assert_tables_equal(got, exp, sort_by="url")
    # empty lookup
    assert eng.lookup(["https://nope.example/y"]).num_rows == 0


def test_erase_keys_state_surgery(tmp_path, ray_session):
    from debezium_incubator_ray import gen
    from debezium_incubator_ray import schema as S
    from debezium_incubator_ray.config import EngineConfig
    from debezium_incubator_ray.pipelines.cdc import CdcEngine

    spec = gen.BinlogSpec(n_events=500, n_initial=100, seg_rows=100,
                          num_partitions=4, seed=3)
    ev = gen.gen_events(spec)
    binlog = str(tmp_path / "binlog")
    gen.write_binlog(binlog, spec, ev)
    eng = CdcEngine(
        str(tmp_path / "lake"),
        EngineConfig(num_partitions=4, target_rows_per_file=32, apply_concurrency=2),
        payload_schema=S.pages_schema(),
    )
    eng.snapshot(gen.make_pages(spec.n_initial))
    eng.run(binlog)
    before = eng.lake_table()
    victims = before["url"].to_pylist()[:7]
    v_old = eng.manifest.version
    st = eng.erase_keys(victims)
    assert st["erased_rows"] == 7
    after = eng.lake_table()
    assert after.num_rows == before.num_rows - 7
    assert not set(victims) & set(after["url"].to_pylist())
    assert eng.lookup(victims).num_rows == 0
    # time-travel still sees the data until history expires
    assert eng.lake_table(version=v_old).num_rows == before.num_rows
    vac = eng.vacuum(keep_versions=1)
    assert vac["removed_files"] > 0
    # watermarks untouched: replay stays a no-op, erased keys stay gone
    eng.manifest.doc["segments_done"] = []
    assert eng.apply_epoch(binlog)["applied"] == 0
    assert eng.lookup(victims).num_rows == 0


def test_erase_keys_mor_deltas(tmp_path, ray_session):
    from debezium_incubator_ray import gen
    from debezium_incubator_ray import schema as S
    from debezium_incubator_ray.config import EngineConfig
    from debezium_incubator_ray.pipelines.cdc import CdcEngine

    spec = gen.BinlogSpec(n_events=400, n_initial=80, seg_rows=80,
                          num_partitions=4, seed=4)
    ev = gen.gen_events(spec)
    binlog = str(tmp_path / "binlog")
    gen.write_binlog(binlog, spec, ev)
    eng = CdcEngine(
        str(tmp_path / "lake"),
        EngineConfig(num_partitions=4, sink_mode="mor", apply_concurrency=2),
        payload_schema=S.pages_schema(),
    )
    eng.snapshot(gen.make_pages(spec.n_initial))
    eng.run(binlog)
    assert any(eng.manifest.deltas(p) for p in range(4))
    before = eng.lake_table()
    victims = before["url"].to_pylist()[-5:]
    eng.erase_keys(victims)
    after = eng.lake_table()  # merged through the delta overlay
    assert after.num_rows == before.num_rows - 5
    assert not set(victims) & set(after["url"].to_pylist())


def test_read_lake_column_pruning(tmp_path, ray_session):
    import pyarrow as pa

    from debezium_incubator_ray import gen
    from debezium_incubator_ray import schema as S
    from debezium_incubator_ray.config import EngineConfig
    from debezium_incubator_ray.pipelines.cdc import CdcEngine

    spec = gen.BinlogSpec(
        n_events=300, n_initial=60, seg_rows=60, num_partitions=4, seed=8,
        schema_changes=[
            S.SchemaChange("add_column", "fetch_status", "int32", 200, at_lsn=150)
        ],
    )
    ev = gen.gen_events(spec)
    binlog = str(tmp_path / "binlog")
    gen.write_binlog(binlog, spec, ev)
    for mode in ("cow", "mor"):
        eng = CdcEngine(
            str(tmp_path / f"lake-{mode}"),
            EngineConfig(num_partitions=4, sink_mode=mode, apply_concurrency=2),
            payload_schema=S.pages_schema(),
        )
        eng.snapshot(gen.make_pages(spec.n_initial))
        eng.run(binlog)
        # prune to 2 columns, one of them evolved (absent in old files)
        got = eng.read_lake(columns=["url", "fetch_status"]).to_pandas()
        full = eng.lake_table()
        assert sorted(got.columns) == ["fetch_status", "url"]
        assert sorted(got["url"]) == sorted(full["url"].to_pylist())
        assert (
            got.sort_values("url")["fetch_status"].tolist()
            == full["fetch_status"].to_pylist()
        )
        import pytest

        with pytest.raises(ValueError, match="not in lake schema"):
            eng.read_lake(columns=["nope"])


def test_export_changes_outbox(tmp_path, ray_session):
    import os

    import pyarrow.parquet as pq

    from debezium_incubator_ray import gen
    from debezium_incubator_ray import schema as S
    from debezium_incubator_ray.config import EngineConfig
    from debezium_incubator_ray.pipelines.cdc import CdcEngine
    from debezium_incubator_ray.pipelines.events_cdc import scratch_dir  # noqa: F401

    spec = gen.BinlogSpec(n_events=300, n_initial=60, seg_rows=60,
                          num_partitions=4, seed=6)
    ev = gen.gen_events(spec)
    binlog = str(tmp_path / "binlog")
    gen.write_binlog(binlog, spec, ev)
    out = str(tmp_path / "outbox")
    eng = CdcEngine(
        str(tmp_path / "lake"),
        EngineConfig(num_partitions=4, apply_concurrency=2),
        payload_schema=S.pages_schema(),
    )
    eng.snapshot(gen.make_pages(spec.n_initial))
    eng.apply_epoch(binlog, max_segments=2)
    st1 = eng.export_changes(out)
    assert st1["rows"] > 0
    # nothing new → skipped, no second directory
    st2 = eng.export_changes(out)
    assert st2.get("skipped")
    assert len(os.listdir(out)) == 1

    # more epochs → export only the delta window
    eng.run(binlog)
    st3 = eng.export_changes(out)
    assert st3["rows"] > 0 and st3["from"] == st1["to"]

    # replay contract: fold the export windows IN NAME ORDER (keys are
    # unique within a window) — the folded state reproduces the lake
    state = {}
    for name in sorted(os.listdir(out)):
        w = pq.read_table(os.path.join(out, name))
        for url, op in zip(w["url"].to_pylist(), w["op"].to_pylist()):
            if op == "d":
                state.pop(url, None)
            else:
                state[url] = True
    lt = eng.lake_table(include_lsn=True)
    assert sorted(state) == sorted(lt["url"].to_pylist())

    # crash between rename and cursor commit: wipe the cursor → the next
    # call ADOPTS the existing export instead of writing the window again
    eng.manifest.doc["outbox"] = {"exported_version": st1["to"]}
    st4 = eng.export_changes(out)
    assert st4.get("adopted")
    assert len(os.listdir(out)) == 2


def test_zone_map_scan_prunes_runs(tmp_path, ray_session):
    """Zone maps must actually PRUNE: build a lake where a stats column
    correlates with the key (so run ranges are tight), scan a narrow
    range, and assert some runs were skipped — with byte-correct output."""
    import datetime

    import pyarrow as pa

    from debezium_incubator_ray.config import EngineConfig
    from debezium_incubator_ray.pipelines.cdc import CdcEngine

    PAYLOAD = pa.schema(
        [
            pa.field("k", pa.int64()),
            pa.field("score", pa.float64()),
            pa.field("seen", pa.timestamp("us")),
        ]
    )
    n = 4000
    base = datetime.datetime(2026, 1, 1)
    snap = pa.table(
        {
            "k": pa.array(range(n), pa.int64()),
            "score": pa.array([float(i) for i in range(n)], pa.float64()),
            "seen": pa.array(
                [base + datetime.timedelta(seconds=i) for i in range(n)],
                pa.timestamp("us"),
            ),
        }
    )
    eng = CdcEngine(
        str(tmp_path / "lake"),
        EngineConfig(
            table="z", key="k", partitioner="mod", num_partitions=4,
            target_rows_per_file=250, stats_columns=("score", "seen"),
            apply_concurrency=2,
        ),
        payload_schema=PAYLOAD,
    )
    eng.snapshot(snap, snapshot_lsn=0)
    # keys mod-partitioned and runs key-sorted → score ranges per run are
    # tight; a narrow scan must skip most runs
    got = eng.scan("score", lo=100.0, hi=300.0).to_pandas()
    st = eng._last_scan_stats
    assert st["runs_read"] < st["runs_total"]
    assert sorted(got["k"].tolist()) == list(range(100, 301))
    # timestamp zone maps (ISO-encoded bounds) prune and filter correctly
    t0 = base + datetime.timedelta(seconds=500)
    t1 = base + datetime.timedelta(seconds=700)
    got = eng.scan("seen", lo=t0, hi=t1, columns=["k"]).to_pandas()
    assert eng._last_scan_stats["runs_read"] < eng._last_scan_stats["runs_total"]
    assert sorted(got["k"].tolist()) == list(range(500, 701))
    assert list(got.columns) == ["k"]


def test_scan_mor_projection_and_retention_live_rows(tmp_path, ray_session):
    """Reviewer repros: (a) scan with a projection that excludes the scan
    column must work on an uncompacted MoR lake; (b) scan on a
    tombstone-retention lake returns LIVE rows only."""
    from debezium_incubator_ray import gen
    from debezium_incubator_ray import schema as S
    from debezium_incubator_ray.config import EngineConfig
    from debezium_incubator_ray.pipelines.cdc import CdcEngine

    spec = gen.BinlogSpec(n_events=400, n_initial=80, seg_rows=80,
                          num_partitions=4, seed=15)
    ev = gen.gen_events(spec)
    binlog = str(tmp_path / "binlog")
    gen.write_binlog(binlog, spec, ev)

    # (a) MoR lake with outstanding deltas
    eng = CdcEngine(
        str(tmp_path / "mor"),
        EngineConfig(num_partitions=4, sink_mode="mor", apply_concurrency=2,
                     stats_columns=("lang",)),
        payload_schema=S.pages_schema(),
    )
    eng.snapshot(gen.make_pages(spec.n_initial))
    eng.run(binlog)
    assert any(eng.manifest.deltas(p) for p in range(4))
    got = eng.scan("lang", lo="en", hi="en", columns=["url"]).to_pandas()
    full = eng.lake_table()
    import pyarrow.compute as pc

    want = full.filter(pc.equal(full["lang"], "en"))["url"].to_pylist()
    assert sorted(got["url"]) == sorted(want)
    assert list(got.columns) == ["url"]

    # (b) retention lake: markers are not live state
    eng2 = CdcEngine(
        str(tmp_path / "ret"),
        EngineConfig(num_partitions=4, tombstones=False, apply_concurrency=2),
        payload_schema=S.pages_schema(),
    )
    eng2.snapshot(gen.make_pages(spec.n_initial))
    eng2.run(binlog)
    lt = eng2.lake_table()
    n_live = lt.filter(pc.equal(lt["_deleted"], False)).num_rows
    scanned = eng2.scan("url").to_pandas()
    assert len(scanned) == n_live
    assert "_deleted" not in scanned.columns

    # (c) joins are over live rows on retention lakes too
    eng3 = CdcEngine(
        str(tmp_path / "ret2"),
        EngineConfig(num_partitions=4, tombstones=False, apply_concurrency=2),
        payload_schema=S.pages_schema(),
    )
    eng3.snapshot(gen.make_pages(spec.n_initial))
    joined = eng2.join_lake(eng3, join_type="inner").to_pandas()
    live_urls = set(
        lt.filter(pc.equal(lt["_deleted"], False))["url"].to_pylist()
    )
    snap_urls = set(eng3.lake_table()["url"].to_pylist())
    assert set(joined["url"]) == live_urls & snap_urls
    assert "_deleted" not in joined.columns


def test_scan_stats_enabled_on_reopen(tmp_path, ray_session):
    from debezium_incubator_ray import gen
    from debezium_incubator_ray import schema as S
    from debezium_incubator_ray.config import EngineConfig
    from debezium_incubator_ray.pipelines.cdc import CdcEngine

    lake = str(tmp_path / "lake")
    eng = CdcEngine(
        lake, EngineConfig(num_partitions=2), payload_schema=S.pages_schema()
    )
    eng.snapshot(gen.make_pages(50))
    eng.close()
    # reopen WITH stats: policy updates, new runs record zone maps
    eng2 = CdcEngine(lake, EngineConfig(num_partitions=2, stats_columns=("lang",)))
    assert eng2.cfg.stats_columns == ("lang",)
    spec = gen.BinlogSpec(n_events=100, n_initial=50, seg_rows=50,
                          num_partitions=2, seed=2)
    gen.write_binlog(str(tmp_path / "b"), spec, gen.gen_events(spec))
    eng2.run(str(tmp_path / "b"))
    assert any(
        (f.get("stats") or {}).get("lang")
        for p in range(2) for f in eng2.manifest.files(p)
    )


def test_expire_rows_ttl(tmp_path):
    """Retention sweep: rows below the cutoff leave the live state;
    provably-fresh runs carry over byte-identical (same file paths);
    NULL metric never expires; MoR deltas fold first."""
    import numpy as np

    from debezium_incubator_ray.pipelines import events_cdc as EC
    from debezium_incubator_ray.envelope import build_envelopes

    lake = str(tmp_path / "lake")
    binlog = str(tmp_path / "binlog")
    n = 64
    uids = list(range(n))
    vals = [float(u) if u % 7 else None for u in uids]  # some NULLs
    after = pa.table({
        "ts": pa.nulls(n, pa.timestamp("us")),
        "user_id": pa.array(uids, pa.int64()),
        "event_type": pa.array(["t"] * n, pa.string()),
        "value": pa.array(vals, pa.float64()),
        "props": pa.nulls(n, pa.string()),
    })
    env = build_envelopes(
        pa.array(["c"] * n, pa.string()), after, None,
        (np.asarray(uids) % EC.NUM_PARTITIONS).astype(np.int32),
        np.arange(1, n + 1, dtype=np.int64), table="events",
    )
    EC.write_env_binlog(env, binlog)
    eng = EC.make_engine(lake, stats_columns=("value",))
    eng.run(binlog)
    before_files = {
        p: [f["path"] for f in eng.manifest.files(p)]
        for p in range(EC.NUM_PARTITIONS)
    }
    res = eng.expire_rows("value", 30.0)
    lt = eng.lake_table()
    got = {r["user_id"]: r["value"] for r in lt.to_pylist()}
    for u in uids:
        v = vals[u]
        if v is None or v >= 30.0:
            assert u in got, f"row {u} wrongly expired"
        else:
            assert u not in got, f"row {u} should have expired"
    assert res["expired_rows"] == sum(
        1 for v in vals if v is not None and v < 30.0
    )
    # at least one partition rewrote; fresh runs carried over by path
    after_files = {
        p: [f["path"] for f in eng.manifest.files(p)]
        for p in range(EC.NUM_PARTITIONS)
    }
    assert after_files != before_files


def test_expire_rows_null_survives_whole_run_drop(tmp_path):
    """A run whose non-null stats are all-old but which CONTAINS a NULL
    row must not be dropped unread — NULL never expires."""
    import numpy as np

    from debezium_incubator_ray.pipelines import events_cdc as EC
    from debezium_incubator_ray.envelope import build_envelopes

    lake = str(tmp_path / "lake")
    binlog = str(tmp_path / "binlog")
    # both rows route to ONE partition; values [5.0, NULL] -> stats min=max=5
    uids = [0, EC.NUM_PARTITIONS]
    after = pa.table({
        "ts": pa.nulls(2, pa.timestamp("us")),
        "user_id": pa.array(uids, pa.int64()),
        "event_type": pa.array(["t", "t"], pa.string()),
        "value": pa.array([5.0, None], pa.float64()),
        "props": pa.nulls(2, pa.string()),
    })
    import numpy as _np

    env = build_envelopes(
        pa.array(["c", "c"], pa.string()), after, None,
        _np.zeros(2, dtype=_np.int32),
        _np.array([1, 2], dtype=_np.int64), table="events",
    )
    EC.write_env_binlog(env, binlog)
    eng = EC.make_engine(lake, stats_columns=("value",))
    eng.run(binlog)
    res = eng.expire_rows("value", 30.0)
    assert res["expired_rows"] == 1
    lt = eng.lake_table()
    assert lt.num_rows == 1
    assert lt["value"][0].as_py() is None


def test_erase_key_range(ray_session):
    """Range erasure: keys in [lo, hi] removed (including via unread
    whole-run drops), disjoint keys intact, a later higher-LSN event
    re-creates an erased key, and MoR deltas are scrubbed too."""
    import pyarrow.compute as pc

    from debezium_incubator_ray.pipelines import events_cdc as EC

    SF = "/root/testdata/sf0.001"
    root = EC.scratch_dir("rerange")
    binlog = root + "/binlog"
    lake = root + "/lake"
    env = EC.events_envelopes(SF)
    lsn = env["source"].combine_chunks().field("lsn")
    mid = int(pc.max(lsn).as_py()) // 2
    EC.write_env_binlog(env.filter(pc.less_equal(lsn, mid)), binlog)
    # small runs so some fall wholly inside the erased range
    eng = EC.make_engine(lake, sink_mode="mor")
    eng.run(binlog)
    EC.write_env_binlog(env.filter(pc.greater(lsn, mid)), binlog, append=True)
    eng.run(binlog)  # second epoch appends MoR deltas
    before = eng.lake_table()
    lo, hi = 5, 14
    res = eng.erase_key_range(lo, hi)
    after = eng.lake_table()
    uid = after["user_id"].to_pylist()
    assert not any(lo <= u <= hi for u in uid)
    kept = before.filter(pc.or_(
        pc.less(before["user_id"], lo), pc.greater(before["user_id"], hi)
    ))
    assert after.sort_by("user_id").equals(kept.sort_by("user_id"))
    # erased_rows counts PHYSICAL rows scrubbed (base rows + MoR delta
    # rows/markers), so it's >= the logical live-row delta
    assert res["erased_rows"] >= before.num_rows - kept.num_rows
    # a later event with a higher LSN re-creates an erased key
    import numpy as np
    import pyarrow as pa

    from debezium_incubator_ray import schema as S
    from debezium_incubator_ray.envelope import build_envelopes

    top = int(pc.max(lsn).as_py())
    after_tbl = pa.table({
        "user_id": pa.array([lo], pa.int64()),
        "ts": pa.array([None], pa.timestamp("us")),
        "event_type": pa.array(["revive"]),
        "value": pa.array([1.0], pa.float64()),
        "props": pa.array([None], pa.string()),
    })
    env2 = build_envelopes(
        pa.array(["c"], pa.string()), after_tbl, None,
        np.array([lo % EC.NUM_PARTITIONS], dtype=np.int32),
        pa.array([top + 1], pa.int64()), "events_a",
    )
    EC.write_env_binlog(env2, binlog, append=True)
    eng.run(binlog)
    revived = eng.lake_table().filter(
        pc.equal(eng.lake_table()["user_id"], lo)
    )
    assert revived.num_rows == 1
    assert revived["event_type"][0].as_py() == "revive"


def test_purge_tombstones_gc_grace(ray_session):
    """Retention-lake tombstone GC: markers at/below the horizon are
    purged, younger markers and live rows survive; on a MoR lake the
    deltas fold first so no masked base row resurrects; a compacting
    lake refuses."""
    import pyarrow.compute as pc

    from debezium_incubator_ray.envelope import DELETED
    from debezium_incubator_ray.pipelines import events_cdc as EC

    SF = "/root/testdata/sf0.001"
    root = EC.scratch_dir("tbgc")
    binlog, lake = root + "/binlog", root + "/lake"
    env = EC.events_envelopes(SF)
    lsn = env["source"].combine_chunks().field("lsn")
    mid = int(pc.max(lsn).as_py()) // 2
    EC.write_env_binlog(env.filter(pc.less_equal(lsn, mid)), binlog)
    eng = EC.make_engine(lake, tombstones=False, sink_mode="mor")
    eng.run(binlog)
    EC.write_env_binlog(env.filter(pc.greater(lsn, mid)), binlog, append=True)
    eng.run(binlog)  # markers now live in MoR deltas too
    before = eng.lake_table(include_lsn=True)
    res = eng.purge_tombstones(upto_lsn=mid)
    after = eng.lake_table(include_lsn=True)
    dead = pc.fill_null(before[DELETED], False)
    old_markers = before.filter(pc.and_(
        dead, pc.less_equal(before["_lsn"], mid)
    ))
    expect = before.filter(pc.invert(pc.and_(
        dead, pc.less_equal(before["_lsn"], mid)
    )))
    assert res["purged_rows"] == old_markers.num_rows
    assert after.sort_by("user_id").equals(expect.sort_by("user_id"))
    # young markers (lsn > mid) survived the purge
    young_before = before.filter(pc.and_(
        dead, pc.greater(before["_lsn"], mid)
    )).num_rows
    young_after = after.filter(
        pc.fill_null(after[DELETED], False)
    ).num_rows
    assert young_before > 0  # vacuous otherwise
    assert young_after == young_before
    # compacting lakes have no markers to purge
    import pytest as _pytest

    eng2 = EC.make_engine(root + "/lake2")
    with _pytest.raises(ValueError, match="retention"):
        eng2.purge_tombstones(upto_lsn=1)


def test_reshard_grow_preserves_state_and_accepts_new_epochs(tmp_path):
    """P=4 -> P=10: state byte-identical, rows land where the new
    partitioner says, and a post-reshard epoch over an OLD-layout binlog
    still applies exactly-once (exchange path + min-watermark rule)."""
    from debezium_incubator_ray.hashing import partition_ids

    spec = gen.BinlogSpec(
        n_events=3000, n_initial=300, seg_rows=256,
        num_partitions=4, seed=31,
    )
    ev = gen.gen_events(spec)
    binlog = str(tmp_path / "binlog")
    gen.write_binlog(binlog, spec, ev)
    lake = str(tmp_path / "lake")
    eng = CdcEngine(
        lake,
        EngineConfig(num_partitions=4, target_rows_per_file=100_000),
        payload_schema=S.pages_schema(),
    )
    eng.snapshot(gen.make_pages(spec.n_initial))
    # apply only PART of the stream so watermarks differ across partitions
    eng.apply_epoch(binlog, max_segments=2)
    before_partial = eng.lake_table(include_lsn=True).sort_by(
        [(eng.cfg.key, "ascending")]
    )
    wms_before = [eng.manifest.watermark(p) for p in range(4)]

    st = eng.reshard(10)
    assert st["num_partitions"] == 10
    assert eng.manifest.num_partitions == 10
    # min-watermark rule
    assert all(
        eng.manifest.watermark(q) == min(wms_before) for q in range(10)
    )
    after = eng.lake_table(include_lsn=True).sort_by(
        [(eng.cfg.key, "ascending")]
    )
    assert_tables_equal(before_partial, after)
    # physical routing: every run's rows belong to its new partition
    for q in range(10):
        for f in eng.manifest.files(q):
            t = pa.parquet.read_table(os.path.join(lake, f["path"]))
            got = partition_ids(
                t[eng.cfg.key].combine_chunks(), 10,
                eng.manifest.doc.get("partitioner", "hash"),
            )
            assert (got == q).all()

    # drain the rest of the binlog: the old-layout segments route through
    # the exchange path against the resharded lake
    eng.run(binlog)
    final = eng.lake_table()
    oracle = gen.oracle_final_state(spec, ev)
    assert_tables_equal(
        final.sort_by([(eng.cfg.key, "ascending")]),
        oracle.sort_by([(eng.cfg.key, "ascending")]),
    )

    # reopen from the manifest alone: num_partitions restored
    n_final = final.num_rows
    del final, eng  # release the lake lock before reopening
    eng2 = CdcEngine(lake)
    assert eng2.cfg.num_partitions == 10
    # redelivery of everything is a no-op (exactly-once across reshard)
    eng2.manifest.doc["segments_done"] = []
    res = eng2.apply_epoch(binlog)
    assert res["events"] == 0 or res.get("applied", 0) == 0
    assert eng2.lake_table().num_rows == n_final


def test_reshard_partial_lake_and_counter_refusal(tmp_path):
    """Per-cell-LWW lakes reshard (redelivery-idempotent); counter lakes
    refuse (additive folds double-count on replay)."""
    spec = gen.BinlogSpec(
        n_events=800, n_initial=100, seg_rows=128,
        num_partitions=4, seed=33,
    )
    ev = gen.gen_events(spec)
    binlog = str(tmp_path / "binlog")
    gen.write_binlog(binlog, spec, ev)
    lake = str(tmp_path / "lake")
    eng = CdcEngine(
        lake,
        EngineConfig(num_partitions=4, merge_mode="partial"),
        payload_schema=S.pages_schema(),
    )
    eng.snapshot(gen.make_pages(spec.n_initial))
    eng.run(binlog)
    before = eng.lake_table(include_lsn=True).sort_by(
        [(eng.cfg.key, "ascending")]
    )
    st = eng.reshard(8)
    assert st["num_partitions"] == 8
    after = eng.lake_table(include_lsn=True).sort_by(
        [(eng.cfg.key, "ascending")]
    )
    assert_tables_equal(before, after)

    # counter lake: reshard must refuse (additive folds double-count on
    # replay) — flip the manifest policy bit on the resharded lake
    eng.manifest.doc["counter_cols"] = ["views"]
    with pytest.raises(RuntimeError, match="counter"):
        eng.reshard(16)


def test_clone_branches_independently(tmp_path):
    """Hardlink branch: clone reads identically at the branch point,
    then the two lakes diverge — epochs on the clone never touch the
    original, and vacuuming the original never breaks the clone."""
    spec = gen.BinlogSpec(
        n_events=2000, n_initial=200, seg_rows=256,
        num_partitions=4, seed=37,
    )
    ev = gen.gen_events(spec)
    binlog = str(tmp_path / "binlog")
    gen.write_binlog(binlog, spec, ev)
    lake = str(tmp_path / "lake")
    eng = CdcEngine(
        lake, EngineConfig(num_partitions=4),
        payload_schema=S.pages_schema(),
    )
    eng.snapshot(gen.make_pages(spec.n_initial))
    eng.apply_epoch(binlog, max_segments=2)
    branch_tbl = eng.lake_table(include_lsn=True)

    clone = eng.clone(str(tmp_path / "branch"))
    assert_tables_equal(
        clone.lake_table(include_lsn=True), branch_tbl, sort_by="url"
    )
    # forced replay of already-applied segments on the clone is a no-op
    # (the branch carries the source's watermarks)
    clone.manifest.doc["segments_done"] = []
    res = clone.apply_epoch(binlog, max_segments=2)
    assert res["applied"] == 0

    # the clone drains the full stream; the original stays at the branch
    clone.run(binlog)
    oracle = gen.oracle_final_state(spec, ev)
    assert_tables_equal(clone.lake_table(), oracle, sort_by="url")
    assert_tables_equal(
        eng.lake_table(include_lsn=True), branch_tbl, sort_by="url"
    )

    # vacuum the ORIGINAL after it diverges too: clone still reads
    eng.run(binlog)
    eng.vacuum(keep_versions=1)
    assert_tables_equal(clone.lake_table(), oracle, sort_by="url")
    assert_tables_equal(eng.lake_table(), oracle, sort_by="url")

    # destination collision refused
    with pytest.raises(ValueError, match="already a lake"):
        eng.clone(str(tmp_path / "branch"))


def test_update_rows_zone_pruning_and_invariants(tmp_path):
    """Predicate UPDATE: values change only where the predicate holds,
    _lsn/watermarks don't move, zone bounds skip disjoint runs unread,
    and key columns / partial lakes refuse."""
    spec = gen.BinlogSpec(
        n_events=1500, n_initial=200, seg_rows=256,
        num_partitions=4, seed=41,
    )
    ev = gen.gen_events(spec)
    binlog = str(tmp_path / "binlog")
    gen.write_binlog(binlog, spec, ev)
    lake = str(tmp_path / "lake")
    eng = CdcEngine(
        lake,
        EngineConfig(num_partitions=4, stats_columns=("warc_ts",)),
        payload_schema=S.pages_schema(),
    )
    eng.snapshot(gen.make_pages(spec.n_initial))
    eng.run(binlog)
    before = eng.lake_table(include_lsn=True)
    wms = {p: eng.manifest.watermark(p) for p in range(4)}

    st = eng.update_rows(
        lambda t: pc.equal(t["lang"], "en"),
        {"text": lambda t: pc.binary_join_element_wise(
            pc.cast(t["text"], pa.string()), "[updated]", ""
        )},
    )
    after = eng.lake_table(include_lsn=True)
    assert {p: eng.manifest.watermark(p) for p in range(4)} == wms
    b = before.sort_by("url")
    a = after.sort_by("url")
    assert a["_lsn"].equals(b["_lsn"])
    en = pc.equal(b["lang"], "en")
    n_en = int(pc.sum(pc.cast(en, pa.int64())).as_py())
    assert st["updated_rows"] == n_en > 0
    got_txt = a["text"].to_pylist()
    want_txt = [
        t + "[updated]" if is_en else t
        for t, is_en in zip(b["text"].to_pylist(), en.to_pylist())
    ]
    assert got_txt == want_txt

    # key column refuses
    with pytest.raises(ValueError, match="key"):
        eng.update_rows(lambda t: pc.equal(t["lang"], "en"),
                        {"url": lambda t: t["url"]})
    # partial-merge lakes refuse
    eng.manifest.doc["merge_mode"] = "partial"
    with pytest.raises(RuntimeError, match="partial"):
        eng.update_rows(lambda t: pc.equal(t["lang"], "en"),
                        {"text": lambda t: t["text"]})


def test_update_rows_temporal_zone_bounds(tmp_path):
    """zone=(col, lo, hi) with a TEMPORAL stats column: bounds round-trip
    through the ISO zone-map encoding — a disjoint bound updates nothing
    (runs skipped unread), a covering bound behaves like no zone."""
    import datetime

    spec = gen.BinlogSpec(
        n_events=800, n_initial=100, seg_rows=256,
        num_partitions=2, seed=43,
    )
    ev = gen.gen_events(spec)
    binlog = str(tmp_path / "binlog")
    gen.write_binlog(binlog, spec, ev)
    lake = str(tmp_path / "lake")
    eng = CdcEngine(
        lake,
        EngineConfig(num_partitions=2, stats_columns=("warc_ts",)),
        payload_schema=S.pages_schema(),
    )
    eng.snapshot(gen.make_pages(spec.n_initial))
    eng.run(binlog)
    before = eng.lake_table(include_lsn=True)

    far_future = datetime.datetime(2100, 1, 1)
    st0 = eng.update_rows(
        lambda t: pc.is_valid(t["url"]),
        {"lang": lambda t: pa.array(["zz"] * t.num_rows)},
        zone=("warc_ts", far_future, datetime.datetime(2101, 1, 1)),
    )
    assert st0["updated_rows"] == 0
    assert_tables_equal(eng.lake_table(include_lsn=True), before,
                        sort_by="url")

    st1 = eng.update_rows(
        lambda t: pc.is_valid(t["url"]),
        {"lang": lambda t: pa.array(["zz"] * t.num_rows)},
        zone=("warc_ts", datetime.datetime(1970, 1, 1), far_future),
    )
    assert st1["updated_rows"] == before.num_rows
    assert set(eng.lake_table()["lang"].to_pylist()) == {"zz"}
