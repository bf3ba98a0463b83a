"""JoinView — incrementally-maintained co-partitioned join views.

Laws: (1) a refreshed view is byte-equal to a from-scratch join_lake
materialization; (2) refresh against unchanged sources rewrites NOTHING;
(3) a source change refreshes ONLY the partitions it touched; (4) files
not named by the committed state are invisible to readers and get
janitored when their partition next refreshes; (5) co-partitioning is
validated at construction.
"""

import os

import numpy as np
import pyarrow.compute as pc
import pytest

from debezium_incubator_ray import gen
from debezium_incubator_ray import schema as S
from debezium_incubator_ray.config import EngineConfig
from debezium_incubator_ray.hashing import partition_ids
from debezium_incubator_ray.pipelines.cdc import CdcEngine
from debezium_incubator_ray.pipelines.view import JoinView


def _mk_pair(tmp_path, n_initial=120, n_events=600, parts=4):
    """Left = snapshot + stream; right = snapshot only (same universe)."""
    spec = gen.BinlogSpec(n_events=n_events, n_initial=n_initial,
                          seg_rows=128, num_partitions=parts, seed=21)
    binlog = str(tmp_path / "binlog")
    gen.write_binlog(binlog, spec)
    left = CdcEngine(str(tmp_path / "left"),
                     EngineConfig(num_partitions=parts, apply_concurrency=2),
                     payload_schema=S.pages_schema())
    left.snapshot(gen.make_pages(n_initial))
    left.run(binlog)
    right = CdcEngine(str(tmp_path / "right"),
                      EngineConfig(num_partitions=parts,
                                   apply_concurrency=2),
                      payload_schema=S.pages_schema())
    right.snapshot(gen.make_pages(n_initial))
    return left, right


def test_join_view_matches_join_lake_and_skips_when_fresh(
    tmp_path, ray_session
):
    left, right = _mk_pair(tmp_path)
    view = left.join_view(right, str(tmp_path / "view"))

    r1 = view.refresh()
    assert r1["refreshed"] == 4 and r1["skipped"] == 0
    want = left.join_lake(right, join_type="inner").to_pandas()
    got = view.table().to_pandas()
    assert sorted(got.columns) == sorted(want.columns)
    w = want.sort_values("url").reset_index(drop=True)[sorted(want.columns)]
    g = got.sort_values("url").reset_index(drop=True)[sorted(got.columns)]
    assert g.equals(w)

    # unchanged sources: nothing recomputed, version does not move
    r2 = view.refresh()
    assert r2 == {"version": r1["version"], "refreshed": 0,
                  "skipped": 4, "rows_written": 0}

    # read() streams the same rows
    assert view.read().count() == len(got)


def test_join_view_incremental_refresh_touches_only_changed_partitions(
    tmp_path, ray_session
):
    left, right = _mk_pair(tmp_path)
    view = left.join_view(right, str(tmp_path / "view"))
    view.refresh()

    # erase two keys living in ONE partition of the left lake
    lt = left.lake_table()
    urls = lt["url"].to_pylist()
    parts = partition_ids(lt["url"].combine_chunks(), 4, "hash")
    in_p0 = [u for u, p in zip(urls, parts) if p == 0][:2]
    assert in_p0
    left.erase_keys(in_p0)

    r = view.refresh()
    assert r["refreshed"] == 1 and r["skipped"] == 3

    want = left.join_lake(right, join_type="inner").to_pandas()
    got = view.table().to_pandas()
    cols = sorted(want.columns)
    assert (
        got.sort_values("url").reset_index(drop=True)[cols]
        .equals(want.sort_values("url").reset_index(drop=True)[cols])
    )
    assert not any(u in set(got["url"]) for u in in_p0)


def test_join_view_orphans_invisible_readers_safe_then_vacuumed(
    tmp_path, ray_session
):
    left, right = _mk_pair(tmp_path)
    view = left.join_view(right, str(tmp_path / "view"))
    view.refresh()
    before = view.table().to_pandas()
    old_files = view._committed_files()

    # simulate a crash between file write and state commit
    pdir = os.path.join(view.view_dir, "p=0")
    orphan = os.path.join(pdir, "view-deadbeef.parquet")
    with open(orphan, "wb") as f:
        f.write(b"not parquet at all")
    got = view.table().to_pandas()
    assert got.equals(before)  # reader never opens the orphan

    # a refresh SUPERSEDES partition 0 but leaves the old bytes for
    # in-flight readers of the previous version
    lt = left.lake_table()
    parts = partition_ids(lt["url"].combine_chunks(), 4, "hash")
    u0 = [u for u, p in zip(lt["url"].to_pylist(), parts) if p == 0][:1]
    left.erase_keys(u0)
    r = view.refresh()
    assert r["refreshed"] == 1
    assert all(os.path.exists(f) for f in old_files)
    assert os.path.exists(orphan)

    # vacuum reclaims everything the committed state does not name
    v = view.vacuum()
    assert v["files_removed"] == 2  # orphan + superseded p=0 file
    assert not os.path.exists(orphan)
    live = set(view._committed_files())
    assert all(os.path.exists(f) for f in live)


def test_join_view_refresh_is_single_writer(tmp_path, ray_session):
    from debezium_incubator_ray.pipelines.view import (
        JoinViewLockedError, _view_write_lock,
    )

    left, right = _mk_pair(tmp_path, n_events=50)
    view = left.join_view(right, str(tmp_path / "view"))
    with _view_write_lock(view.view_dir):
        with pytest.raises(JoinViewLockedError):
            view.refresh()
        with pytest.raises(JoinViewLockedError):
            view.vacuum()
    # lock released -> refresh proceeds
    assert view.refresh()["refreshed"] == 4


def test_join_view_validates_copartitioning(tmp_path, ray_session):
    left, _ = _mk_pair(tmp_path, n_events=50)
    other = CdcEngine(str(tmp_path / "other"),
                      EngineConfig(num_partitions=8, apply_concurrency=2),
                      payload_schema=S.pages_schema())
    other.snapshot(gen.make_pages(10))
    with pytest.raises(ValueError, match="co-partition"):
        JoinView(str(tmp_path / "v2"), left, other)


def test_join_view_empty_inner_join(tmp_path, ray_session):
    """Disjoint key universes: the view commits zero files and both read
    paths return an EMPTY result with the real join schema."""
    parts = 4
    left = CdcEngine(str(tmp_path / "l"),
                     EngineConfig(num_partitions=parts, apply_concurrency=2),
                     payload_schema=S.pages_schema())
    left.snapshot(gen.make_pages(30))
    right = CdcEngine(str(tmp_path / "r"),
                      EngineConfig(num_partitions=parts,
                                   apply_concurrency=2),
                      payload_schema=S.pages_schema())
    # shift ids far away so the url sets are disjoint
    pages = gen.payload_table(np.arange(10_000, 10_030, dtype=np.int64),
                              np.zeros(30, dtype=np.int64))
    right.snapshot(pages)
    view = left.join_view(right, str(tmp_path / "view"))
    r = view.refresh()
    assert r["rows_written"] == 0
    t = view.table()
    assert t.num_rows == 0
    assert "url" in t.column_names
    assert view.read().count() == 0


def test_join_view_lineage_records_each_commit(tmp_path, ray_session):
    left, right = _mk_pair(tmp_path)
    view = left.join_view(right, str(tmp_path / "view"))
    view.refresh()
    view.refresh()  # no-op: must NOT add a lineage row
    lt = left.lake_table()
    parts = partition_ids(lt["url"].combine_chunks(), 4, "hash")
    u0 = [u for u, p in zip(lt["url"].to_pylist(), parts) if p == 0][:1]
    left.erase_keys(u0)
    view.refresh()
    lin = view.lineage()
    assert [r["version"] for r in lin] == [1, 2]
    assert lin[0]["refreshed"] == 4 and lin[0]["partitions"] == [0, 1, 2, 3]
    assert lin[1]["refreshed"] == 1 and lin[1]["partitions"] == [0]


def test_join_view_lock_is_cross_process(tmp_path, ray_session):
    import subprocess
    import sys
    import textwrap

    left, right = _mk_pair(tmp_path, n_events=50)
    view = left.join_view(right, str(tmp_path / "view"))
    view.refresh()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = textwrap.dedent("""
        import sys
        import ray
        ray.init(address="local", num_cpus=2, include_dashboard=False,
                 logging_level="ERROR")
        from debezium_incubator_ray.pipelines.cdc import CdcEngine
        from debezium_incubator_ray.pipelines.view import (
            JoinView, JoinViewLockedError,
        )
        vdir, ldir, rdir = sys.argv[1:4]
        v = JoinView(vdir, CdcEngine(ldir), CdcEngine(rdir))
        try:
            v.refresh()
            print("RAN")
        except JoinViewLockedError:
            print("REJECTED")
    """)
    from debezium_incubator_ray.pipelines.view import _view_write_lock

    env = dict(os.environ, PYTHONPATH=repo, RAY_ADDRESS="local")
    with _view_write_lock(view.view_dir):
        r = subprocess.run(
            [sys.executable, "-c", script, view.view_dir,
             left.lake_dir, right.lake_dir],
            capture_output=True, text=True, timeout=300, env=env, cwd=repo,
        )
    assert r.returncode == 0, r.stderr[-2000:]
    assert r.stdout.strip().splitlines()[-1] == "REJECTED"


def test_join_view_schema_evolution_forces_full_refresh(
    tmp_path, ray_session
):
    """An add_column evolution on a source bumps every partition's
    fingerprint (schema version + defaults are part of it): the next
    refresh rewrites ALL partitions and the view carries the new
    column with its backfill default."""
    left, right = _mk_pair(tmp_path, n_events=200)
    view = left.join_view(right, str(tmp_path / "view"))
    view.refresh()
    assert "score" not in view.table().column_names

    left.apply_schema_changes([
        S.SchemaChange(change="add_column", column="score",
                       type="double", default=1.5, at_lsn=10**9)
    ])
    r = view.refresh()
    assert r["refreshed"] == 4
    t = view.table()
    assert "score" in t.column_names
    assert set(t["score"].to_pylist()) == {1.5}
    # projected read prunes to the requested columns
    got = view.read(columns=["url", "score"]).to_pandas()
    assert sorted(got.columns) == ["score", "url"]


def test_join_view_maintained_during_tail(tmp_path, ray_session):
    """The streaming-materialized-view composition: tail(on_epoch=
    refresh) keeps the join view in lockstep with the lake — after the
    tail drains, the view equals a fresh full join WITHOUT any final
    manual refresh, and at least one refresh skipped partitions (the
    incremental path actually engaged)."""
    spec = gen.BinlogSpec(n_events=400, n_initial=100, seg_rows=64,
                          num_partitions=4, seed=33)
    binlog = str(tmp_path / "binlog")
    gen.write_binlog(binlog, spec)
    left = CdcEngine(str(tmp_path / "left"),
                     EngineConfig(num_partitions=4, apply_concurrency=2),
                     payload_schema=S.pages_schema())
    left.snapshot(gen.make_pages(100))
    right = CdcEngine(str(tmp_path / "right"),
                      EngineConfig(num_partitions=4, apply_concurrency=2),
                      payload_schema=S.pages_schema())
    right.snapshot(gen.make_pages(100))
    view = left.join_view(right, str(tmp_path / "view"))
    view.refresh()

    refreshes = []
    left.tail(binlog, poll_interval_s=0.05, idle_polls=1,
              max_segments_per_epoch=4,
              on_epoch=lambda st: refreshes.append(view.refresh()))
    assert len(refreshes) >= 2  # multiple epochs each refreshed the view

    want = left.join_lake(right, join_type="inner").to_pandas()
    got = view.table().to_pandas()
    cols = sorted(want.columns)
    assert (
        got.sort_values("url").reset_index(drop=True)[cols]
        .equals(want.sort_values("url").reset_index(drop=True)[cols])
    )


def test_join_view_tracks_mor_delta_epochs(tmp_path, ray_session):
    """MoR lakes append DELTA runs instead of rewriting bases; the
    partition fingerprint covers the delta entries (they live inside
    the manifest's partition doc), so a delta-only epoch still marks
    the partition stale and the view folds the merged state."""
    spec = gen.BinlogSpec(n_events=400, n_initial=100, seg_rows=128,
                          num_partitions=4, seed=11)
    binlog = str(tmp_path / "binlog")
    gen.write_binlog(binlog, spec)
    left = CdcEngine(str(tmp_path / "left"),
                     EngineConfig(num_partitions=4, sink_mode="mor",
                                  apply_concurrency=2),
                     payload_schema=S.pages_schema())
    left.snapshot(gen.make_pages(100))
    right = CdcEngine(str(tmp_path / "right"),
                      EngineConfig(num_partitions=4, apply_concurrency=2),
                      payload_schema=S.pages_schema())
    right.snapshot(gen.make_pages(100))
    view = left.join_view(right, str(tmp_path / "view"))
    view.refresh()

    left.run(binlog)  # MoR: delta runs only
    assert any(left.manifest.deltas(p) for p in range(4))
    r = view.refresh()
    assert r["refreshed"] >= 1
    want = left.join_lake(right, join_type="inner").to_pandas()
    got = view.table().to_pandas()
    cols = sorted(want.columns)
    assert (
        got.sort_values("url").reset_index(drop=True)[cols]
        .equals(want.sort_values("url").reset_index(drop=True)[cols])
    )


def test_join_lake_version_pinned(tmp_path, ray_session):
    """join_lake(left_version=) joins the RETAINED state: a join pinned
    to the pre-stream version ignores everything streamed after."""
    spec = gen.BinlogSpec(n_events=300, n_initial=80, seg_rows=64,
                          num_partitions=4, seed=5)
    binlog = str(tmp_path / "binlog")
    gen.write_binlog(binlog, spec)
    left = CdcEngine(str(tmp_path / "left"),
                     EngineConfig(num_partitions=4, apply_concurrency=2),
                     payload_schema=S.pages_schema())
    left.snapshot(gen.make_pages(80))
    v_snap = left.manifest.version
    frozen = left.join_lake  # bind before streaming for clarity
    right = CdcEngine(str(tmp_path / "right"),
                      EngineConfig(num_partitions=4, apply_concurrency=2),
                      payload_schema=S.pages_schema())
    right.snapshot(gen.make_pages(80))
    want = left.join_lake(right, join_type="inner").to_pandas()

    left.run(binlog)  # the live state moves on
    live = left.join_lake(right, join_type="inner").to_pandas()
    pinned = frozen(right, join_type="inner",
                    left_version=v_snap).to_pandas()
    cols = sorted(want.columns)

    def canon(df):
        return df.sort_values("url").reset_index(drop=True)[cols]

    assert canon(pinned).equals(canon(want))
    assert not canon(live).equals(canon(want))  # streaming really moved it


def test_join_view_custom_manifest_store(tmp_path, ray_session):
    """The control plane honors an injected ManifestStore (the
    object-store deployment): state lives in the store, not the
    default _view dir."""
    from debezium_incubator_ray.pipelines.view import JoinView
    from debezium_incubator_ray.state.store import MemoryStore

    left, right = _mk_pair(tmp_path, n_events=50)
    store = MemoryStore()
    view = JoinView(str(tmp_path / "view"), left, right, store=store)
    r = view.refresh()
    assert r["refreshed"] == 4
    assert store.read("viewstate.json") is not None
    assert not os.path.exists(str(tmp_path / "view" / "_view"))
    # a second handle over the same store resumes the committed state
    view2 = JoinView(str(tmp_path / "view"), left, right, store=store)
    assert view2.refresh()["refreshed"] == 0


def test_tail_on_epoch_exception_aborts_but_lake_consistent(
    tmp_path, ray_session
):
    """A raising on_epoch hook aborts the tail (fail-loud) AFTER the
    epoch committed — the lake is consistent and a plain re-run
    converges to the full state."""
    spec = gen.BinlogSpec(n_events=300, n_initial=60, seg_rows=64,
                          num_partitions=4, seed=9)
    binlog = str(tmp_path / "binlog")
    gen.write_binlog(binlog, spec)
    eng = CdcEngine(str(tmp_path / "lake"),
                    EngineConfig(num_partitions=4, apply_concurrency=2),
                    payload_schema=S.pages_schema())
    eng.snapshot(gen.make_pages(60))

    calls = []

    def boom(st):
        calls.append(st)
        raise RuntimeError("derived-state refresh failed")

    with pytest.raises(RuntimeError, match="derived-state"):
        eng.tail(binlog, poll_interval_s=0.05, idle_polls=1,
                 max_segments_per_epoch=4, on_epoch=boom)
    assert len(calls) == 1  # aborted on the FIRST progressing epoch

    eng.run(binlog)  # plain resume drains the rest
    ev = gen.gen_events(spec)
    want = gen.oracle_final_state(spec, ev)
    got = eng.lake_table().sort_by([("url", "ascending")])
    for col in want.column_names:
        assert got[col].combine_chunks().equals(
            want[col].combine_chunks()), col
