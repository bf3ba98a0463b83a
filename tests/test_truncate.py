"""TRUNCATE TABLE events (op='t', EngineConfig.truncate_events).

Semantics under test: the newest truncate marker wipes every row whose LSN
is <= the marker's LSN — committed lake rows AND same-epoch older events —
while later events re-create their keys; replaying the drained binlog is a
no-op (the watermark advanced past the marker); the exchange path (marker
fan-out) and the aligned path (per-partition marker replication) agree.
"""

import os

import pyarrow as pa
import pyarrow.compute as pc

from debezium_incubator_ray import schema as S
from debezium_incubator_ray.envelope import lww_reduce
from debezium_incubator_ray.pipelines import events_cdc as EC

from tests.conftest import assert_tables_equal

SF = "/root/testdata/sf0.001"


def test_truncate_aligned_vs_exchange(ray_session):
    a = EC.final_state_truncated(SF, aligned=True)
    b = EC.final_state_truncated(SF, aligned=False)
    assert_tables_equal(a, b, sort_by="user_id")


def test_truncate_replay_and_restart_noop(ray_session):
    root = EC.scratch_dir("trunc-replay")
    binlog = os.path.join(root, "binlog")
    lake = os.path.join(root, "lake")
    env = EC.events_envelopes(SF, lsn_stride=2)
    n = env.num_rows
    t_lsn = 2 * ((n - 1) * 3 // 5) + 1
    marker = EC.truncate_marker(t_lsn)
    env2 = pa.concat_tables([env, marker], promote_options="permissive")
    env2 = env2.sort_by([("ts_ms", "ascending")])
    EC.write_env_binlog(env2, binlog)
    eng = EC.make_engine(lake, truncate_events=True)
    eng.run(binlog)
    state1 = eng.lake_table(include_lsn=True).sort_by(
        [("user_id", "ascending")]
    )
    # every surviving row postdates the marker
    assert state1.num_rows > 0
    assert pc.min(state1[S.LSN]).as_py() > t_lsn
    # dup redelivery of ALL segments (marker included) must be a no-op
    eng.manifest.doc["segments_done"] = []
    res = eng.apply_epoch(binlog)
    assert res["applied"] == 0
    # restart from the manifest: same state
    del eng
    eng = EC.make_engine(lake, truncate_events=True)
    state2 = eng.lake_table(include_lsn=True).sort_by(
        [("user_id", "ascending")]
    )
    assert_tables_equal(state1, state2)


def test_truncate_across_epochs_wipes_committed_rows(ray_session):
    """Epoch 1 commits normal events; epoch 2 delivers ONLY a truncate
    marker newer than everything — the lake must end up empty."""
    root = EC.scratch_dir("trunc-epochs")
    binlog = os.path.join(root, "binlog")
    lake = os.path.join(root, "lake")
    env = EC.events_envelopes(SF, lsn_stride=2)
    EC.write_env_binlog(env, binlog)
    eng = EC.make_engine(lake, truncate_events=True)
    eng.run(binlog)
    assert eng.lake_table().num_rows > 0
    t_lsn = 2 * (env.num_rows - 1) + 1  # newer than every event
    marker = EC.truncate_marker(t_lsn)
    EC.write_env_binlog(marker, binlog, append=True)
    eng.run(binlog)
    assert eng.lake_table().num_rows == 0


def test_truncate_disabled_skips_marker(ray_session):
    """Without EngineConfig.truncate_events the op='t' row is an
    unsupported mutation kind: skipped, nothing wiped."""
    root = EC.scratch_dir("trunc-off")
    binlog = os.path.join(root, "binlog")
    lake = os.path.join(root, "lake")
    env = EC.events_envelopes(SF)
    t_lsn = env.num_rows * 10  # would wipe everything if honored
    marker = EC.truncate_marker(t_lsn)
    env2 = pa.concat_tables([env, marker], promote_options="permissive")
    EC.write_env_binlog(env2, binlog)
    eng = EC.make_engine(lake)  # truncate_events defaults False
    eng.run(binlog)
    baseline = EC.final_state(SF).sort_by([("user_id", "ascending")])
    got = eng.lake_table(include_lsn=True)
    i = got.schema.get_field_index(S.LSN)
    got = got.set_column(i, pa.field("lsn", pa.int64()), got[S.LSN])
    assert_tables_equal(
        got.sort_by([("user_id", "ascending")]), baseline
    )


def test_lww_reduce_null_keys_survive():
    """Null-key control rows never collapse with each other and never
    steal a real key's winner slot."""
    t = pa.table({
        "k": pa.array([1, 1, None, None], pa.int64()),
        S.LSN: pa.array([5, 9, 3, 7], pa.int64()),
        "op": pa.array(["u", "u", "t", "t"]),
    })
    out = lww_reduce(t, "k")
    assert out.num_rows == 3  # one winner for k=1, both null rows kept
    kept = out.filter(pc.is_valid(out["k"]))
    assert kept[S.LSN].to_pylist() == [9]
