"""merge_mode='partial' (per-cell LWW, Cassandra CellData presence
semantics): kernel laws for partial_fold/merge_partial and the engine
end-to-end on both the aligned and the exchange path."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from debezium_incubator_ray.envelope import (
    HAD_DEL,
    SET_MASK,
    merge_partial,
    partial_fold,
)

SF = "/root/testdata/sf0.001"


def ev(k, lsn, op, a=None, b=None, mask=None):
    return {"k": k, "a": a, "b": b, "op": op, "_lsn": lsn,
            SET_MASK: mask}


def tbl(rows):
    return pa.table({
        "k": pa.array([r["k"] for r in rows], pa.int64()),
        "a": pa.array([r["a"] for r in rows], pa.int64()),
        "b": pa.array([r["b"] for r in rows], pa.string()),
        "op": pa.array([r["op"] for r in rows], pa.string()),
        "_lsn": pa.array([r["_lsn"] for r in rows], pa.int64()),
        SET_MASK: pa.array([r[SET_MASK] for r in rows], pa.int64()),
    })


# mask bits: 0=k, 1=a, 2=b
def test_partial_fold_latest_setter_per_cell():
    t = tbl([
        ev(1, 10, "c", a=1, b="x", mask=7),
        ev(1, 20, "u", a=2, b="IGNORED", mask=3),   # sets only a
        ev(1, 30, "u", a=99, b="z", mask=5),        # sets only b
    ])
    out = partial_fold(t, "k")
    assert out.num_rows == 1
    r = out.to_pylist()[0]
    assert (r["a"], r["b"]) == (2, "z")
    assert r["_lsn"] == 30 and r["op"] == "u" and not r[HAD_DEL]
    assert r[SET_MASK] == 7


def test_partial_fold_delete_shadows_older_cells():
    t = tbl([
        ev(1, 10, "c", a=1, b="x", mask=7),
        ev(1, 20, "d", mask=7),
        ev(1, 30, "u", a=5, b=None, mask=3),  # only a set after the delete
    ])
    r = partial_fold(t, "k").to_pylist()[0]
    assert r["a"] == 5 and r["b"] is None
    assert r[SET_MASK] == 3 and r[HAD_DEL] and r["op"] == "u"


def test_partial_fold_dead_key_and_missing_mask():
    t = tbl([
        ev(1, 10, "c", a=1, b="x", mask=7),
        ev(1, 20, "d", mask=7),
        ev(2, 5, "u", a=3, b="q", mask=None),  # null mask = full row
    ])
    out = partial_fold(t, "k")
    rows = {r["k"]: r for r in out.to_pylist()}
    assert rows[1]["op"] == "d" and rows[1]["_lsn"] == 20
    assert rows[2]["op"] == "u" and rows[2]["a"] == 3 and rows[2]["b"] == "q"
    # a table with no mask column at all is also full-row
    out2 = partial_fold(t.drop_columns([SET_MASK]), "k")
    assert {r["k"]: r["op"] for r in out2.to_pylist()} == {1: "d", 2: "u"}


def test_merge_partial_inherit_vs_had_del():
    lake = pa.table({
        "k": pa.array([1, 2, 3], pa.int64()),
        "a": pa.array([10, 20, 30], pa.int64()),
        "b": pa.array(["p", "q", "r"], pa.string()),
        "_lsn": pa.array([1, 1, 1], pa.int64()),
    })
    patches = partial_fold(tbl([
        ev(1, 50, "u", a=11, b="DEAD", mask=3),          # unset b inherits
        ev(2, 60, "d", mask=7),                           # key dies
        ev(3, 70, "d", mask=7),
        ev(3, 80, "u", a=None, b="new", mask=5),          # post-delete: a=null
        ev(4, 90, "u", a=44, b=None, mask=3),             # new key, b unset
    ]), "k")
    out = merge_partial(lake, patches, "k").to_pylist()
    rows = {r["k"]: r for r in out}
    assert set(rows) == {1, 3, 4}
    assert rows[1]["a"] == 11 and rows[1]["b"] == "p" and rows[1]["_lsn"] == 50
    assert rows[3]["a"] is None and rows[3]["b"] == "new"
    assert rows[4]["a"] == 44 and rows[4]["b"] is None
    # output is key-sorted
    assert [r["k"] for r in out] == [1, 3, 4]


def test_merge_partial_no_existing():
    patches = partial_fold(tbl([ev(7, 5, "u", a=1, b=None, mask=3)]), "k")
    out = merge_partial(None, patches, "k").to_pylist()
    assert out == [{"k": 7, "a": 1, "b": None, "_lsn": 5}]


def test_fold_is_consistent_with_sequential_merge():
    """One fold over all events == folding epoch prefixes through the lake."""
    rng = np.random.default_rng(11)
    n = 2000
    rows = []
    for lsn in range(n):
        k = int(rng.integers(0, 60))
        op = rng.choice(["c", "u", "u", "u", "d"])
        mask = 7 if op in ("c", "d") else int(rng.integers(0, 4)) * 2 + 1
        rows.append(ev(k, lsn, op,
                       a=int(rng.integers(0, 1000)),
                       b=f"s{int(rng.integers(0, 100))}", mask=mask))
    t = tbl(rows)
    whole = merge_partial(None, partial_fold(t, "k"), "k")
    lake = None
    for lo in range(0, n, 500):
        chunk = t.slice(lo, 500)
        lake = merge_partial(lake, partial_fold(chunk, "k"), "k")
    assert whole.equals(lake)


@pytest.fixture(scope="module")
def partial_lakes(ray_session, tmp_path_factory):
    """Aligned-path state (library drive) + exchange-path state."""
    from debezium_incubator_ray.pipelines import events_cdc as EC
    from debezium_incubator_ray.config import EngineConfig
    from debezium_incubator_ray.pipelines.cdc import CdcEngine

    aligned = EC.final_state_partial(SF)

    env = EC.events_partial_envelopes(SF)
    root = tmp_path_factory.mktemp("partial_ex")
    binlog, lake = str(root / "binlog"), str(root / "lake")
    EC.write_env_binlog(env, binlog)
    cfg = EngineConfig(
        table="events", key="user_id", num_partitions=EC.NUM_PARTITIONS,
        partitioner="mod", target_rows_per_file=100_000,
        merge_mode="partial", aligned_binlog="never",
    )
    eng = CdcEngine(lake, cfg, payload_schema=EC.EVENTS_PAYLOAD)
    eng.run(binlog)
    exchange = eng.lake_table(include_lsn=True)
    # replay: re-deliver everything — must be a no-op
    eng.manifest.doc["segments_done"] = []
    eng.apply_epoch(binlog)
    replayed = eng.lake_table(include_lsn=True)
    return aligned, exchange, replayed


def test_engine_partial_aligned_vs_exchange(partial_lakes):
    aligned, exchange, replayed = partial_lakes
    a = aligned.rename_columns(
        ["user_id", "ts", "event_type", "value", "props", "_lsn"]
    ).sort_by("user_id")
    x = exchange.sort_by("user_id")
    assert a.equals(x)
    assert x.equals(replayed.sort_by("user_id"))


def test_engine_partial_matches_bruteforce(partial_lakes):
    """Row-by-row python oracle over the event stream."""
    import pyarrow.parquet as pq

    aligned, _, _ = partial_lakes
    ev_t = pq.read_table(os.path.join(SF, "events.parquet")).sort_by(
        [("event_id", "ascending")]
    )
    state = {}
    cols = ["user_id", "ts", "event_type", "value", "props"]
    for r in ev_t.to_pylist():
        eid, uid = r["event_id"], r["user_id"]
        mod = eid % 10
        if mod == 0:
            state.pop(uid, None)
            continue
        mask = 31 if mod in (1, 2) else (eid & 30) | 1
        row = state.get(uid, {c: None for c in cols} | {"user_id": uid})
        for j, c in enumerate(cols):
            if (mask >> j) & 1:
                row[c] = r[c]
        row["lsn"] = eid
        state[uid] = row
    got = {r["user_id"]: r for r in aligned.to_pylist()}
    assert set(got) == set(state)
    for uid, exp in state.items():
        for c in cols + ["lsn"]:
            assert got[uid][c] == exp[c], (uid, c)


def test_counter_fold_accumulates_and_delete_resets():
    t = tbl([
        ev(1, 10, "c", a=5, b="x", mask=7),
        ev(1, 20, "u", a=3, b=None, mask=3),      # +3
        ev(1, 30, "u", a=None, b="y", mask=7),    # null contribution skipped
        ev(2, 11, "c", a=10, b="p", mask=7),
        ev(2, 12, "d", mask=7),
        ev(2, 13, "u", a=4, b=None, mask=3),      # counter restarts post-del
        ev(3, 14, "u", a=None, b="q", mask=6),    # a never set -> null
    ])
    out = partial_fold(t, "k", counter_cols=("a",))
    rows = {r["k"]: r for r in out.to_pylist()}
    assert rows[1]["a"] == 8 and rows[1]["b"] == "y"
    assert rows[2]["a"] == 4
    assert rows[3]["a"] is None and rows[3]["b"] == "q"


def test_counter_merge_adds_to_lake():
    lake = pa.table({
        "k": pa.array([1, 2], pa.int64()),
        "a": pa.array([100, None], pa.int64()),
        "b": pa.array(["p", "q"], pa.string()),
        "_lsn": pa.array([1, 1], pa.int64()),
    })
    patches = partial_fold(tbl([
        ev(1, 50, "u", a=7, b=None, mask=3),      # 100 + 7
        ev(2, 60, "u", a=5, b=None, mask=3),      # null lake -> 5
        ev(2, 70, "d", mask=7),
        ev(2, 80, "u", a=2, b=None, mask=3),      # post-delete -> 2, not 107
    ]), "k", counter_cols=("a",))
    out = merge_partial(lake, patches, "k", counter_cols=("a",)).to_pylist()
    rows = {r["k"]: r for r in out}
    assert rows[1]["a"] == 107 and rows[1]["b"] == "p"
    assert rows[2]["a"] == 2 and rows[2]["b"] is None


def test_counter_sequential_merge_law():
    rng = np.random.default_rng(13)
    rows = []
    for lsn in range(1500):
        k = int(rng.integers(0, 40))
        op = rng.choice(["c", "u", "u", "d"])
        mask = 7 if op in ("c", "d") else int(rng.integers(0, 4)) * 2 + 1
        rows.append(ev(k, lsn, op, a=int(rng.integers(0, 50)),
                       b=f"s{int(rng.integers(0, 9))}", mask=mask))
    t = tbl(rows)
    cc = ("a",)
    whole = merge_partial(None, partial_fold(t, "k", counter_cols=cc), "k",
                          counter_cols=cc)
    lake = None
    for lo in range(0, 1500, 400):
        lake = merge_partial(
            lake, partial_fold(t.slice(lo, 400), "k", counter_cols=cc), "k",
            counter_cols=cc,
        )
    assert whole.equals(lake)


def test_counter_engine_mor_matches_cow(ray_session):
    from debezium_incubator_ray.pipelines import events_cdc as EC

    cow = EC.final_state_partial(SF, counter_cols=("value",)).sort_by(
        "user_id"
    )
    mor = EC.final_state_partial(
        SF, counter_cols=("value",), sink_mode="mor"
    ).sort_by("user_id")
    assert cow.equals(mor)


def test_counter_config_validation(ray_session, tmp_path):
    from debezium_incubator_ray.pipelines import events_cdc as EC

    with pytest.raises(ValueError, match="counter_cols"):
        EC.make_engine(str(tmp_path / "c1"), counter_cols=("value",))  # lww
    with pytest.raises(ValueError, match="counter_cols"):
        EC.make_engine(str(tmp_path / "c2"), merge_mode="partial",
                       counter_cols=("event_type",))  # non-numeric
    with pytest.raises(ValueError, match="counter_cols"):
        EC.make_engine(str(tmp_path / "c3"), merge_mode="partial",
                       counter_cols=("user_id",))  # key


def test_normalize_mask_backfills_default_on_creates():
    """A column ABSENT from the writer's envelope but backfilled with a
    table default must count as SET for row-creating events (the create
    defines the whole row — lww stores the default there too), and as
    UNSET for partial updates (the old writer never touched it)."""
    from debezium_incubator_ray import schema as S
    from debezium_incubator_ray.envelope import build_envelopes
    from debezium_incubator_ray.stages.normalize import NormalizeEnvelope

    target = pa.schema([
        pa.field("k", pa.int64(), nullable=False),
        pa.field("v", pa.int64()),
        pa.field("status", pa.string()),  # added later; writer lacks it
    ])
    after = pa.table({
        "k": pa.array([1, 2], pa.int64()),
        "v": pa.array([10, 20], pa.int64()),
    })
    env = build_envelopes(
        pa.array(["c", "u"], pa.string()), after, after,
        np.zeros(2, dtype=np.int32), pa.array([5, 6], pa.int64()), "t",
    )
    norm = NormalizeEnvelope(
        schema_b64=S.schema_to_b64(target), key="k", num_partitions=1,
        partitioner="mod", defaults={"status": "active"},
        emit_set_mask=True,
    )
    out = norm(env)
    rows = {r["k"]: r for r in out.to_pylist()}
    # bits: 0=k, 1=v, 2=status
    assert rows[1]["op"] == "c" and rows[1][SET_MASK] == 7
    assert rows[2]["op"] == "u" and rows[2][SET_MASK] == 3
    assert rows[1]["status"] == "active"


def test_partial_config_validation(ray_session, tmp_path):
    from debezium_incubator_ray.pipelines import events_cdc as EC

    with pytest.raises(ValueError, match="partial"):
        EC.make_engine(str(tmp_path / "l2"), merge_mode="partial",
                       tombstones=False)
    eng = EC.make_engine(str(tmp_path / "l3"), merge_mode="partial")
    with pytest.raises(NotImplementedError, match="partial"):
        eng.snapshot_incremental(lambda last, n: None)


def test_partial_mor_matches_cow(ray_session):
    """sink_mode='mor' + merge_mode='partial': delta runs hold the patch
    rows (cell masks included) and the read path folds them in version
    order — byte-equal to the CoW lake; compact() folds to base with
    identical state; replay is a no-op."""
    from debezium_incubator_ray.pipelines import events_cdc as EC

    cow = EC.final_state_partial(SF).sort_by("user_id")
    mor = EC.final_state_partial(SF, sink_mode="mor").sort_by("user_id")
    assert cow.equals(mor)

    # full MoR drive with compact + replay probes
    import os
    import pyarrow.compute as pc

    root = EC.scratch_dir("pmor")
    binlog, lake = os.path.join(root, "binlog"), os.path.join(root, "lake")
    env = EC.events_partial_envelopes(SF)
    lsn = env["source"].combine_chunks().field("lsn")
    mid = int(pc.max(lsn).as_py()) // 2
    EC.write_env_binlog(env.filter(pc.less_equal(lsn, mid)), binlog)
    eng = EC.make_engine(lake, merge_mode="partial", sink_mode="mor")
    eng.run(binlog)
    EC.write_env_binlog(env.filter(pc.greater(lsn, mid)), binlog, append=True)
    eng.run(binlog)
    # at least one partition merged deltas (second epoch appended)
    assert any(
        e.get("deltas") for e in eng.manifest.doc["partitions"].values()
    )
    before = eng.lake_table(include_lsn=True).sort_by("user_id")
    assert before.equals(cow.rename_columns(before.column_names))
    eng.compact()
    assert not any(
        e.get("deltas") for e in eng.manifest.doc["partitions"].values()
    )
    after = eng.lake_table(include_lsn=True).sort_by("user_id")
    assert before.equals(after)
    # replay: re-deliver everything — no-op
    eng.manifest.doc["segments_done"] = []
    eng.apply_epoch(binlog)
    assert before.equals(eng.lake_table(include_lsn=True).sort_by("user_id"))


def test_partial_mor_pruned_read(ray_session):
    """Column-pruned read over a partial lake with UNCOMPACTED patch
    deltas: the mask remap must use the file's full stored payload order,
    not the pruned subset."""
    import os
    import pyarrow.compute as pc
    from debezium_incubator_ray.pipelines import events_cdc as EC

    root = EC.scratch_dir("pmorprune")
    binlog, lake = os.path.join(root, "binlog"), os.path.join(root, "lake")
    env = EC.events_partial_envelopes(SF)
    lsn = env["source"].combine_chunks().field("lsn")
    mid = int(pc.max(lsn).as_py()) // 2
    EC.write_env_binlog(env.filter(pc.less_equal(lsn, mid)), binlog)
    eng = EC.make_engine(lake, merge_mode="partial", sink_mode="mor")
    eng.run(binlog)
    EC.write_env_binlog(env.filter(pc.greater(lsn, mid)), binlog, append=True)
    eng.run(binlog)
    assert any(
        e.get("deltas") for e in eng.manifest.doc["partitions"].values()
    )
    full = eng.lake_table(include_lsn=False).sort_by("user_id")
    pruned = (
        eng.read_lake(columns=["user_id", "event_type"])
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    ref = full.select(["user_id", "event_type"]).to_pandas()
    assert pruned["user_id"].tolist() == ref["user_id"].tolist()
    assert pruned["event_type"].tolist() == ref["event_type"].tolist()


def test_partial_mor_evolution_mask_remap(ray_session):
    """v1 patch deltas read under the evolved v2 schema: stored mask bits
    must remap onto the upgraded payload order (byte-equal to the CoW
    evolution drive)."""
    from debezium_incubator_ray.pipelines import events_cdc as EC

    cow = EC.final_state_partial_evolution(SF).sort_by("user_id")
    mor = EC.final_state_partial_evolution(SF, sink_mode="mor").sort_by(
        "user_id"
    )
    assert cow.equals(mor)
