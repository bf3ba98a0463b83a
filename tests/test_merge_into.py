"""CdcEngine.merge_into — SQL-MERGE conditional upsert as a synthetic
aligned epoch. Verifies every (when_matched, when_not_matched) policy
against a pyarrow-computed expectation, the ANSI duplicate-key refusal,
LWW interplay with later stream events, and replay safety across
consecutive merges (the "_merge" channel's segment numbering)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from debezium_incubator_ray import gen
from debezium_incubator_ray import schema as S
from debezium_incubator_ray.config import EngineConfig
from debezium_incubator_ray.pipelines.cdc import CdcEngine

from tests.conftest import assert_tables_equal


def _lake(tmp_path, **kw):
    spec = gen.BinlogSpec(
        n_events=400, n_initial=100, seg_rows=100, num_partitions=4, seed=9
    )
    ev = gen.gen_events(spec)
    binlog = str(tmp_path / "binlog")
    gen.write_binlog(binlog, spec, ev)
    cfg = EngineConfig(
        num_partitions=4, target_rows_per_file=64, apply_concurrency=2, **kw
    )
    eng = CdcEngine(str(tmp_path / "lake"), cfg, payload_schema=S.pages_schema())
    eng.snapshot(gen.make_pages(spec.n_initial), snapshot_lsn=0)
    eng.run(binlog)
    return eng


def _src(urls, langs):
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "lang": pa.array([str(v) for v in langs], pa.string()),
    })


def test_update_insert_and_counts(tmp_path):
    eng = _lake(tmp_path)
    before = eng.lake_table()
    live = set(before["url"].to_pylist())
    some_live = sorted(live)[:5]
    new = ["https://merged.example/a", "https://merged.example/b"]
    st = eng.merge_into(_src(some_live + new, [1.0] * 7))
    assert st["matched"] == 5 and st["updated"] == 5
    assert st["inserted"] == 2 and st["deleted"] == 0 and st["skipped"] == 0
    after = eng.lake_table()
    assert after.num_rows == before.num_rows + 2
    d = {u: r for u, r in zip(after["url"].to_pylist(), after["lang"].to_pylist())}
    for u in some_live + new:
        assert d[u] == "1.0"
    # full-row replace: absent payload columns go NULL on updated rows
    texts = {u: t for u, t in zip(after["url"].to_pylist(), after["text"].to_pylist())}
    assert texts[some_live[0]] is None
    # untouched rows byte-identical
    keep = pc.invert(pc.is_in(before["url"], value_set=pa.array(some_live)))
    assert_tables_equal(
        after.filter(pc.invert(pc.is_in(after["url"], value_set=pa.array(some_live + new)))),
        before.filter(keep),
        sort_by="url",
    )


def test_delete_skip_and_insert_ignore(tmp_path):
    eng = _lake(tmp_path)
    before = eng.lake_table()
    live = sorted(set(before["url"].to_pylist()))
    victims = live[:3]
    ghost = ["https://nope.example/x"]
    st = eng.merge_into(_src(victims + ghost, [0.0] * 4),
                        when_matched="delete", when_not_matched="skip")
    assert st["deleted"] == 3 and st["skipped"] == 1
    after = eng.lake_table()
    assert after.num_rows == before.num_rows - 3
    assert not set(victims) & set(after["url"].to_pylist())
    # insert-ignore: matched rows untouched, only the new key lands
    st2 = eng.merge_into(_src([live[5], "https://new.example/y"], [7.0, 7.0]),
                         when_matched="skip", when_not_matched="insert")
    assert st2["skipped"] == 1 and st2["inserted"] == 1
    t = eng.lake_table()
    d = dict(zip(t["url"].to_pylist(), t["lang"].to_pylist()))
    assert d["https://new.example/y"] == "7.0"
    row_before = before.filter(pc.equal(before["url"], live[5]))
    row_after = t.filter(pc.equal(t["url"], live[5]))
    assert_tables_equal(row_after, row_before, sort_by="url")


def test_duplicate_source_keys_raise(tmp_path):
    eng = _lake(tmp_path)
    with pytest.raises(Exception) as ei:
        eng.merge_into(_src(["https://dup.example/a"] * 2, [1.0, 2.0]))
    assert "duplicate" in str(ei.value)


def test_merge_then_stream_lww_and_reopen(tmp_path):
    eng = _lake(tmp_path)
    live = sorted(set(eng.lake_table()["url"].to_pylist()))
    st = eng.merge_into(_src([live[0]], [5.0]))
    lsn = st["lsn"]
    # a second merge is stamped strictly above the first and wins LWW
    st2 = eng.merge_into(_src([live[0]], [6.0]))
    assert st2["lsn"] > lsn
    eng.flush()
    eng.close()
    eng2 = CdcEngine(str(tmp_path / "lake"))
    t = eng2.lake_table()
    d = dict(zip(t["url"].to_pylist(), t["lang"].to_pylist()))
    assert d[live[0]] == "6.0"
    # the merge channel's done-set survives reopen: unique segment names
    done = eng2.manifest.doc["segments_done_by_source"]["_merge"]
    assert len(done) == len(set(done))


def test_counter_lake_refuses(tmp_path):
    eng = _lake(tmp_path)
    eng.cfg.counter_cols = ("lang",)
    with pytest.raises(RuntimeError):
        eng.merge_into(_src(["x"], [1.0]))


def test_stream_event_at_merge_lsn_supersedes(tmp_path):
    """The next undelivered stream event may carry EXACTLY the merge's
    LSN (merge stamps max watermark + 1). The stream is the source of
    truth: at an equal-LSN tie the later-applied writer must win."""
    import os

    import pyarrow.parquet as pq
    from debezium_incubator_ray.envelope import build_envelopes

    eng = _lake(tmp_path)
    live = sorted(set(eng.lake_table()["url"].to_pylist()))
    st = eng.merge_into(_src([live[0]], ["from-merge"]))
    after = pa.table({
        "url": pa.array([live[0]], pa.string()),
        "lang": pa.array(["from-stream"], pa.string()),
    })
    env = build_envelopes(
        pa.array(["u"], pa.string()), after, None,
        np.array([0], dtype=np.int32),
        np.array([st["lsn"]], dtype=np.int64),
        "pages",
    )
    b2 = tmp_path / "binlog2" / "p=0"
    os.makedirs(b2)
    # relpath must be fresh: segments_done is keyed by relpath across ALL
    # binlog dirs of the default channel (one-binlog-per-table contract)
    pq.write_table(env, str(b2 / "seg-00090.parquet"))
    res = eng.apply_epoch(str(tmp_path / "binlog2"))
    assert res["applied"] >= 1
    t = eng.lake_table()
    d = dict(zip(t["url"].to_pylist(), t["lang"].to_pylist()))
    assert d[live[0]] == "from-stream"


def test_composite_key_merge(tmp_path):
    """merge_into on a composite-PK lake: routing/matching on the _key
    encoding, update + insert + delete policies, NULL-component refusal."""
    from tests.test_composite_key import ROWS, _drive

    eng = _drive(tmp_path, ROWS)
    before = eng.lake_table()
    # live keys: (1,a)=10.0, (2,a)=3.0, (2,b)=40.0
    src = pa.table({
        "uid": pa.array([1, 2, 9], pa.int64()),
        "kind": pa.array(["a", "b", "z"], pa.string()),
        "val": pa.array([99.0, 98.0, 97.0], pa.float64()),
    })
    st = eng.merge_into(src)
    assert st["matched"] == 2 and st["updated"] == 2 and st["inserted"] == 1
    t = eng.lake_table()
    d = {(u, k): v for u, k, v in zip(
        t["uid"].to_pylist(), t["kind"].to_pylist(), t["val"].to_pylist())}
    assert d[(1, "a")] == 99.0 and d[(2, "b")] == 98.0 and d[(9, "z")] == 97.0
    assert d[(2, "a")] == 3.0  # untouched
    # delete one composite key
    st2 = eng.merge_into(
        pa.table({"uid": pa.array([2], pa.int64()),
                  "kind": pa.array(["a"], pa.string())}),
        when_matched="delete", when_not_matched="skip",
    )
    assert st2["deleted"] == 1
    t2 = eng.lake_table()
    assert (2, "a") not in {
        (u, k) for u, k in zip(t2["uid"].to_pylist(), t2["kind"].to_pylist())
    }
    assert t2.num_rows == t.num_rows - 1
    # NULL key component refused
    with pytest.raises(Exception) as ei:
        eng.merge_into(pa.table({
            "uid": pa.array([None], pa.int64()),
            "kind": pa.array(["a"], pa.string()),
            "val": pa.array([1.0]),
        }))
    assert "NULL key" in str(ei.value)
    # missing key component refused
    with pytest.raises(Exception) as ei2:
        eng.merge_into(pa.table({"uid": pa.array([1], pa.int64())}))
    assert "key column" in str(ei2.value)


def test_partial_lake_merge_patches_only_provided_columns(tmp_path):
    """On a merge_mode='partial' lake a matched UPDATE patches ONLY the
    source-provided columns (set_mask marks just those cells); an
    unmatched INSERT sets the provided cells and leaves the rest NULL."""
    from debezium_incubator_ray.envelope import build_envelopes
    from debezium_incubator_ray.pipelines import events_cdc as EC

    users = np.arange(1, 9, dtype=np.int64)
    after = pa.table({
        "user_id": pa.array(users),
        "ts": pa.nulls(8, pa.timestamp("us")),
        "event_type": pa.array(["t0"] * 8, pa.string()),
        "value": pa.array(np.full(8, 1.0), pa.float64()),
        "props": pa.array(["p0"] * 8, pa.string()),
    })
    env = build_envelopes(
        pa.array(["c"] * 8, pa.string()), after, None,
        (users % 4).astype(np.int32), np.arange(8, dtype=np.int64),
        "events",
    )
    binlog = str(tmp_path / "binlog")
    EC.write_env_binlog(env, binlog)
    cfg = EngineConfig(
        table="events", key="user_id", num_partitions=4,
        partitioner="mod", merge_mode="partial", aligned_binlog="never",
        target_rows_per_file=64,
    )
    eng = CdcEngine(str(tmp_path / "lake"), cfg,
                    payload_schema=EC.EVENTS_PAYLOAD)
    eng.run(binlog)
    st = eng.merge_into(pa.table({
        "user_id": pa.array([1, 99], pa.int64()),
        "value": pa.array([9.0, 9.5], pa.float64()),
    }))
    assert st["updated"] == 1 and st["inserted"] == 1
    t = eng.lake_table()
    rows = {u: (et, v, p) for u, et, v, p in zip(
        t["user_id"].to_pylist(), t["event_type"].to_pylist(),
        t["value"].to_pylist(), t["props"].to_pylist())}
    assert rows[1] == ("t0", 9.0, "p0")   # patched value, kept the rest
    assert rows[99] == (None, 9.5, None)  # insert: unprovided cells NULL
    assert rows[2] == ("t0", 1.0, "p0")   # untouched


def test_mor_lookup_agrees_with_scan_at_lsn_tie(tmp_path):
    """Point reads and scans must resolve an equal-LSN tie identically
    (later writer wins) on a merge-on-read lake: merge at LSN L, then a
    stream delta at the same L — lookup() previously served the stale
    merge row while the scan served the stream row."""
    import os

    import pyarrow.parquet as pq
    from debezium_incubator_ray.envelope import build_envelopes

    eng = _lake(tmp_path, sink_mode="mor", mor_compact_deltas=0)
    live = sorted(set(eng.lake_table()["url"].to_pylist()))
    st = eng.merge_into(_src([live[0]], ["from-merge"]))
    after = pa.table({
        "url": pa.array([live[0]], pa.string()),
        "lang": pa.array(["from-stream"], pa.string()),
    })
    env = build_envelopes(
        pa.array(["u"], pa.string()), after, None,
        np.array([0], dtype=np.int32),
        np.array([st["lsn"]], dtype=np.int64),
        "pages",
    )
    b2 = tmp_path / "binlog2" / "p=0"
    os.makedirs(b2)
    pq.write_table(env, str(b2 / "seg-00091.parquet"))
    eng.apply_epoch(str(tmp_path / "binlog2"))
    scan = dict(zip(
        eng.lake_table()["url"].to_pylist(),
        eng.lake_table()["lang"].to_pylist(),
    ))
    hit = eng.lookup([live[0]])
    assert scan[live[0]] == "from-stream"
    assert hit["lang"].to_pylist() == ["from-stream"]
