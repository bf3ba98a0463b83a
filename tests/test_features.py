"""Engine-feature tests added in round 2: tombstone retention, latest-only
mode, per-segment quarantine, aligned-path validation, hash-impl guard."""

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from debezium_incubator_ray import gen
from debezium_incubator_ray import schema as S
from debezium_incubator_ray.config import EngineConfig
from debezium_incubator_ray.pipelines.cdc import CdcEngine


def _mk(tmp_path, n_events=600, n_initial=100, P=4, **cfg_kw):
    binlog = str(tmp_path / "binlog")
    lake = str(tmp_path / "lake")
    spec = gen.BinlogSpec(
        n_events=n_events, n_initial=n_initial, seg_rows=128,
        num_partitions=P, seed=7,
    )
    ev = gen.gen_events(spec)
    gen.write_binlog(binlog, spec, ev)
    cfg = EngineConfig(
        num_partitions=P, apply_concurrency=2, target_rows_per_file=1000, **cfg_kw
    )
    eng = CdcEngine(lake, cfg, payload_schema=S.pages_schema())
    return eng, binlog, spec, ev


def test_tombstone_retention(tmp_path, ray_session):
    eng, binlog, spec, ev = _mk(tmp_path, tombstones=False)
    eng.snapshot(gen.make_pages(spec.n_initial))
    eng.run(binlog)
    lt = eng.lake_table()
    from debezium_incubator_ray.envelope import DELETED

    assert DELETED in lt.column_names
    import pyarrow.compute as pc

    dead = lt.filter(pc.equal(lt[DELETED], True))
    live = lt.filter(pc.equal(lt[DELETED], False))
    # the live rows equal the compacted oracle
    oracle = gen.oracle_final_state(spec, ev)
    assert live.select(["url"]).sort_by([("url", "ascending")])["url"].to_pylist() == \
        oracle["url"].to_pylist()
    # retained tombstones are exactly the keys whose final op is a delete
    final_dead = set()
    op, uid, lsn = ev["op"], ev["url_id"], ev["lsn"]
    order = np.lexsort((-lsn, uid))
    seen = set()
    for i in order:
        if uid[i] in seen:
            continue
        seen.add(uid[i])
        if op[i] == "d":
            final_dead.add(int(uid[i]))
    got_dead = set(
        int(u.rsplit("/", 1)[1]) for u in dead["url"].to_pylist()
    )
    assert got_dead == final_dead
    # tombstone payloads are null
    assert dead["text"].null_count == dead.num_rows
    # replay idempotence still holds with retention on
    eng.manifest.doc["segments_done"] = []
    st = eng.apply_epoch(binlog)
    assert st["applied"] == 0
    # resume adopts the manifest's tombstone mode
    eng.close()
    eng2 = CdcEngine(eng.lake_dir)
    assert eng2.cfg.tombstones is False


def test_latest_only_mode(tmp_path, ray_session):
    eng, binlog, spec, ev = _mk(tmp_path, latest_only=True)
    st = eng.apply_epoch(binlog)
    # one segment per partition applied, everything marked done
    assert st["segments"] == spec.num_partitions
    assert st["events"] < spec.n_events  # older segments skipped
    from debezium_incubator_ray.sources import binlog as B

    assert set(eng.manifest.doc["segments_done"]) == set(B.list_segments(binlog))
    st2 = eng.apply_epoch(binlog)
    assert st2["segments"] == 0


def test_segment_quarantine(tmp_path, ray_session):
    eng, binlog, spec, ev = _mk(tmp_path)
    # corrupt one segment's bytes
    bad = os.path.join(binlog, "p=0", sorted(os.listdir(os.path.join(binlog, "p=0")))[0])
    with open(bad, "wb") as f:
        f.write(b"not a parquet file")
    st = eng.run(binlog)
    assert st[0]["quarantined"] == 1
    errs = eng.manifest.doc["segments_error"]
    assert len(errs) == 1 and "p=0" in next(iter(errs))
    # the quarantined segment is never retried
    st2 = eng.apply_epoch(binlog)
    assert st2["segments"] == 0 and st2["quarantined"] == 0


def test_misaligned_partial_epoch_raises(tmp_path, ray_session):
    # binlog with 2 partitions feeding a 4-partition lake: a PARTIAL epoch
    # (max_segments) could advance watermarks past unapplied LSNs → engine
    # must refuse (full drains remain allowed)
    binlog = str(tmp_path / "binlog")
    lake = str(tmp_path / "lake")
    spec = gen.BinlogSpec(n_events=400, n_initial=50, seg_rows=64, num_partitions=2, seed=9)
    ev = gen.gen_events(spec)
    gen.write_binlog(binlog, spec, ev)
    eng = CdcEngine(
        lake, EngineConfig(num_partitions=4, apply_concurrency=2),
        payload_schema=S.pages_schema(),
    )
    with pytest.raises(ValueError, match="LSN monotonicity"):
        eng.apply_epoch(binlog, max_segments=1)
    # full drain through the exchange path is sound and matches the oracle
    eng.snapshot(gen.make_pages(spec.n_initial))
    eng.apply_epoch(binlog)
    oracle = gen.oracle_final_state(spec, ev)
    got = eng.lake_table().select(oracle.schema.names)
    assert got.equals(oracle)


def test_hash_impl_guard(tmp_path):
    from debezium_incubator_ray.state.manifest import Manifest

    m = Manifest.create(
        str(tmp_path / "l"), "t", "url", 2, S.schema_to_b64(S.pages_schema())
    )
    doc_path = os.path.join(str(tmp_path / "l"), "_manifest", "v0.json")
    with open(doc_path) as f:
        doc = json.load(f)
    doc["hash_impl"] = "other-hash-v0"
    with open(doc_path, "w") as f:
        json.dump(doc, f)
    with pytest.raises(RuntimeError, match="routing hash"):
        Manifest.load(str(tmp_path / "l"))


def test_aligned_path_used_and_matches_exchange(tmp_path, ray_session):
    # same binlog applied via aligned fast path vs forced exchange path —
    # identical final lake bytes
    binlog = str(tmp_path / "binlog")
    spec = gen.BinlogSpec(n_events=500, n_initial=80, seg_rows=128, num_partitions=4, seed=5)
    ev = gen.gen_events(spec)
    gen.write_binlog(binlog, spec, ev)
    outs = {}
    for mode in ("auto", "never"):
        lake = str(tmp_path / f"lake-{mode}")
        eng = CdcEngine(
            lake,
            EngineConfig(num_partitions=4, apply_concurrency=2, aligned_binlog=mode),
            payload_schema=S.pages_schema(),
        )
        eng.snapshot(gen.make_pages(spec.n_initial))
        st = eng.run(binlog)
        assert st[0].get("aligned") is (mode == "auto")
        outs[mode] = eng.lake_table()
        eng.close()
    assert outs["auto"].equals(outs["never"])
    oracle = gen.oracle_final_state(spec, ev)
    assert outs["auto"].select(oracle.schema.names).equals(oracle)


def test_lake_drop_table_reconciliation(tmp_path, ray_session):
    from debezium_incubator_ray.pipelines.lake import Lake

    root = str(tmp_path / "lake")
    lake = Lake(root)
    lake.create_table("a", S.pages_schema(), EngineConfig(num_partitions=2))
    lake.create_table("b", S.pages_schema(), EngineConfig(num_partitions=2))
    assert lake.table_names() == ["a", "b"]
    # detach only: restart re-attaches (files kept)
    lake.drop_table("a")
    assert lake.table_names() == ["b"]
    lake2 = Lake(root)
    assert lake2.table_names() == ["a", "b"]
    # delete: gone for good
    for e in lake2.engines.values():
        e.close()
    lake3 = Lake(root)
    lake3.drop_table("a", delete_files=True)
    for e in lake3.engines.values():
        e.close()
    assert Lake(root).table_names() == ["b"]


def test_demux_single_pass_multi_table(tmp_path, ray_session):
    """One mixed binlog routed to two lake tables in a single pass; each
    table's final state equals the per-table LWW oracle."""
    import pyarrow.compute as pc

    from debezium_incubator_ray.envelope import lww_reduce
    from debezium_incubator_ray.pipelines import events_cdc as EC
    from debezium_incubator_ray.pipelines.lake import Lake

    sf = "/root/testdata/sf0.001"
    binlog = str(tmp_path / "binlog")
    env = EC.write_events_binlog(sf, binlog, table_name_by_parity=True)
    lake = Lake(str(tmp_path / "lake"))
    for t in ("events_a", "events_b"):
        lake.create_table(
            t, EC.EVENTS_PAYLOAD,
            EC.EngineConfig(key="user_id", num_partitions=EC.NUM_PARTITIONS,
                            partitioner="mod", apply_concurrency=2),
        )
    st = lake.apply_epoch_demux(binlog)
    assert st["tables"] == 2 and st["segments"] > 0
    # oracle: flatten envelopes, LWW per user, split by parity
    src = env["source"].combine_chunks()
    flat = pa.table(
        {
            "user_id": env["after"].combine_chunks().field("user_id"),
            S.LSN: src.field("lsn"),
            "op": env["op"].combine_chunks(),
        }
    )
    flat = flat.set_column(
        0, "user_id",
        pc.coalesce(flat["user_id"], env["before"].combine_chunks().field("user_id")),
    )
    winners = lww_reduce(flat, "user_id")
    live = winners.filter(pc.not_equal(winners["op"], "d"))
    uid = live["user_id"].to_numpy()
    for t, parity in (("events_a", 0), ("events_b", 1)):
        got = lake[t].lake_table()
        expect = np.sort(uid[uid % 2 == parity])
        assert got["user_id"].to_numpy().tolist() == expect.tolist()
    # re-running the demux epoch is a no-op (segments done + watermarks)
    st2 = lake.apply_epoch_demux(binlog)
    assert st2["segments"] == 0


def test_manifest_store_protocol(tmp_path):
    """OffsetWriter-style pluggable store (state/store.py): the manifest
    control plane round-trips through a MemoryStore (the object-store
    stand-in) exactly as through the local-fs default."""
    from debezium_incubator_ray.state.manifest import Manifest
    from debezium_incubator_ray.state.store import MemoryStore

    store = MemoryStore()
    m = Manifest.create(
        str(tmp_path / "l"), "t", "url", 2,
        S.schema_to_b64(S.pages_schema()), store=store,
    )
    m2 = m.commit({0: {"watermark": 9, "files": []}})
    m3 = m2.commit({1: {"watermark": 4, "files": []}})
    assert store.read("CURRENT") == "2"
    r = Manifest.load(str(tmp_path / "l"), store=store)
    assert r.watermark(0) == 9 and r.watermark(1) == 4 and r.version == 2
    assert Manifest.exists(str(tmp_path / "l"), store=store)
    # versions retained for time travel
    assert store.read("v0.json") is not None and store.read("v2.json") is not None


def test_lake_custom_namer(tmp_path, ray_session):
    """Pluggable TableTopicNamer: output dir = sanitize(namer(table))."""
    from debezium_incubator_ray import schema as S
    from debezium_incubator_ray.pipelines.lake import Lake

    lake = Lake(str(tmp_path / "lake"), namer=lambda t: f"cdc.ks1.{t}!")
    eng = lake.create_table("pages", S.pages_schema())
    assert eng.cfg.table == "cdc.ks1.pages_"
    assert lake["pages"] is eng
    lake.drop_table("pages")
    assert lake.table_names() == []


def test_processed_low_watermark(tmp_path, ray_session):
    """Low watermark = min over partitions; metrics expose it; segments
    wholly below it are trimmable."""
    from debezium_incubator_ray import gen
    from debezium_incubator_ray import schema as S
    from debezium_incubator_ray.config import EngineConfig
    from debezium_incubator_ray.pipelines.cdc import CdcEngine

    spec = gen.BinlogSpec(
        n_events=600, n_initial=80, seg_rows=128, num_partitions=2, seed=3
    )
    ev = gen.gen_events(spec)
    binlog = str(tmp_path / "binlog")
    gen.write_binlog(binlog, spec, ev)
    eng = CdcEngine(
        str(tmp_path / "lake"), EngineConfig(num_partitions=2),
        payload_schema=S.pages_schema(),
    )
    assert eng.processed_low_watermark() == -1
    eng.run(binlog)
    low = eng.processed_low_watermark()
    wms = [e["watermark"] for e in eng.manifest.doc["partitions"].values()]
    assert low == min(wms) and low > 0
    assert eng.metrics()["processed-low-watermark"] == low


def test_join_lake_copartitioned(tmp_path, ray_session):
    import pyarrow as pa

    from debezium_incubator_ray import gen
    from debezium_incubator_ray import schema as S
    from debezium_incubator_ray.config import EngineConfig
    from debezium_incubator_ray.pipelines.cdc import CdcEngine

    import pytest

    spec = gen.BinlogSpec(n_events=300, n_initial=80, seg_rows=60,
                          num_partitions=4, seed=12)
    ev = gen.gen_events(spec)
    binlog = str(tmp_path / "binlog")
    gen.write_binlog(binlog, spec, ev)
    engines = []
    for tag in ("a", "b"):
        eng = CdcEngine(
            str(tmp_path / f"lake-{tag}"),
            EngineConfig(num_partitions=4, apply_concurrency=2),
            payload_schema=S.pages_schema(),
        )
        eng.snapshot(gen.make_pages(spec.n_initial))
        engines.append(eng)
    engines[0].run(binlog)  # side A streams; side B stays at the snapshot
    joined = pa.Table.from_pandas(
        engines[0].join_lake(engines[1], join_type="inner").to_pandas()
    )
    a = engines[0].lake_table()
    b = engines[1].lake_table()
    common = set(a["url"].to_pylist()) & set(b["url"].to_pylist())
    assert set(joined["url"].to_pylist()) == common
    assert "text_r" in joined.column_names  # right side suffixed

    # mismatched partitioning must refuse (the no-shuffle premise)
    other = CdcEngine(
        str(tmp_path / "lake-c"),
        EngineConfig(num_partitions=8, apply_concurrency=2),
        payload_schema=S.pages_schema(),
    )
    other.snapshot(gen.make_pages(10))
    with pytest.raises(ValueError, match="co-partitioning"):
        engines[0].join_lake(other)


def test_tail_applies_segments_as_they_arrive(tmp_path, ray_session):
    import threading
    import time as _time

    from debezium_incubator_ray import gen
    from debezium_incubator_ray import schema as S
    from debezium_incubator_ray.config import EngineConfig
    from debezium_incubator_ray.pipelines.cdc import CdcEngine

    spec = gen.BinlogSpec(n_events=200, n_initial=40, seg_rows=50,
                          num_partitions=2, seed=13)
    ev = gen.gen_events(spec)
    binlog = str(tmp_path / "binlog")
    gen.write_binlog(binlog, spec, ev)
    eng = CdcEngine(
        str(tmp_path / "lake"),
        EngineConfig(num_partitions=2, apply_concurrency=2),
        payload_schema=S.pages_schema(),
    )
    eng.snapshot(gen.make_pages(spec.n_initial))

    # withhold each partition's LAST segment; a "producer" thread restores
    # them while the tail loop is polling (late commit-log arrival)
    import os
    import shutil

    held = []
    stash = str(tmp_path / "stash")
    os.makedirs(stash)
    for p in range(2):
        pdir = os.path.join(binlog, f"p={p}")
        segs = sorted(os.listdir(pdir))
        if len(segs) > 1:
            src = os.path.join(pdir, segs[-1])
            dst = os.path.join(stash, f"p{p}-" + segs[-1])
            shutil.move(src, dst)
            held.append((dst, src))
    assert held

    def drop_late():
        _time.sleep(0.5)
        for dst, src in held:
            shutil.move(dst, src)

    t = threading.Thread(target=drop_late)
    t.start()
    stats = eng.tail(binlog, poll_interval_s=0.2, idle_polls=10)
    t.join()
    total = sum(s["events"] for s in stats)
    assert total == spec.n_events  # late segments applied by the tail loop
    oracle = gen.oracle_final_state(spec, ev)
    got = eng.lake_table().select(oracle.schema.names)
    assert got.sort_by("url").equals(oracle.sort_by("url"))


def test_demux_with_mor_table(tmp_path, ray_session):
    """Mixed-binlog demux where one destination table is merge-on-read and
    the other copy-on-write: the sink mode is a per-table manifest property,
    so the SAME demux pass must produce identical final states either way."""
    from debezium_incubator_ray.pipelines import events_cdc as EC
    from debezium_incubator_ray.pipelines.lake import Lake

    sf = "/root/testdata/sf0.001"
    b1 = str(tmp_path / "binlog1")
    EC.write_events_binlog(sf, b1, table_name_by_parity=True)

    lakes = {}
    for variant, mor_table in (("x", None), ("y", "events_a")):
        lake = Lake(str(tmp_path / f"lake-{variant}"))
        for t in ("events_a", "events_b"):
            lake.create_table(
                t, EC.EVENTS_PAYLOAD,
                EC.EngineConfig(
                    key="user_id", num_partitions=EC.NUM_PARTITIONS,
                    partitioner="mod", apply_concurrency=2,
                    sink_mode="mor" if t == mor_table else "cow",
                ),
            )
        lake.apply_epoch_demux(b1)
        lakes[variant] = lake
    for t in ("events_a", "events_b"):
        a = lakes["x"][t].lake_table(include_lsn=True)
        b = lakes["y"][t].lake_table(include_lsn=True)
        assert a.equals(b), t
