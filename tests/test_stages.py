"""Unit tests for normalize / sources / lake-registry / manifest laws
(pure or single-stage — mirrors the reference's stage-test layer:
QueueProcessorTest, FileOffsetWriterTest, CommitLogUtilTest)."""

import os

import numpy as np
import pyarrow as pa
import pytest

from debezium_incubator_ray import gen
from debezium_incubator_ray import schema as S
from debezium_incubator_ray.envelope import build_envelopes
from debezium_incubator_ray.sources import binlog as bsrc
from debezium_incubator_ray.stages.normalize import NormalizeEnvelope
from debezium_incubator_ray.state.manifest import Manifest


def _env_batch(n=10, table="pages"):
    ids = np.arange(n, dtype=np.int64)
    lsns = ids + 1
    after = gen.payload_table(ids, lsns)
    op = pa.array(["u"] * n, type=pa.string())
    return build_envelopes(
        op, after, gen.payload_table(ids, np.zeros(n, np.int64)),
        (ids % 4).astype(np.int32), lsns, table=table,
    )


def _norm(**kw):
    kw.setdefault("schema_b64", S.schema_to_b64(S.pages_schema()))
    kw.setdefault("key", "url")
    kw.setdefault("num_partitions", 4)
    return NormalizeEnvelope(**kw)


def test_normalize_flattens_and_partitions():
    out = _norm()(_env_batch(8))
    assert set(out.column_names) >= {"url", "text", "op", S.LSN, S.PART}
    assert out.num_rows == 8
    assert out[S.PART].to_pylist() == list(
        np.asarray(
            __import__(
                "debezium_incubator_ray.hashing", fromlist=["partition_ids"]
            ).partition_ids(out["url"].combine_chunks(), 4, "hash")
        )
    )


def test_normalize_field_blacklist_keeps_key():
    out = _norm(field_blacklist=["lang", "url"])(_env_batch(5))
    assert "lang" not in out.column_names
    assert "url" in out.column_names  # key never dropped


def test_normalize_table_regex_filter():
    batch = _env_batch(6, table="keep_me")
    out = _norm(table_include_regex=r"^keep")(batch)
    assert out.num_rows == 6
    out2 = _norm(table_include_regex=r"^other$")(batch)
    assert out2.num_rows == 0


def test_normalize_drops_invalid_ops_and_null_keys():
    batch = _env_batch(4)
    bad_op = batch.set_column(
        0, "op", pa.array(["u", "x", "u", "zz"], type=pa.string())
    )
    out = _norm()(bad_op)
    assert out.num_rows == 2
    # delete with neither image → null key → skipped
    nulled = batch.set_column(0, "op", pa.array(["d"] * 4, type=pa.string()))
    t = nulled["after"].combine_chunks()
    nulled = nulled.set_column(
        nulled.schema.get_field_index("after"), pa.field("after", t.type),
        pa.nulls(4, t.type),
    )
    b = nulled["before"].combine_chunks()
    nulled = nulled.set_column(
        nulled.schema.get_field_index("before"), pa.field("before", b.type),
        pa.nulls(4, b.type),
    )
    assert _norm()(nulled).num_rows == 0


def test_normalize_emit_before():
    out = _norm(emit_before=True)(_env_batch(5))
    assert "before_text" in out.column_names
    assert out["before_text"].null_count == 0


def test_normalize_column_transforms():
    """Debezium column SMT parity: mask/truncate/hash redact at normalize;
    NULLs stay NULL; key columns and non-string columns are refused."""
    import hashlib

    import pyarrow.compute as pc

    batch = _env_batch(5)
    # inject one NULL text to prove redaction preserves absence
    a = batch["after"].combine_chunks()
    texts = a.field("text").to_pylist()
    texts[2] = None
    fields = {f.name: a.field(f.name) for f in a.type}
    fields["text"] = pa.array(texts, pa.string())
    new = pa.StructArray.from_arrays(
        list(fields.values()), names=list(fields.keys())
    )
    batch = batch.set_column(
        batch.schema.get_field_index("after"), pa.field("after", new.type), new
    )

    out = _norm(
        column_transforms=(
            ("text", "mask", 4), ("lang", "hash"),
        )
    )(batch)
    vals = out["text"].to_pylist()
    assert vals[2] is None and all(v == "****" for i, v in enumerate(vals) if i != 2)
    langs_raw = new.field("lang").to_pylist()
    assert out["lang"].to_pylist() == [
        hashlib.md5(s.encode()).hexdigest() for s in langs_raw
    ]

    out2 = _norm(column_transforms=(("text", "truncate", 3),))(_env_batch(4))
    orig = _env_batch(4)["after"].combine_chunks().field("text").to_pylist()
    assert out2["text"].to_pylist() == [s[:3] for s in orig]

    # emit_before images are redacted too
    out3 = _norm(
        emit_before=True, column_transforms=(("text", "mask", 2),)
    )(_env_batch(3))
    assert set(out3["before_text"].to_pylist()) == {"**"}

    with pytest.raises(ValueError):  # key column refused
        _norm(column_transforms=(("url", "mask", 4),))
    with pytest.raises(ValueError):  # non-string column refused
        _norm(column_transforms=(("warc_ts", "hash"),))
    with pytest.raises(ValueError):  # unknown kind
        _norm(column_transforms=(("text", "rot13"),))
    with pytest.raises(ValueError):  # mask needs a length
        _norm(column_transforms=(("text", "mask"),))


def test_segment_listing_sorted_and_latest_only(tmp_path):
    d = str(tmp_path)
    for p in (1, 0):
        os.makedirs(f"{d}/p={p}")
        for k in (2, 0, 1):
            pa.parquet.write_table(
                pa.table({"x": [1]}), f"{d}/p={p}/seg-{k:05d}.parquet"
            )
    segs = bsrc.list_segments(d)
    assert segs == [
        "p=0/seg-00000.parquet", "p=0/seg-00001.parquet", "p=0/seg-00002.parquet",
        "p=1/seg-00000.parquet", "p=1/seg-00001.parquet", "p=1/seg-00002.parquet",
    ]
    latest = bsrc.plan_epoch(d, [], latest_only=True)
    assert latest == ["p=0/seg-00002.parquet", "p=1/seg-00002.parquet"]
    rest = bsrc.plan_epoch(d, segments_done=segs[:4])
    assert rest == segs[4:]


def test_manifest_watermark_mark_if_greater(tmp_path):
    """FileOffsetWriterTest.java:38-77 law: offsets only move forward."""
    m = Manifest.create(
        str(tmp_path / "l"), "t", "k", 2, S.schema_to_b64(S.pages_schema())
    )
    m2 = m.commit({0: {"watermark": 10}})
    m3 = m2.commit({0: {"watermark": 5}})  # stale mark must not regress
    assert m3.watermark(0) == 10
    assert m3.version == 2
    m4 = Manifest.load(str(tmp_path / "l"))
    assert m4.version == 2 and m4.watermark(0) == 10


def test_single_writer_lock(tmp_path, ray_session):
    """Double-writer rejection (FileOffsetWriterTest.java:38-125 lock law)."""
    from debezium_incubator_ray.pipelines.cdc import CdcEngine, ConcurrentWriterError

    lake = str(tmp_path / "l")
    cfg = lambda: __import__(
        "debezium_incubator_ray.config", fromlist=["EngineConfig"]
    ).EngineConfig(num_partitions=2)
    a = CdcEngine(lake, cfg(), payload_schema=S.pages_schema())
    a.snapshot(gen.make_pages(5))  # takes the writer lock
    b = CdcEngine(lake)  # reader: fine
    assert b.lake_table().num_rows == 5
    with pytest.raises(ConcurrentWriterError):
        b.snapshot(gen.make_pages(5))
    a.close()
    b.cfg.snapshot_mode = "ALWAYS"
    # a redo at a stale LSN would be a silent no-op (every row filtered as a
    # duplicate) — the engine must refuse it rather than pretend to refresh
    with pytest.raises(ValueError):
        b.snapshot(gen.make_pages(5))
    # lock released → new writer allowed at a strictly newer snapshot LSN
    b.snapshot(gen.make_pages(5), snapshot_lsn=1)


def test_lineage_parquet_emitted(tmp_path):
    m = Manifest.create(
        str(tmp_path / "l"), "t", "k", 2, S.schema_to_b64(S.pages_schema())
    )
    m = m.commit({0: {"watermark": 3}}, lineage={"kind": "epoch", "events": 7,
                                                "watermarks": {"0": 3}})
    m = m.commit({}, lineage={"kind": "heartbeat", "events": 0})
    lt = m.lineage_table()
    assert lt.num_rows == 2
    assert lt["kind"].to_pylist() == ["epoch", "heartbeat"]
    assert lt["events"].to_pylist() == [7, 0]


def test_sanitize_and_lake_registry(tmp_path, ray_session):
    from debezium_incubator_ray.pipelines.lake import Lake, sanitize_table_name

    assert sanitize_table_name("ks.my table!", "pfx") == "pfx.ks.my_table_"
    done = []
    lake = Lake(str(tmp_path / "root"), on_segment_done=lambda p, ok: done.append(p))
    eng = lake.create_table("pages", S.pages_schema())
    spec = gen.BinlogSpec(n_events=50, n_initial=10, seg_rows=32, num_partitions=4)
    ev = gen.gen_events(spec)
    binlog = str(tmp_path / "binlog")
    gen.write_binlog(binlog, spec, ev)
    lake.apply_epoch("pages", binlog)
    assert len(done) > 0 and all(os.path.exists(p) for p in done)
    # re-open: discovery finds the table
    lake2 = Lake(str(tmp_path / "root"))
    assert lake2.table_names() == ["pages"]


# ----------------------------------------------------------------------
# offset-flush policy (OffsetFlushPolicy.java:19-51)
def test_flush_policy_semantics():
    from debezium_incubator_ray.state.flush import OffsetFlushPolicy

    always = OffsetFlushPolicy.always()
    assert always.should_flush(0.0, 0)
    per = OffsetFlushPolicy.periodic(10.0, 1000)
    assert not per.should_flush(9.9, 999)
    assert per.should_flush(10.0, 0)      # interval elapsed
    assert per.should_flush(0.0, 1000)    # max events reached


def test_periodic_flush_batches_manifest_writes(tmp_path, ray_session):
    """Periodic mode: epochs commit in memory; the persisted CURRENT only
    advances at flush points — and a 'crash' (engine dropped without flush)
    resumes from the last persisted version and replays to the same state."""
    from debezium_incubator_ray.config import EngineConfig
    from debezium_incubator_ray.pipelines.cdc import CdcEngine

    spec = gen.BinlogSpec(
        n_events=300, n_initial=60, seg_rows=50, num_partitions=4, seed=31
    )
    ev = gen.gen_events(spec)
    binlog = str(tmp_path / "binlog")
    gen.write_binlog(binlog, spec, ev)
    lake = str(tmp_path / "lake")
    cfg = EngineConfig(
        num_partitions=4, target_rows_per_file=64, apply_concurrency=2,
        offset_flush="periodic",
        offset_flush_interval_s=3600.0, offset_flush_max_events=10**9,
    )
    eng = CdcEngine(lake, cfg, payload_schema=S.pages_schema())
    eng.snapshot(gen.make_pages(spec.n_initial))  # structural: persisted
    v_snap = int(open(os.path.join(lake, "_manifest", "CURRENT")).read())

    # drain segment-by-segment: in-memory version advances, CURRENT doesn't
    st = eng.apply_epoch(binlog, max_segments=4)
    assert st["events"] > 0
    assert eng.manifest.version > v_snap
    assert int(open(os.path.join(lake, "_manifest", "CURRENT")).read()) == v_snap
    assert eng.manifest.dirty

    # crash: drop the engine WITHOUT flushing (bypass close())
    os.close(eng._lock_fd)
    eng._lock_fd = None
    del eng

    # resume: persisted manifest knows nothing of the un-flushed epoch; the
    # full drain must replay it idempotently and reach the oracle state
    eng2 = CdcEngine(lake, cfg)
    assert eng2.manifest.version == v_snap
    eng2.run(binlog)  # run() force-flushes at end-of-drain
    assert not eng2.manifest.dirty
    assert int(open(os.path.join(lake, "_manifest", "CURRENT")).read()) == eng2.manifest.version
    oracle = gen.oracle_final_state(spec, ev)
    from tests.conftest import assert_tables_equal

    assert_tables_equal(eng2.lake_table(), oracle, sort_by="url")


def test_debezium_json_roundtrip_fidelity(tmp_path, ray_session):
    """Wire-format write -> C++ JSON parse reproduces the envelope table
    exactly: int64 stays exact (no pandas NaN-promotion), null
    before/after structs survive, timestamps round-trip through int64
    microseconds, snapshot bools stay bools."""
    import os
    import pyarrow.compute as pc

    from debezium_incubator_ray.pipelines.events_cdc import (
        EVENTS_PAYLOAD, events_envelopes,
    )
    from debezium_incubator_ray.sources.debezium_json import (
        read_debezium_jsonl, write_debezium_jsonl,
    )

    env = events_envelopes("/root/testdata/sf0.001")
    jdir = str(tmp_path / "wire")
    n = write_debezium_jsonl(env, jdir, seg_rows=10_000)
    assert n == 8  # one shard per partition at this size

    parts = []
    for p in sorted(os.listdir(jdir)):
        for f in sorted(os.listdir(os.path.join(jdir, p))):
            parts.append(read_debezium_jsonl(
                os.path.join(jdir, p, f), EVENTS_PAYLOAD
            ))
    got = pa.concat_tables(parts)
    # reorder both by lsn and compare column-for-column
    def by_lsn(t):
        lsn = t["source"].combine_chunks().field("lsn")
        return t.take(pc.sort_indices(lsn))

    a, b = by_lsn(env), by_lsn(got)
    # JSON carries no nullability flags: cast restores them, values must
    # then be byte-identical
    b = b.cast(a.schema)
    assert a.schema.equals(b.schema)
    for name in a.column_names:
        assert a[name].combine_chunks().equals(
            b[name].combine_chunks()
        ), name


def test_normalize_constraints_check_rules():
    """CHECK constraints at normalize: min/max/not_null/regex drop
    violating c/u rows; deletes are exempt; unknown column raises."""
    import numpy as np
    import pyarrow as pa
    import pytest
    from debezium_incubator_ray import schema as S
    from debezium_incubator_ray.envelope import build_envelopes
    from debezium_incubator_ray.stages.normalize import NormalizeEnvelope

    payload = pa.schema([
        pa.field("url", pa.large_string(), nullable=False),
        pa.field("lang", pa.string()),
        pa.field("fetch_ms", pa.int64()),
    ])
    after = pa.table({
        "url": pa.array(["a", "b", "c", "d", "e"], pa.large_string()),
        "lang": pa.array(["en", "zz", None, "en", "en"]),
        "fetch_ms": pa.array([10, 20, 30, 999, None], pa.int64()),
    })
    before = pa.table({
        "url": pa.array(["a", "b", "c", "d", "e"], pa.large_string()),
        "lang": pa.array([None] * 5, pa.string()),
        "fetch_ms": pa.array([None] * 5, pa.int64()),
    })
    env = build_envelopes(
        pa.array(["c", "c", "c", "u", "d"], pa.string()),
        after, before,
        np.zeros(5, dtype=np.int32),
        np.arange(1, 6, dtype=np.int64),
        table="pages",
    )
    norm = NormalizeEnvelope(
        schema_b64=S.schema_to_b64(payload),
        key="url", num_partitions=2, partitioner="hash",
        constraints=(
            ("lang", "regex", "^(en|de)$"),   # 'zz' fails, NULL passes
            ("fetch_ms", "max", 500),          # 999 fails, NULL passes
        ),
    )
    out = norm(env)
    # b (lang zz) and d (fetch_ms 999) dropped; delete e exempt
    assert sorted(out["url"].to_pylist()) == ["a", "c", "e"]
    assert out.filter(
        pa.compute.equal(out["op"], "d")
    )["url"].to_pylist() == ["e"]

    bad = NormalizeEnvelope(
        schema_b64=S.schema_to_b64(payload),
        key="url", num_partitions=2, partitioner="hash",
        constraints=(("nope", "not_null"),),
    )
    with pytest.raises(ValueError, match="not in the normalized"):
        bad(env)
    with pytest.raises(ValueError, match="unknown constraint kind"):
        NormalizeEnvelope(
            schema_b64=S.schema_to_b64(payload), key="url",
            num_partitions=2, partitioner="hash",
            constraints=(("lang", "between", 1),),
        )


def test_flatten_envelopes_rewrite_and_drop(ray_session):
    """ExtractNewRecordState: rewrite keeps deletes with before-image
    payload + __deleted='true' (null struct → null payload); drop removes
    them; metadata columns carry op/lsn/table."""
    import pyarrow.compute as pc

    from debezium_incubator_ray.pipelines.derive import flatten_envelopes

    ids = np.arange(4, dtype=np.int64)
    after = gen.payload_table(ids, ids + 1)
    before = gen.payload_table(ids, ids)
    env = build_envelopes(
        pa.array(["c", "u", "d", "d"], pa.string()), after, before,
        (ids % 2).astype(np.int32), ids + 1, table="pages",
    )
    # second delete has NO before image (first event for its key)
    b = env["before"].combine_chunks()
    keep = pa.array([False, True, True, False])
    env = env.set_column(
        env.schema.get_field_index("before"), pa.field("before", b.type),
        pc.if_else(keep, b, pa.nulls(4, b.type)),
    )

    flat = flatten_envelopes(env, gen.payload_table(ids, ids).schema,
                             delete_handling="rewrite").take_all()
    assert [r["__deleted"] for r in flat] == ["false", "false", "true", "true"]
    assert [r["__op"] for r in flat] == ["c", "u", "d", "d"]
    assert [r["__lsn"] for r in flat] == [1, 2, 3, 4]
    # row 2: delete with before → before payload; row 3: all-null payload
    assert flat[2]["url"] == before["url"][2].as_py()
    assert flat[3]["url"] is None and flat[3]["text"] is None

    dropped = flatten_envelopes(env, after.schema,
                                delete_handling="drop").take_all()
    assert [r["__op"] for r in dropped] == ["c", "u"]
    assert "__deleted" not in dropped[0]
    assert dropped[1]["text"] == after["text"][1].as_py()

    with pytest.raises(ValueError):
        flatten_envelopes(env, after.schema, delete_handling="tombstone")


def test_snapshot_row_filter_and_watermark_floor(tmp_path, ray_session):
    """snapshot.select.statement.overrides: rows failing the predicate
    never enter the lake; every partition's watermark is floored at the
    snapshot position (streaming resumes table-wide after it)."""
    import pyarrow.compute as pc

    from debezium_incubator_ray.config import EngineConfig
    from debezium_incubator_ray.pipelines.cdc import CdcEngine

    lake = str(tmp_path / "l")
    eng = CdcEngine(
        lake, EngineConfig(num_partitions=4), payload_schema=S.pages_schema()
    )
    pages = gen.make_pages(40)
    eng.snapshot(
        pages, snapshot_lsn=7,
        row_filter=lambda t: pc.greater_equal(
            pc.utf8_length(t["text"]), pc.min(pc.utf8_length(t["text"]))
        ),  # all pass — floor check below is the point
    )
    assert all(eng.manifest.watermark(p) >= 7 for p in range(4))
    assert eng.lake_table().num_rows == 40
    eng.close()

    lake2 = str(tmp_path / "l2")
    eng2 = CdcEngine(
        lake2, EngineConfig(num_partitions=4), payload_schema=S.pages_schema()
    )
    # real filter: keep only urls of even url_id (ends with digit parity)
    eng2.snapshot(
        pages, snapshot_lsn=7,
        row_filter=lambda t: pc.match_substring_regex(t["url"], r"[02468]$"),
    )
    lt = eng2.lake_table()
    assert 0 < lt.num_rows < 40
    assert all(u[-1] in "02468" for u in lt["url"].to_pylist())
    # untouched-partition floor: every partition watermark is >= 7
    assert all(eng2.manifest.watermark(p) >= 7 for p in range(4))
    eng2.close()


def test_fused_reader_preserves_schema_on_all_empty_segments(tmp_path):
    """read_normalize_combine over a group of ZERO-ROW (but valid)
    segments returns an empty table WITH the normalized schema — the
    salted pre-reduce and exchange writers need the columns."""
    import os

    import pyarrow.parquet as pq

    from debezium_incubator_ray import gen
    from debezium_incubator_ray.stages.exchange import (
        read_normalize_combine,
    )
    from debezium_incubator_ray.stages.normalize import NormalizeEnvelope

    spec = gen.BinlogSpec(n_events=64, n_initial=8, num_partitions=2,
                          seg_rows=64, seed=3)
    binlog = str(tmp_path / "b")
    out = gen.write_binlog(binlog, spec, gen.gen_events(spec))
    seg = out["segments"][0]
    empty = str(tmp_path / "empty.parquet")
    pq.write_table(pq.read_table(seg).slice(0, 0), empty)

    from debezium_incubator_ray import schema as S

    nk = dict(
        schema_b64=S.schema_to_b64(S.pages_schema()),
        key="url", key_cols=None, num_partitions=2, partitioner="hash",
        defaults={}, field_blacklist=(), table_include_regex=None,
        default_at={},
    )
    t = read_normalize_combine([empty, empty], NormalizeEnvelope(**nk),
                               "url", False, None)
    assert t is not None and t.num_rows == 0
    assert "url" in t.column_names and S.LSN in t.column_names
    # and a mixed group still combines the non-empty segment normally
    t2 = read_normalize_combine([empty, seg], NormalizeEnvelope(**nk),
                                "url", False, None)
    assert t2.num_rows > 0
