"""Pure-kernel tests (no Ray needed): generator determinism, text
invariant, LWW reduce/merge laws, schema evolution, hashing stability.

Mirrors the reference's golden unit-test layer
(CassandraTypeDeserializerTest.java:72-447 one-test-per-rule;
FileOffsetWriterTest.java:38-125 mark/isProcessed ordering laws).
"""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from debezium_incubator_ray import gen
from debezium_incubator_ray import schema as S
from debezium_incubator_ray.envelope import lww_reduce, merge_lww
from debezium_incubator_ray.hashing import partition_ids, stable_hash

from tests.conftest import assert_tables_equal


def test_extract_text_invariant():
    pages = gen.make_pages(50)
    t = gen.extract_text(pages["html"])
    assert t.to_pylist() == pages["text"].to_pylist()


def test_generator_deterministic():
    spec = gen.BinlogSpec(n_events=300, n_initial=50, seed=11)
    a, b = gen.gen_events(spec), gen.gen_events(spec)
    for k in a:
        assert (a[k] == b[k]).all()


def test_payload_pure_function():
    ids = np.array([3, 7, 3], dtype=np.int64)
    lsns = np.array([5, 5, 5], dtype=np.int64)
    t = gen.payload_table(ids, lsns)
    assert t["text"][0].as_py() == t["text"][2].as_py()
    assert t["url"][0].as_py() != t["url"][1].as_py()


def test_stable_hash_deterministic():
    arr = pa.array([f"u{i}" for i in range(100)])
    h1, h2 = stable_hash(arr), stable_hash(arr)
    assert (h1 == h2).all()
    p = partition_ids(arr, 8, "hash")
    assert p.min() >= 0 and p.max() < 8
    ints = pa.array(np.arange(100, dtype=np.int64))
    pm = partition_ids(ints, 8, "mod")
    assert (pm == np.arange(100) % 8).all()


def test_lww_reduce_max_lsn_wins():
    t = pa.table(
        {
            "k": ["a", "b", "a", "a", "b"],
            S.LSN: pa.array([1, 2, 5, 3, 1], type=pa.int64()),
            "v": [10, 20, 50, 30, 11],
        }
    )
    r = lww_reduce(t, "k")
    got = {r["k"][i].as_py(): r["v"][i].as_py() for i in range(r.num_rows)}
    assert got == {"a": 50, "b": 20}


def test_merge_lww_upsert_and_tombstone():
    existing = pa.table(
        {"k": ["a", "b", "c"], "v": [1, 2, 3], S.LSN: pa.array([0, 0, 0], type=pa.int64())}
    )
    fresh = pa.table(
        {
            "k": ["b", "c", "d"],
            "v": [20, None, 40],
            S.LSN: pa.array([5, 6, 7], type=pa.int64()),
            "op": ["u", "d", "c"],
        }
    )
    out = merge_lww(existing, fresh, "k")
    got = {out["k"][i].as_py(): out["v"][i].as_py() for i in range(out.num_rows)}
    assert got == {"a": 1, "b": 20, "d": 40}  # c tombstoned away
    assert out["k"].to_pylist() == sorted(out["k"].to_pylist())  # sorted run


def test_schema_evolution_rules():
    base = S.pages_schema()
    defaults = {}
    s2 = S.apply_change(
        base, defaults, S.SchemaChange("add_column", "fetch_status", "int32", 200, 10)
    )
    assert s2.field("fetch_status").type == pa.int32()
    assert defaults["fetch_status"] == 200
    s3 = S.apply_change(
        s2, defaults, S.SchemaChange("widen_type", "fetch_status", "int64")
    )
    assert s3.field("fetch_status").type == pa.int64()
    with pytest.raises(TypeError):
        S.apply_change(
            s3, defaults, S.SchemaChange("widen_type", "fetch_status", "int8")
        )
    # upgrade_table backfills defaults and casts
    t = pa.table({"url": ["u"], "warc_ts": pa.array([0], pa.timestamp("us")),
                  "html": pa.array([b"x"], pa.large_binary()),
                  "text": pa.array(["x"], pa.large_string()),
                  "lang": ["en"]})
    up = S.upgrade_table(t, s3, defaults)
    assert up["fetch_status"].to_pylist() == [200]
    assert up.schema.field("fetch_status").type == pa.int64()


def test_oracle_matches_bruteforce_merge():
    import pyarrow.parquet as pq
    import tempfile

    spec = gen.BinlogSpec(n_events=800, n_initial=150, seg_rows=128, num_partitions=4, seed=3)
    ev = gen.gen_events(spec)
    with tempfile.TemporaryDirectory() as d:
        info = gen.write_binlog(d, spec, ev)
        all_env = pa.concat_tables([pq.read_table(s) for s in info["segments"]])
    from debezium_incubator_ray.envelope import unpack_struct

    after = unpack_struct(all_env["after"], S.pages_schema())
    before = unpack_struct(all_env["before"], S.pages_schema())
    flat = pa.table(
        {
            **after,
            "op": all_env["op"].combine_chunks(),
            S.LSN: all_env["source"].combine_chunks().field("lsn"),
        }
    )
    flat = flat.set_column(0, "url", pc.coalesce(flat["url"], before["url"]))
    snap = gen.make_pages(spec.n_initial).append_column(
        S.LSN, pa.array(np.zeros(spec.n_initial, np.int64))
    )
    merged = merge_lww(snap, flat, "url")
    oracle = gen.oracle_final_state(spec, ev)
    assert_tables_equal(merged.select(oracle.schema.names), oracle)


def test_group_argmin_lexicographic_ties():
    import ray.data
    from debezium_incubator_ray.functions.kernels import group_argmin

    t = pa.table({
        "g": pa.array([1, 1, 1, 2, 2, 3, 3], pa.int64()),
        "v": pa.array([5.0, 3.0, 3.0, 7.0, None, 2.0, 2.0], pa.float64()),
        "tie": pa.array([9, 8, 2, 1, 0, 6, 4], pa.int64()),
    })
    out = (
        group_argmin(
            ray.data.from_arrow(t).repartition(4), "g", "v", "tie",
            buckets=2,
        )
        .to_pandas().set_index("g").sort_index()
    )
    # g=1: min v=3.0 with ties -> tie 2; g=2: NULL v excluded -> (7.0, 1);
    # g=3: (2.0, 4)
    assert out.loc[1, "v"] == 3.0 and out.loc[1, "tie"] == 2
    assert out.loc[2, "v"] == 7.0 and out.loc[2, "tie"] == 1
    assert out.loc[3, "v"] == 2.0 and out.loc[3, "tie"] == 4
