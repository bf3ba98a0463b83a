"""Golden-value tests for the nested/collection conversion rules — one
test per rule with exact expected values, mirroring the reference's
CassandraTypeDeserializerTest.java:72-447 (one test per type, exact Avro
value) and OracleValueConverters interval/decimal rules."""

import uuid as U

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from debezium_incubator_ray.functions import typeconv as TC


def test_list_passthrough_and_cast():
    col = pa.array([[1, 2], [3]], pa.list_(pa.int32()))
    out = TC.list_passthrough(col, pa.int64())
    assert out.type == pa.list_(pa.int64())
    assert out.to_pylist() == [[1, 2], [3]]


def test_set_to_sorted_list_distinct_sorted():
    s = pa.array([[3, 1, 3, 2], [5, 5], [], [9]], pa.list_(pa.int64()))
    assert TC.set_to_sorted_list(s).to_pylist() == [[1, 2, 3], [5], [], [9]]


def test_map_stringify_nonstring_keys():
    m = pa.array(
        [[(1, "a"), (2, "b")], [(3, "c")]], pa.map_(pa.int64(), pa.string())
    )
    ms = TC.map_stringify_keys(m)
    assert pa.types.is_string(ms.type.key_type)
    assert ms.to_pylist() == [[("1", "a"), ("2", "b")], [("3", "c")]]
    # string keys pass through untouched
    m2 = pa.array([[("k", 1)]], pa.map_(pa.string(), pa.int64()))
    assert TC.map_stringify_keys(m2) is m2 or TC.map_stringify_keys(m2).equals(m2)


def test_tuple_to_struct_positional_names():
    t = pa.StructArray.from_arrays(
        [pa.array([1, 2]), pa.array(["x", "y"])], names=["c0", "c1"]
    )
    ts = TC.tuple_to_struct(t)
    assert [ts.type.field(i).name for i in range(2)] == ["field1", "field2"]
    assert ts.to_pylist() == [
        {"field1": 1, "field2": "x"},
        {"field1": 2, "field2": "y"},
    ]


def test_uuid_to_fixed16_golden():
    us = [str(U.UUID(int=i * 7919 + 1)) for i in range(4)] + [
        "6ba7b810-9dad-11d1-80b4-00c04fd430c8"  # RFC 4122 namespace uuid
    ]
    out = TC.uuid_to_fixed16(pa.array(us))
    assert out.type == pa.binary(16)
    assert out.to_pylist() == [U.UUID(u).bytes for u in us]


def test_duration_struct_golden():
    d = TC.duration_to_struct(pa.array([1, 0]), pa.array([2, 30]), pa.array([3, 0]))
    assert d.to_pylist() == [
        {"months": 1, "days": 2, "nanos": 3},
        {"months": 0, "days": 30, "nanos": 0},
    ]


def test_interval_day_to_second_regex_kernel():
    iv = TC.interval_dts_to_micros(pa.array(["1 2:3:4.5", "0 0:0:1", "-1 0:0:0"]))
    assert iv.to_pylist() == [(26 * 3600 + 184.5) * 1e6, 1e6, -86400 * 1e6]


def test_interval_year_to_month():
    assert TC.interval_ym_to_months(pa.array(["2-3", "-1-0", "0-11"])).to_pylist() == [
        27, -12, 11,
    ]


def test_decimal_scale_pad_and_variable_scale():
    dec = TC.decimal_scale_pad(pa.array([4.4444, 1.5]), 12, 6)
    assert pc.cast(dec, pa.string()).to_pylist() == ["4.444400", "1.500000"]
    vs = TC.variable_scale_decimal(dec)
    assert vs.to_pylist() == [
        {"scale": 6, "value": 4444400},
        {"scale": 6, "value": 1500000},
    ]


def test_timestamptz_iso_zoned():
    ts = pa.array([np.datetime64("2026-01-01T12:00:00", "us")], pa.timestamp("us"))
    assert TC.timestamptz_to_iso(ts).to_pylist() == ["2026-01-01T12:00:00+0000"]
    zoned = pc.assume_timezone(ts, "America/New_York")
    assert TC.timestamptz_to_iso(zoned).to_pylist() == ["2026-01-01T12:00:00-0500"]


def test_md5_token_hash_bridge_matches_duckdb():
    import duckdb

    from debezium_incubator_ray.functions.tokens import md5_u64

    vals = ["hello", "", "wörld", "hello"]
    got = md5_u64(pa.array(vals))
    con = duckdb.connect()
    exp = [
        con.execute(
            "SELECT ('0x' || substring(md5(?), 1, 16))::UBIGINT", [v]
        ).fetchone()[0]
        for v in vals
    ]
    assert got.tolist() == exp


def test_shingle_hash_doc_boundaries():
    from debezium_incubator_ray.functions.tokens import shingle_hashes

    g, gl = shingle_hashes(pa.array(["a b c d", "c d a b", "", "a b"]), 3)
    assert gl.tolist() == [2, 2, 0, 1]
    # gram 'b c d' of doc0 equals nothing in doc1 (different trigrams),
    # but 'c d a' of doc1 is distinct from 'a b c' of doc0
    assert len(set(g.tolist())) == 5  # abc,bcd / cda,dab / ab
