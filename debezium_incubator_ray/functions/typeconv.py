"""Deterministic scalar type-conversion rules (P10/P12).

Re-expresses the reference's two converter stacks as one Arrow cast-rule
module:
- Cassandra byte-buffer deserializers → Avro scalars
  (CassandraTypeDeserializer.java:58-83 and type/deserializer/*.java);
- Oracle JDBC/LCR values → Connect values with width-based integer
  narrowing, decimal scale handling and temporal-unit rules
  (OracleValueConverters.java:82-111 narrowing, :228-253 decimal scale,
  :347-385 DATE/TIMESTAMP precision → epoch millis/micros/nanos).

Everything is a vectorized pyarrow.compute kernel suitable for
``map_batches(batch_format="pyarrow")``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def narrow_int_by_width(col, width: int):
    """Width-based integer narrowing (OracleValueConverters.java:82-111):
    NUMBER(p,0) with p<3 → int8, <5 → int16, <10 → int32, <19 → int64."""
    if width < 3:
        t = pa.int8()
    elif width < 5:
        t = pa.int16()
    elif width < 10:
        t = pa.int32()
    elif width < 19:
        t = pa.int64()
    else:
        t = pa.decimal128(width, 0)
    return pc.cast(col, t)


def floor_to_int64(col):
    """double → int64 with explicit floor (deterministic across engines —
    DuckDB CAST rounds half-even, Arrow cast truncates; both sides of the
    oracle comparison use floor)."""
    return pc.cast(pc.floor(col), pa.int64())


def decimal_scale_pad(col, precision: int, scale: int):
    """NUMBER(p,s) → Decimal(s) with scale padding: 4.4444 → 4.444400 for
    s=6 (OracleValueConverters.java:228-253)."""
    return pc.cast(col, pa.decimal128(precision, scale))


def timestamp_to_epoch_ms(col):
    """DATE/TIMESTAMP → epoch millis (OracleValueConverters.java:347-385;
    TimestampTypeDeserializer.java:18-27 timestamp-millis)."""
    return pc.cast(pc.cast(col, pa.timestamp("ms")), pa.int64())


def timestamp_to_epoch_us(col):
    return pc.cast(pc.cast(col, pa.timestamp("us")), pa.int64())


def timestamp_to_iso_string(col):
    """TIMESTAMPTZ → ISO-8601 string (OracleValueConverters.java:355-364);
    UTC-naive (Arrow and DuckDB defaults agree). Second precision: Arrow's
    %S prints fractional digits for sub-second units, so truncate first."""
    return pc.strftime(pc.cast(col, pa.timestamp("s")), format="%Y-%m-%d %H:%M:%S")


def bool_to_int(col):
    return pc.cast(col, pa.int8())


def float_narrow(col):
    """BINARY_FLOAT semantic: store as float32
    (OracleValueConverters.java:67-70,194-225)."""
    return pc.cast(col, pa.float32())


def interval_to_micros(day: int, hour: int, minute: int, second: float) -> float:
    """INTERVAL DAY TO SECOND → micro-duration (regex-parsed in the
    reference, OracleValueConverters.java:392-441); scalar helper used by
    tests."""
    return ((day * 24 + hour) * 3600 + minute * 60 + second) * 1_000_000.0


def normalize_types(batch: pa.Table, rules) -> pa.Table:
    """Apply a list of (column, fn, out_name) conversion rules to a batch."""
    out = batch
    for col, fn, out_name in rules:
        out = out.append_column(out_name, fn(out[col]))
    return out


# ---------------------------------------------------------------------------
# nested / collection conversions (P10 breadth: the reference's
# type/deserializer/*.java family re-expressed as Arrow kernels)

import numpy as np


def _chunked(col):
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def list_passthrough(col, value_type=None):
    """list/set → Avro array (SetTypeDeserializer.java:22-25 converts a set
    to a plain array): identity on list columns, with optional element
    cast."""
    col = _chunked(col)
    if value_type is not None and col.type.value_type != value_type:
        col = pc.cast(col, pa.list_(value_type))
    return col


def set_to_sorted_list(col):
    """set semantics pinned deterministically: distinct + sorted elements
    per row (the reference's set→array leaves iteration order to the
    driver; a distributed engine must pin it). Vectorized: one flatten,
    one lexsort, one adjacent-distinct mask — no per-row loop."""
    col = _chunked(col)
    n = len(col)
    offsets = np.zeros(n + 1, dtype=np.int64)
    lens = pc.list_value_length(col).to_numpy(zero_copy_only=False)
    lens = np.nan_to_num(lens, nan=0).astype(np.int64)
    np.cumsum(lens, out=offsets[1:])
    flat = col.flatten()
    if len(flat) == 0:
        return pc.cast(col, pa.list_(col.type.value_type))
    vals = flat.to_numpy(zero_copy_only=False)
    row_of = np.repeat(np.arange(n), lens)
    order = np.lexsort((vals, row_of))
    v, r = vals[order], row_of[order]
    keep = np.ones(len(v), dtype=bool)
    keep[1:] = (v[1:] != v[:-1]) | (r[1:] != r[:-1])
    new_lens = np.bincount(r[keep], minlength=n)
    new_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(new_lens, out=new_off[1:])
    kept = pc.take(flat, pa.array(order[keep]))
    return pa.LargeListArray.from_arrays(pa.array(new_off), kept)


def map_stringify_keys(col):
    """map<K,V> → map<string,V>: non-string keys are stringified
    (MapTypeDeserializer.java:21-41 — Avro map keys must be strings)."""
    col = _chunked(col)
    if pa.types.is_string(col.type.key_type):
        return col
    keys = pc.cast(col.keys, pa.string())
    return pa.MapArray.from_arrays(col.offsets, keys, col.items)


def tuple_to_struct(col, prefix: str = "field"):
    """tuple → record{field1..fieldN} (TupleTypeDeserializer.java:25-61
    names positional components field<i>)."""
    col = _chunked(col)
    assert pa.types.is_struct(col.type)
    children = [col.field(i) for i in range(col.type.num_fields)]
    fields = [
        pa.field(f"{prefix}{i + 1}", col.type.field(i).type)
        for i in range(col.type.num_fields)
    ]
    return pa.StructArray.from_arrays(
        children, fields=fields, mask=pc.invert(pc.is_valid(col))
    )


_HEX_LUT = np.full(256, 255, dtype=np.uint8)
for _i, _c in enumerate(b"0123456789abcdef"):
    _HEX_LUT[_c] = _i
for _i, _c in enumerate(b"ABCDEF"):
    _HEX_LUT[_c] = 10 + _i


def uuid_to_fixed16(col):
    """uuid/timeuuid string → fixed 16-byte binary
    (UUIDTypeDeserializer.java:20-29 → Avro fixed(16)). Vectorized numpy
    hex decode: strip dashes, ascii→nibble lookup, pack pairs."""
    col = _chunked(col)
    hexs = pc.cast(pc.replace_substring(col, "-", ""), pa.string())
    if isinstance(hexs, pa.ChunkedArray):
        hexs = hexs.combine_chunks()
    n = len(hexs)
    bufs = hexs.buffers()
    offsets = np.frombuffer(bufs[1], dtype=np.int32)[
        hexs.offset : hexs.offset + n + 1
    ]
    flat = np.frombuffer(bufs[2], dtype=np.uint8)[offsets[0] : offsets[-1]]
    if len(flat) != n * 32:
        raise ValueError("uuid_to_fixed16: every uuid must be 32 hex chars")
    nib = _HEX_LUT[flat]
    if (nib == 255).any():
        raise ValueError("uuid_to_fixed16: non-hex character")
    by = (nib[0::2] << 4) | nib[1::2]
    return pa.FixedSizeBinaryArray.from_buffers(
        pa.binary(16), n, [None, pa.py_buffer(by.tobytes())]
    )


def inet_to_string(col):
    """inet → string (InetAddressDeserializer.java:21-24) — identity for
    already-textual addresses, cast otherwise."""
    return pc.cast(_chunked(col), pa.string())


def duration_struct_type() -> pa.DataType:
    return pa.struct(
        [pa.field("months", pa.int32()), pa.field("days", pa.int32()),
         pa.field("nanos", pa.int64())]
    )


def duration_to_struct(months, days, nanos):
    """duration → record{months, days, nanos}
    (CassandraTypeToAvroSchemaMapper.java:37-41)."""
    return pa.StructArray.from_arrays(
        [
            pc.cast(_chunked(months), pa.int32()),
            pc.cast(_chunked(days), pa.int32()),
            pc.cast(_chunked(nanos), pa.int64()),
        ],
        fields=list(duration_struct_type()),
    )


_DTS_RE = r"^([+-]?\d+) (\d+):(\d+):(\d+(?:\.\d+)?)$"


def interval_dts_to_micros(col):
    """INTERVAL DAY TO SECOND string 'D H:M:S[.f]' → micro-duration double
    (regex-parsed in the reference, OracleValueConverters.java:392-441) —
    vectorized via pc.extract_regex + arithmetic kernels."""
    col = _chunked(col)
    m = pc.extract_regex(
        col, r"^(?P<d>[+-]?\d+) (?P<h>\d+):(?P<mi>\d+):(?P<s>\d+(?:\.\d+)?)$"
    )
    d = pc.cast(pc.struct_field(m, "d"), pa.float64())
    h = pc.cast(pc.struct_field(m, "h"), pa.float64())
    mi = pc.cast(pc.struct_field(m, "mi"), pa.float64())
    s = pc.cast(pc.struct_field(m, "s"), pa.float64())
    total = pc.add(
        pc.multiply(pc.add(pc.multiply(pc.add(pc.multiply(d, 24.0), h), 60.0), mi), 60.0),
        s,
    )
    return pc.multiply(total, 1_000_000.0)


def interval_ym_to_months(col):
    """INTERVAL YEAR TO MONTH string 'Y-M' → total months int32
    (OracleValueConverters.java:392-420)."""
    col = _chunked(col)
    m = pc.extract_regex(col, r"^(?P<y>[+-]?\d+)-(?P<m>\d+)$")
    y = pc.cast(pc.struct_field(m, "y"), pa.int64())
    mo = pc.cast(pc.struct_field(m, "m"), pa.int64())
    return pc.cast(pc.add(pc.multiply(y, 12), mo), pa.int32())


def variable_scale_decimal(col):
    """NUMBER without scale → VariableScaleDecimal struct {scale, unscaled}
    (OracleValueConverters.java:331-345 — the struct the reference emits
    when precision/scale are unknown). Input: decimal128 column; unscaled
    bounded to int64 here (covers the reference's test domain)."""
    col = _chunked(col)
    assert pa.types.is_decimal(col.type)
    scale = col.type.scale
    # exact unscaled digits via the decimal's string form (no float round)
    s = pc.cast(col, pa.string())
    digits = pc.replace_substring(s, ".", "")
    unscaled = pc.cast(digits, pa.int64())
    n = len(col)
    return pa.StructArray.from_arrays(
        [
            pa.array(np.full(n, scale, dtype=np.int32)),
            unscaled,
        ],
        fields=[pa.field("scale", pa.int32()), pa.field("value", pa.int64())],
    )


def timestamptz_to_iso(col):
    """TIMESTAMPTZ → ISO-8601 zoned string with UTC offset
    (OracleValueConverters.java:355-364). tz-aware input keeps its zone."""
    col = _chunked(col)
    if getattr(col.type, "tz", None) is None:
        col = pc.assume_timezone(col, "UTC")
    # %S prints fractional digits for sub-second units — truncate first
    col = pc.cast(col, pa.timestamp("s", tz=col.type.tz))
    return pc.strftime(col, format="%Y-%m-%dT%H:%M:%S%z")


def timestamp_ltz_unsupported(col):
    """TIMESTAMP WITH LOCAL TIME ZONE → typed NULL column (with a warn):
    the reference explicitly does not support LTZ — its converter
    registers the type but emits null for every value
    (ORA/OracleValueConverters.java:71-73,388-390). Emitting a TYPED null
    string column (not dropping the field) keeps downstream schema
    alignment stable, matching the reference's behavior of keeping the
    field in the record schema with null data."""
    import warnings

    col = _chunked(col)
    warnings.warn(
        "TIMESTAMP WITH LOCAL TIME ZONE is unsupported (parity with the "
        "reference's OracleValueConverters); values convert to null",
        UserWarning,
        stacklevel=2,
    )
    return pa.nulls(len(col), pa.string())
