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
