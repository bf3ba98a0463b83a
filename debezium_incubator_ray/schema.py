"""Arrow schemas, the change-event envelope layout, and schema evolution.

Reference parity:
- envelope = {op, before?, after, source{...}, ts_ms}
  (Record.java:86-97 builds {ts, op, source, after};
   XStreamChangeRecordEmitter.java:34-46 adds before images for u/d).
- source struct mirrors SourceInfo.java:34-60 / OracleSourceInfoStructMaker
  .java:20-27 collapsed to (partition, lsn, table, snapshot, ts_us).
- schema evolution follows Debezium semantics — additive columns with default
  backfill and type widening only (AlterTableParserListener.java:76-133 ADD /
  DROP COLUMN; OracleDatabaseSchema.java:49-64 apply + record history) —
  re-expressed as Arrow schema unification at the sink.
"""

from __future__ import annotations

import base64
import dataclasses
import re
from typing import Any, Dict, List, Optional, Sequence

import pyarrow as pa
import pyarrow.compute as pc

OPS = ("c", "u", "d", "r")  # create, update, delete, snapshot-read
LSN = "_lsn"  # flattened offset column carried through the pipeline + lake
PART = "_p"  # lake partition id column (hash(key) % P)
# reserved defaults-dict key carrying the CUMULATIVE column-rename map
# {historical_name: current_name}: it rides the manifest's defaults through
# every normalize/upgrade site, so renamed columns resolve at both the
# envelope (old-name writers) and the lake-file (old-name runs) boundaries
RENAMES_KEY = "__renames__"

# ---------------------------------------------------------------------------
# canonical table schemas


def pages_schema() -> pa.Schema:
    """The flagship lake table (BASELINE.json input_hint): Common-Crawl-style
    web pages."""
    return pa.schema(
        [
            pa.field("url", pa.string(), nullable=False),
            pa.field("warc_ts", pa.timestamp("us")),
            pa.field("html", pa.large_binary()),
            pa.field("text", pa.large_string()),
            pa.field("lang", pa.string()),
        ]
    )


def source_schema() -> pa.Schema:
    return pa.schema(
        [
            pa.field("partition", pa.int32()),
            pa.field("lsn", pa.int64()),
            pa.field("table", pa.string()),
            pa.field("snapshot", pa.bool_()),
            pa.field("ts_us", pa.timestamp("us")),
        ]
    )


def envelope_schema(payload: pa.Schema) -> pa.Schema:
    """Debezium-style envelope over an arbitrary payload schema."""
    payload_struct = pa.struct(list(payload))
    return pa.schema(
        [
            pa.field("op", pa.string(), nullable=False),
            pa.field("before", payload_struct),
            pa.field("after", payload_struct),
            pa.field("source", pa.struct(list(source_schema())), nullable=False),
            pa.field("ts_ms", pa.int64()),
        ]
    )


# ---------------------------------------------------------------------------
# schema (de)serialization for the manifest


def schema_to_b64(schema: pa.Schema) -> str:
    return base64.b64encode(schema.serialize().to_pybytes()).decode()


def schema_from_b64(s: str) -> pa.Schema:
    return pa.ipc.read_schema(pa.BufferReader(base64.b64decode(s)))


# ---------------------------------------------------------------------------
# schema evolution (Debezium semantics: additive + widening, default backfill)

_WIDEN_OK = {
    ("int8", "int16"),
    ("int8", "int32"),
    ("int8", "int64"),
    ("int16", "int32"),
    ("int16", "int64"),
    ("int32", "int64"),
    ("float", "double"),
    ("int32", "double"),
    ("int64", "double"),
    ("string", "large_string"),
    ("binary", "large_binary"),
    ("timestamp[ms]", "timestamp[us]"),
}


@dataclasses.dataclass
class SchemaChange:
    """A structured DDL-like control event (the reference parses these out of
    Oracle DDL text with ANTLR, OracleDdlParser.java:44-110; our stream
    carries them structured — no text parsing needed)."""

    change: str  # "add_column" | "widen_type" | "drop_column" | "rename_column"
    column: str
    type: Optional[str] = None  # arrow type name for add/widen
    default: Any = None  # backfill default for add_column
    at_lsn: int = 0  # events with lsn > at_lsn use the new version
    to: Optional[str] = None  # new name for rename_column

    def to_json(self) -> dict:
        return dataclasses.asdict(self)

    @staticmethod
    def from_json(d: dict) -> "SchemaChange":
        return SchemaChange(**d)


_TYPE_BY_NAME = {
    "int8": pa.int8(),
    "int16": pa.int16(),
    "int32": pa.int32(),
    "int64": pa.int64(),
    "float": pa.float32(),
    "double": pa.float64(),
    "string": pa.string(),
    "large_string": pa.large_string(),
    "binary": pa.binary(),
    "large_binary": pa.large_binary(),
    "bool": pa.bool_(),
    "date32": pa.date32(),
    "timestamp[ms]": pa.timestamp("ms"),
    "timestamp[us]": pa.timestamp("us"),
}


_DECIMAL_RE = re.compile(r"decimal128\((\d+),\s*(\d+)\)$")


def type_by_name(name: str) -> pa.DataType:
    m = _DECIMAL_RE.match(name)
    if m:  # NUMBER(p,s) from the DDL parser (ddl.py)
        return pa.decimal128(int(m.group(1)), int(m.group(2)))
    return _TYPE_BY_NAME[name]


def apply_change(schema: pa.Schema, defaults: Dict[str, Any], ch: SchemaChange) -> pa.Schema:
    """Evolve ``schema`` by one structured change; mutates ``defaults``."""
    if ch.change == "add_column":
        if schema.get_field_index(ch.column) != -1:
            return schema  # idempotent replay of the same DDL event
        defaults[ch.column] = ch.default
        return schema.append(pa.field(ch.column, type_by_name(ch.type)))
    if ch.change == "widen_type":
        i = schema.get_field_index(ch.column)
        if i == -1:
            raise KeyError(f"widen_type: no column {ch.column}")
        old = schema.field(i)
        new_t = type_by_name(ch.type)
        if (str(old.type), str(new_t)) not in _WIDEN_OK and old.type != new_t:
            raise TypeError(f"narrowing/unsupported widen {old.type} -> {new_t}")
        return schema.set(i, pa.field(ch.column, new_t, nullable=old.nullable))
    if ch.change == "rename_column":
        i = schema.get_field_index(ch.column)
        if i == -1:
            if schema.get_field_index(ch.to) != -1:
                return schema  # idempotent replay of the same DDL event
            raise KeyError(f"rename_column: no column {ch.column}")
        if schema.get_field_index(ch.to) != -1:
            raise ValueError(
                f"rename_column: target {ch.to!r} already exists"
            )
        if ch.column in defaults:
            defaults[ch.to] = defaults.pop(ch.column)
        old = schema.field(i)
        return schema.set(
            i, pa.field(ch.to, old.type, nullable=old.nullable)
        )
    if ch.change == "drop_column":
        i = schema.get_field_index(ch.column)
        if i == -1:
            return schema
        defaults.pop(ch.column, None)
        return schema.remove(i)
    raise ValueError(f"unknown schema change {ch.change}")


def upgrade_table(
    tbl: pa.Table, target: pa.Schema, defaults: Optional[Dict[str, Any]] = None
) -> pa.Table:
    """Align ``tbl`` to ``target``: add missing columns (default backfill),
    widen types via cast, drop extra columns, reorder. Vectorized; the
    workhorse of both event normalization and lazy lake-file upgrade."""
    defaults = defaults or {}
    renames = defaults.get(RENAMES_KEY) or {}
    if renames:
        # pre-rename: runs written before a rename_column carry the old
        # name; the cumulative old->current map realigns them by name
        tbl = tbl.rename_columns(
            [renames.get(n, n) for n in tbl.schema.names]
        )
    n = tbl.num_rows
    cols: List[pa.ChunkedArray] = []
    names = set(tbl.schema.names)
    for f in target:
        if f.name in names:
            col = tbl.column(f.name)
            if col.type != f.type:
                col = pc.cast(col, f.type)
            cols.append(col)
        else:
            d = defaults.get(f.name)
            if d is None:
                cols.append(pa.chunked_array([pa.nulls(n, f.type)]))
            else:
                cols.append(
                    pa.chunked_array([pa.array([d] * n, type=f.type)])
                )
    return pa.Table.from_arrays(cols, schema=target)


def schema_at_lsn(
    base: pa.Schema, changes: Sequence[SchemaChange], lsn: int
) -> pa.Schema:
    """Schema version in effect for events with ``_lsn > change.at_lsn``
    (reference: schema history replayed up to the restart offset,
    OracleConnectorTask.java:73-76 schema.recover(previousOffset))."""
    s = base
    defaults: Dict[str, Any] = {}
    for ch in sorted(changes, key=lambda c: c.at_lsn):
        if ch.at_lsn <= lsn:
            s = apply_change(s, defaults, ch)
    return s
