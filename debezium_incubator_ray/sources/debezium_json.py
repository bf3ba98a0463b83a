"""Debezium wire-format (JSON envelope) interchange.

Reference parity: the reference emits Kafka records whose value is the
Debezium JSON envelope — ``{"op", "before", "after", "source": {...},
"ts_ms"}`` (Record.java envelope build; CassandraConnectorTask /
OracleConnectorTask serialize through the Kafka Connect JSON converter).
This module reads that wire format into the engine's canonical Arrow
envelope table, and writes it back out for interop tests.

Scale shape: parsing uses pyarrow's C++ JSON reader with an EXPLICIT
schema (no type inference drift across shards), one Ray task per shard
file; the conversion to a parquet binlog is an embarrassingly parallel
map over shards — no shuffle, each output segment mirrors its input
shard's p=<p>/seg-<k> name so the engine's aligned fast path and
segment-level exactly-once carry over unchanged.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.json as pj
import pyarrow.parquet as pq

from debezium_incubator_ray import schema as S


def _json_payload_schema(payload: pa.Schema) -> pa.Schema:
    """The payload struct as it appears on the JSON wire: timestamps ride
    as int64 microseconds (Debezium's MicroTimestamp logical type)."""
    fields = []
    for f in payload:
        t = pa.int64() if pa.types.is_timestamp(f.type) else f.type
        fields.append(pa.field(f.name, t))
    return pa.schema(fields)


def wire_schema(payload: pa.Schema) -> pa.Schema:
    """Explicit parse schema for one JSON envelope line."""
    p = pa.struct(list(_json_payload_schema(payload)))
    return pa.schema([
        pa.field("op", pa.string()),
        pa.field("before", p),
        pa.field("after", p),
        pa.field("source", pa.struct([
            pa.field("partition", pa.int64()),
            pa.field("lsn", pa.int64()),
            pa.field("table", pa.string()),
            pa.field("snapshot", pa.bool_()),
            pa.field("ts_us", pa.int64()),
        ])),
        pa.field("ts_ms", pa.int64()),
    ])


def _payload_to_wire(col: pa.ChunkedArray, payload: pa.Schema) -> pa.Array:
    """Envelope struct column -> wire layout (timestamps to int64 us)."""
    arr = col.combine_chunks()
    kids = []
    for f in payload:
        child = arr.field(f.name)
        if pa.types.is_timestamp(f.type):
            child = pc.cast(child, pa.int64())
        kids.append(child)
    return pa.StructArray.from_arrays(
        kids, fields=list(_json_payload_schema(payload)),
        mask=pc.is_null(arr),
    )


def _payload_from_wire(arr: pa.Array, payload: pa.Schema) -> pa.Array:
    kids = []
    for f in payload:
        child = arr.field(f.name)
        if pa.types.is_timestamp(f.type):
            child = pc.cast(child, f.type)
        elif child.type != f.type:
            child = pc.cast(child, f.type)
        kids.append(child)
    return pa.StructArray.from_arrays(
        kids, fields=list(payload), mask=pc.is_null(arr),
    )


def write_debezium_jsonl(env: pa.Table, out_dir: str,
                         seg_rows: int = 4096) -> int:
    """Envelope table -> p=<p>/seg-<k>.jsonl shards of wire-format lines
    (the interop WRITER — test/export scaffolding; the engine-facing
    direction is :func:`convert_jsonl_binlog`). Returns shard count."""
    payload = pa.schema(list(env["after"].type.field(i)
                             for i in range(env["after"].type.num_fields)))
    wire = pa.table({
        "op": env["op"],
        "before": _payload_to_wire(env["before"], payload),
        "after": _payload_to_wire(env["after"], payload),
        "source": env["source"].combine_chunks().cast(
            wire_schema(payload).field("source").type
        ),
        "ts_ms": pc.cast(env["ts_ms"], pa.int64()),
    })
    part = env["source"].combine_chunks().field("partition").to_numpy(
        zero_copy_only=False
    )
    n_shards = 0
    for p in np.unique(part):
        idx = np.nonzero(part == p)[0]
        pdir = os.path.join(out_dir, f"p={int(p)}")
        os.makedirs(pdir, exist_ok=True)
        for k, lo in enumerate(range(0, len(idx), seg_rows)):
            chunk = wire.take(pa.array(idx[lo:lo + seg_rows]))
            # to_pylist + json.dumps keeps int64 exact (a pandas round
            # trip NaN-promotes nullable struct children to float); this
            # WRITER is driver-side interop/test scaffolding — the
            # engine-facing direction is the C++ JSON reader below
            import json as _json

            rows = chunk.to_pylist()

            def _finite(v):
                # bare NaN/Infinity tokens are not JSON; the C++ reader
                # rejects them — write null instead (Debezium does the
                # same through the Connect JSON converter)
                if isinstance(v, float) and not np.isfinite(v):
                    return None
                if isinstance(v, dict):
                    return {k2: _finite(x) for k2, x in v.items()}
                return v

            with open(os.path.join(pdir, f"seg-{k:05d}.jsonl"), "w") as f:
                for r in rows:
                    f.write(_json.dumps(_finite(r), separators=(",", ":")))
                    f.write("\n")
            n_shards += 1
    return n_shards


def read_debezium_jsonl(path: str, payload: pa.Schema) -> pa.Table:
    """One wire-format shard -> canonical Arrow envelope table (explicit
    parse schema: no inference drift; C++ JSON reader, no Python loop)."""
    ws = wire_schema(payload)
    raw = pj.read_json(
        path, parse_options=pj.ParseOptions(explicit_schema=ws),
    )
    src = raw["source"].combine_chunks()
    source = pa.StructArray.from_arrays(
        [
            pc.cast(src.field("partition"), pa.int32()),
            src.field("lsn"),
            src.field("table"),
            src.field("snapshot"),
            pc.cast(src.field("ts_us"), pa.timestamp("us")),
        ],
        fields=list(S.source_schema()),
    )
    return pa.table({
        "op": raw["op"],
        "before": _payload_from_wire(raw["before"].combine_chunks(), payload),
        "after": _payload_from_wire(raw["after"].combine_chunks(), payload),
        "source": source,
        "ts_ms": pc.cast(raw["ts_ms"], pa.int64()),
    })


def convert_jsonl_binlog(src_dir: str, dst_dir: str,
                         payload: pa.Schema) -> int:
    """Debezium-JSONL shard directory -> parquet binlog with identical
    p=<p>/seg-<k> layout, one Ray task per shard (embarrassingly
    parallel, no shuffle). Returns segment count."""
    import ray.data

    shards = []
    for pdir in sorted(os.listdir(src_dir)):
        if not pdir.startswith("p="):
            continue
        for f in sorted(os.listdir(os.path.join(src_dir, pdir))):
            if f.endswith(".jsonl"):
                shards.append(os.path.join(pdir, f))
    if not shards:
        return 0
    schema_b64 = S.schema_to_b64(payload)

    def convert(batch: pa.Table) -> pa.Table:
        pl = S.schema_from_b64(schema_b64)
        outs = []
        for rel in batch["rel"].to_pylist():
            env = read_debezium_jsonl(os.path.join(src_dir, rel), pl)
            out = os.path.join(dst_dir, rel[:-len(".jsonl")] + ".parquet")
            os.makedirs(os.path.dirname(out), exist_ok=True)
            pq.write_table(env, out)
            outs.append(rel)
        return pa.table({"rel": pa.array(outs)})

    ray.data.from_items(
        [{"rel": r} for r in shards],
        override_num_blocks=min(len(shards), 64),
    ).map_batches(convert, batch_format="pyarrow").materialize()
    return len(shards)
