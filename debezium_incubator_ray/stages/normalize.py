"""Envelope normalization: the stateless hot-path map_batches stage.

Turns raw envelope batches (op, before, after, source, ts_ms) into the flat
apply-ready layout: payload columns (upgraded to the current schema version
with default backfill), ``op``, ``_lsn``, ``_p``.

Reference parity:
- op classification / unsupported-kind skip with counter
  (CommitLogReadHandlerImpl.java:76-136,248-279);
- key extraction (Record.java:73-84 buildKey) — for deletes the key comes
  from the before image (after is null, TombstoneRecord semantics);
- field blacklist projection (FieldFilterSelector.java:28-50) — never drops
  key columns, applied to insert/update images;
- table include regex (OracleConnectorConfig.java:101-103,325-348);
- positional/schema alignment (XStreamChangeRecordEmitter.java:53-62) —
  here: Arrow struct flattening + upgrade_table.

Stateless-but-compiled: regexes and parsed schemas are built once per actor
(callable class), applied vectorized per batch.
"""

from __future__ import annotations

import hashlib
import re
from typing import Any, Dict, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from debezium_incubator_ray import schema as S
from debezium_incubator_ray.envelope import SET_MASK, unpack_struct
from debezium_incubator_ray.hashing import partition_ids

_VALID_OPS = pa.array(list(S.OPS), type=pa.string())


def compile_column_transforms(transforms, protected=()) -> list:
    """Validate (column, kind, arg) value-redaction rules — the engine's
    analog of Debezium's column SMT knobs (`column.mask.with.length.chars`,
    `column.truncate.to.length.chars`, `column.mask.hash.*`): kinds are
    "mask" (non-null → '*' × arg), "truncate" (first arg characters) and
    "hash" (md5 hex of the value — the cross-engine-verifiable digest).
    Key columns are refused: redacting the routing/merge key would break
    partitioning and the LWW upsert."""
    out = []
    for col, kind, *arg in transforms:
        if kind not in ("mask", "truncate", "hash"):
            raise ValueError(f"unknown column transform kind {kind!r}")
        if col in protected:
            raise ValueError(
                f"column transform on key column {col!r}: the routing/"
                "merge key cannot be redacted"
            )
        a = arg[0] if arg else None
        if kind in ("mask", "truncate") and (not isinstance(a, int) or a < 0):
            raise ValueError(f"{kind} transform on {col!r} needs a length >= 0")
        out.append((col, kind, a))
    return out


def apply_column_transforms(cols: Dict[str, pa.Array], compiled) -> None:
    """Apply compiled transforms in place to a dict of payload arrays.
    NULLs stay NULL (a redacted absent value is still absent); each rule is
    one vectorized kernel — hash runs md5 once per DISTINCT value via
    dictionary encoding (low-cardinality columns pay ~0)."""
    for col, kind, a in compiled:
        v = cols.get(col)
        if v is None:
            continue  # blacklisted / absent from this payload version
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        out_t = v.type  # preserve the string flavor (string / large_string)
        if kind == "mask":
            cols[col] = pc.if_else(
                pc.is_valid(v),
                pa.scalar("*" * a, out_t),
                pa.nulls(len(v), out_t),
            )
        elif kind == "truncate":
            cols[col] = pc.utf8_slice_codeunits(v, 0, a)
        else:  # hash
            de = pc.dictionary_encode(v)
            vocab = [
                hashlib.md5(str(s).encode()).hexdigest()
                for s in de.dictionary.to_pylist()
            ]
            cols[col] = pc.take(pa.array(vocab, out_t), de.indices)


class NormalizeEnvelope:
    def __init__(
        self,
        schema_b64: str,
        key: str,
        num_partitions: int,
        partitioner: str = "hash",
        defaults: Optional[Dict[str, Any]] = None,
        field_blacklist: Sequence[str] = (),
        table_include_regex: Optional[str] = None,
        emit_before: bool = False,
        default_at: Optional[Dict[str, int]] = None,
        key_cols: Optional[Sequence[str]] = None,
        emit_set_mask: bool = False,
        constraints: Sequence[tuple] = (),
        column_transforms: Sequence[tuple] = (),
        truncate_events: bool = False,
        truncate_fanout: bool = True,
    ):
        self.schema = S.schema_from_b64(schema_b64)
        self.key = key
        # composite PK: key components extracted per column (deletes fall
        # back to the before image per component), then joined into the
        # internal ``_key`` routing/sort column (EngineConfig.key_cols)
        self.key_cols = list(key_cols) if key_cols else None
        self.num_partitions = num_partitions
        self.partitioner = partitioner
        self.defaults = defaults or {}
        # activation LSN per defaulted column: the default backfills only
        # events serialized BEFORE the column existed (column absent, or a
        # widened null at lsn <= at_lsn) — an explicit NULL set by an event
        # after the evolution stays NULL (Debezium default semantics; the
        # reference backfills only on absent fields, not present nulls)
        self.default_at = default_at or {}
        # cumulative column renames {historical -> current}: envelopes
        # serialized before a rename_column carry the old field name
        self.renames = dict((defaults or {}).get(S.RENAMES_KEY) or {})
        protected = set(self.key_cols or [key])
        self.blacklist = {f for f in field_blacklist if f not in protected}
        self.table_re = re.compile(table_include_regex) if table_include_regex else None
        self.emit_before = emit_before
        # merge_mode="partial": carry the per-event modified-cell bitmask
        # (envelope column ``set_mask``, bit j = WRITER payload field j —
        # CellData presence, CellData.java:23-60) remapped to the CURRENT
        # schema's emitted-column order as ``_set_mask``
        self.emit_set_mask = emit_set_mask
        if emit_set_mask and emit_before:
            raise ValueError("emit_set_mask and emit_before are exclusive")
        # row constraints (CHECK semantics, see EngineConfig.constraints):
        # validated + regexes compiled once per actor
        self.constraints = []
        for col, kind, *arg in constraints:
            if kind not in ("not_null", "min", "max", "regex"):
                raise ValueError(f"unknown constraint kind {kind!r}")
            a = arg[0] if arg else None
            if kind == "regex":
                a = re.compile(a)
            self.constraints.append((col, kind, a))
        # value redaction (mask / truncate / hash) — validated once per
        # actor, applied vectorized per batch BEFORE constraints (rules see
        # the values the lake will actually store)
        # TRUNCATE events (op='t', EngineConfig.truncate_events): the keyless
        # control record is split off BEFORE key extraction and re-emitted
        # as one marker row per lake partition (truncate_fanout=True, the
        # exchange path) or a single _p = -1 sentinel row (the aligned path
        # rewrites it to the task's own partition). Disabled → op='t' rows
        # fall through the unsupported-kind skip like the reference's
        # unhandled mutation kinds.
        self.truncate_events = truncate_events
        self.truncate_fanout = truncate_fanout
        self.column_transforms = compile_column_transforms(
            column_transforms, protected
        )
        for col, _kind, _a in self.column_transforms:
            idx = self.schema.get_field_index(col)
            if idx < 0 or not (
                pa.types.is_string(self.schema.field(idx).type)
                or pa.types.is_large_string(self.schema.field(idx).type)
            ):
                raise ValueError(
                    f"column transform on {col!r}: not a string column of "
                    "the payload schema (redaction targets text columns)"
                )

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return self._empty()
        src = batch["source"].combine_chunks()
        if self.table_re is not None:
            tables = src.field("table")
            # vectorized over the (tiny) set of distinct table names
            uniq = pc.unique(tables).to_pylist()
            keep_names = {t for t in uniq if t and self.table_re.search(t)}
            mask = pc.is_in(tables, value_set=pa.array(sorted(keep_names), type=pa.string()))
            batch = batch.filter(mask)
            src = batch["source"].combine_chunks()
            n = batch.num_rows
            if n == 0:
                return self._empty()
        op = batch["op"].combine_chunks()
        trunc_lsn = None
        if self.truncate_events:
            tmask = pc.fill_null(pc.equal(op, "t"), False)
            if pc.any(tmask).as_py():
                # only the max truncate LSN matters (an older truncate is
                # shadowed by a newer one within the epoch)
                trunc_lsn = pc.max(
                    batch.filter(tmask)["source"].combine_chunks().field("lsn")
                ).as_py()
                batch = batch.filter(pc.invert(tmask))
                src = batch["source"].combine_chunks()
                op = batch["op"].combine_chunks()
                n = batch.num_rows
                if n == 0:
                    return self._with_truncate(self._empty(), trunc_lsn)
        ok = pc.is_in(op, value_set=_VALID_OPS)
        if not pc.all(ok).as_py():
            # unsupported kinds are skipped (with the reference's
            # skip-and-warn semantics); counted via row delta in lineage
            batch = batch.filter(ok)
            src = batch["source"].combine_chunks()
            op = batch["op"].combine_chunks()
            n = batch.num_rows
            if n == 0:
                return self._with_truncate(self._empty(), trunc_lsn)

        payload_env = batch["after"].type  # struct type as written
        env_fields = {f.name for f in payload_env}
        if self.renames:
            # old-name writers resolve to current names: unpack with the
            # envelope's OWN field types, then remap the keys (the cast to
            # the current schema type happens in the per-field loop below)
            env_schema = pa.schema([
                pa.field(payload_env.field(i).name, payload_env.field(i).type)
                for i in range(payload_env.num_fields)
            ])
            after = {
                self.renames.get(k, k): v
                for k, v in unpack_struct(batch["after"], env_schema).items()
            }
        else:
            after = unpack_struct(batch["after"], self._env_schema(env_fields))
        key_components = self.key_cols or [self.key]
        before_keys: Dict[str, pa.Array] = {}
        if "before" in batch.column_names:
            b = batch["before"].combine_chunks()
            valid = pc.is_valid(b)
            for kc in key_components:
                child = b.field(kc)
                before_keys[kc] = pc.if_else(
                    valid, child, pa.nulls(n, child.type)
                )

        lsn_arr = src.field("lsn")
        cols: Dict[str, pa.Array] = {}
        for f in self.schema:
            if f.name in self.blacklist:
                continue
            col = after.get(f.name)
            d = self.defaults.get(f.name)
            if col is None:
                # column absent from the serialized envelope: the writer
                # predates the add_column — backfill all rows
                col = pa.nulls(n, f.type)
                if d is not None:
                    col = pc.fill_null(col, pa.scalar(d, type=f.type))
            else:
                if col.type != f.type:
                    col = pc.cast(col, f.type)  # type widening
                if d is not None:
                    # present column: backfill only pre-evolution rows
                    # (lsn <= activation) — later explicit NULLs are kept
                    at = self.default_at.get(f.name)
                    pre = (
                        pc.less_equal(lsn_arr, pa.scalar(at, pa.int64()))
                        if at is not None
                        else pa.array(np.ones(n, dtype=bool))
                    )
                    need = pc.and_(pre, pc.is_null(col))
                    col = pc.if_else(need, pa.scalar(d, type=f.type), col)
            cols[f.name] = col
        # key: coalesce(after.key, before.key) — deletes carry key via before
        for kc, bk in before_keys.items():
            cols[kc] = pc.coalesce(
                cols[kc], pc.cast(bk, self.schema.field(kc).type)
            )
        if self.key_cols:
            # internal composite routing/sort key (null if ANY component is
            # null → row skipped below, like a missing single-column key)
            from debezium_incubator_ray.envelope import composite_key_arrays

            cols[self.key] = composite_key_arrays(
                [cols[kc] for kc in self.key_cols]
            )
        if self.emit_set_mask:
            # writer-relative cell mask → current-schema emitted-column bit
            # order. -1 (all bits) covers full-row events AND envelopes with
            # no mask column; a target column the writer never had is unset
            # (pre-evolution writers can't have touched it).
            if "set_mask" in batch.column_names:
                src_mask = (
                    pc.fill_null(batch["set_mask"].combine_chunks(), -1)
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                )
            else:
                src_mask = np.full(n, -1, dtype=np.int64)
            writer_idx = {
                self.renames.get(f.name, f.name): i
                for i, f in enumerate(payload_env)
            }
            is_cr = (
                pc.is_in(op, value_set=pa.array(["c", "r"], pa.string()))
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            out_mask = np.zeros(n, dtype=np.int64)
            tj = 0
            for name in cols:  # insertion order == emitted payload order
                wj = writer_idx.get(name)
                if name in (self.key_cols or [self.key]) or name == self.key:
                    out_mask |= np.int64(1) << np.int64(tj)  # key cells: always present
                elif wj is not None:
                    out_mask |= ((src_mask >> np.int64(wj)) & 1) << np.int64(tj)
                elif self.defaults.get(name) is not None:
                    # column absent from this writer but backfilled with the
                    # table default above: a row-CREATING event defines the
                    # whole row, so the default IS its cell value (same
                    # outcome as the lww path); partial updates leave the
                    # cell untouched (it inherits / stays null)
                    out_mask |= is_cr << np.int64(tj)
                tj += 1
            cols[SET_MASK] = pa.array(out_mask)
        if self.column_transforms:
            # value redaction (mask/truncate/hash) — after defaults/widening
            # so rules see lake-typed values, before constraints so CHECK
            # rules validate what the lake will store
            apply_column_transforms(cols, self.column_transforms)
        if self.emit_before:
            btype = batch["before"].type
            if self.renames:
                bschema = pa.schema([
                    pa.field(btype.field(i).name, btype.field(i).type)
                    for i in range(btype.num_fields)
                ])
                before_all = {
                    self.renames.get(k, k): v
                    for k, v in unpack_struct(batch["before"], bschema).items()
                }
            else:
                bschema = self._env_schema({f.name for f in btype})
                before_all = unpack_struct(batch["before"], bschema)
            if self.column_transforms:
                apply_column_transforms(before_all, self.column_transforms)
            for name, arr in before_all.items():
                if name in self.blacklist:
                    continue
                cols[f"before_{name}"] = arr

        cols["op"] = op
        cols[S.LSN] = src.field("lsn")
        out = pa.table(cols)
        # rows with no extractable key (e.g. a delete with neither image)
        # cannot be routed — skip them, like the reference skips unsupported
        # mutation kinds (CommitLogReadHandlerImpl.java:116-136)
        key_valid = pc.is_valid(out[self.key])
        if not pc.all(key_valid).as_py():
            out = out.filter(key_valid)
            if out.num_rows == 0:
                return self._with_truncate(self._empty(), trunc_lsn)
        if self.constraints:
            # CHECK constraints: a violating c/u/r row is dropped before
            # apply (the prior lake value survives); deletes are exempt
            bad, _ = violation_mask(out, self.constraints)
            if pc.any(bad).as_py():
                out = out.filter(pc.invert(bad))
                if out.num_rows == 0:
                    return self._with_truncate(self._empty(), trunc_lsn)
        out = out.append_column(
            S.PART,
            pa.array(
                partition_ids(out[self.key], self.num_partitions, self.partitioner),
                type=pa.int32(),
            ),
        )
        return self._with_truncate(out, trunc_lsn)

    def _env_schema(self, names) -> pa.Schema:
        fallback = (self.key_cols or [self.key])[0]
        return pa.schema(
            [f for f in self.schema if f.name in names]
            or [self.schema.field(fallback)]
        )

    def _empty(self) -> pa.Table:
        cols = {
            f.name: pa.nulls(0, f.type)
            for f in self.schema
            if f.name not in self.blacklist
        }
        if self.key_cols:
            cols[self.key] = pa.nulls(0, pa.string())
        if self.emit_set_mask:
            cols[SET_MASK] = pa.nulls(0, pa.int64())
        cols["op"] = pa.nulls(0, pa.string())
        cols[S.LSN] = pa.nulls(0, pa.int64())
        cols[S.PART] = pa.nulls(0, pa.int32())
        return pa.table(cols)

    def _with_truncate(self, out: pa.Table, trunc_lsn) -> pa.Table:
        """Append the truncate marker rows (null payload, null key, op='t')
        to a normalized batch: one per lake partition when fanning out
        (exchange path), or a single ``_p = -1`` sentinel the aligned
        applier rewrites to its own partition."""
        if trunc_lsn is None:
            return out
        reps = self.num_partitions if self.truncate_fanout else 1
        arrays = []
        for f in out.schema:
            if f.name == "op":
                arrays.append(pa.array(["t"] * reps, f.type))
            elif f.name == S.LSN:
                arrays.append(pa.array([trunc_lsn] * reps, pa.int64()))
            elif f.name == S.PART:
                vals = list(range(reps)) if self.truncate_fanout else [-1]
                arrays.append(pa.array(vals, pa.int32()))
            else:
                arrays.append(pa.nulls(reps, f.type))
        marker = pa.Table.from_arrays(arrays, schema=out.schema)
        return pa.concat_tables([out, marker])

def violation_mask(out: pa.Table, constraints) -> tuple:
    """(bad_mask BooleanArray, reason StringArray) over a normalized
    batch: a c/u/r row violating ANY compiled rule is bad; deletes are
    exempt; ``reason`` carries the FIRST violated rule (constraint
    declaration order) as 'column:kind', null where the row passes.
    Shared by the drop path (NormalizeEnvelope.__call__) and the
    dead-letter view (CdcEngine.dead_letters)."""
    n = out.num_rows
    is_del = pc.equal(out["op"], "d")
    bad = pa.array(np.zeros(n, dtype=bool))
    reason = np.full(n, None, dtype=object)
    for col, kind, a in constraints:
        if col not in out.column_names:
            raise ValueError(
                f"constraint on {col!r}: column not in the "
                "normalized payload (blacklisted or unknown)"
            )
        v = out[col]
        if kind == "not_null":
            viol = pc.is_null(v)
        elif kind == "min":
            viol = pc.fill_null(pc.less(v, a), False)
        elif kind == "max":
            viol = pc.fill_null(pc.greater(v, a), False)
        else:  # regex (substring match = pass)
            viol = pc.fill_null(
                pc.invert(pc.match_substring_regex(v, a.pattern)),
                False,
            )
        viol = pc.and_(viol, pc.invert(is_del))
        fresh = pc.and_(viol, pc.invert(bad)).to_numpy(
            zero_copy_only=False
        )
        reason[fresh] = f"{col}:{kind}"
        bad = pc.or_(bad, viol)
    return bad, pa.array(reason, pa.string())


def make_outbox_router(field: str, prefix: str = ""):
    """Outbox event-router SMT (Debezium's outbox pattern): rewrite each
    envelope's ``source.table`` to ``prefix + payload[field]`` — the
    aggregate-type column of an outbox table decides the destination
    table. Deletes carry a null ``after``, so the route falls back to the
    before image (the row's last known aggregate type); rows where both
    images lack the field stay on their original table (no engine will
    match them — the Debezium router likewise requires a non-null
    aggregatetype). Returns a batch->batch callable for
    ``Lake.apply_epoch_demux(route_fn=...)``."""
    from debezium_incubator_ray.schema import source_schema

    def route(batch: pa.Table) -> pa.Table:
        src = batch["source"].combine_chunks()
        after = batch["after"].combine_chunks()
        n = batch.num_rows
        # mask children under a NULL parent struct: some writers store
        # child values beneath an invalid parent (unpack_struct's warning)
        # and a delete would otherwise route by its tombstone's stale
        # payload instead of the before image
        child = after.field(field)
        val = pc.if_else(pc.is_valid(after), child, pa.nulls(n, child.type))
        if "before" in batch.column_names:
            b = batch["before"].combine_chunks()
            bchild = b.field(field)
            bval = pc.if_else(
                pc.is_valid(b), bchild, pa.nulls(n, bchild.type)
            )
            val = pc.coalesce(val, bval)
        routed = pc.binary_join_element_wise(
            pa.array([prefix] * batch.num_rows, pa.string()),
            pc.cast(val, pa.string()),
            "",
        )
        tbl = pc.coalesce(routed, src.field("table"))
        new_src = pa.StructArray.from_arrays(
            [src.field("partition"), src.field("lsn"), tbl,
             src.field("snapshot"), src.field("ts_us")],
            fields=list(source_schema()),
        )
        i = batch.schema.get_field_index("source")
        return batch.set_column(
            i, pa.field("source", new_src.type, nullable=False), new_src
        )

    return route
