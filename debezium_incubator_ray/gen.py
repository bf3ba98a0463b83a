"""Deterministic synthetic data: pages lake table + Debezium-style binlog.

Everything is a pure function of (ids, lsns, seed) so any component — the
engine, the pytest oracle, the bench harness — can independently recompute
the exact same bytes (the per-url byte-identical ``text`` invariant from
BASELINE.json input_hint).

Mirrors the reference's embedded-infra test pattern: build tiny deterministic
inputs, run a stage, assert the materialized batch
(EmbeddedCassandraConnectorTestBase.java:33-55, CommitLogProcessorTest.java:
45-96). The binlog layout mirrors commit-log segments sorted by filename
(CommitLogProcessor.java:83-84, CommitLogUtil.java:75-103):
``binlog/p=<p>/seg-<k>.parquet``, LSN-ordered within partition.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from debezium_incubator_ray import schema as S
from debezium_incubator_ray.envelope import build_envelopes
from debezium_incubator_ray.hashing import partition_ids

_LANGS = np.array(["en", "de", "fr", "es", "zh", "ja", "ru", "pt"])
_LANG_W = np.array([45, 10, 10, 10, 8, 7, 5, 5])  # fixed weights (FIXTURES F1)
_HTML_PRE = b"<!DOCTYPE html><html><body>"
_HTML_SUF = b"</body></html>"

# deterministic word vocabulary (no RNG — pure arithmetic)
_VOCAB = np.array(
    ["w%04d" % ((i * 2654435761) % 9973) for i in range(1024)]
)
_VOCAB_ARROW = pa.array(_VOCAB.tolist(), type=pa.string())


def make_text(url_ids: np.ndarray, lsns: np.ndarray) -> pa.Array:
    """Pure deterministic text per (url_id, version lsn) — fully vectorized
    (flat token-index arithmetic + an Arrow-kernel list join)."""
    url_ids = np.asarray(url_ids, dtype=np.int64)
    lsns = np.asarray(lsns, dtype=np.int64)
    n_tok = (5 + (url_ids + lsns) % 60).astype(np.int64)
    offsets = np.zeros(len(url_ids) + 1, dtype=np.int64)
    np.cumsum(n_tok, out=offsets[1:])
    total = int(offsets[-1])
    row_of = np.repeat(np.arange(len(url_ids)), n_tok)
    j = np.arange(total, dtype=np.int64) - offsets[row_of]
    idx = (url_ids[row_of] * 2654435761 + lsns[row_of] * 40503 + j * 97) % 1024
    flat = pc.take(_VOCAB_ARROW, pa.array(idx))  # C++ gather, no py objects
    lists = pa.LargeListArray.from_arrays(pa.array(offsets, pa.int64()), flat)
    return pc.cast(pc.binary_join(lists, " "), pa.large_string())


def urls_for(url_ids: np.ndarray) -> pa.Array:
    """Vectorized f"https://site-{u % 97}.example/p/{u:08d}"."""
    url_ids = np.asarray(url_ids, dtype=np.int64)
    site = pc.cast(pa.array(url_ids % 97), pa.string())
    num = pc.utf8_lpad(pc.cast(pa.array(url_ids), pa.string()), 8, "0")
    return pc.binary_join_element_wise(
        pa.scalar("https://site-"), site, pa.scalar(".example/p/"), num,
        pa.scalar(""),
    )


def payload_table(
    url_ids: np.ndarray, lsns: np.ndarray, schema_version: int = 1
) -> pa.Table:
    """Build the full pages payload for rows (url_ids[i], version=lsns[i])."""
    url_ids = np.asarray(url_ids, dtype=np.int64)
    lsns = np.asarray(lsns, dtype=np.int64)
    texts = make_text(url_ids, lsns)
    n = len(url_ids)
    html = pc.cast(
        pc.binary_join_element_wise(
            pa.scalar(_HTML_PRE.decode(), pa.large_string()),
            texts,
            pa.scalar(_HTML_SUF.decode(), pa.large_string()),
            pa.scalar("", pa.large_string()),
        ),
        pa.large_binary(),
    )
    base = np.int64(1767225600_000000)  # 2026-01-01T00:00:00Z in us
    ts = base + url_ids * 1_000_000 + lsns * 1000
    lang = _LANGS[
        np.searchsorted(np.cumsum(_LANG_W), (url_ids * 31) % 100, side="right")
    ]
    cols = [
        urls_for(url_ids),
        pa.array(ts, type=pa.timestamp("us")),
        html,
        texts,
        pa.array(lang, type=pa.string()),
    ]
    schema = S.pages_schema()
    if schema_version >= 2:
        schema = schema.append(pa.field("fetch_status", pa.int32()))
        cols.append(pa.array((200 + (url_ids + lsns) % 5).astype(np.int32)))
    return pa.Table.from_arrays(cols, schema=schema)


def extract_text(html: pa.Array | pa.ChunkedArray) -> pa.Array:
    """THE per-row invariant: deterministic text extraction from html bytes,
    vectorized (pc.binary_slice strips the fixed wrapper)."""
    if isinstance(html, pa.ChunkedArray):
        html = html.combine_chunks()
    sliced = pc.binary_slice(html, len(_HTML_PRE), -len(_HTML_SUF))
    return pc.cast(sliced, pa.large_string())


def make_pages(n0: int, chunk: int = 131_072) -> pa.Table:
    """Initial lake table state (snapshot source): versions at lsn=0.

    Built in chunks — one multi-million-row make_text call thrashes caches
    (measured ~10x slower per row than the ~100k-row regime)."""
    parts = []
    for lo in range(0, n0, chunk):
        ids = np.arange(lo, min(lo + chunk, n0), dtype=np.int64)
        parts.append(payload_table(ids, np.zeros(len(ids), dtype=np.int64)))
    if not parts:
        return payload_table(np.empty(0, np.int64), np.empty(0, np.int64))
    return pa.concat_tables(parts)


# ---------------------------------------------------------------------------
# binlog event stream (F2)


@dataclasses.dataclass
class BinlogSpec:
    n_events: int = 10_000
    n_initial: int = 1_000  # pre-existing urls (snapshot universe)
    seg_rows: int = 2_048  # mirrors max.batch.size=2048 default
    num_partitions: int = 16
    seed: int = 42
    base_lsn: int = 0  # stream lsns start at base_lsn + 1
    zipf_s: float = 1.1  # hot-url skew for updates
    # mix: create / update / delete / reinsert (percent, cumulative)
    mix: Sequence[int] = (30, 75, 90, 100)
    schema_changes: Sequence[S.SchemaChange] = ()
    emit_before: bool = True  # before images (u/d); off halves gen cost


def gen_events(spec: BinlogSpec) -> Dict[str, np.ndarray]:
    """Deterministic event stream with a live/deleted url state machine.

    Returns parallel arrays: op (bytes code), url_id, lsn, prev_lsn.
    prev_lsn = the version a before-image would show (-1 if none).
    """
    rng = np.random.default_rng(spec.seed)
    n = spec.n_events
    action_u = rng.integers(0, 100, size=n)
    pick_u = rng.random(size=n)  # for zipf-ish index into live set
    ops = np.empty(n, dtype="U1")
    url_id = np.empty(n, dtype=np.int64)
    prev_lsn = np.full(n, -1, dtype=np.int64)
    lsn = spec.base_lsn + 1 + np.arange(n, dtype=np.int64)

    live: Dict[int, int] = {i: 0 for i in range(spec.n_initial)}
    live_list: List[int] = list(range(spec.n_initial))
    deleted: List[int] = []
    next_new = spec.n_initial
    c_cre, c_upd, c_del, _ = spec.mix
    a = 1.0 / (spec.zipf_s)

    for i in range(n):
        r = action_u[i]
        if r < c_cre or not live_list:
            uid = next_new
            next_new += 1
            ops[i] = "c"
            url_id[i] = uid
            live[uid] = int(lsn[i])
            live_list.append(uid)
        elif r < c_upd:
            # zipf-ish: u**(1/s) biases toward low ranks (hot urls)
            k = int((pick_u[i] ** (1.0 / spec.zipf_s)) * len(live_list))
            uid = live_list[min(k, len(live_list) - 1)]
            ops[i] = "u"
            url_id[i] = uid
            prev_lsn[i] = live[uid]
            live[uid] = int(lsn[i])
        elif r < c_del:
            k = min(int(pick_u[i] * len(live_list)), len(live_list) - 1)
            uid = live_list[k]
            # O(1) swap-remove — list.pop(mid) is O(n) and makes generation
            # quadratic at millions of events
            live_list[k] = live_list[-1]
            live_list.pop()
            ops[i] = "d"
            url_id[i] = uid
            prev_lsn[i] = live.pop(uid)
            deleted.append(uid)
        else:
            if deleted:
                uid = deleted.pop()
                ops[i] = "c"
                url_id[i] = uid
                live[uid] = int(lsn[i])
                live_list.append(uid)
            else:
                uid = live_list[0]
                ops[i] = "u"
                url_id[i] = uid
                prev_lsn[i] = live[uid]
                live[uid] = int(lsn[i])
    return {"op": ops, "url_id": url_id, "lsn": lsn, "prev_lsn": prev_lsn}


def events_to_envelopes(
    ev: Dict[str, np.ndarray],
    sl: slice,
    spec: BinlogSpec,
    emit_before: bool = True,
) -> pa.Table:
    """Materialize envelope rows for events[sl] (vectorized payload build)."""
    op = ev["op"][sl]
    uid = ev["url_id"][sl]
    lsn = ev["lsn"][sl]
    prev = ev["prev_lsn"][sl]
    ver = 1
    changes = sorted(spec.schema_changes, key=lambda c: c.at_lsn)
    after = payload_table(uid, lsn, schema_version=ver)
    if changes:
        # events after the change's at_lsn carry the evolved payload; a
        # single mixed batch is split by lsn and rebuilt per version
        at = changes[0].at_lsn
        v2_mask = lsn > at
        if v2_mask.any() and (~v2_mask).any():
            t1 = payload_table(uid[~v2_mask], lsn[~v2_mask], 1)
            t2 = payload_table(uid[v2_mask], lsn[v2_mask], 2)
            # upgraded at generation: engine sees heterogeneous segments
            after = (t1, t2, v2_mask)
        elif v2_mask.all():
            after = payload_table(uid, lsn, 2)
    before = payload_table(uid, np.maximum(prev, 0)) if emit_before else None
    part = partition_ids(urls_for(uid), spec.num_partitions, "hash")

    def _build(after_tbl, op_a, before_tbl, part_a, lsn_a):
        return build_envelopes(
            pa.array(op_a, type=pa.string()),
            after_tbl,
            before_tbl,
            part_a,
            lsn_a,
            table="pages",
        )

    if isinstance(after, tuple):
        t1, t2, v2_mask = after
        m = ~v2_mask
        e1 = _build(t1, op[m], before.filter(pa.array(m)) if before else None, part[m], lsn[m])
        before2 = (
            payload_table(uid[v2_mask], np.maximum(prev[v2_mask], 0), 2)
            if emit_before
            else None
        )
        e2 = _build(t2, op[v2_mask], before2, part[v2_mask], lsn[v2_mask])
        return e1, e2  # caller concatenates into one mixed segment
    return _build(after, op, before, part, lsn)


def write_binlog(
    out_dir: str, spec: BinlogSpec, ev: Optional[Dict[str, np.ndarray]] = None
) -> Dict:
    """Write the segment files + a structured schema-change control file.

    Returns {"segments": [...], "events": ev}.
    """
    ev = ev if ev is not None else gen_events(spec)
    os.makedirs(out_dir, exist_ok=True)
    part = partition_ids(
        urls_for(ev["url_id"]), spec.num_partitions, "hash"
    )
    segments = []
    for p in range(spec.num_partitions):
        idx = np.nonzero(part == p)[0]  # already lsn-ordered (global order)
        pdir = os.path.join(out_dir, f"p={p}")
        os.makedirs(pdir, exist_ok=True)
        for k, lo in enumerate(range(0, len(idx), spec.seg_rows)):
            chunk = idx[lo : lo + spec.seg_rows]
            sub = {k2: v[chunk] for k2, v in ev.items()}
            env = events_to_envelopes(sub, slice(None), spec, emit_before=spec.emit_before)
            path = os.path.join(pdir, f"seg-{k:05d}.parquet")
            if isinstance(env, tuple):
                env = _concat_mixed(env)
            pq.write_table(env, path)
            segments.append(path)
    if spec.schema_changes:
        with open(os.path.join(out_dir, "_schema_changes.json"), "w") as f:
            json.dump([c.to_json() for c in spec.schema_changes], f)
    return {"segments": segments, "events": ev}


def _concat_mixed(pair):
    """Two envelope tables of different payload versions → one segment table
    upgraded to the newer envelope schema (missing struct fields → null; the
    engine backfills defaults)."""
    from debezium_incubator_ray.envelope import widen_struct_column

    e1, e2 = pair
    for col in ("before", "after"):
        i = e1.schema.get_field_index(col)
        widened = widen_struct_column(e1[col], e2.schema.field(col).type)
        e1 = e1.set_column(i, pa.field(col, e2.schema.field(col).type), widened)
    return pa.concat_tables([e1, e2])


def oracle_final_state(
    spec: BinlogSpec,
    ev: Dict[str, np.ndarray],
    upto_lsn: Optional[int] = None,
) -> pa.Table:
    """The ~50-line engine-independent oracle (FIXTURES.md): snapshot ∪ stream
    → max-lsn winner per url → drop deletes → rebuild payload deterministically.
    """
    op = np.concatenate([np.full(spec.n_initial, "r"), ev["op"]])
    uid = np.concatenate([np.arange(spec.n_initial, dtype=np.int64), ev["url_id"]])
    lsn = np.concatenate([np.zeros(spec.n_initial, dtype=np.int64), ev["lsn"]])
    if upto_lsn is not None:
        m = lsn <= upto_lsn
        op, uid, lsn = op[m], uid[m], lsn[m]
    order = np.lexsort((-lsn, uid))
    uid_s, lsn_s, op_s = uid[order], lsn[order], op[order]
    first = np.ones(len(uid_s), dtype=bool)
    first[1:] = uid_s[1:] != uid_s[:-1]
    w_uid, w_lsn, w_op = uid_s[first], lsn_s[first], op_s[first]
    live = w_op != "d"
    changes = sorted(spec.schema_changes, key=lambda c: c.at_lsn)
    if not changes:
        tbl = payload_table(w_uid[live], w_lsn[live])
        return tbl.sort_by([("url", "ascending")])
    # schema evolution: rows last written after at_lsn carry real values;
    # older rows get the default backfill
    at = changes[0].at_lsn
    u, l = w_uid[live], w_lsn[live]
    tbl = payload_table(u, l, schema_version=2)
    col = changes[0].column
    default = changes[0].default
    idx = tbl.schema.get_field_index(col)
    v2 = pa.array(l > at)
    backfilled = pc.if_else(
        v2,
        tbl.column(col).combine_chunks(),
        pa.array(np.full(len(u), default), type=tbl.schema.field(idx).type),
    )
    tbl = tbl.set_column(idx, tbl.schema.field(idx), backfilled)
    return tbl.sort_by([("url", "ascending")])
