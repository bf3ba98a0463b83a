"""Staging-file exchange: a disk-backed hash shuffle for the apply stage.

Measured on this environment, Ray Data's object-store AllToAll (sort /
repartition / groupby) moves the 2.5 GB epoch at ~90 MB/s regardless of CPU
count, while plain map stages move the same data at multi-GB/s. So the
partition exchange is expressed as two ordinary map stages around local
staging files (the external-shuffle design of classic MapReduce/Spark):

  stage 1 (tasks):   each block is split by `_p` (one vectorized sort +
                     zero-copy slices) and appended to
                     ``staging/p=<p>/<uuid>.arrow``; the task returns only
                     a tiny (p, path, rows) manifest. Staging files are
                     LZ4-compressed Arrow IPC, not parquet: parquet
                     encoding is overhead for write-once/read-once files,
                     but LZ4 block compression cuts staged bytes ~8x on
                     web-text payloads for ~2x write CPU (measured 49 MB ->
                     6 MB, +27 ms/100k rows) — the bytes, not the CPU, are
                     the scarce resource when many writers stream at once.
  driver:            collects the manifests (KBs), builds {p: [files]}.
  stage 2 (actors):  one call per partition id reads exactly its listed
                     files and runs the PartitionApplier merge.

Exactly-once: staging files are uuid-named and referenced only through the
returned manifests — a retried writer task's orphan files are never read; a
crash before commit leaves only invisible staging + data files.

Multi-node note: the "staging" mode above assumes the staging root is on
shared storage. For clusters without one, ``exchange="objref"`` (below)
stages the very same LZ4-IPC slices in Ray's OBJECT STORE instead of
files: stage-1 split tasks return each partition slice as a separate
driver-owned object that stays on the node that produced it (per-node
staging), and stage-2 apply tasks take their partition's slice refs as
task ARGUMENTS, so Ray's locality-aware scheduler places each applier on
the node already holding most of its bytes and fetches only the rest
(node-affinity stage-2 scheduling). Only the lake itself (the durable
output) needs shared storage — exactly the deployment split of the
reference's per-node offsets model (CAS/FileOffsetWriter.java:152-172).
The object-store groupby exchange remains available via
EngineConfig.exchange="groupby".
"""

from __future__ import annotations

import io
import json
import os
import uuid
from typing import Any, Dict, List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from debezium_incubator_ray import schema as S

# staged bytes are the scarce resource (see module docstring)
_IPC_LZ4 = pa.ipc.IpcWriteOptions(compression="lz4")


def _partition_slices(batch: pa.Table, P: int):
    """Shared split kernel for every exchange writer: one vectorized sort
    by the partition column, then zero-copy slices at the partition
    boundaries. Yields (p, slice_table) for each non-empty partition."""
    if batch.num_rows == 0:
        return
    idx = pc.sort_indices(batch, sort_keys=[(S.PART, "ascending")])
    t = batch.take(idx)
    parts = t[S.PART].combine_chunks().to_numpy()
    bounds = np.searchsorted(parts, np.arange(P + 1))
    for p in range(P):
        lo, hi = bounds[p], bounds[p + 1]
        if hi > lo:
            yield p, t.slice(lo, hi - lo)

WRITER_MANIFEST_SCHEMA = pa.schema(
    [
        pa.field(S.PART, pa.int32()),
        pa.field("path", pa.string()),
        pa.field("rows", pa.int64()),
    ]
)


class StagingWriter:
    """map_batches stage: split each batch by partition id and append each
    slice to a uuid-named staging parquet. Vectorized: one sort by `_p`,
    then zero-copy slices at the partition boundaries."""

    def __init__(self, stage_dir: str, num_partitions: int):
        self.stage_dir = stage_dir
        self.P = num_partitions
        for p in range(num_partitions):
            os.makedirs(os.path.join(stage_dir, f"p={p}"), exist_ok=True)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return WRITER_MANIFEST_SCHEMA.empty_table()
        out_p: List[int] = []
        out_path: List[str] = []
        out_rows: List[int] = []
        tag = uuid.uuid4().hex
        for p, sl in _partition_slices(batch, self.P):
            rel = f"p={p}/{tag}.arrow"
            with pa.OSFile(os.path.join(self.stage_dir, rel), "wb") as f:
                with pa.ipc.new_file(f, sl.schema, options=_IPC_LZ4) as w:
                    w.write_table(sl)
            out_p.append(p)
            out_path.append(rel)
            out_rows.append(sl.num_rows)
        return pa.Table.from_arrays(
            [
                pa.array(out_p, pa.int32()),
                pa.array(out_path, pa.string()),
                pa.array(out_rows, pa.int64()),
            ],
            schema=WRITER_MANIFEST_SCHEMA,
        )


class StagedApplier:
    """Actor-pool stage over partition ids: read exactly the staging files
    the writer manifests listed for this partition, then run the standard
    PartitionApplier merge (watermark → LWW → copy-on-write sorted runs)."""

    def __init__(
        self,
        manifest_doc: Dict[str, Any],
        lake_dir: str,
        stage_dir: str,
        files_by_partition: Dict[int, List[str]],
        target_rows_per_file: int = 1_000_000,
        watermark_filter: bool = True,
        source: str = "",
    ):
        from debezium_incubator_ray.stages.apply import PartitionApplier

        self.inner = PartitionApplier(
            manifest_doc, lake_dir, target_rows_per_file,
            watermark_filter=watermark_filter, source=source,
        )
        self.stage_dir = stage_dir
        self.files = {int(k): v for k, v in files_by_partition.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        outs = []
        for p in batch[S.PART].to_pylist():
            paths = [os.path.join(self.stage_dir, rel) for rel in self.files[p]]
            events = pa.concat_tables([_read_ipc(f) for f in paths])
            outs.append(self.inner(events))
        return pa.concat_tables(outs)


def _read_ipc(path: str) -> pa.Table:
    with pa.OSFile(path, "rb") as f:
        return pa.ipc.open_file(f).read_all()


# ---------------------------------------------------------------------------
# Locality-aware object-store exchange ("objref"): per-node staging for
# clusters WITHOUT a shared staging filesystem.


def _table_to_ipc_bytes(t: pa.Table) -> bytes:
    sink = io.BytesIO()
    with pa.ipc.new_file(sink, t.schema, options=_IPC_LZ4) as w:
        w.write_table(t)
    return sink.getvalue()


def _ipc_bytes_to_table(b: bytes) -> pa.Table:
    return pa.ipc.open_file(pa.BufferReader(b)).read_all()


@ray.remote
def split_block(block: pa.Table, P: int):
    """Stage 1 of the objref exchange: split ONE normalized block by
    partition id (one vectorized sort + zero-copy slices, same kernel as
    StagingWriter) into P LZ4-compressed Arrow IPC buffers, returned as P
    SEPARATE objects (call with ``num_returns=P + 1``) so stage 2 fetches
    only its own partition's bytes. Return 0 is the tiny per-task meta
    ``(counts, node_id)`` — the per-partition row-count vector plus the
    node that ran the split (drives the per-node combine below); the
    slice objects themselves stay in the object store on the node that
    ran this task. Tasks carry no scheduling constraint: Ray's default
    locality-aware scheduling runs each split where its block already
    lives, so RAW (uncompressed) bytes never cross nodes."""
    counts = np.zeros(P, dtype=np.int64)
    slices: List[Any] = [None] * P
    for p, sl in _partition_slices(block, P):
        counts[p] = sl.num_rows
        slices[p] = _table_to_ipc_bytes(sl)
    meta = (counts.tolist(), ray.get_runtime_context().get_node_id())
    return (meta, *slices)


def read_normalize_combine(paths: List[str], norm, key: str,
                           merge_partial: bool, read_batch):
    """THE fused-reader kernel — read a group of binlog segments,
    normalize each in ``read_batch`` windows (memory bound: a giant
    segment never doubles in one normalize call), concat, and LWW
    pre-combine (skipped for merge_partial: a full-row reduce would
    drop the losing events' cells). One implementation serves both the
    fully-fused objref task (:func:`read_split_block`) and the Dataset
    flavor the staging/groupby exchanges use (pipelines/cdc.py), so the
    two paths cannot drift. An all-empty path group still returns a
    ZERO-ROW table WITH the normalized schema — downstream stages (the
    salted pre-reduce, the exchange writers) need the columns."""
    from debezium_incubator_ray.envelope import lww_reduce

    outs: List[pa.Table] = []
    last = None
    for pth in paths:
        env = pq.read_table(pth)
        if env.num_rows == 0:
            last = norm(env)  # preserve the normalized schema
            continue
        step = read_batch or env.num_rows
        for lo in range(0, env.num_rows, step):
            f = norm(env.slice(lo, step))
            last = f
            if f.num_rows:
                outs.append(f)
    if not outs:
        return last  # None only for an empty path list
    out = pa.concat_tables(outs) if len(outs) > 1 else outs[0]
    if not merge_partial:
        out = lww_reduce(out, key)
    return out


@ray.remote
def read_split_block(paths: List[str], norm_kwargs: Dict[str, Any],
                     key: str, merge_partial: bool,
                     read_batch, P: int):
    """FULLY-fused stage 1 of the objref exchange: read one group of
    binlog segments → normalize → in-task LWW combine
    (:func:`read_normalize_combine`) → split into P LZ4-IPC slices, all
    inside ONE task (``num_returns=P + 1``; return 0 =
    ``(counts, node_id)``, the :func:`split_block` contract). The raw
    decoded envelope bytes — the heaviest data of the epoch — live only
    in this task's heap and never enter the object store: the only
    objects the epoch stages are the compressed slices. (Ray Data cannot
    express a multi-return split, and does not fuse ReadParquet with
    downstream maps in this version, so the Dataset formulation ships
    raw blocks between operators — measured as the dominant cost on the
    simulated 2-node cluster.)"""
    from debezium_incubator_ray.stages.normalize import NormalizeEnvelope

    norm = NormalizeEnvelope(**norm_kwargs)
    t = read_normalize_combine(paths, norm, key, merge_partial, read_batch)
    counts = np.zeros(P, dtype=np.int64)
    slices: List[Any] = [None] * P
    if t is not None and t.num_rows:
        for p, sl in _partition_slices(t, P):
            counts[p] = sl.num_rows
            slices[p] = _table_to_ipc_bytes(sl)
    meta = (counts.tolist(), ray.get_runtime_context().get_node_id())
    return (meta, *slices)


@ray.remote
def combine_slices(*payloads):
    """Node-local combine between split and apply (the multi-node
    coalescing stage): gathers the LZ4-IPC slice payloads one node
    produced for ONE partition into a single list object — a memcpy, no
    decode. Stage 2 then fetches one combined object per producing node
    instead of one small object per (block × partition); per-object
    store metadata and per-fetch gRPC round-trips were the measured
    multi-node plateau of the fine-grained fan-out. Scheduled with soft
    affinity to the producing node, so the gather reads local bytes and
    only the combined object crosses the wire."""
    return [b for b in payloads if b is not None]


def combine_slice_refs(slices_by_p: Dict[int, List], nodes_by_p: Dict[int, List]):
    """Per-(node, partition) combine plan for the objref exchange: for
    every partition, group its slice refs by producing node and replace
    each multi-slice group with ONE :func:`combine_slices` task output
    (soft-pinned to that node). Single-node epochs and singleton groups
    pass through untouched — the combine only engages where it saves
    cross-node fetches. Deterministic order: nodes sorted, original
    block order preserved within a node."""
    all_nodes = {n for ns in nodes_by_p.values() for n in ns}
    if len(all_nodes) <= 1:
        return slices_by_p  # single node: no cross-node fetch to save
    from ray.util.scheduling_strategies import NodeAffinitySchedulingStrategy

    out: Dict[int, List] = {}
    for p, refs in slices_by_p.items():
        groups: Dict[Any, List] = {}
        for ref, nid in zip(refs, nodes_by_p[p]):
            groups.setdefault(nid, []).append(ref)
        combined: List = []
        for nid in sorted(groups, key=str):
            grp = groups[nid]
            if len(grp) == 1:
                combined.append(grp[0])
            else:
                combined.append(
                    combine_slices.options(
                        scheduling_strategy=NodeAffinitySchedulingStrategy(
                            node_id=nid, soft=True
                        )
                    ).remote(*grp)
                )
        out[p] = combined
    return out


def _flatten_payloads(payloads) -> List[bytes]:
    """Stage-2 payload args are raw LZ4-IPC buffers or per-node combined
    LISTS of them (:func:`combine_slices`); flatten to one buffer list."""
    flat: List[bytes] = []
    for b in payloads:
        if b is None:
            continue
        if isinstance(b, list):
            flat.extend(x for x in b if x is not None)
        else:
            flat.append(b)
    return flat


@ray.remote
def apply_partition_slices(ctor: Dict[str, Any], p: int, *payloads):
    """Stage 2 of the objref exchange: one task per partition. The slice
    refs (raw or per-node combined) arrive as task ARGUMENTS, so Ray's
    locality-aware scheduler prefers the node already holding most of
    the bytes and the object store transfers only the remote ones. Runs
    the standard PartitionApplier merge; returns the tiny commit-record
    table."""
    from debezium_incubator_ray.stages.apply import PartitionApplier

    events = pa.concat_tables(
        [_ipc_bytes_to_table(b) for b in _flatten_payloads(payloads)]
    )
    return PartitionApplier(**ctor)(events)


class DemuxStagingWriter:
    """Mixed-table demux: ONE pass over a binlog carrying N tables routes
    every event to its (table, partition) staging file (reference:
    RecordMaker.java:36-58 + CassandraTopicSelector.java:32-110 emit to a
    topic per table; here: a lake dir per table). Per batch, per table:
    filter by source.table (the table's NormalizeEnvelope include-regex),
    normalize to that table's schema, split by partition id, append.
    Returns tiny (table, p, path, rows) manifest rows."""

    def __init__(self, stage_dir: str, norm_kwargs_by_table: Dict[str, Dict[str, Any]],
                 route_fn=None):
        from debezium_incubator_ray.stages.normalize import NormalizeEnvelope

        self.stage_dir = stage_dir
        # optional routing SMT (e.g. the outbox event router): rewrites
        # source.table from payload fields BEFORE the per-table include
        # regexes split the stream
        self.route_fn = route_fn
        self.norms = {
            t: NormalizeEnvelope(**kw) for t, kw in norm_kwargs_by_table.items()
        }
        for t, kw in norm_kwargs_by_table.items():
            for p in range(kw["num_partitions"]):
                os.makedirs(os.path.join(stage_dir, t, f"p={p}"), exist_ok=True)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.route_fn is not None:
            batch = self.route_fn(batch)
        tables: List[str] = []
        ps: List[int] = []
        paths: List[str] = []
        rows: List[int] = []
        tag = uuid.uuid4().hex
        for tname, norm in self.norms.items():
            flat = norm(batch)  # include-regex inside norm routes the table
            for p, sl in _partition_slices(flat, norm.num_partitions):
                rel = os.path.join(tname, f"p={p}", f"{tag}.arrow")
                with pa.OSFile(os.path.join(self.stage_dir, rel), "wb") as f:
                    with pa.ipc.new_file(f, sl.schema, options=_IPC_LZ4) as w:
                        w.write_table(sl)
                tables.append(tname)
                ps.append(p)
                paths.append(rel)
                rows.append(sl.num_rows)
        return pa.table(
            {
                "table": pa.array(tables, pa.string()),
                S.PART: pa.array(ps, pa.int32()),
                "path": pa.array(paths, pa.string()),
                "rows": pa.array(rows, pa.int64()),
            }
        )


class DemuxApplier:
    """Stage 2 of the demux epoch: one call per (table, partition) item —
    the per-table PartitionApplier merge over exactly the staging files the
    writers listed. Commit rows carry the table name."""

    def __init__(
        self,
        manifest_docs: Dict[str, Dict[str, Any]],
        lake_dirs: Dict[str, str],
        stage_dir: str,
        files_by_tp: Dict[str, List[str]],
        target_rows_per_file=1_000_000,
    ):
        from debezium_incubator_ray.stages.apply import PartitionApplier

        # per-table file-size targets (a dict) or one int for all
        tgt = (
            target_rows_per_file
            if isinstance(target_rows_per_file, dict)
            else {t: target_rows_per_file for t in manifest_docs}
        )
        self.inner = {
            t: PartitionApplier(doc, lake_dirs[t], tgt[t])
            for t, doc in manifest_docs.items()
        }
        self.stage_dir = stage_dir
        self.files = files_by_tp  # key "table|p" -> [relpaths]

    def __call__(self, batch: pa.Table) -> pa.Table:
        outs = []
        for tname, p in zip(batch["table"].to_pylist(), batch[S.PART].to_pylist()):
            paths = [
                os.path.join(self.stage_dir, rel)
                for rel in self.files[f"{tname}|{p}"]
            ]
            events = pa.concat_tables([_read_ipc(f) for f in paths])
            rec = self.inner[tname](events)
            outs.append(rec.append_column("table", pa.array([tname])))
        return pa.concat_tables(outs)


@ray.remote
def read_split_block_demux(paths: List[str],
                           norm_kwargs_by_table: Dict[str, Dict[str, Any]],
                           route_fn, layout: List, read_batch=None):
    """FULLY-fused demux stage 1 (see :func:`read_split_block`): read a
    group of raw binlog segments → routing SMT → per-table normalize
    (both applied in ``read_batch`` windows — same memory bound as the
    single-table reader) → per-(table, partition) LZ4-IPC slices, one
    object per touched ``layout`` slot, all in ONE task
    (``num_returns=len(layout) + 1``; return 0 = ``(counts,
    node_id)``). Raw envelope bytes never enter the object store."""
    from debezium_incubator_ray.stages.normalize import NormalizeEnvelope

    slot = {tuple(tp): i for i, tp in enumerate(layout)}
    counts = np.zeros(len(layout), dtype=np.int64)
    acc: List[List[pa.Table]] = [[] for _ in layout]
    norms = {
        t: NormalizeEnvelope(**kw) for t, kw in norm_kwargs_by_table.items()
    }
    for pth in paths:
        env = pq.read_table(pth)
        step = read_batch or env.num_rows or 1
        for lo in range(0, env.num_rows, step):
            block = env.slice(lo, step)
            if route_fn is not None:
                block = route_fn(block)
            for tname, norm in norms.items():
                flat = norm(block)
                for p, sl in _partition_slices(flat, norm.num_partitions):
                    acc[slot[(tname, p)]].append(sl)
    slices: List[Any] = [None] * len(layout)
    for i, lst in enumerate(acc):
        if lst:
            t = lst[0] if len(lst) == 1 else pa.concat_tables(lst)
            counts[i] = t.num_rows
            slices[i] = _table_to_ipc_bytes(t)
    meta = (counts.tolist(), ray.get_runtime_context().get_node_id())
    return (meta, *slices)


@ray.remote
def apply_demux_slices(ctor: Dict[str, Any], tname: str, p: int, *payloads):
    """Demux flavor of :func:`apply_partition_slices`: one task per
    (table, partition); slice refs (raw or per-node combined) arrive as
    args for locality-aware scheduling; runs that table's
    PartitionApplier merge and tags the commit record with the table
    name."""
    from debezium_incubator_ray.stages.apply import PartitionApplier

    events = pa.concat_tables(
        [_ipc_bytes_to_table(b) for b in _flatten_payloads(payloads)]
    )
    rec = PartitionApplier(
        ctor["manifest_docs"][tname], ctor["lake_dirs"][tname],
        ctor["target_rows_per_file"][tname],
    )(events)
    return rec.append_column("table", pa.array([tname] * rec.num_rows))
