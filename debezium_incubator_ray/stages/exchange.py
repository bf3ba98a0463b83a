"""Staging-file exchange: a disk-backed hash shuffle for the apply stage.

Measured on this environment, Ray Data's object-store AllToAll (sort /
repartition / groupby) moves the 2.5 GB epoch at ~90 MB/s regardless of CPU
count, while plain map stages move the same data at multi-GB/s. So the
partition exchange is expressed as two ordinary map stages around local
staging files (the external-shuffle design of classic MapReduce/Spark):

  stage 1 (tasks):   each block is split by `_p` (one vectorized sort +
                     zero-copy slices) and appended to
                     ``staging/p=<p>/<uuid>.parquet``; the task returns only
                     a tiny (p, path, rows) manifest.
  driver:            collects the manifests (KBs), builds {p: [files]}.
  stage 2 (actors):  one call per partition id reads exactly its listed
                     files and runs the PartitionApplier merge.

Exactly-once: staging files are uuid-named and referenced only through the
returned manifests — a retried writer task's orphan files are never read; a
crash before commit leaves only invisible staging + data files.

Multi-node note: on a real cluster the staging root must be shared storage
(or per-node staging + locality-aware stage-2 scheduling); the object-store
groupby exchange remains available via EngineConfig.exchange="groupby".
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Any, Dict, List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from debezium_incubator_ray import schema as S

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
        idx = pc.sort_indices(batch, sort_keys=[(S.PART, "ascending")])
        t = batch.take(idx)
        parts = t[S.PART].combine_chunks().to_numpy()
        bounds = np.searchsorted(parts, np.arange(self.P + 1))
        out_p: List[int] = []
        out_path: List[str] = []
        out_rows: List[int] = []
        tag = uuid.uuid4().hex
        for p in range(self.P):
            lo, hi = bounds[p], bounds[p + 1]
            if hi <= lo:
                continue
            rel = f"p={p}/{tag}.parquet"
            pq.write_table(
                t.slice(lo, hi - lo), os.path.join(self.stage_dir, rel)
            )
            out_p.append(p)
            out_path.append(rel)
            out_rows.append(int(hi - lo))
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
    ):
        from debezium_incubator_ray.stages.apply import PartitionApplier

        self.inner = PartitionApplier(manifest_doc, lake_dir, target_rows_per_file)
        self.stage_dir = stage_dir
        self.files = {int(k): v for k, v in files_by_partition.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        outs = []
        for p in batch[S.PART].to_pylist():
            paths = [os.path.join(self.stage_dir, rel) for rel in self.files[p]]
            events = pa.concat_tables([pq.read_table(f) for f in paths])
            outs.append(self.inner(events))
        return pa.concat_tables(outs)
