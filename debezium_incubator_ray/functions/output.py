"""Resumable partitioned Parquet output for batch (curation) pipelines.

The CDC lake gets resumability from its manifest; batch pipeline OUTPUTS
need the same property without a manifest: write one directory per key
bucket with a per-bucket commit marker, so a failed run re-does only the
buckets that never committed and a finished bucket's bytes are never
rewritten. This is the "partitioned output a failed 100 TB job can
resume" shape — the unit of retry is a bucket, not the job.

Layout:
    out_dir/bucket=<i>/part-<uuid>.parquet     (data)
    out_dir/bucket=<i>/_SUCCESS                (commit marker, JSON stats)

Readers (`ray.data.read_parquet(out_dir)`, DuckDB, pyarrow.dataset)
ignore the underscore-prefixed marker files by default.

Single-writer-per-bucket is assumed (the same contract Ray Data's own
write_parquet has); a bucket directory with data files but NO marker is
an aborted attempt and is cleared before rewrite.
"""

from __future__ import annotations

import json
import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from debezium_incubator_ray.functions.tokens import md5_u64


def _bucket_of(col, buckets: int) -> np.ndarray:
    """md5-bridge bucket id per row (DuckDB-reproducible:
    ('0x' || substring(md5(CAST(v AS VARCHAR)),1,16))::UBIGINT % buckets)."""
    return (md5_u64(pc.cast(col, pa.string())) % np.uint64(buckets)).astype(
        np.int64
    )


def resumable_write(
    ds,
    out_dir: str,
    partition_col: str,
    buckets: int = 16,
) -> pa.Table:
    """Write ``ds`` as bucket-partitioned parquet, skipping buckets whose
    commit marker already exists. Returns one metadata row per bucket:
    (bucket, rows, skipped) — ``rows`` for a skipped bucket comes from
    its marker, so the summary is exact either way.

    Scale shape: the done-set probe is a driver-side directory listing
    (#buckets entries); pending rows route by bucket hash in ONE groupby
    shuffle and each bucket task writes + commits independently. A crash
    loses only uncommitted buckets; rerunning the same call finishes the
    remainder and never touches committed bytes."""
    os.makedirs(out_dir, exist_ok=True)
    # the layout (partition column + bucket count) is part of the output's
    # identity: resuming with a different layout would skip/duplicate rows
    # across incompatible hash spaces — record it once, refuse a mismatch
    layout_path = os.path.join(out_dir, "_LAYOUT.json")
    layout = {"partition_col": partition_col, "buckets": buckets}
    if os.path.exists(layout_path):
        with open(layout_path) as f:
            prev = json.load(f)
        if prev != layout:
            raise ValueError(
                f"resumable_write layout mismatch for {out_dir}: committed "
                f"{prev}, requested {layout}; use a fresh out_dir or the "
                "original layout"
            )
    else:
        tmp = layout_path + f".{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(layout, f)
        os.replace(tmp, layout_path)
    done = {}
    for i in range(buckets):
        marker = os.path.join(out_dir, f"bucket={i}", "_SUCCESS")
        if os.path.exists(marker):
            with open(marker) as f:
                done[i] = json.load(f).get("rows", 0)

    def tag(t: pa.Table) -> pa.Table:
        b = _bucket_of(t[partition_col].combine_chunks(), buckets)
        t = t.append_column("_bucket", pa.array(b))
        if done:
            keep = ~np.isin(b, np.fromiter(done, np.int64, len(done)))
            t = t.filter(pa.array(keep))
        return t

    def write_bucket(group: pa.Table) -> pa.Table:
        b = int(group["_bucket"][0].as_py())
        bdir = os.path.join(out_dir, f"bucket={b}")
        os.makedirs(bdir, exist_ok=True)
        marker_path = os.path.join(bdir, "_SUCCESS")
        if os.path.exists(marker_path):
            # a marker appearing here means another attempt (e.g. a Ray
            # speculative/retried copy of this task) already committed the
            # bucket — clearing files now would delete committed data, so
            # defer to the winner and report it as skipped
            with open(marker_path) as f:
                rows = json.load(f).get("rows", 0)
            return pa.table({
                "bucket": pa.array([b], pa.int64()),
                "rows": pa.array([rows], pa.int64()),
                "skipped": pa.array([True]),
            })
        # no marker => any files here are an aborted attempt: clear them
        for name in os.listdir(bdir):
            if not name.startswith("_"):
                os.remove(os.path.join(bdir, name))
        data = group.drop_columns(["_bucket"])
        pq.write_table(data, os.path.join(bdir, f"part-{uuid.uuid4().hex}.parquet"))
        # marker last, atomically — the bucket's commit point
        tmp = os.path.join(bdir, f"._SUCCESS.{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump({"rows": data.num_rows}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, os.path.join(bdir, "_SUCCESS"))
        return pa.table({
            "bucket": pa.array([b], pa.int64()),
            "rows": pa.array([data.num_rows], pa.int64()),
            "skipped": pa.array([False]),
        })

    written = (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_bucket")
        .map_groups(write_bucket, batch_format="pyarrow")
    )
    from debezium_incubator_ray.functions.kernels import collect_table

    wrote = collect_table(written, empty=pa.table({
        "bucket": pa.array([], pa.int64()),
        "rows": pa.array([], pa.int64()),
        "skipped": pa.array([], pa.bool_()),
    }))
    skipped = pa.table({
        "bucket": pa.array(sorted(done), pa.int64()),
        "rows": pa.array([done[i] for i in sorted(done)], pa.int64()),
        "skipped": pa.array([True] * len(done), pa.bool_()),
    })
    out = pa.concat_tables([wrote, skipped])
    return out.take(pc.sort_indices(out, sort_keys=[("bucket", "ascending")]))
