"""PartitionApplier — the stateful sink stage (actor pool via map_groups).

One call merges one lake partition's epoch events into its sorted Parquet
runs:

1. watermark filter (P9/D1): drop events with lsn <= the partition's applied
   watermark — re-delivered segments become a no-op (the exactly-once core,
   CommitLogReadHandlerImpl.java:216-219; LcrEventHandler.java:53-65;
   FileOffsetWriter.java:92-104);
2. LWW reduce (A3): max-LSN winner per key (the log-compaction contract,
   CassandraConnectorConfig.java:216-222);
3. copy-on-write targeting (D2): only sorted runs whose [min_key, max_key]
   range intersects the epoch's keys are read + rewritten; untouched runs are
   carried over — at 100 TB an epoch touches a bounded subset of runs, so
   apply cost is O(epoch ∪ affected runs), not O(lake);
4. tombstone compaction: keys whose winner is a delete are dropped — safe
   because the watermark guarantees no older event can ever be re-applied;
5. lazy schema upgrade: runs written under an older schema version are
   upgraded (default backfill / widening) only when rewritten;
6. returns a one-row metadata record (watermark, files, counts, skew stats)
   — data files become visible only via the driver's atomic manifest commit.

The actor holds the manifest snapshot + parsed schema in ``__init__`` (once
per actor), not per batch.
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
from debezium_incubator_ray.envelope import lww_reduce, merge_lww
from debezium_incubator_ray.schema import upgrade_table

COMMIT_SCHEMA = pa.schema(
    [
        pa.field(S.PART, pa.int32()),
        pa.field("watermark", pa.int64()),
        pa.field("events_in", pa.int64()),
        pa.field("events_applied", pa.int64()),
        pa.field("distinct_keys", pa.int64()),
        pa.field("rows_total", pa.int64()),
        pa.field("files_json", pa.string()),
    ]
)


class PartitionApplier:
    def __init__(self, manifest_doc: Dict[str, Any], lake_dir: str, target_rows_per_file: int = 1_000_000):
        self.doc = manifest_doc
        self.lake_dir = lake_dir
        self.key = manifest_doc["key"]
        self.target_rows = target_rows_per_file
        self.schema = S.schema_from_b64(manifest_doc["schemas"][-1]["schema"])
        self.schema_version = manifest_doc["schemas"][-1]["version"]
        self.defaults = manifest_doc["defaults"]
        self.next_version = manifest_doc["version"] + 1

    # ------------------------------------------------------------------
    def __call__(self, group: pa.Table) -> pa.Table:
        p = group[S.PART][0].as_py()
        ent = self.doc["partitions"][str(p)]
        wm = ent["watermark"]
        events_in = group.num_rows
        lsn_max = pc.max(group[S.LSN]).as_py()

        fresh = group.filter(pc.greater(group[S.LSN], wm)).drop_columns([S.PART])
        events = lww_reduce(fresh, self.key)  # sorted by key asc

        files = ent["files"]
        new_files: List[Dict] = []
        rows_total = 0
        if events.num_rows == 0:
            # pure-duplicate delivery: watermark may still advance; files kept
            return self._record(p, max(wm, lsn_max), events_in, 0, 0,
                                sum(f["rows"] for f in files), files)

        keys = events[self.key].combine_chunks()
        if not files:
            runs = [(None, events)]
        else:
            # assign each event to the run whose key range it falls into;
            # events beyond the last run's max_key merge into the last run
            bounds = [f["max_key"] for f in files]
            keys_np = keys.to_numpy(zero_copy_only=False)
            assign = np.searchsorted(np.array(bounds, dtype=object), keys_np, side="left")
            assign = np.minimum(assign, len(files) - 1)
            runs = []
            touched = np.unique(assign)
            touched_set = set(int(t) for t in touched)
            for i, f in enumerate(files):
                if i in touched_set:
                    sl = events.filter(pa.array(assign == i))
                    runs.append((f, sl))
                else:
                    new_files.append(f)  # carried over untouched (CoW)
                    rows_total += f["rows"]

        for f, ev in runs:
            existing = None
            if f is not None:
                existing = pq.read_table(os.path.join(self.lake_dir, f["path"]))
                if f.get("schema_version", 1) != self.schema_version:
                    lsn_col = existing[S.LSN]
                    existing = upgrade_table(
                        existing.drop_columns([S.LSN]), self.schema, self.defaults
                    ).append_column(S.LSN, lsn_col)
            merged = merge_lww(existing, ev, self.key)
            rows_total += merged.num_rows
            new_files.extend(self._write_run(p, merged))

        new_files.sort(key=lambda f: f["min_key"])
        return self._record(
            p,
            max(wm, lsn_max),
            events_in,
            fresh.num_rows,
            events.num_rows,
            rows_total,
            new_files,
        )

    # ------------------------------------------------------------------
    def _write_run(self, p: int, tbl: pa.Table) -> List[Dict]:
        out = []
        os.makedirs(os.path.join(self.lake_dir, "data", f"p={p}"), exist_ok=True)
        n = tbl.num_rows
        if n == 0:
            return out
        for lo in range(0, n, self.target_rows):
            chunk = tbl.slice(lo, self.target_rows)
            name = f"data/p={p}/v{self.next_version:06d}-{uuid.uuid4().hex}.parquet"
            pq.write_table(chunk, os.path.join(self.lake_dir, name))
            kcol = chunk[self.key]
            out.append(
                {
                    "path": name,
                    "rows": chunk.num_rows,
                    "min_key": pc.min(kcol).as_py(),
                    "max_key": pc.max(kcol).as_py(),
                    "schema_version": self.schema_version,
                }
            )
        return out

    def _record(self, p, wm, ev_in, ev_applied, distinct, rows_total, files) -> pa.Table:
        return pa.Table.from_pydict(
            {
                S.PART: [p],
                "watermark": [wm],
                "events_in": [ev_in],
                "events_applied": [ev_applied],
                "distinct_keys": [distinct],
                "rows_total": [rows_total],
                "files_json": [json.dumps(files)],
            },
            schema=COMMIT_SCHEMA,
        )
