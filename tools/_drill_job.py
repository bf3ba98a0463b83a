"""The JOB PAYLOAD of the full-lifecycle drill (tools/job_lifecycle_drill.py)
— the self-contained script you would hand to the north-rule deployment
verb:

    ray job submit --address http://<head>:8265 --working-dir . \
        -- python tools/_drill_job.py <lake> <binlog> <pages> start

In this sandbox the Ray job-submission HTTP server cannot run (ray is
installed without the dashboard extras — no aiohttp — and installs are
forbidden), so the drill coordinator executes this script exactly the way
the job agent would: a fresh process connecting to the running cluster via
RAY_ADDRESS. The payload itself is deployment-real: it owns its Ray
connection, resumes purely from the lake manifest, and never assumes
driver-local state.

Modes:
    start   — create the engine (objref exchange, misaligned binlog →
              the multi-node locality exchange every epoch), bulk-load
              the snapshot, then tail until the producer finishes.
    resume  — reopen from the manifest (post-SIGKILL recovery), run
              compact + vacuum MID-STREAM (the producer is still
              writing), then tail to drain.
"""
import json
import os
import sys
import time

import ray

from debezium_incubator_ray import schema as S
from debezium_incubator_ray.config import EngineConfig
from debezium_incubator_ray.pipelines.cdc import CdcEngine


def main():
    lake, binlog, pages, mode = sys.argv[1:5]
    ray.init(address=os.environ.get("RAY_ADDRESS", "auto"),
             logging_level="ERROR")
    t0 = time.time()
    if mode == "start":
        eng = CdcEngine(
            lake,
            EngineConfig(
                table="pages", key="url", partitioner="hash",
                num_partitions=8, exchange="objref",
                aligned_binlog="never", target_rows_per_file=100_000,
            ),
            payload_schema=S.pages_schema(),
        )
        snap = eng.snapshot(pages)
        print(json.dumps({"phase": "snapshot", "t": round(time.time() - t0, 2),
                          "stats": {k: v for k, v in (snap or {}).items()
                                    if isinstance(v, (int, float, bool))}}),
              flush=True)
    else:
        # resume: identity, partitioning, sink mode, schema history and
        # watermarks all come from the manifest — nothing else survives
        # the SIGKILL, which is the point
        eng = CdcEngine(lake)
        print(json.dumps({"phase": "resume",
                          "manifest_version": eng.manifest.version}),
              flush=True)
        # maintenance MID-STREAM: the producer is still appending
        c = eng.compact()
        v = eng.vacuum(keep_versions=2)
        print(json.dumps({"phase": "maintenance", "compact": c, "vacuum": v},
                         default=str), flush=True)

    epochs = 0
    events = 0
    # tail until the producer's done-marker exists AND a final drain
    # finds nothing new
    while True:
        stats = eng.tail(binlog, poll_interval_s=0.3, idle_polls=4)
        epochs += len(stats)
        events += sum(s.get("events", 0) for s in stats)
        if os.path.exists(os.path.join(binlog, "_GEN_DONE.json")):
            stats = eng.tail(binlog, poll_interval_s=0.3, idle_polls=4)
            epochs += len(stats)
            events += sum(s.get("events", 0) for s in stats)
            break
    eng.close()
    print(json.dumps({"phase": "drained", "epochs": epochs,
                      "events": events,
                      "t": round(time.time() - t0, 2)}), flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
