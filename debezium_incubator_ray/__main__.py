"""Job entrypoint: ``python -m debezium_incubator_ray <command> ...``.

This is the driver script a cluster submits as a Ray job::

    ray job submit --working-dir . -- \
        python -m debezium_incubator_ray tail \
            --lake s3://bucket/lake --binlog /mnt/wal --health-port 8080

On a cluster ``RAY_ADDRESS`` (set by ``ray job submit``) connects the
driver to the existing cluster; standalone it defaults to a local
session. The engine resumes purely from the lake manifest, so re-running
the same job after a crash continues from the last committed epoch —
the job is the restartable unit, the manifest is the checkpoint.

Commands:
  snapshot --lake L --source DIR    bulk-load the initial table state
                                    (schema inferred from the source
                                    parquet footer on first creation)
  run      --lake L --binlog DIR    drain all pending segments (epochs
                                    until no progress), then exit
  tail     --lake L --binlog DIR    drain, then poll for new segments;
                                    --health-port serves live /health
                                    + /metrics; SIGINT finishes the
                                    in-flight epoch and flushes
  compact  --lake L                 merge sub-target sorted runs
  status   --lake L                 print the manifest summary as JSON
  view-refresh --view V --lake L --right R
                                    refresh the incrementally-maintained
                                    join view of two co-partitioned
                                    lakes (creates it on first use)
  view-vacuum  --view V --lake L --right R
                                    reclaim superseded view files once
                                    in-flight readers have drained

``--config cfg.json`` feeds EngineConfig fields (partitions, sink mode,
merge mode, tombstones, ...) on lake creation; an existing lake's
manifest is authoritative and the flag is ignored for identity fields.
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import sys
import threading


def _ray_init():
    import ray

    if not ray.is_initialized():
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            include_dashboard=False,
            logging_level="ERROR",
        )


def _engine(args, need_schema_from: str | None = None):
    import pyarrow.parquet as pq

    from debezium_incubator_ray.config import EngineConfig
    from debezium_incubator_ray.pipelines.cdc import CdcEngine
    from debezium_incubator_ray.state.manifest import Manifest

    cfg = None
    if getattr(args, "config", None):
        with open(args.config) as f:
            cfg = EngineConfig(**json.load(f))
    schema = None
    if not Manifest.exists(args.lake) and need_schema_from:
        src = need_schema_from
        if os.path.isdir(src):
            files = sorted(
                os.path.join(src, n) for n in os.listdir(src)
                if n.endswith(".parquet")
            )
            if not files:
                raise SystemExit(
                    f"error: no .parquet files in snapshot source {src}"
                )
            src = files[0]
        schema = pq.read_schema(src)
        if "_lsn" in schema.names:
            schema = schema.remove(schema.get_field_index("_lsn"))
    return CdcEngine(args.lake, cfg, payload_schema=schema)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="python -m debezium_incubator_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    def common(p, binlog=False):
        p.add_argument("--lake", required=True)
        p.add_argument("--config", default=None)
        if binlog:
            p.add_argument("--binlog", required=True)
            p.add_argument("--source", default="",
                           help="named offset channel (fan-in)")

    p = sub.add_parser("snapshot")
    common(p)
    p.add_argument("--src", required=True,
                   help="parquet file/dir of the initial table state")
    p.add_argument("--snapshot-lsn", type=int, default=0)

    p = sub.add_parser("run")
    common(p, binlog=True)

    p = sub.add_parser("tail")
    common(p, binlog=True)
    p.add_argument("--poll", type=float, default=1.0)
    p.add_argument("--idle-polls", type=int, default=None)
    p.add_argument("--health-port", type=int, default=None)
    p.add_argument("--health-host", default="127.0.0.1",
                   help="bind address for /health; 0.0.0.0 for cluster jobs")

    p = sub.add_parser("compact")
    common(p)

    p = sub.add_parser("status")
    p.add_argument("--lake", required=True)

    for vc in ("view-refresh", "view-vacuum"):
        p = sub.add_parser(vc)
        p.add_argument("--view", required=True)
        p.add_argument("--lake", required=True, help="left lake dir")
        p.add_argument("--right", required=True, help="right lake dir")
        p.add_argument("--join-type", default="inner")

    args = ap.parse_args(argv)

    if args.cmd == "status":
        # manifest-only: no Ray session needed
        from debezium_incubator_ray.state.manifest import Manifest

        if not Manifest.exists(args.lake):
            raise SystemExit(f"error: no lake manifest at {args.lake}")
        m = Manifest.load(args.lake)
        doc = m.doc
        print(json.dumps({
            "version": doc["version"],
            "table": doc["table"],
            "num_partitions": doc["num_partitions"],
            "snapshot_complete": doc["snapshot_complete"],
            "segments_done": len(doc.get("segments_done", [])),
            "segments_error": len(doc.get("segments_error", {})),
            "watermarks": {
                p_: ent.get("watermark", -1)
                for p_, ent in doc["partitions"].items()
            },
            "rows": sum(
                f.get("rows", 0)
                for ent in doc["partitions"].values()
                for f in ent.get("files", [])
            ),
        }))
        return 0

    _ray_init()
    try:
        if args.cmd == "snapshot":
            eng = _engine(args, need_schema_from=args.src)
            st = eng.snapshot(args.src, snapshot_lsn=args.snapshot_lsn)
            print(json.dumps({"snapshot": st}))
        elif args.cmd == "run":
            eng = _engine(args)
            stats = eng.run(args.binlog, source=args.source)
            print(json.dumps({
                "epochs": len(stats),
                "events": sum(s.get("events", 0) for s in stats),
            }))
        elif args.cmd == "tail":
            eng = _engine(args)
            stop = threading.Event()
            signal.signal(signal.SIGINT, lambda *a: stop.set())
            signal.signal(signal.SIGTERM, lambda *a: stop.set())
            stats = eng.tail(
                args.binlog, poll_interval_s=args.poll,
                idle_polls=args.idle_polls, source=args.source,
                health_port=args.health_port,
                health_host=args.health_host, stop=stop,
            )
            print(json.dumps({
                "epochs": len(stats),
                "events": sum(s.get("events", 0) for s in stats),
            }))
        elif args.cmd == "compact":
            eng = _engine(args)
            print(json.dumps({"compact": eng.compact()}))
        elif args.cmd in ("view-refresh", "view-vacuum"):
            from debezium_incubator_ray.pipelines.cdc import CdcEngine
            from debezium_incubator_ray.pipelines.view import JoinView
            from debezium_incubator_ray.state.manifest import Manifest

            for side, d in (("--lake", args.lake),
                            ("--right", args.right)):
                if not Manifest.exists(d):
                    raise SystemExit(
                        f"error: no lake manifest at {d} ({side})"
                    )
            view = JoinView(args.view, CdcEngine(args.lake),
                            CdcEngine(args.right),
                            join_type=args.join_type)
            if args.cmd == "view-refresh":
                print(json.dumps({"refresh": view.refresh()}))
            else:
                print(json.dumps({"vacuum": view.vacuum()}))
    finally:
        import ray

        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
