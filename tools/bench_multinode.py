"""Throughput of the objref exchange on a SIMULATED 2-node cluster.

The multi-node correctness laws live in tests/multinode_driver.py; this
tool adds the missing *throughput* evidence: the same misaligned CDC
epoch (exchange="objref", the no-shared-staging-root path a real
cluster without shared storage runs) timed on

  - a simulated 2-node ray.cluster_utils.Cluster (cpus_per_node each), and
  - a plain single-node session with the same TOTAL CPU count,

so the cross-node object-store hop is priced against the intra-node
baseline at equal parallelism. Workload shape matches bench.py (same
generator, seg_rows, P=64, snapshot warm), scaled by GRAFT_BENCH_MULT
(default 16 -> 160k events at sf0.1).

Usage:
    python tools/bench_multinode.py            # both legs, one JSON line
    python tools/bench_multinode.py --mode cluster --cpus-per-node 8
    python tools/bench_multinode.py --mode local --cpus-per-node 8

Each leg runs in a fresh subprocess (a cluster_utils Cluster cannot share
a process with a normal local session).
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
# Ray workers need the package importable too (they inherit env, not
# sys.path) — required for standalone single-leg runs
os.environ["PYTHONPATH"] = (
    REPO + os.pathsep + os.environ.get("PYTHONPATH", "")
).rstrip(os.pathsep)


def build_workload(sf_dir: str, mult: int, root: str):
    import numpy as np
    import pyarrow.parquet as pq

    from debezium_incubator_ray import gen
    from debezium_incubator_ray.hashing import HASH_IMPL

    n_events_tbl = pq.ParquetFile(
        os.path.join(sf_dir, "events.parquet")
    ).metadata.num_rows
    n_events = n_events_tbl * mult
    n_initial = max(1000, n_events // 4)
    P = 64
    spec = gen.BinlogSpec(
        n_events=n_events, n_initial=n_initial, seg_rows=8192,
        num_partitions=P, seed=42, emit_before=False,
    )
    tag = os.path.basename(os.path.normpath(sf_dir))
    binlog = os.path.join(root, f"binlog-mn-{tag}-m{mult}-{HASH_IMPL}")
    marker = os.path.join(binlog, "_DONE")
    if not os.path.exists(marker):
        shutil.rmtree(binlog, ignore_errors=True)
        ev = gen.gen_events(spec)
        gen.write_binlog(binlog, spec, ev)
        with open(marker, "w") as f:
            f.write("ok")
    pages_dir = os.path.join(binlog, "_pages")
    if not os.path.exists(pages_dir + ".DONE"):
        shutil.rmtree(pages_dir, ignore_errors=True)
        os.makedirs(pages_dir, exist_ok=True)
        chunk = max(1, spec.n_initial // 64)
        for k, lo in enumerate(range(0, spec.n_initial, chunk)):
            ids = np.arange(lo, min(lo + chunk, spec.n_initial),
                            dtype=np.int64)
            pq.write_table(
                gen.payload_table(ids, np.zeros(len(ids), np.int64)),
                os.path.join(pages_dir, f"part-{k:03d}.parquet"),
            )
        with open(pages_dir + ".DONE", "w") as f:
            f.write("ok")
    return spec, binlog, pages_dir


def _parity_route(t):
    """Outbox-style routing SMT for the demux leg: url's last digit's
    parity picks the destination table (the multinode_driver law-4
    shape)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    src = t["source"].combine_chunks()
    after = t["after"].combine_chunks()
    last = pc.extract_regex(after.field("url"), r"(?P<d>\d)$")
    parity = pc.bit_wise_and(
        pc.cast(pc.struct_field(last, "d"), pa.int64()), 1)
    tbl = pc.if_else(pc.equal(parity, 0),
                     pa.scalar("pages_even"), pa.scalar("pages_odd"))
    if isinstance(tbl, pa.ChunkedArray):
        tbl = tbl.combine_chunks()
    names = [src.type.field(i).name for i in range(src.type.num_fields)]
    arrs = [tbl if n == "table" else src.field(i)
            for i, n in enumerate(names)]
    new_src = pa.StructArray.from_arrays(arrs, names=names)
    i = t.schema.get_field_index("source")
    return t.set_column(i, t.schema.field("source"), new_src)


def run_leg(mode: str, cpus_per_node: int, sf_dir: str, mult: int,
            demux: bool = False) -> None:
    import ray

    root = "/tmp/dbzray-bench"
    os.makedirs(root, exist_ok=True)
    if mode == "cluster":
        from ray.cluster_utils import Cluster

        cluster = Cluster(
            initialize_head=True,
            head_node_args={"num_cpus": cpus_per_node,
                            "include_dashboard": False},
        )
        cluster.add_node(num_cpus=cpus_per_node)
        ray.init(address=cluster.address, logging_level="ERROR")
        ncpu = 2 * cpus_per_node
    else:
        ncpu = 2 * cpus_per_node
        ray.init(address="local", num_cpus=ncpu,
                 include_dashboard=False, logging_level="ERROR")

    import ray.data

    from debezium_incubator_ray import schema as S
    from debezium_incubator_ray.config import EngineConfig
    from debezium_incubator_ray.pipelines.cdc import CdcEngine

    spec, binlog, pages_dir = build_workload(sf_dir, mult, root)
    lake = os.path.join(root, f"lake-mn-{mode}")
    shutil.rmtree(lake, ignore_errors=True)

    # warm page cache + worker pool (same rationale as bench.py)
    for p in os.listdir(binlog):
        d = os.path.join(binlog, p)
        if os.path.isdir(d):
            for f in os.listdir(d):
                with open(os.path.join(d, f), "rb") as fh:
                    fh.read()

    def _warm(b):
        import debezium_incubator_ray.stages.apply  # noqa: F401
        import debezium_incubator_ray.stages.exchange  # noqa: F401

        return b

    ray.data.range(ncpu * 4, override_num_blocks=ncpu * 4).map_batches(
        _warm, num_cpus=1
    ).count()

    if demux:
        # multi-table (outbox-routed) objref epoch: one binlog demuxed
        # into two lakes by url parity — the fully-fused
        # read_split_block_demux path
        from debezium_incubator_ray.pipelines.lake import Lake

        lk = Lake(lake)
        for name in ("pages_even", "pages_odd"):
            lk.create_table(name, S.pages_schema(), EngineConfig(
                num_partitions=32, exchange="objref",
                target_rows_per_file=250_000,
            ))
        t1 = time.perf_counter()
        st = lk.apply_epoch_demux(binlog, route_fn=_parity_route)
        t_apply = time.perf_counter() - t1
        # deletes have a null after -> null route -> no table (the
        # law-4 contract), so routed events < generated events
        assert 0 < st["events"] <= spec.n_events, st
        print(json.dumps({
            "mode": mode, "demux": True, "cpus_per_node": cpus_per_node,
            "ncpu": ncpu, "n_events": st["events"], "t_snap": 0.0,
            "t_apply": round(t_apply, 3),
            "events_per_s": round(st["events"] / t_apply, 1),
        }))
        ray.shutdown()
        return
    cfg = EngineConfig(
        num_partitions=64, apply_concurrency=ncpu,
        target_rows_per_file=250_000, exchange="objref",
        aligned_binlog="never",
    )
    eng = CdcEngine(lake, cfg, payload_schema=S.pages_schema())
    t0 = time.perf_counter()
    eng.snapshot(pages_dir)
    t_snap = time.perf_counter() - t0
    t1 = time.perf_counter()
    stats = eng.run(binlog)
    t_apply = time.perf_counter() - t1
    assert stats and all(not s.get("aligned") for s in stats), (
        "exchange path not taken"
    )
    print(json.dumps({
        "mode": mode, "cpus_per_node": cpus_per_node, "ncpu": ncpu,
        "n_events": spec.n_events, "t_snap": round(t_snap, 3),
        "t_apply": round(t_apply, 3),
        "events_per_s": round(spec.n_events / t_apply, 1),
    }))
    ray.shutdown()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["cluster", "local", "both"],
                    default="both")
    ap.add_argument("--cpus-per-node", type=int, default=8)
    ap.add_argument("--sf", default=os.environ.get(
        "GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--mult", type=int, default=int(os.environ.get(
        "GRAFT_BENCH_MULT", "16")))
    ap.add_argument("--demux", action="store_true",
                    help="time the multi-table (outbox-routed) demux "
                         "epoch instead of the single-table one")
    args = ap.parse_args()
    if args.mode in ("cluster", "local"):
        run_leg(args.mode, args.cpus_per_node, args.sf, args.mult,
                demux=args.demux)
        return
    results = {}
    env = dict(os.environ)  # module import already merged REPO into PYTHONPATH
    env.pop("RAY_ADDRESS", None)  # cluster leg must not attach to local
    for mode in ("cluster", "local"):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--mode", mode,
             "--cpus-per-node", str(args.cpus_per_node),
             "--sf", args.sf, "--mult", str(args.mult)]
            + (["--demux"] if args.demux else []),
            capture_output=True, text=True, env=env, cwd=REPO,
            timeout=1800,
        )
        lines = [ln for ln in out.stdout.splitlines()
                 if ln.startswith("{")]
        if out.returncode != 0 or not lines:
            sys.stderr.write(f"--- {mode} leg failed "
                             f"(rc={out.returncode}) ---\n")
            sys.stderr.write(out.stdout[-2000:] + "\n")
            sys.stderr.write(out.stderr[-4000:] + "\n")
            raise SystemExit(1)
        results[mode] = json.loads(lines[-1])
    c, l = results["cluster"], results["local"]
    print(json.dumps({
        "cluster_events_per_s": c["events_per_s"],
        "local_events_per_s": l["events_per_s"],
        "cluster_vs_local": round(
            c["events_per_s"] / l["events_per_s"], 3),
        "ncpu": l["ncpu"], "n_events": l["n_events"],
        "detail": results,
    }))


if __name__ == "__main__":
    main()
