"""FULL-LIFECYCLE drill on the simulated 2-node cluster — the north-rule
deployment shape end to end, in one scripted run:

    cluster up (2 nodes) → job 1 [snapshot → tail] with a LIVE producer
    writing segments + corruption + DDL churn → SIGKILL the job
    mid-stream → job 2 [resume from manifest → compact + vacuum
    MID-STREAM → tail to drain] → final oracle check (exact LWW state,
    quarantine accounting, schema churn landed, replay no-op).

The deployment verb is `ray job submit`; this sandbox's Ray has no
dashboard extras (no aiohttp, installs forbidden), so the job-submission
HTTP server cannot run. The drill executes the job payload
(tools/_drill_job.py) exactly the way the job agent would — a fresh
process connecting to the running cluster via RAY_ADDRESS — which is the
submit path minus the HTTP envelope. The payload script is unchanged
either way.

Usage:
    python tools/job_lifecycle_drill.py            # ~60 s drill
    python tools/job_lifecycle_drill.py --seconds 30 --events-per-round 8000

Prints a timeline (one JSON object per line) and a final RESULT line;
exit 0 iff every check passed. Evidence recorded in BASELINE.md.
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
os.environ["PYTHONPATH"] = (
    REPO + os.pathsep + os.environ.get("PYTHONPATH", "")
).rstrip(os.pathsep)

TIMELINE = []
T0 = time.time()


def mark(phase, **kw):
    row = {"t": round(time.time() - T0, 2), "phase": phase, **kw}
    TIMELINE.append(row)
    print(json.dumps(row, default=str), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=20.0,
                    help="producer runtime")
    ap.add_argument("--events-per-round", type=int, default=4000)
    ap.add_argument("--period", type=float, default=0.3)
    ap.add_argument("--cpus-per-node", type=int, default=4)
    ap.add_argument("--n-snapshot", type=int, default=2000)
    args = ap.parse_args()

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray
    from ray.cluster_utils import Cluster

    from debezium_incubator_ray import gen
    from debezium_incubator_ray.pipelines.cdc import CdcEngine

    root = f"/tmp/dbzray-drill-{os.getpid()}"
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    binlog = os.path.join(root, "binlog")
    lake = os.path.join(root, "lake")
    pages = os.path.join(root, "pages")
    os.makedirs(binlog)
    os.makedirs(pages)
    ids = np.arange(args.n_snapshot, dtype=np.int64)
    pq.write_table(gen.payload_table(ids, np.zeros(len(ids), np.int64)),
                   os.path.join(pages, "part-000.parquet"))

    cluster = Cluster(
        initialize_head=True,
        head_node_args={"num_cpus": args.cpus_per_node,
                        "include_dashboard": False},
    )
    cluster.add_node(num_cpus=args.cpus_per_node)
    ray.init(address=cluster.address, logging_level="ERROR")
    mark("cluster_up", nodes=2, cpus_per_node=args.cpus_per_node,
         address=cluster.address)

    env = dict(os.environ, RAY_ADDRESS=cluster.address)
    genp = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "tests", "soak_generator.py"),
         binlog, str(args.seconds), str(args.events_per_round),
         str(args.period)],
        env=dict(os.environ), cwd=REPO,
    )
    mark("producer_started", seconds=args.seconds,
         events_per_round=args.events_per_round)

    def submit(mode):
        # = `ray job submit --address <head> -- python tools/_drill_job.py
        #    <lake> <binlog> <pages> <mode>` minus the HTTP envelope (the
        #    job server needs dashboard extras this sandbox doesn't have)
        return subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tools", "_drill_job.py"),
             lake, binlog, pages, mode],
            env=env, cwd=REPO, stdout=subprocess.PIPE, text=True,
        )

    job1 = submit("start")
    mark("job1_submitted", mode="start")

    # kill mid-stream: wait until the lake has committed real progress
    cur = os.path.join(lake, "_manifest", "CURRENT")
    deadline = time.time() + 120
    while True:
        assert time.time() < deadline, "job1 made no progress"
        try:
            with open(cur) as f:
                v = int(f.read().strip())
            if v >= 3:  # snapshot + >=2 stream epochs committed
                break
        except (FileNotFoundError, ValueError):
            pass
        time.sleep(0.2)
    assert job1.poll() is None, "job1 exited before the kill window"
    job1.send_signal(signal.SIGKILL)
    job1.wait(timeout=30)
    mark("job1_sigkilled", manifest_version=v)

    job2 = submit("resume")
    mark("job2_submitted", mode="resume")
    out, _ = job2.communicate(timeout=max(600, args.seconds * 20))
    assert job2.returncode == 0, f"job2 failed rc={job2.returncode}"
    for line in out.splitlines():
        if line.startswith("{"):
            mark("job2_" + json.loads(line)["phase"],
                 **{k: val for k, val in json.loads(line).items()
                    if k != "phase"})
    genp.wait(timeout=120)
    mark("producer_done")

    # ---- final oracle check (parent, read-only engine) ----------------
    with open(os.path.join(binlog, "_GEN_DONE.json")) as f:
        inv = json.load(f)
    eng = CdcEngine(lake)
    doc = eng.manifest.doc
    checks = {}
    checks["all_good_segments_done"] = (
        set(inv["good_segments"]) <= set(doc["segments_done"])
    )
    checks["corrupt_quarantined_exactly"] = (
        set(inv["corrupt_segments"])
        == set(doc.get("segments_error", {}))
    )
    checks["churn_columns_in_schema"] = all(
        c in eng.manifest.current_schema().names
        for c in inv["schema_columns"]
    )
    # exact LWW state: stream winners ∪ snapshot rows never overwritten
    exp = pq.read_table(os.path.join(binlog, "_expected.parquet"))
    best = dict(zip(exp["url_id"].to_pylist(), exp["lsn"].to_pylist()))
    for i in range(args.n_snapshot):
        best.setdefault(i, 0)
    exp_ids = np.array(sorted(best), dtype=np.int64)
    exp_t = pa.table({
        "url": gen.urls_for(exp_ids),
        "lsn": pa.array([best[i] for i in sorted(best)], pa.int64()),
    }).sort_by([("url", "ascending")])
    lt = eng.lake_table(include_lsn=True)
    lt = lt.sort_by([("url", "ascending")])
    checks["row_count_exact"] = lt.num_rows == exp_t.num_rows
    checks["urls_exact"] = lt["url"].combine_chunks().equals(
        exp_t["url"].combine_chunks().cast(lt["url"].combine_chunks().type))
    checks["lsns_exact"] = lt["_lsn"].combine_chunks().cast(
        pa.int64()).equals(exp_t["lsn"].combine_chunks())
    # byte-identical extracted text per url (the input-hint invariant)
    checks["text_invariant"] = gen.extract_text(
        lt["html"]).to_pylist() == lt["text"].to_pylist()
    # replay no-op: re-deliver everything, nothing applies
    eng.manifest.doc["segments_done"] = []
    st = eng.apply_epoch(binlog)
    checks["replay_noop"] = st["applied"] == 0
    eng.close()
    ray.shutdown()
    ok = all(checks.values())
    mark("verify", ok=ok, events=inv["events"], rounds=inv["rounds"],
         corrupt_segments=len(inv["corrupt_segments"]),
         churn_columns=len(inv["schema_columns"]), **checks)
    print("RESULT " + json.dumps({"ok": ok, "timeline": TIMELINE},
                                 default=str))
    shutil.rmtree(root, ignore_errors=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
