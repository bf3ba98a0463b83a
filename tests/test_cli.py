"""Job-entrypoint test: the `python -m debezium_incubator_ray` driver a
cluster submits with `ray job submit` — snapshot -> run -> status ->
replay no-op, each in its own process (its own Ray session), resuming
purely from the lake manifest."""

import json
import os
import subprocess
import sys

import numpy as np
import pyarrow.parquet as pq

from debezium_incubator_ray import gen

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cli(*argv, timeout=300):
    env = dict(os.environ, PYTHONPATH=REPO, RAY_ADDRESS="local")
    r = subprocess.run(
        [sys.executable, "-m", "debezium_incubator_ray", *argv],
        capture_output=True, text=True, timeout=timeout, env=env, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    return json.loads(r.stdout.strip().splitlines()[-1])


def test_cli_snapshot_run_status_replay(tmp_path):
    spec = gen.BinlogSpec(n_events=300, n_initial=60, seg_rows=100,
                          num_partitions=4, seed=3)
    ev = gen.gen_events(spec)
    binlog = str(tmp_path / "binlog")
    gen.write_binlog(binlog, spec, ev)
    pages_dir = str(tmp_path / "pages")
    os.makedirs(pages_dir)
    ids = np.arange(spec.n_initial, dtype=np.int64)
    pq.write_table(
        gen.payload_table(ids, np.zeros(len(ids), np.int64)),
        os.path.join(pages_dir, "part-000.parquet"),
    )
    lake = str(tmp_path / "lake")
    cfg = str(tmp_path / "cfg.json")
    with open(cfg, "w") as f:
        json.dump({"num_partitions": 4, "target_rows_per_file": 64,
                   "apply_concurrency": 2}, f)

    snap = _cli("snapshot", "--lake", lake, "--src", pages_dir,
                "--config", cfg)
    assert snap["snapshot"]["events"] == spec.n_initial

    run1 = _cli("run", "--lake", lake, "--binlog", binlog)
    assert run1["events"] == spec.n_events

    st = _cli("status", "--lake", lake)
    assert st["snapshot_complete"] and st["num_partitions"] == 4
    assert st["segments_done"] >= 4  # at least one segment per partition
    oracle = gen.oracle_final_state(spec, ev)
    assert st["rows"] == oracle.num_rows

    # a fresh process replaying the same binlog applies nothing
    run2 = _cli("run", "--lake", lake, "--binlog", binlog)
    assert run2["events"] == 0

    # tail drains (nothing new), idles out, exits cleanly
    tl = _cli("tail", "--lake", lake, "--binlog", binlog,
              "--idle-polls", "1", "--poll", "0.1")
    assert tl["events"] == 0 and tl["epochs"] >= 1


def test_cli_sigkill_mid_run_then_resume_converges(tmp_path):
    """The job-level crash law: SIGKILL the driver process at an
    ARBITRARY point mid-apply, re-submit the same job, and the lake
    converges to the exact oracle state — the manifest checkpoint makes
    the job the restartable unit (kill-anywhere safety, not a staged
    fault injection)."""
    import signal
    import time

    spec = gen.BinlogSpec(n_events=2000, n_initial=200, seg_rows=64,
                          num_partitions=4, seed=21)
    ev = gen.gen_events(spec)
    binlog = str(tmp_path / "binlog")
    gen.write_binlog(binlog, spec, ev)
    pages_dir = str(tmp_path / "pages")
    os.makedirs(pages_dir)
    ids = np.arange(spec.n_initial, dtype=np.int64)
    pq.write_table(
        gen.payload_table(ids, np.zeros(len(ids), np.int64)),
        os.path.join(pages_dir, "part-000.parquet"),
    )
    lake = str(tmp_path / "lake")
    cfg = str(tmp_path / "cfg.json")
    with open(cfg, "w") as f:
        json.dump({"num_partitions": 4, "target_rows_per_file": 64,
                   "apply_concurrency": 2}, f)

    _cli("snapshot", "--lake", lake, "--src", pages_dir, "--config", cfg)

    # start the apply job and SIGKILL it mid-flight. The kill window is
    # PINNED to the first observable lake write (a new file under the lake
    # root — part files land before the manifest commit that makes them
    # visible), not a wall-clock sleep: a fixed sleep raced Ray session
    # startup on loaded hosts (finished-before-kill) and idled on fast
    # ones. Killing at first-write is guaranteed mid-epoch — the other
    # partitions and the manifest swap are still ahead of the process.
    def lake_files():
        out = set()
        for r, _, files in os.walk(lake):
            out.update(os.path.join(r, f) for f in files)
        return out

    baseline = lake_files()
    env = dict(os.environ, PYTHONPATH=REPO, RAY_ADDRESS="local")
    proc = subprocess.Popen(
        [sys.executable, "-m", "debezium_incubator_ray", "run",
         "--lake", lake, "--binlog", binlog],
        env=env, cwd=REPO,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    deadline = time.time() + 180
    while time.time() < deadline:
        if lake_files() - baseline:
            break
        time.sleep(0.02)
    else:
        proc.kill()
        raise AssertionError("no lake write observed within 180s")
    # the law is only exercised if the job was actually in flight: a
    # completed process would turn this into a vacuous replay test
    assert proc.poll() is None, "run finished before the kill landed"
    proc.send_signal(signal.SIGKILL)
    proc.wait(timeout=60)

    # re-submit: resumes from the last committed manifest and finishes
    _cli("run", "--lake", lake, "--binlog", binlog)
    st = _cli("status", "--lake", lake)
    oracle = gen.oracle_final_state(spec, ev)
    assert st["rows"] == oracle.num_rows
    assert st["snapshot_complete"]
    # byte-level equality read back in THIS process
    import ray

    from debezium_incubator_ray.pipelines.cdc import CdcEngine

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 logging_level="ERROR", ignore_reinit_error=True)
    lt = CdcEngine(lake).lake_table().sort_by("url")
    for col in oracle.column_names:
        assert lt[col].to_pylist() == oracle[col].to_pylist(), col


def test_cli_view_refresh_and_vacuum(tmp_path):
    """view-refresh / view-vacuum drive the incrementally-maintained
    join view from the job entrypoint: first refresh builds every
    partition, the re-run skips all of them, and vacuum reports zero
    reclaimable files on a clean view."""
    pages_dir = str(tmp_path / "pages")
    os.makedirs(pages_dir)
    ids = np.arange(80, dtype=np.int64)
    pq.write_table(
        gen.payload_table(ids, np.zeros(len(ids), np.int64)),
        os.path.join(pages_dir, "part-000.parquet"),
    )
    left, right = str(tmp_path / "l"), str(tmp_path / "r")
    _cli("snapshot", "--lake", left, "--src", pages_dir)
    _cli("snapshot", "--lake", right, "--src", pages_dir)
    view = str(tmp_path / "view")

    r1 = _cli("view-refresh", "--view", view,
              "--lake", left, "--right", right)["refresh"]
    assert r1["refreshed"] > 0 and r1["skipped"] == 0
    r2 = _cli("view-refresh", "--view", view,
              "--lake", left, "--right", right)["refresh"]
    assert r2["refreshed"] == 0 and r2["version"] == r1["version"]
    v = _cli("view-vacuum", "--view", view,
             "--lake", left, "--right", right)["vacuum"]
    assert v == {"files_removed": 0}


def test_cli_view_refresh_missing_lake_is_clear(tmp_path):
    env = dict(os.environ, PYTHONPATH=REPO, RAY_ADDRESS="local")
    r = subprocess.run(
        [sys.executable, "-m", "debezium_incubator_ray", "view-refresh",
         "--view", str(tmp_path / "v"), "--lake", str(tmp_path / "typo"),
         "--right", str(tmp_path / "also-missing")],
        capture_output=True, text=True, timeout=300, env=env, cwd=REPO,
    )
    assert r.returncode != 0
    assert "no lake manifest" in r.stderr and "--lake" in r.stderr
