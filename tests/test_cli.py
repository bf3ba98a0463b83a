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
