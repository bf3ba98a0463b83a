"""Full-lifecycle drill on the simulated 2-node cluster
(tools/job_lifecycle_drill.py): snapshot → tail with live producer +
corruption + DDL churn → SIGKILL mid-stream → resume from manifest →
compact/vacuum mid-stream → drain → exact oracle + quarantine + replay
checks. Runs in its own process group (a cluster_utils Cluster cannot
share the pytest session's Ray)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_full_lifecycle_drill():
    env = dict(os.environ, PYTHONPATH=REPO)
    env.pop("RAY_ADDRESS", None)  # the drill owns its cluster
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools",
                                      "job_lifecycle_drill.py"),
         "--seconds", "8", "--events-per-round", "2000",
         "--period", "0.25"],
        capture_output=True, text=True, timeout=500, env=env, cwd=REPO,
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    result = [l for l in r.stdout.splitlines() if l.startswith("RESULT ")]
    assert result, r.stdout[-3000:]
    doc = json.loads(result[-1][len("RESULT "):])
    assert doc["ok"] is True
    phases = [row["phase"] for row in doc["timeline"]]
    for must in ("cluster_up", "producer_started", "job1_submitted",
                 "job1_sigkilled", "job2_submitted", "job2_resume",
                 "job2_maintenance", "job2_drained", "verify"):
        assert must in phases, (must, phases)
