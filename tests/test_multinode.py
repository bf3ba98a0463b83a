"""Locality-aware objref exchange on a simulated 2-node Ray cluster.

The driver (multinode_driver.py) owns its own ray.cluster_utils.Cluster —
it must run in a separate process from the pytest session's local Ray.
Laws proved there: epoch completes across nodes with the lake byte-equal
to the oracle and no shared staging root; stage-1 slices stay on the
writing node; stage-2-style consumers fetch them cross-node through the
object store. Deployment parity: the reference's per-node offsets model
(CAS/FileOffsetWriter.java:152-172) — only the lake (durable output)
needs shared storage.
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_objref_exchange_on_two_node_cluster(tmp_path):
    env = dict(os.environ, PYTHONPATH=REPO)
    env.pop("RAY_ADDRESS", None)  # the driver connects to its own cluster
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tests", "multinode_driver.py"),
         str(tmp_path)],
        capture_output=True, text=True, timeout=420, env=env, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "MULTINODE_OK" in r.stdout, r.stdout[-2000:]
