"""Sustained-tail soak: a continuous tail() under live segment
production with injected corruption and schema churn, asserting bounded
memory, full quarantine accounting, and exact final state.

The generator subprocess (soak_generator.py) writes rounds of segments
until its deadline; the engine tails the directory concurrently. Laws:
  - every good segment lands in segments_done, every corrupt one in
    segments_error (quarantine, not fatal);
  - the lake's final (url, lsn) state equals the generator's LWW oracle
    over good events only — mid-tail schema churn included;
  - driver RSS stays bounded for the duration (recorded ceiling), and
    Ray object-store usage is reported (spill stats) — the streaming
    backpressure posture of SURVEY §2.8 (BlockingEventQueue.java:29-42),
    measured instead of assumed.

Duration: DBZRAY_SOAK_SECONDS (default 45 in-suite; the 10-minute
evidence run recorded in BASELINE.md sets 600).
"""

import os
import subprocess
import sys
import threading
import time

import pyarrow as pa

from debezium_incubator_ray import gen
from debezium_incubator_ray import schema as S
from debezium_incubator_ray.config import EngineConfig
from debezium_incubator_ray.pipelines.cdc import CdcEngine

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SOAK_S = float(os.environ.get("DBZRAY_SOAK_SECONDS", "45"))


def _rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return 0.0


def test_sustained_tail_soak(tmp_path):
    import json

    binlog = str(tmp_path / "binlog")
    os.makedirs(binlog)
    lake = str(tmp_path / "lake")

    env = dict(os.environ, PYTHONPATH=REPO)
    gen_proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "tests", "soak_generator.py"),
         binlog, str(SOAK_S), "2000", "0.25"],
        env=env, cwd=REPO,
    )

    rss0 = _rss_mb()
    peak = [rss0]
    stop_mon = threading.Event()

    def monitor():
        while not stop_mon.is_set():
            peak[0] = max(peak[0], _rss_mb())
            time.sleep(0.5)

    mon = threading.Thread(target=monitor, daemon=True)
    mon.start()

    eng = CdcEngine(
        lake,
        EngineConfig(num_partitions=4, target_rows_per_file=50_000),
        payload_schema=S.pages_schema(),
    )
    try:
        # drain+poll until the generator finishes AND the tail has gone
        # idle on a fully-applied directory
        stats = eng.tail(binlog, poll_interval_s=0.5, idle_polls=8,
                         max_epochs=int(SOAK_S * 40))
        deadline = time.time() + 120
        while not os.path.exists(os.path.join(binlog, "_GEN_DONE.json")):
            assert time.time() < deadline, "generator never finished"
            time.sleep(0.5)
        stats += eng.tail(binlog, poll_interval_s=0.5, idle_polls=4)
    finally:
        stop_mon.set()
        gen_proc.wait(timeout=60)
        mon.join(timeout=5)

    with open(os.path.join(binlog, "_GEN_DONE.json")) as f:
        inv = json.load(f)
    assert inv["rounds"] >= 3, inv  # the soak actually soaked

    doc = eng.manifest.doc
    done = set(doc["segments_done"])
    errs = doc.get("segments_error", {})
    assert set(inv["good_segments"]) <= done
    assert set(inv["corrupt_segments"]) == set(errs), (
        inv["corrupt_segments"], errs)
    # the quarantine reason must actually be a parquet/arrow read error
    # (not e.g. a permissions failure recorded as corruption)
    assert all(
        "parquet" in e.lower() or "arrow" in e.lower()
        for e in errs.values()
    ), errs

    # exact final state vs the generator's LWW oracle (good events only),
    # through whatever schema churn landed mid-tail
    import pyarrow.parquet as pq

    exp = pq.read_table(os.path.join(binlog, "_expected.parquet"))
    lt = eng.lake_table(include_lsn=True).select(["url", S.LSN])
    lt = lt.sort_by([("url", "ascending")])
    exp_urls = gen.urls_for(exp["url_id"].to_numpy())
    exp_t = pa.table({"url": exp_urls, "lsn": exp["lsn"]}).sort_by(
        [("url", "ascending")])
    assert lt.num_rows == exp_t.num_rows, (lt.num_rows, exp_t.num_rows)
    assert lt["url"].combine_chunks().equals(
        exp_t["url"].combine_chunks().cast(lt["url"].combine_chunks().type))
    assert lt[S.LSN].combine_chunks().cast(pa.int64()).equals(
        exp_t["lsn"].combine_chunks())

    # schema churn landed: every control column exists in the lake schema
    full = eng.lake_table()
    for col in inv["schema_columns"]:
        assert col in full.column_names, col

    # bounded memory: the drain must stream, not accumulate. Record the
    # ceiling; the object-store/spill report goes to stdout for the
    # BASELINE.md evidence run.
    growth = peak[0] - rss0
    events = inv["events"]
    print(f"\nSOAK: {inv['rounds']} rounds, {events} events, "
          f"{len(stats)} epochs, rss0={rss0:.0f}MB peak={peak[0]:.0f}MB "
          f"growth={growth:.0f}MB")
    try:
        from ray._private.internal_api import memory_summary

        print(memory_summary(stats_only=True))
    except Exception:  # no grpc in this sandbox: report usage via resources
        import ray as _ray

        total = _ray.cluster_resources().get("object_store_memory", 0)
        free = _ray.available_resources().get("object_store_memory", 0)
        print(f"object store: {(total - free) / 2**20:.0f} MB in use of "
              f"{total / 2**20:.0f} MB at drain end")
    assert growth < 1500, f"driver RSS grew {growth:.0f} MB"
