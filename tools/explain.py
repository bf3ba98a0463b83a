"""Print a query's Ray Data execution stats (`ds.stats()`) — the per-stage
wall-time / block / memory breakdown used to audit whether a pipeline's
time goes to useful compute or to shuffle/driver overhead.

Usage: python tools/explain.py [--sf /root/testdata/sf0.1] [--cpus 16] q1 [q2 ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("GRAFT_SF_DIR",
                                                   "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "16")))
    ap.add_argument("names", nargs="+")
    a = ap.parse_args()

    import ray

    ray.init(address="local", num_cpus=a.cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as E

    qs = E.queries()
    for name in a.names:
        print(f"\n=== {name} ===")
        t0 = time.perf_counter()
        res = qs[name](a.sf)
        if hasattr(res, "stats"):
            res = res.materialize()
            n = res.count()
            print(f"rows={n}  wall={time.perf_counter() - t0:.3f}s")
            print(res.stats())
        else:
            n = getattr(res, "num_rows", len(res))
            print(f"rows={n}  wall={time.perf_counter() - t0:.3f}s "
                  "(driver-side table result — no Dataset stats)")
    ray.shutdown()


if __name__ == "__main__":
    main()
