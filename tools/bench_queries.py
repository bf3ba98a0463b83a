"""Time a list of queries() entries over an arbitrary sf dir (no oracle).

The input-scaling evidence runner: run the same queries over the driver's
sf0.1 tables and over a K-times-replicated set (tools/scale_tables.py) and
compare per-query wall time — a query whose time grows much faster than
the input is a scale bug.

Usage:
  python tools/bench_queries.py --sf /tmp/sf1x [--cpus 32] q1 q2 ...
Prints one JSON line: {"sf": ..., "num_cpus": N, "queries": {name: sec}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", required=True)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
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
    out = {}
    for name in a.names:
        t0 = time.perf_counter()
        res = qs[name](a.sf)
        # consume without collecting rows to the driver
        if hasattr(res, "count") and not hasattr(res, "num_rows"):
            n = res.count()
        else:
            n = getattr(res, "num_rows", len(res))
        out[name] = {"sec": round(time.perf_counter() - t0, 3), "rows": int(n)}
    print(json.dumps({"sf": a.sf, "num_cpus": a.cpus, "queries": out}))
    ray.shutdown()


if __name__ == "__main__":
    main()
