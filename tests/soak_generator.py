"""Continuous segment producer for the sustained-tail soak
(tests/test_soak.py): writes one round of per-partition segments per
period into an existing binlog dir, injecting corruption (a garbage
segment replacing partition 0's real events on corrupt rounds) and
schema churn (a structured add_column control entry every CHURN rounds).
Runs until the deadline, then writes the expected final LWW state
(url_id -> winning lsn over GOOD events only) plus a _GEN_DONE.json
inventory. All writes are tmp+rename so the tail never reads a
half-written file.

Usage: soak_generator.py BINLOG_DIR SECONDS EVENTS_PER_ROUND PERIOD_S
"""
import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from debezium_incubator_ray import gen
from debezium_incubator_ray.hashing import partition_ids

P = 4
UNIVERSE = 20_000
CORRUPT_EVERY = 7
CHURN_EVERY = 10


def main():
    binlog = sys.argv[1]
    seconds = float(sys.argv[2])
    n_round = int(sys.argv[3])
    period = float(sys.argv[4])

    for p in range(P):
        os.makedirs(os.path.join(binlog, f"p={p}"), exist_ok=True)

    rng = np.random.default_rng(99)
    best = {}  # url_id -> winning lsn (good events only)
    good_segments, corrupt_segments = [], []
    schema_entries = []
    base_lsn = 0
    r = 0
    deadline = time.time() + seconds
    while time.time() < deadline:
        ids = rng.integers(0, UNIVERSE, n_round).astype(np.int64)
        lsn = base_lsn + 1 + np.arange(n_round, dtype=np.int64)
        base_lsn += n_round
        corrupt = (r % CORRUPT_EVERY) == CORRUPT_EVERY - 1
        part = np.asarray(
            partition_ids(gen.urls_for(ids), P, "hash"), dtype=np.int64
        )
        ev = {
            "op": np.full(n_round, "c", dtype="U1"),
            "url_id": ids,
            "lsn": lsn,
            "prev_lsn": np.full(n_round, -1, dtype=np.int64),
        }
        spec = gen.BinlogSpec(
            n_events=n_round, n_initial=0, num_partitions=P,
            seg_rows=n_round, emit_before=False,
        )
        env = gen.events_to_envelopes(ev, slice(None), spec,
                                      emit_before=False)
        for p in range(P):
            rel = f"p={p}/seg-{r:05d}.parquet"
            final = os.path.join(binlog, rel)
            if corrupt and p == 0:
                tmp = final + ".tmp"
                with open(tmp, "wb") as f:
                    f.write(b"this is not a parquet file" * 64)
                os.replace(tmp, final)
                corrupt_segments.append(rel)
                continue
            m = part == p
            sl = env.filter(pa.array(m))
            tmp = final + ".tmp"
            pq.write_table(sl, tmp)
            os.replace(tmp, final)
            good_segments.append(rel)
            for u, l in zip(ids[m], lsn[m]):
                prev = best.get(int(u))
                if prev is None or l > prev:
                    best[int(u)] = int(l)
        if r > 0 and r % CHURN_EVERY == 0:
            schema_entries.append({
                "change": "add_column", "column": f"soak_c{r}",
                "type": "int32", "default": r, "at_lsn": base_lsn,
            })
            tmp = os.path.join(binlog, "_schema_changes.json.tmp")
            with open(tmp, "w") as f:
                json.dump(schema_entries, f)
            os.replace(tmp, os.path.join(binlog, "_schema_changes.json"))
        r += 1
        time.sleep(period)

    exp = pa.table({
        "url_id": pa.array(sorted(best), pa.int64()),
        "lsn": pa.array([best[u] for u in sorted(best)], pa.int64()),
    })
    pq.write_table(exp, os.path.join(binlog, "_expected.parquet.tmp"))
    os.replace(os.path.join(binlog, "_expected.parquet.tmp"),
               os.path.join(binlog, "_expected.parquet"))
    tmp = os.path.join(binlog, "_GEN_DONE.json.tmp")
    with open(tmp, "w") as f:
        json.dump({
            "rounds": r, "events": int(base_lsn),
            "good_segments": good_segments,
            "corrupt_segments": corrupt_segments,
            "schema_columns": [e["column"] for e in schema_entries],
        }, f)
    os.replace(tmp, os.path.join(binlog, "_GEN_DONE.json"))
    print(f"generator done: {r} rounds, {base_lsn} events, "
          f"{len(corrupt_segments)} corrupt")


if __name__ == "__main__":
    main()
