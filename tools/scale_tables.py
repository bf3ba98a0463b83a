"""Synthesize an sf1-sized benchmark table set from sf0.1 (deterministic).

Replicates the driver tables K times with id offsets (doc_id/event_id/
vec_id/orderkey spaces shifted per replica; text perturbed with a replica
tag so dedup/ngram queries see real new content, not K identical corpora).
BENCH-ONLY input for the scale-up evidence runs — correctness stays pinned
to the driver's own sf dirs.

Usage: python tools/scale_tables.py [--k 10] [--src /root/testdata/sf0.1]
       [--out /tmp/sf1x]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def _shift(col: pa.ChunkedArray, off: int) -> pa.Array:
    return pc.add(col, off)


def scale_documents(src, out_dir, k):
    t = pq.read_table(os.path.join(src, "documents.parquet"))
    n = t.num_rows
    parts = []
    for r in range(k):
        off = r * (int(pc.max(t["doc_id"]).as_py()) + 1)
        text = t["text"]
        if r > 0:
            # perturb: prepend a replica tag token so shingles differ
            text = pc.binary_join_element_wise(
                pa.scalar(f"r{r}"), pc.cast(text, pa.string()), pa.scalar(" ")
            )
        parts.append(pa.table({
            "doc_id": _shift(t["doc_id"], off),
            "text": text,
            "lang": t["lang"],
            "source": t["source"],
            "n_chars": pc.cast(pc.utf8_length(pc.cast(text, pa.string())),
                               pa.int64()),
        }))
    big = pa.concat_tables(parts)
    pq.write_table(big, os.path.join(out_dir, "documents.parquet"))
    return big.num_rows, n


def scale_simple(src, out_dir, name, id_cols, k):
    t = pq.read_table(os.path.join(src, f"{name}.parquet"))
    n = t.num_rows
    parts = []
    offs = {c: int(pc.max(t[c]).as_py()) + 1 for c in id_cols}
    for r in range(k):
        cols = {}
        for c in t.column_names:
            cols[c] = _shift(t[c], r * offs[c]) if c in id_cols else t[c]
        parts.append(pa.table(cols))
    big = pa.concat_tables(parts)
    pq.write_table(big, os.path.join(out_dir, f"{name}.parquet"))
    return big.num_rows, n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/sf1x")
    a = ap.parse_args()
    os.makedirs(a.out, exist_ok=True)

    big, base = scale_documents(a.src, a.out, a.k)
    print(f"documents: {base} -> {big}")
    for name, ids in [
        ("events", ["event_id"]),
        ("embeddings", ["vec_id"]),
        ("orders", ["o_orderkey"]),
        ("lineitem", ["l_orderkey"]),
    ]:
        big, base = scale_simple(a.src, a.out, name, ids, a.k)
        print(f"{name}: {base} -> {big}")
    # small dims copied as-is (joins reference them unchanged)
    import shutil

    for name in ["region", "nation", "customer", "supplier", "part"]:
        p = os.path.join(a.src, f"{name}.parquet")
        if os.path.exists(p):
            shutil.copy(p, os.path.join(a.out, f"{name}.parquet"))
    print("done:", a.out)


if __name__ == "__main__":
    main()
