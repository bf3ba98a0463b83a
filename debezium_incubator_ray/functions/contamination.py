"""Benchmark decontamination: flag corpus documents that share any word
n-gram with a (small) benchmark/eval set.

The standard pretraining hygiene step (GPT-3 appendix C / PaLM-style
13-gram checks, here parameterized): the benchmark side is tiny by nature
(eval sets are KBs-to-MBs), so its distinct gram-hash set is collected
once, sorted, and broadcast via ``ray.put``; the corpus streams through a
stateless ``map_batches`` that shingles each batch (shared vectorized
kernels from functions/tokens.py — no gram strings materialized) and
counts distinct-gram hits per document with one ``searchsorted`` against
the broadcast array. Nothing corpus-sized ever leaves the tasks; the
output is one (doc_id, n_hits, contaminated) row per document.

Gram semantics match the SQL-mirrorable shingle rule (tokens.py module
docstring): k-grams for docs with >= k tokens, ONE gram of all tokens for
0 < n < k, none for empty docs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from debezium_incubator_ray.functions.tokens import (
    distinct_per_doc,
    shingle_hashes,
)


def benchmark_gram_hashes(
    bench_ds: "ray.data.Dataset", k: int = 8, text_col: str = "text"
) -> "ray.ObjectRef":
    """Sorted unique uint64 gram hashes of the benchmark set, as an object
    ref for zero-copy reads in every corpus task. The benchmark side MUST
    be lookup-table-sized (eval sets are); the corpus side never is."""

    def grams(batch: pa.Table) -> pa.Table:
        # batch-level distinct is all that matters here (the per-doc
        # grouping distinct_per_doc would add gets discarded by np.unique)
        g, _ = shingle_hashes(batch[text_col], k=k)
        return pa.table({"g": pa.array(np.unique(g), pa.uint64())})

    parts = bench_ds.map_batches(
        grams, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()  # benchmark-sized: distinct hashes only
    if parts:
        allg = np.unique(np.array([r["g"] for r in parts], dtype=np.uint64))
    else:
        allg = np.empty(0, dtype=np.uint64)
    return ray.put(allg)


class Decontaminator:
    """map_batches callable: per-doc distinct-gram hits vs the broadcast
    benchmark gram set (one searchsorted per batch)."""

    def __init__(self, bench_ref, k: int = 8, id_col: str = "doc_id",
                 text_col: str = "text"):
        self.bench = ray.get(bench_ref)  # sorted uint64, shared per actor
        self.k = k
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        g, per_doc = shingle_hashes(batch[self.text_col], k=self.k)
        gd, cnt = distinct_per_doc(g, per_doc)
        if len(self.bench) and len(gd):
            pos = np.searchsorted(self.bench, gd)
            pos[pos == len(self.bench)] = 0
            hit = self.bench[pos] == gd
        else:
            hit = np.zeros(len(gd), dtype=bool)
        doc_of = np.repeat(np.arange(len(cnt), dtype=np.int64), cnt)
        n_hits = np.bincount(doc_of[hit], minlength=len(cnt)).astype(np.int64)
        return pa.table({
            self.id_col: batch[self.id_col],
            "n_hits": pa.array(n_hits, pa.int64()),
            "contaminated": pa.array(n_hits > 0),
        })


def decontaminate(
    ds: "ray.data.Dataset",
    bench_ds: "ray.data.Dataset",
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    concurrency: int = 4,
) -> "ray.data.Dataset":
    """(doc_id, n_hits, contaminated) per corpus document — see module
    docstring for the broadcast/stream shape."""
    ref = benchmark_gram_hashes(bench_ds, k=k, text_col=text_col)
    return ds.map_batches(
        Decontaminator,
        fn_constructor_kwargs={"bench_ref": ref, "k": k, "id_col": id_col,
                               "text_col": text_col},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    )
