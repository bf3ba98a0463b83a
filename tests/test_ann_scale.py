"""IVF recall-vs-scale guard: recall@k at FIXED probes must not drop as
the corpus grows (16x deterministic replication with per-replica vector
perturbation) — centroid quality from spherical k-means has to keep up
with data growth, or probe pruning starts cutting true neighbors. Pins
the round-3 ask: ann_recall_eval as a scale law, not a point estimate."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from debezium_incubator_ray.functions.ann import (
    _batch_matrix, brute_force_topk, ivf_topk, spherical_kmeans,
)

SF = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")


@pytest.fixture(scope="module")
def base():
    t = pq.read_table(os.path.join(SF, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    return _batch_matrix(t), t["vec_id"].to_numpy()


def _replicate(M, ids, k):
    """k deterministic replicas; r>0 vectors are perturbed (seeded) so the
    scaled corpus is not a degenerate stack of exact duplicates."""
    parts = []
    off = int(ids.max()) + 1
    for r in range(k):
        rng = np.random.default_rng(1000 + r)
        Mr = M if r == 0 else M + 0.05 * rng.standard_normal(M.shape)
        parts.append(pa.table({
            "vec_id": pa.array(ids + r * off),
            "embedding": pa.array(list(Mr.astype(np.float32)),
                                  pa.list_(pa.float32())),
        }))
    return pa.concat_tables(parts)


def _recall_at_5(tbl, Q, qids, nprobe=4):
    ds = ray.data.from_arrow(tbl).repartition(8)
    init = _batch_matrix(tbl.slice(0, 32))  # deterministic k-means seed
    C, _ = spherical_kmeans(ds, init, iters=2)
    exact = brute_force_topk(ds, qids, Q, k=5).to_pandas()
    approx = ivf_topk(ds, qids, Q, C, k=5, nprobe=nprobe).to_pandas()
    hit = exact.merge(approx, on=["query_id", "vec_id"], how="inner")
    return len(hit) / len(exact)


def test_ivf_recall_does_not_drop_at_16x(base):
    M, ids = base
    Q, qids = M[:10], ids[:10]
    r1 = _recall_at_5(_replicate(M, ids, 1), Q, qids)
    r16 = _recall_at_5(_replicate(M, ids, 16), Q, qids)
    # sf0.1 floor measured 0.92 (46/50) with 32 centroids / nprobe 4;
    # the scale law: fixed probes must hold recall as data grows
    assert r1 >= 0.9, r1
    assert r16 >= r1, (r16, r1)


def test_ivf_index_build_and_pruned_search(base, tmp_path):
    """Persisted-index laws: hive layout by centroid, search byte-equal
    to the in-memory IVF path, rebuild is atomic (old index readable
    until the rename), and an all-empty probe set returns the canonical
    empty result."""
    import json

    import pyarrow as pa

    from debezium_incubator_ray.functions.ann import (
        build_ivf_index, ivf_index_topk, ivf_topk,
    )

    M, ids = base
    tbl = _replicate(M, ids, 1)
    ds = ray.data.from_arrow(tbl).repartition(4)
    C = M[:8]
    idx = str(tmp_path / "ivf")
    info = build_ivf_index(ds, C, idx)
    assert info["clusters"] == 8
    dirs = sorted(d for d in os.listdir(idx) if d.startswith("cluster="))
    assert dirs and all(d.split("=")[1].isdigit() for d in dirs)
    with open(os.path.join(idx, "_CENTROIDS.json")) as f:
        persisted = np.asarray(json.load(f)["centroids"])
    assert persisted.shape == C.shape

    Q, qids = M[:6], ids[:6]
    mem = ivf_topk(ds, qids, Q, C, k=5, nprobe=3).sort_by(
        [("query_id", "ascending"), ("rank", "ascending")])
    onx = ivf_index_topk(idx, qids, Q, k=5, nprobe=3).sort_by(
        [("query_id", "ascending"), ("rank", "ascending")])
    assert mem.equals(onx)

    # rebuild over the same path is atomic and leaves one valid index
    info2 = build_ivf_index(ds, C, idx)
    assert info2["clusters"] == 8
    onx2 = ivf_index_topk(idx, qids, Q, k=5, nprobe=3).sort_by(
        [("query_id", "ascending"), ("rank", "ascending")])
    assert mem.equals(onx2)
    assert not [d for d in os.listdir(str(tmp_path)) if d.endswith(".tmp")]

    # nprobe larger than cluster count degrades to exact brute force
    from debezium_incubator_ray.functions.ann import brute_force_topk

    exact = brute_force_topk(ds, qids, Q, k=5).sort_by(
        [("query_id", "ascending"), ("rank", "ascending")])
    allp = ivf_index_topk(idx, qids, Q, k=5, nprobe=99).sort_by(
        [("query_id", "ascending"), ("rank", "ascending")])
    assert exact.select(["query_id", "vec_id", "rank"]).equals(
        allp.select(["query_id", "vec_id", "rank"]))


def test_ivf_index_append_equals_rebuild(base, tmp_path):
    """append_to_ivf_index laws: (1) append == rebuild with the SAME
    centroids (query parity); (2) un-manifested files are invisible;
    (3) mutators are single-writer."""
    import pytest as _pytest

    from debezium_incubator_ray.functions.ann import (
        append_to_ivf_index, build_ivf_index, ivf_index_topk,
        spherical_kmeans,
    )
    from debezium_incubator_ray.functions.text import (
        TextIndexLockedError, _index_write_lock,
    )

    M, ids = base
    tbl = _replicate(M, ids, 2)
    half = len(tbl) // 2
    ds_all = ray.data.from_arrow(tbl).repartition(4)
    C, _ = spherical_kmeans(ds_all, _batch_matrix(tbl.slice(0, 16)),
                            iters=2)
    Q, qids = M[:8], ids[:8]

    inc = str(tmp_path / "inc")
    build_ivf_index(ray.data.from_arrow(tbl.slice(0, half)), C, inc)
    r = append_to_ivf_index(inc, ray.data.from_arrow(tbl.slice(half)))
    assert r["appended"] == len(tbl) - half

    full = str(tmp_path / "full")
    build_ivf_index(ds_all, C, full)
    a = ivf_index_topk(inc, qids, Q, k=5, nprobe=3).sort_by(
        [("query_id", "ascending"), ("rank", "ascending")])
    b = ivf_index_topk(full, qids, Q, k=5, nprobe=3).sort_by(
        [("query_id", "ascending"), ("rank", "ascending")])
    assert a.equals(b)

    # a crashed append's files (no manifest entry) are invisible
    cdir = next(os.path.join(inc, d) for d in sorted(os.listdir(inc))
                if d.startswith("cluster="))
    with open(os.path.join(cdir, "append-dead-0000.parquet"), "wb") as f:
        f.write(b"garbage")
    a2 = ivf_index_topk(inc, qids, Q, k=5, nprobe=3).sort_by(
        [("query_id", "ascending"), ("rank", "ascending")])
    assert a2.equals(a)

    # empty incremental cycle is a no-op, not a crash — and it carries
    # the full drift-monitor return shape
    empty = pa.table({"vec_id": pa.array([], pa.int64()),
                      "embedding": pa.array([], pa.list_(pa.float32()))})
    r0 = append_to_ivf_index(inc, ray.data.from_arrow(empty))
    assert r0["appended"] == 0
    assert r0["retrain_recommended"] is False
    assert r0["post_mean_sim"] > 0  # the live corpus's running mean

    # single-writer
    with _index_write_lock(inc):
        with _pytest.raises(TextIndexLockedError):
            append_to_ivf_index(inc, ray.data.from_arrow(tbl.slice(0, 4)))


def test_ivf_append_drift_triggers_retrain_flag(base, tmp_path):
    """Append-drift tripwire: same-distribution appends keep the flag
    clear; a DISTRIBUTION-SHIFTED append (vectors the frozen centroids
    quantize poorly) trips retrain_recommended in the manifest AND the
    return value — and rebuilding with re-trained centroids over the
    shifted corpus resets the baseline, clears the flag, and restores
    the recall floor for queries in the shifted region."""
    import json

    from debezium_incubator_ray.functions.ann import (
        append_to_ivf_index, brute_force_topk, build_ivf_index,
        ivf_index_topk, spherical_kmeans,
    )

    M, ids = base
    tbl = _replicate(M, ids, 1)
    ds_all = ray.data.from_arrow(tbl).repartition(4)
    C, _ = spherical_kmeans(ds_all, _batch_matrix(tbl.slice(0, 16)),
                            iters=2)
    idx = str(tmp_path / "idx")
    info = build_ivf_index(ds_all, C, idx)
    assert info["build_mean_sim"] > 0

    # same-distribution append (the 16x-replica shape): no flag
    rep = _replicate(M, ids, 2).slice(len(tbl))
    r1 = append_to_ivf_index(idx, ray.data.from_arrow(rep))
    assert r1["retrain_recommended"] is False

    # distribution-shifted append: orthogonal-ish vectors in a region the
    # frozen centroids never saw (negated + heavy noise), 2x corpus size
    rng = np.random.default_rng(7)
    shift = -3.0 * M + rng.standard_normal(M.shape)
    off = int(ids.max()) + 1
    shifted = pa.concat_tables([
        pa.table({
            "vec_id": pa.array(ids + (r + 10) * off),
            "embedding": pa.array(
                list((shift + 0.1 * r).astype(np.float32)),
                pa.list_(pa.float32())),
        })
        for r in range(2)
    ])
    r2 = append_to_ivf_index(idx, ray.data.from_arrow(shifted))
    assert r2["retrain_recommended"] is True
    with open(os.path.join(idx, "_MANIFEST.json")) as f:
        man = json.load(f)
    assert man["distortion"]["retrain_recommended"] is True
    assert man["distortion"]["post_mean_sim"] < \
        man["distortion"]["build_mean_sim"]

    # rebuild with RE-TRAINED centroids over the full (shifted) corpus:
    # flag cleared, recall floor in the shifted region restored
    full_tbl = pa.concat_tables([tbl, rep, shifted])
    full_ds = ray.data.from_arrow(full_tbl).repartition(8)
    C2, _ = spherical_kmeans(
        full_ds, np.vstack([_batch_matrix(tbl.slice(0, 16)), shift[:16]]),
        iters=4)
    build_ivf_index(full_ds, C2, idx)
    with open(os.path.join(idx, "_MANIFEST.json")) as f:
        man2 = json.load(f)
    assert man2["distortion"]["retrain_recommended"] is False

    qn = 8
    Qs = shift[:qn]
    qids = np.arange(qn, dtype=np.int64) + 10**9
    exact = brute_force_topk(full_ds, qids, Qs, k=5).to_pandas()
    approx = ivf_index_topk(idx, qids, Qs, k=5, nprobe=8).to_pandas()
    hit = exact.merge(approx, on=["query_id", "vec_id"], how="inner")
    assert len(hit) / len(exact) >= 0.9
