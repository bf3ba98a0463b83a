"""Tests for the training-data operators (text, dedup, ANN, typeconv,
multimodal) over the driver-supplied sf0.001 testdata."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest
import ray.data

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_ds():
    return ray.data.read_parquet(
        os.path.join(SF, "documents.parquet"), columns=["doc_id", "text"]
    )


def test_token_count_and_quality(docs_ds):
    from debezium_incubator_ray.functions.text import quality_score

    out = docs_ds.map_batches(
        quality_score, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    docs = pq.read_table(os.path.join(SF, "documents.parquet")).to_pandas()
    # cross-check n_tokens on a few rows against python split
    m = out.set_index("doc_id")
    for _, row in docs.head(20).iterrows():
        expect = len(row["text"].split())
        assert m.loc[row["doc_id"], "n_tokens"] == expect
    assert (out["punct_ratio"] >= 0).all() and (out["punct_ratio"] <= 1).all()


def test_lang_id_deterministic(docs_ds):
    from debezium_incubator_ray.functions.text import LangId

    a = docs_ds.map_batches(LangId, batch_format="pyarrow", concurrency=2).to_pandas()
    b = docs_ds.map_batches(LangId, batch_format="pyarrow", concurrency=2).to_pandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    assert (a["pred_lang"] == b["pred_lang"]).all()
    assert a["pred_lang"].notna().all()


def test_fingerprint_order_sensitive():
    from debezium_incubator_ray.functions.text import Fingerprint

    t = pa.table({"doc_id": [1, 2, 3], "text": ["a b c", "c b a", "a b c"]})
    out = Fingerprint()(t)
    fp = out["fingerprint"].to_pylist()
    assert fp[0] == fp[2] and fp[0] != fp[1]


def test_exact_dedup(docs_ds):
    from debezium_incubator_ray.functions.dedup import exact_dedup

    full = ray.data.read_parquet(os.path.join(SF, "documents.parquet"))
    doubled = full.union(ray.data.read_parquet(os.path.join(SF, "documents.parquet")))
    out = exact_dedup(doubled).to_pandas()
    n = pq.ParquetFile(os.path.join(SF, "documents.parquet")).metadata.num_rows
    assert len(out) == n
    assert out["doc_id"].is_unique


def test_minhash_finds_planted_near_dups():
    from debezium_incubator_ray.functions.dedup import (
        minhash_candidate_pairs, verify_jaccard,
    )

    base = pq.read_table(os.path.join(SF, "documents.parquet")).to_pydict()
    texts, ids = base["text"][:50], list(range(50))
    # plant near-dups: docs 1000+i = doc i with one word changed
    for i in range(5):
        words = texts[i].split()
        words[len(words) // 2] = "zzzz"
        texts.append(" ".join(words))
        ids.append(1000 + i)
    ds = ray.data.from_arrow(pa.table({"doc_id": ids, "text": texts}))
    pairs = verify_jaccard(
        minhash_candidate_pairs(ds), ds, threshold=0.5
    ).to_pandas()
    found = {(a, b) for a, b in zip(pairs["a"], pairs["b"])}
    for i in range(5):
        assert (i, 1000 + i) in found, f"planted near-dup {i} not found: {found}"


def test_simhash_similar_docs_close():
    from debezium_incubator_ray.functions.dedup import SimHash, hamming64

    t = pa.table(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "the quick brown fox jumps over the lazy dog again and again",
                "the quick brown fox jumps over the lazy cat again and again",
                "completely different words about ships and harbors at dawn",
            ],
        }
    )
    out = SimHash()(t)
    s = np.array(out["simhash"].to_pylist(), dtype=np.int64)
    d01 = hamming64(s[0:1], s[1:2])[0]
    d02 = hamming64(s[0:1], s[2:3])[0]
    assert d01 < d02


def test_ann_brute_matches_numpy():
    from debezium_incubator_ray.functions.ann import brute_force_topk, _batch_matrix

    tbl = pq.read_table(os.path.join(SF, "embeddings.parquet"))
    Q = _batch_matrix(tbl.filter(pc.less(tbl["vec_id"], 5)))
    ds = ray.data.read_parquet(os.path.join(SF, "embeddings.parquet"))
    out = brute_force_topk(ds, np.arange(5), Q, k=3)
    # numpy oracle
    M = _batch_matrix(tbl)
    ids = tbl["vec_id"].to_numpy()
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    sims = Qn @ Mn.T
    got = out.to_pandas()
    for qi in range(5):
        order = np.lexsort((ids, -sims[qi]))[:3]
        expect = list(ids[order])
        mine = list(got[got["query_id"] == qi].sort_values("rank")["vec_id"])
        assert mine == expect
    # self is always rank 1
    assert (got[got["rank"] == 1]["vec_id"].values == np.arange(5)).all()


def test_ann_lsh_recall_reasonable():
    from debezium_incubator_ray.functions.ann import lsh_topk, brute_force_topk, _batch_matrix

    tbl = pq.read_table(os.path.join(SF, "embeddings.parquet"))
    Q = _batch_matrix(tbl.filter(pc.less(tbl["vec_id"], 5)))
    ds = ray.data.read_parquet(os.path.join(SF, "embeddings.parquet"))
    approx = lsh_topk(ds, np.arange(5), Q, dim=Q.shape[1], k=3, n_planes=4).to_pandas()
    # every query at least finds itself (same bucket by construction)
    assert (approx[approx["rank"] == 1]["vec_id"].values == np.arange(5)).all()


def test_multimodal_stub_plumbing():
    from debezium_incubator_ray.functions.multimodal import media_pipeline, decode_image

    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "payload": pa.array([b"\x89PNGxxxx", b"RIFFyyyy"], pa.large_binary()),
        }
    )
    out = media_pipeline(ray.data.from_arrow(t)).to_pandas()
    metas = {r["doc_id"]: r["media_meta"] for _, r in out.iterrows()}
    assert metas[1]["n_bytes"] == 8
    assert metas[1]["magic"] == b"\x89PNG".hex()
    assert metas[2]["magic"] == b"RIFF".hex()
    # the real baseline decoder rejects a truncated PNG as malformed
    with pytest.raises(ValueError):
        decode_image(b"\x89PNG\r\n\x1a\n")


def test_typeconv_goldens():
    from debezium_incubator_ray.functions import typeconv as TC

    col = pa.chunked_array([pa.array([1.9, -2.5, 100.0])])
    assert TC.floor_to_int64(col).to_pylist() == [1, -3, 100]
    assert TC.narrow_int_by_width(pa.array([1, 2]), 2).type == pa.int8()
    assert TC.narrow_int_by_width(pa.array([1, 2]), 4).type == pa.int16()
    assert TC.narrow_int_by_width(pa.array([1, 2]), 9).type == pa.int32()
    assert TC.narrow_int_by_width(pa.array([1, 2]), 18).type == pa.int64()
    ts = pa.array([np.datetime64("2026-01-01T00:00:01", "us")], pa.timestamp("us"))
    assert TC.timestamp_to_epoch_ms(ts).to_pylist() == [1767225601000]
    assert TC.timestamp_to_iso_string(ts).to_pylist() == ["2026-01-01 00:00:01"]
    assert TC.interval_to_micros(1, 2, 3, 4.5) == ((26 * 3600 + 184.5) * 1e6)
    d = TC.decimal_scale_pad(pa.array([4.4444]), 10, 6)
    assert str(d[0]) == "4.444400"


def test_embedding_lsh_near_dup_recall():
    """Banded-LSH scale path: every planted high-cosine pair is found
    (verify step makes precision exact; banding makes recall ~1 at high
    tau), and results agree with the exact block-pair operator."""
    from debezium_incubator_ray.functions.dedup import (
        embedding_near_dup_pairs, embedding_near_dup_pairs_lsh,
    )

    rng = np.random.default_rng(3)
    base = rng.standard_normal((40, 16))
    # plant 8 near-dups: vec 100+i = vec i + small noise (cos > 0.99)
    dups = base[:8] + 0.02 * rng.standard_normal((8, 16))
    ids = list(range(40)) + [100 + i for i in range(8)]
    M = np.vstack([base, dups]).astype(np.float32)
    t = pa.table({"vec_id": pa.array(ids, pa.int64()),
                  "embedding": pa.array(M.tolist(), pa.list_(pa.float32()))})
    ds = ray.data.from_arrow(t)
    approx = embedding_near_dup_pairs_lsh(
        ds, tau=0.95, dim=16, n_planes=16, bands=4
    ).to_pandas()
    got = {(a, b) for a, b in zip(approx["a"], approx["b"])}
    for i in range(8):
        assert (i, 100 + i) in got, f"planted pair {i} missed: {got}"
    # precision: agrees with the exact operator at the same tau
    exact = embedding_near_dup_pairs(ray.data.from_arrow(t), tau=0.95).to_pandas()
    expect = {(a, b) for a, b in zip(exact["a"], exact["b"])}
    assert got <= expect


def test_connected_components_min_label(ray_session):
    """CC over a hand-built graph: two components + an isolated edge;
    cluster_id must be the min node id of each component."""
    import ray.data
    from debezium_incubator_ray.functions.dedup import connected_components

    # component {1,2,3,9} via chain 9-3, 3-2, 2-1; component {5,7}; {10,11}
    pairs = pa.table(
        {"a": pa.array([9, 3, 2, 5, 10], pa.int64()),
         "b": pa.array([3, 2, 1, 7, 11], pa.int64())}
    )
    expect = {1: 1, 2: 1, 3: 1, 9: 1, 5: 5, 7: 5, 10: 10, 11: 10}
    # fast path (driver union-find) and distributed min-label propagation
    # (driver_cutover=0) must agree exactly
    for cutover in (10_000_000, 0):
        out = connected_components(
            ray.data.from_arrow(pairs), driver_cutover=cutover
        ).to_pandas()
        got = dict(zip(out["doc_id"], out["cluster_id"]))
        assert got == expect, (cutover, got)


def test_near_dup_clusters_planted(ray_session):
    """Planted duplicate group collapses to one cluster with the min id
    canonical; unrelated docs don't appear."""
    import ray.data
    from debezium_incubator_ray.functions.dedup import near_dup_clusters

    base = pq.read_table(os.path.join(SF, "documents.parquet")).to_pydict()
    texts = list(base["text"][:40])
    ids = list(range(100, 100 + len(texts)))
    # plant: 3 near-identical copies of doc 0's text
    dup_text = texts[0]
    for j, did in enumerate([900, 901, 902]):
        ids.append(did)
        texts.append(dup_text + (" tail" * j))
    docs = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})
    )
    out = near_dup_clusters(docs, threshold=0.5).to_pandas()
    got = dict(zip(out["doc_id"], out["cluster_id"]))
    # 100 (the original) + 900/901/902 must share the cluster rooted at 100
    for did in (100, 900, 901, 902):
        assert got.get(did) == 100, (did, got)
    keep = dict(zip(out["doc_id"], out["keep"]))
    assert keep[100] and not keep[900] and not keep[901] and not keep[902]


def test_ivf_topk_probe_semantics(ray_session):
    """nprobe = n_centroids makes IVF exhaustive: results must equal the
    brute-force baseline exactly; smaller nprobe stays a subset ranking."""
    import ray.data
    from debezium_incubator_ray.functions.ann import (
        brute_force_topk, ivf_topk, _batch_matrix,
    )

    et = pq.read_table(os.path.join(SF, "embeddings.parquet"))
    qt = et.slice(0, 5)
    ct = et.slice(0, 4)
    Q = _batch_matrix(qt)
    C = _batch_matrix(ct)
    ds = ray.data.read_parquet(os.path.join(SF, "embeddings.parquet"))
    brute = brute_force_topk(ds, qt["vec_id"].to_numpy(), Q, k=3).to_pandas()
    full = ivf_topk(
        ds, qt["vec_id"].to_numpy(), Q, C, k=3, nprobe=4
    ).to_pandas()
    assert full[["query_id", "vec_id", "rank"]].equals(
        brute[["query_id", "vec_id", "rank"]]
    )
    part = ivf_topk(
        ds, qt["vec_id"].to_numpy(), Q, C, k=3, nprobe=1
    ).to_pandas()
    # partial probing returns <= k per query and never invents neighbors
    # with better rank-1 scores than brute force
    assert len(part) <= len(brute)
    b1 = brute[brute["rank"] == 1].set_index("query_id")["score"]
    p1 = part[part["rank"] == 1].set_index("query_id")["score"]
    for qid, sc in p1.items():
        assert sc <= b1[qid] + 1e-12


def test_stratified_sample_deterministic_and_resumable(ray_session):
    """The sample is a pure function of ids: re-running, and running over
    an arbitrary shard subset, reproduce the identical member set."""
    import ray.data
    from debezium_incubator_ray.functions.sample import stratified_sample

    docs = ray.data.read_parquet(
        os.path.join(SF, "documents.parquet"), columns=["doc_id", "lang"]
    )
    rates = {"en": 0.6, "zh": 0.2}
    a = set(stratified_sample(docs, rates).to_pandas()["doc_id"])
    b = set(stratified_sample(docs, rates).to_pandas()["doc_id"])
    assert a == b and len(a) > 0
    # shard-subset replay: filtering first half of ids then sampling gives
    # exactly the members of the full sample within that half
    half = docs.filter(lambda r: r["doc_id"] < 250)
    c = set(stratified_sample(half, rates).to_pandas()["doc_id"])
    assert c == {i for i in a if i < 250}
    # rate monotonicity: en kept more than zh relative to stratum sizes
    full = docs.to_pandas()
    kept = full[full["doc_id"].isin(a)]
    en_rate = len(kept[kept.lang == "en"]) / max(len(full[full.lang == "en"]), 1)
    zh_rate = len(kept[kept.lang == "zh"]) / max(len(full[full.lang == "zh"]), 1)
    assert en_rate > zh_rate


def test_sessionize_gap_boundaries(ray_session):
    """Exactly-gap spacing stays one session (> gap splits); multi-key."""
    import ray.data
    from debezium_incubator_ray.functions.windows import sessionize

    GAP = 30 * 60 * 1_000_000
    base = 1_700_000_000_000_000
    rows = pa.table(
        {
            "user_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
            "ts": pa.array(
                [base, base + GAP, base + GAP + GAP + 1, base, base + 1],
                pa.timestamp("us"),
            ),
            "value": pa.array([1.0, 2.0, 4.0, 8.0, 16.0]),
        }
    )
    out = (
        sessionize(ray.data.from_arrow(rows))
        .to_pandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    # user 1: events 1+2 one session (delta == gap, not >), event 3 alone
    assert list(out["n_events"]) == [2, 1, 2]
    assert list(out["sum_value"]) == [3.0, 4.0, 24.0]


def test_topk_per_group_tiebreak(ray_session):
    import ray.data
    from debezium_incubator_ray.functions.windows import topk_per_group

    rows = pa.table(
        {
            "event_type": pa.array(["a"] * 4 + ["b"] * 2),
            "event_id": pa.array([4, 3, 2, 1, 10, 11], pa.int64()),
            "value": pa.array([5.0, 5.0, 5.0, 9.0, 1.0, 1.0]),
        }
    )
    out = (
        topk_per_group(ray.data.from_arrow(rows), k=2)
        .to_pandas()
        .sort_values(["event_type", "rank"])
        .reset_index(drop=True)
    )
    # a: 9.0 first, then the value-5 tie broken by LOWEST event_id (2)
    assert list(out[out.event_type == "a"]["event_id"]) == [1, 2]
    assert list(out[out.event_type == "b"]["event_id"]) == [10, 11]
    assert list(out["rank"]) == [1, 2, 1, 2]


def test_asof_join_edges(ray_session):
    """Inclusive match at equal ts, null for no-predecessor, no key leak."""
    import ray.data
    from debezium_incubator_ray.functions.joins import asof_join

    left = pa.table(
        {"user_id": pa.array([1, 1, 2], pa.int64()),
         "ts": pa.array([100, 50, 100], pa.timestamp("us")),
         "lv": pa.array([10.0, 20.0, 30.0])}
    )
    right = pa.table(
        {"user_id": pa.array([1, 1, 3], pa.int64()),
         "ts": pa.array([100, 60, 10], pa.timestamp("us")),
         "rv": pa.array([1.0, 2.0, 3.0])}
    )
    out = (
        asof_join(
            ray.data.from_arrow(left), ray.data.from_arrow(right),
            "user_id", "ts", left_cols=["lv"], right_cols=["rv"],
        )
        .to_pandas()
        .sort_values(["user_id", "ts"])
        .reset_index(drop=True)
    )
    # user 1 @100 -> right @100 (inclusive); user 1 @50 -> none (60 > 50);
    # user 2 -> none (right's user 3 row must not leak across keys)
    import math

    assert list(out["lv"]) == [20.0, 10.0, 30.0]
    assert math.isnan(out["r_rv"][0]) and out["r_rv"][1] == 1.0
    assert math.isnan(out["r_rv"][2])


def test_spherical_kmeans_converges_and_assigns(ray_session):
    """More iterations never worsen mean cosine-to-centroid; every vector
    lands in exactly one cluster; empty clusters keep their centroid."""
    import ray.data
    from debezium_incubator_ray.functions.ann import (
        spherical_kmeans, _batch_matrix, _normalize,
    )

    et = pq.read_table(os.path.join(SF, "embeddings.parquet"))
    init = _batch_matrix(et.slice(0, 4))
    ds = ray.data.read_parquet(os.path.join(SF, "embeddings.parquet"))

    def mean_cos(C):
        M = _normalize(_batch_matrix(et))
        return float(np.max(_normalize(C) @ M.T, axis=0).mean())

    C1, a1 = spherical_kmeans(ds, init, iters=1)
    C3, a3 = spherical_kmeans(ds, init, iters=3)
    assert mean_cos(C3) >= mean_cos(C1) - 1e-9
    df = a3.to_pandas()
    assert len(df) == et.num_rows
    assert df["vec_id"].is_unique
    assert set(df["cluster"]) <= set(range(4))


def test_line_dedup_strips_frequent_lines(ray_session):
    import ray.data
    from debezium_incubator_ray.functions.text import line_dedup

    docs = pa.table(
        {
            "doc_id": pa.array(list(range(6)), pa.int64()),
            "text": pa.array(
                [
                    f"unique-{i}\nBOILER\nalso-{i}" if i < 5 else "BOILER"
                    for i in range(6)
                ]
            ),
        }
    )
    out = (
        line_dedup(ray.data.from_arrow(docs), min_docs=5)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # BOILER (6 docs) dropped everywhere; unique lines rejoin in order;
    # the all-boilerplate doc becomes empty
    assert out["text_clean"].tolist() == [
        f"unique-{i}\nalso-{i}" for i in range(5)
    ] + [""]


def test_repetition_metrics_golden():
    from debezium_incubator_ray.functions.text import repetition_metrics

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": ["a b a b a", "x y z", "", None],
        }
    )
    out = repetition_metrics(t)
    assert out["n_grams"].to_pylist() == [4, 2, 0, 0]
    assert out["n_distinct"].to_pylist() == [2, 2, 0, 0]
    assert out["dup_frac"].to_pylist() == [0.5, 0.0, 0.0, 0.0]


def test_hopping_agg_every_event_in_two_windows(ray_session):
    import ray.data
    from debezium_incubator_ray.functions.windows import hopping_agg

    ts = pa.array([1_000_000 * s for s in (5, 15, 25)], pa.timestamp("us"))
    t = pa.table(
        {"ts": ts, "event_type": ["a", "a", "b"],
         "value": pa.array([1.0, 2.0, 4.0])}
    )
    out = (
        hopping_agg(ray.data.from_arrow(t), hop_us=10_000_000, n_hops=2)
        .to_pandas()
        .sort_values(["window", "event_type"])
        .reset_index(drop=True)
    )
    # hop=10s, window=20s: event@5s → windows -1,0; @15s → 0,1; @25s → 1,2
    rows = {(int(r.window), r.event_type): (r.total_value, int(r.n))
            for r in out.itertuples()}
    assert rows == {
        (-1, "a"): (1.0, 1), (0, "a"): (3.0, 2), (1, "a"): (2.0, 1),
        (1, "b"): (4.0, 1), (2, "b"): (4.0, 1),
    }


def test_pack_sequences_prefix_sum():
    """Packing offsets = exclusive prefix sum in doc_id order, invariant
    to input row order and to range_width (the distribution knob)."""
    from debezium_incubator_ray.functions.pack import pack_sequences

    texts = ["a b c", "", "d e", "f g h i j", "k", "l m n o"]
    n_tok = [3, 0, 2, 5, 1, 4]
    # shuffle input rows: order must not matter
    perm = [3, 0, 5, 1, 4, 2]
    t = pa.table({
        "doc_id": pa.array(perm, pa.int64()),
        "text": [texts[j] for j in perm],
    })
    for width in (2, 100):
        out = (
            pack_sequences(ray.data.from_arrow(t), seq_len=4,
                           range_width=width)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        off = np.concatenate([[0], np.cumsum(n_tok)[:-1]])
        assert list(out.n_tokens) == n_tok
        assert list(out.seq_id) == list(off // 4)
        assert list(out.seq_offset) == list(off % 4)


def test_decontaminate_planted_overlap():
    from debezium_incubator_ray.functions.contamination import decontaminate

    secret = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    corpus = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": [
            f"intro words {secret} trailing content here",  # contains it
            "completely unrelated text with enough tokens to shingle",
            secret,  # exactly the benchmark doc
        ],
    })
    bench = pa.table({
        "doc_id": pa.array([100], pa.int64()),
        "text": [secret],
    })
    out = (
        decontaminate(ray.data.from_arrow(corpus),
                      ray.data.from_arrow(bench), k=8, concurrency=1)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert list(out.contaminated) == [True, False, True]
    assert out.n_hits[0] >= 1 and out.n_hits[1] == 0


def test_incremental_dedup_novel_only():
    from debezium_incubator_ray.functions.dedup import incremental_dedup

    old = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": ["seen before", "also seen"],
    })
    new = pa.table({
        "doc_id": pa.array([10, 11, 12, 13], pa.int64()),
        "text": ["seen before",      # dup of ingested -> dropped
                 "brand new",        # novel -> kept
                 "brand new",        # dup WITHIN new -> min-id wins
                 "another novel"],
    })
    out = (
        incremental_dedup(ray.data.from_arrow(new), ray.data.from_arrow(old))
        .to_pandas().sort_values("doc_id")
    )
    assert list(out.doc_id) == [11, 13]
    # duplicate PHYSICAL rows per id (re-delivered shard) still collapse
    redelivered = ray.data.from_arrow(new).union(ray.data.from_arrow(new))
    out2 = (
        incremental_dedup(redelivered, ray.data.from_arrow(old))
        .to_pandas().sort_values("doc_id")
    )
    assert list(out2.doc_id) == [11, 13]


def test_global_quantile_threshold_exact():
    from debezium_incubator_ray.functions.sample import (
        global_quantile_threshold, top_quantile_filter,
    )

    vals = [1, 2, 2, 3, 5, 5, 5, 8, 9, 10]  # n=10
    t = pa.table({"doc_id": pa.array(range(10), pa.int64()),
                  "n_chars": pa.array(vals, pa.int64())})
    ds = ray.data.from_arrow(t)
    # q=0.8 -> need cum >= 8 -> sorted vals[7] = 8
    assert global_quantile_threshold(ds, q=0.8) == 8
    # q=0.5 -> need cum >= 5 -> value 5 (cum at 5 is 7)
    assert global_quantile_threshold(ds, q=0.5) == 5
    out, thr = top_quantile_filter(ds, q=0.8)
    assert thr == 8
    assert sorted(out.to_pandas().n_chars) == [8, 9, 10]


def test_fixed_size_sample_exact_k_and_deterministic():
    from debezium_incubator_ray.functions.sample import fixed_size_sample

    t = pa.table({"doc_id": pa.array(range(200), pa.int64()),
                  "n_chars": pa.array(range(200), pa.int64())})
    a = fixed_size_sample(ray.data.from_arrow(t), k=7).to_pandas()
    b = fixed_size_sample(
        ray.data.from_arrow(t).repartition(5), k=7
    ).to_pandas()
    assert len(a) == 7
    assert sorted(a.doc_id) == sorted(b.doc_id)  # partitioning-invariant
    # k >= n: everything kept
    full = fixed_size_sample(ray.data.from_arrow(t.slice(0, 3)), k=10).to_pandas()
    assert len(full) == 3


def test_domain_quota_sample_caps_per_domain():
    from debezium_incubator_ray.functions.sample import domain_quota_sample

    t = pa.table({
        "doc_id": pa.array(range(30), pa.int64()),
        "domain": ["big.com"] * 25 + ["small.org"] * 5,
    })
    out = domain_quota_sample(ray.data.from_arrow(t), quota=4).to_pandas()
    counts = out.groupby("domain").size().to_dict()
    assert counts == {"big.com": 4, "small.org": 4}


def test_broadcast_join_and_distinct_count():
    from debezium_incubator_ray.functions.joins import (
        broadcast_join, distinct_count_per_group,
    )

    facts = pa.table({
        "k": pa.array([1, 2, 2, 3, 9], pa.int64()),
        "v": pa.array([10.0, 20.0, 21.0, 30.0, 99.0]),
    })
    dim = pa.table({
        "k": pa.array([1, 2, 3], pa.int64()),
        "name": ["a", "b", "c"],
    })
    out = broadcast_join(ray.data.from_arrow(facts), dim, on="k").to_pandas()
    assert len(out) == 4  # inner join drops k=9
    assert set(out.name) == {"a", "b", "c"}

    ev = pa.table({
        "g": ["x", "x", "x", "y"],
        "u": pa.array([1, 1, 2, 5], pa.int64()),
    })
    dc = distinct_count_per_group(
        ray.data.from_arrow(ev).repartition(3), "g", "u"
    ).to_pandas().set_index("g")
    assert dc.loc["x", "n_distinct"] == 2 and dc.loc["y", "n_distinct"] == 1


def test_normalize_text_passes():
    from debezium_incubator_ray.functions.text import normalize_text

    arr = pa.array(["  a\tb\n\nc  d ", "\x00x\x1fy", "clean"])
    out = normalize_text(arr).to_pylist()
    assert out == ["a b c d", "x y", "clean"]


def test_global_histogram_and_cdf():
    from debezium_incubator_ray.functions.sample import (
        global_histogram, quantile_from_cdf,
    )

    t = pa.table({"v": pa.array([1, 1, 2, 5, 5, 5], pa.int64())})
    vals, cum = global_histogram(ray.data.from_arrow(t).repartition(2), "v")
    assert list(vals) == [1, 2, 5] and list(cum) == [2, 3, 6]
    assert quantile_from_cdf(vals, cum, 0.5) == 2
    assert quantile_from_cdf(vals, cum, 0.99) == 5


def test_fixed_size_sample_duplicate_rows_collapse():
    from debezium_incubator_ray.functions.sample import fixed_size_sample

    t = pa.table({"doc_id": pa.array(range(50), pa.int64()),
                  "n_chars": pa.array(range(50), pa.int64())})
    tripled = ray.data.from_arrow(t).union(
        ray.data.from_arrow(t), ray.data.from_arrow(t)
    )
    base = sorted(
        fixed_size_sample(ray.data.from_arrow(t), k=7).to_pandas().doc_id
    )
    out = fixed_size_sample(tripled, k=7, unique_ids=False).to_pandas()
    assert len(out) == 7 and sorted(out.doc_id) == base
    # unique_ids=True keeps all physical copies of the same 7 winners
    out2 = fixed_size_sample(tripled, k=7).to_pandas()
    assert len(out2) == 21 and sorted(set(out2.doc_id)) == base


def test_domain_quota_null_domains_are_own_group():
    from debezium_incubator_ray.functions.sample import domain_quota_sample

    t = pa.table({
        "doc_id": pa.array(range(12), pa.int64()),
        "domain": ["a.com"] * 5 + [None] * 5 + ["", ""],
    })
    out = domain_quota_sample(ray.data.from_arrow(t), quota=3).to_pandas()
    by = out.groupby(out.domain.isna()).size()
    assert by[True] == 3          # nulls capped as their own group
    n_a = (out.domain == "a.com").sum()
    n_empty = (out.domain == "").sum()
    assert n_a == 3 and n_empty == 2


def test_shuffle_join_matches_arrow_join():
    from debezium_incubator_ray.functions.joins import shuffle_join

    left = pa.table({
        "k": pa.array([1, 2, 3, 4], pa.int64()),
        "name": ["a", "b", "c", "d"],
    })
    right = pa.table({
        "rk": pa.array([2, 2, 3, 9], pa.int64()),
        "name": ["x", "y", "z", "w"],  # collides with left 'name'
        "v": pa.array([1.0, 2.0, 3.0, 9.0]),
    })
    out = (
        shuffle_join(
            ray.data.from_arrow(left).repartition(3),
            ray.data.from_arrow(right).repartition(2),
            on="k", right_on="rk", buckets=4,
        )
        .to_pandas().sort_values(["k", "name_r"]).reset_index(drop=True)
    )
    assert list(out.k) == [2, 2, 3]
    assert list(out.name) == ["b", "b", "c"]
    assert list(out.name_r) == ["x", "y", "z"]
    assert list(out.v) == [1.0, 2.0, 3.0]


def test_fixed_size_sample_in_block_duplicates():
    from debezium_incubator_ray.functions.sample import fixed_size_sample

    t = pa.table({"doc_id": pa.array(list(range(20)) * 3, pa.int64()),
                  "n_chars": pa.array(list(range(20)) * 3, pa.int64())})
    out = fixed_size_sample(
        ray.data.from_arrow(t), k=7, unique_ids=False
    ).to_pandas()
    assert len(out) == 7 and out.doc_id.is_unique


def test_shuffle_join_suffix_collision():
    from debezium_incubator_ray.functions.joins import shuffle_join

    left = pa.table({"k": pa.array([1], pa.int64()),
                     "name": ["a"], "name_r": ["pre-existing"]})
    right = pa.table({"k": pa.array([1], pa.int64()), "name": ["b"]})
    out = shuffle_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right), on="k"
    ).to_pandas()
    assert len(out) == 1
    assert out["name"][0] == "a" and out["name_r"][0] == "pre-existing"
    assert out["name_r_r"][0] == "b"


def test_funnel_users_order_matters():
    from debezium_incubator_ray.functions.windows import funnel_users

    t = pa.table({
        "user_id": pa.array([1, 1, 2, 2, 3, 4], pa.int64()),
        "event_type": ["click", "purchase",      # 1: click then buy -> in
                       "purchase", "click",      # 2: buy BEFORE click -> out
                       "click",                  # 3: no purchase -> out
                       "purchase"],              # 4: no click -> out
        "event_id": pa.array([10, 20, 10, 20, 10, 10], pa.int64()),
    })
    out = funnel_users(
        ray.data.from_arrow(t).repartition(3), "click", "purchase"
    ).to_pandas()
    assert list(out.user_id) == [1]


def test_dq_operators():
    from debezium_incubator_ray.functions.quality import (
        fk_orphans, profile_table,
    )

    facts = pa.table({"user_id": pa.array([1, 2, 2, 9, None], pa.int64())})
    dim = pa.array([1, 2], pa.int64())
    out = fk_orphans(
        ray.data.from_arrow(facts).repartition(2), "user_id", dim
    ).to_pandas()
    assert list(out.user_id) == [9]  # null is not an orphan; distinct

    t = pa.table({
        "a": pa.array([3, 1, None], pa.int64()),
        "s": ["b", "a", "c"],
    })
    prof = profile_table(
        ray.data.from_arrow(t).repartition(3), ["a", "s"]
    ).to_pylist()
    pa_row = next(r for r in prof if r["column"] == "a")
    assert pa_row["n_rows"] == 3 and pa_row["n_nulls"] == 1
    assert pa_row["min_v"] == "1" and pa_row["max_v"] == "3"
    ps = next(r for r in prof if r["column"] == "s")
    assert ps["min_v"] == "a" and ps["max_v"] == "c"


def test_kmv_sketch_deterministic_and_close():
    from debezium_incubator_ray.functions.sketch import approx_distinct_kmv

    ids = pa.table({"v": pa.array(list(range(5000)) * 2, pa.int64())})
    a = approx_distinct_kmv(ray.data.from_arrow(ids), "v", k=128)
    b = approx_distinct_kmv(
        ray.data.from_arrow(ids).repartition(7), "v", k=128
    )
    assert a.equals(b)  # partitioning-invariant, bit-identical
    est = a["estimate"][0].as_py()
    assert abs(est - 5000) / 5000 < 0.3  # ~1/sqrt(126) error regime
    # exact when distinct < k
    small = pa.table({"v": pa.array([1, 2, 2, 3], pa.int64())})
    s = approx_distinct_kmv(ray.data.from_arrow(small), "v", k=128)
    assert s["estimate"][0].as_py() == 3.0


def test_fk_orphans_string_keys_and_funnel_timestamp_order():
    from debezium_incubator_ray.functions.quality import fk_orphans
    from debezium_incubator_ray.functions.windows import funnel_users

    facts = pa.table({"sku": ["a", "b", "b", "z", None]})
    out = fk_orphans(
        ray.data.from_arrow(facts).repartition(2), "sku",
        pa.array(["a", "b"]),
    ).to_pandas()
    assert list(out.sku) == ["z"]

    t = pa.table({
        "user_id": ["u1", "u1", "u2"],
        "event_type": ["click", "purchase", "click"],
        "ts": pa.array(
            [np.datetime64("2026-01-01T00:00:00", "us"),
             np.datetime64("2026-01-01T00:00:01", "us"),
             np.datetime64("2026-01-01T00:00:02", "us")],
            pa.timestamp("us"),
        ),
    })
    out2 = funnel_users(
        ray.data.from_arrow(t).repartition(3), "click", "purchase",
        order_col="ts",
    ).to_pandas()
    assert list(out2.user_id) == ["u1"]


def test_domain_quota_dict_mixture():
    from debezium_incubator_ray.functions.sample import domain_quota_sample

    t = pa.table({
        "doc_id": pa.array(range(30), pa.int64()),
        "lang": ["en"] * 20 + ["zh"] * 8 + ["fr"] * 2,
    })
    out = domain_quota_sample(
        ray.data.from_arrow(t), {"en": 5, "zh": 100}, domain_col="lang",
        default_quota=1,
    ).to_pandas()
    counts = out.groupby("lang").size().to_dict()
    assert counts == {"en": 5, "zh": 8, "fr": 1}


def test_exact_dedup_semijoin_mode_equivalent():
    """The semi-join winner filter (the no-broadcast scale path) returns
    the identical result to the broadcast filter."""
    from debezium_incubator_ray.functions.dedup import exact_dedup

    full = ray.data.read_parquet(os.path.join(SF, "documents.parquet"))
    doubled = full.union(
        ray.data.read_parquet(os.path.join(SF, "documents.parquet"))
    )
    a = exact_dedup(doubled).to_pandas().sort_values("doc_id")
    b = exact_dedup(doubled, winner_filter="semijoin").to_pandas(
    ).sort_values("doc_id")
    assert list(a.doc_id) == list(b.doc_id)


def test_domain_quota_dict_null_key():
    from debezium_incubator_ray.functions.sample import domain_quota_sample

    t = pa.table({
        "doc_id": pa.array(range(12), pa.int64()),
        "lang": [None] * 6 + [""] * 6,
    })
    out = domain_quota_sample(
        ray.data.from_arrow(t), {None: 4, "": 2}, domain_col="lang",
        default_quota=0,
    ).to_pandas()
    assert out.lang.isna().sum() == 4
    assert (out.lang == "").sum() == 2


def test_shuffle_join_salt_invariant():
    """Hot-key salting: identical result set for any salt, including a
    key that dominates the left side and left-outer unmatched rows."""
    from debezium_incubator_ray.functions.joins import shuffle_join

    left = pa.table({
        "k": pa.array([1] * 50 + [2, 3], pa.int64()),
        "x": pa.array(range(52), pa.int64()),
    })
    right = pa.table({
        "k": pa.array([1, 2], pa.int64()),
        "y": ["hot", "cold"],
    })
    for jt in ("inner", "left outer"):
        base = shuffle_join(
            ray.data.from_arrow(left), ray.data.from_arrow(right),
            on="k", join_type=jt,
        ).to_pandas().sort_values(["k", "x"]).reset_index(drop=True)
        salted = shuffle_join(
            ray.data.from_arrow(left), ray.data.from_arrow(right),
            on="k", join_type=jt, salt=4,
        ).to_pandas().sort_values(["k", "x"]).reset_index(drop=True)
        assert base.equals(salted), jt
    import pytest as _pytest

    with _pytest.raises(ValueError):
        shuffle_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                     on="k", join_type="full outer", salt=2)


def test_frame_sampler_and_resize_stub():
    from debezium_incubator_ray.functions.multimodal import (
        FrameSampler, ResizeStub, decode_video_frames,
    )

    t = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "payload": pa.array(
            [b"0123456789abcdef" * 4, b"xy"], pa.large_binary()
        ),
    })
    out = (
        ray.data.from_arrow(t)
        .map_batches(FrameSampler, fn_constructor_kwargs={"k": 4,
                     "frame_bytes": 16},
                     batch_format="pyarrow", concurrency=1)
        .to_pandas().sort_values(["doc_id", "frame_idx"])
    )
    assert len(out) == 8  # 2 docs x 4 frames, exploded
    d0 = out[out.doc_id == 0]
    assert list(d0.frame) == [b"0123456789abcdef"] * 4  # period-16 payload
    r = ResizeStub(side=8)(t)
    assert all(len(x) == 64 for x in r["thumb"].to_pylist())
    # deterministic: same payload -> same thumb
    assert ResizeStub(side=8)(t)["thumb"].equals(r["thumb"])
    with pytest.raises(NotImplementedError):
        decode_video_frames(b"RIFF", 4)


def test_frame_sampler_null_payloads():
    from debezium_incubator_ray.functions.multimodal import (
        FrameSampler, ResizeStub,
    )

    t = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "payload": pa.array([b"0123456789abcdef", None], pa.large_binary()),
    })
    out = FrameSampler(k=2, frame_bytes=8)(t)
    by = {(r["doc_id"], r["frame_idx"]): r["frame"] for r in out.to_pylist()}
    assert by[(0, 0)] == b"01234567"
    assert by[(1, 0)] is None and by[(1, 1)] is None
    r = ResizeStub(side=4)(t)
    assert r["thumb"][1].as_py() is None and r["thumb"][0].as_py() is not None


def test_peak_window_avg_frames_and_nulls():
    """Frame math vs a hand-rolled reference: short frames at key start
    average the available rows; NULLs are excluded; all-NULL keys emit
    NULL peak."""
    from debezium_incubator_ray.functions.windows import peak_window_avg

    t = pa.table({
        "user_id": [1, 1, 1, 1, 2, 2, 3],
        "ts": pa.array([10, 20, 30, 40, 5, 6, 7], pa.timestamp("us")),
        "event_id": [1, 2, 3, 4, 5, 6, 7],
        "value": pa.array([1.0, None, 4.0, 10.0, 2.0, None, None]),
    })
    out = (
        peak_window_avg(ray.data.from_arrow(t), window=3, buckets=4)
        .to_pandas()
        .set_index("user_id")["peak_avg"]
        .to_dict()
    )
    # user 1 frames: [1], [1,-], [1,-,4]->2.5, [-,4,10]->7.0 -> peak 7.0
    assert out[1] == 7.0
    # user 2: [2], [2,-] -> 2.0
    assert out[2] == 2.0
    # user 3: all NULL -> NULL
    assert np.isnan(out[3])


def test_argmax_rows_ties_and_nulls():
    from debezium_incubator_ray.functions.windows import argmax_rows

    t = pa.table({
        "user_id": [1, 1, 1, 2, 2, 3],
        "event_id": [1, 2, 3, 4, 5, 6],
        "value": pa.array([5.0, 5.0, 1.0, None, 2.0, None]),
    })
    out = (
        argmax_rows(ray.data.from_arrow(t), buckets=4)
        .to_pandas()
        .sort_values("event_id")
    )
    # user 1 keeps BOTH tied max rows; user 2 keeps the non-null max;
    # user 3 (all NULL) emits nothing
    assert out["event_id"].tolist() == [1, 2, 5]


def test_zipf_slope_closed_form():
    """Slope matches the closed-form fit on a constructed frequency table
    (freq = 1000 / rank exactly -> slope == -1)."""
    from debezium_incubator_ray.functions.text import zipf_slope

    words = []
    for r in range(1, 11):
        words.extend([f"w{r:02d}"] * (1000 // r))
    docs = pa.table({"text": [" ".join(words)]})
    out = zipf_slope(ray.data.from_arrow(docs), top_n=10).to_pandas()
    assert out["n_terms"].iloc[0] == 10
    # counts floor-divide, so the fit is close to but not exactly -1
    assert abs(out["slope"].iloc[0] + 1.0) < 0.01


def test_bm25_ranks_term_density():
    from debezium_incubator_ray.functions.text import bm25_topk

    docs = pa.table({
        "doc_id": [1, 2, 3, 4],
        "text": [
            "join join join filler",           # high tf, short
            "join filler filler filler filler filler filler filler",
            "filler filler filler",            # no hit -> excluded
            "",                                 # empty -> excluded
        ],
    })
    out = bm25_topk(
        ray.data.from_arrow(docs), ("join",), k=10
    ).to_pandas()
    assert out["doc_id"].tolist() == [1, 2]
    assert (out["score"] > 0).all()


def test_value_histogram_edges():
    """Global range, max clamped into last bucket, NULLs dropped,
    degenerate range falls back to bucket 0."""
    from debezium_incubator_ray.functions.quality import value_histogram

    t = pa.table({
        "event_type": ["a", "a", "b", "b", "a"],
        "value": pa.array([0.0, 10.0, 5.0, None, 10.0]),
    })
    out = (
        value_histogram(ray.data.from_arrow(t), n_buckets=4)
        .to_pandas()
        .set_index(["event_type", "bucket"])["n"]
        .to_dict()
    )
    # width 2.5: 0.0->b0, 5.0->b2, 10.0->clamped b3 (twice for 'a')
    assert out == {("a", 0): 1, ("a", 3): 2, ("b", 2): 1}

    flat = pa.table({"event_type": ["x", "x"], "value": [7.0, 7.0]})
    out2 = value_histogram(ray.data.from_arrow(flat), n_buckets=4).to_pandas()
    assert out2["bucket"].tolist() == [0] and out2["n"].tolist() == [2]


def test_type_token_ratio_excludes_empty():
    from debezium_incubator_ray.functions.text import type_token_ratio

    t = pa.table({
        "doc_id": [1, 2, 3],
        "text": ["a b a b a", "  ", "x"],
    })
    out = (
        type_token_ratio(ray.data.from_arrow(t))
        .to_pandas()
        .set_index("doc_id")
    )
    assert 2 not in out.index  # whitespace-only doc has no token rows
    assert out.loc[1, "n_tokens"] == 5 and out.loc[1, "n_distinct"] == 2
    assert out.loc[1, "ttr"] == 0.4 and out.loc[3, "ttr"] == 1.0


def test_path_signatures_clips_and_orders():
    from debezium_incubator_ray.functions.windows import path_signatures

    t = pa.table({
        "user_id": [1] * 7 + [2, 2] + [3],
        "event_id": [7, 6, 5, 4, 3, 2, 1, 11, 10, 20],
        "event_type": ["g", "f", "e", "d", "c", "b", "a", "y", "x", "z"],
    })
    out = (
        path_signatures(ray.data.from_arrow(t), first_n=5, buckets=4)
        .to_pandas()
        .set_index("path")["n_keys"]
        .to_dict()
    )
    # user 1: events sorted by id -> a,b,c,d,e,f,g clipped to 5
    assert out == {"a>b>c>d>e": 1, "x>y": 1, "z": 1}


def test_gopher_rules_signals_and_edge_docs(ray_session):
    import ray.data
    from debezium_incubator_ray.functions.text import gopher_rules

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            # 4 words, top word 'x' dominates (3/4), no stopwords
            "x x x y",
            # 24 words incl. stopwords, diverse
            " ".join(["the quick brown fox jumps over a lazy dog"] * 2
                     + ["alpha beta gamma delta epsilon zeta"]),
            # single word
            "solo",
        ]),
    })
    out = (
        gopher_rules(ray.data.from_arrow(t).repartition(2), min_words=5)
        .to_pandas().set_index("doc_id").sort_index()
    )
    assert out.loc[1, "n_words"] == 4 and not out.loc[1, "r_words"]
    assert abs(out.loc[1, "top_frac"] - 0.75) < 1e-9
    assert not out.loc[1, "r_stop"] and not out.loc[1, "r_top"]
    assert out.loc[2, "n_words"] == 24 and out.loc[2, "r_words"]
    assert out.loc[2, "r_stop"]  # 'the'/'a' appear 4/24
    assert out.loc[3, "n_words"] == 1
    assert abs(out.loc[3, "mean_word_len"] - 4.0) < 1e-9
    assert not out.loc[3, "pass_all"]


def test_keep_best_per_cluster_planted(ray_session):
    """Planted near-dup group: the winner is the highest-score member
    (ties -> min id), and non-clustered docs never appear."""
    import ray.data
    from debezium_incubator_ray.functions.dedup import keep_best_per_cluster

    base = "alpha beta gamma delta epsilon zeta eta theta"
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 50], pa.int64()),
        "text": pa.array([
            base, base + " iota", base + " iota kappa",
            "totally different words entirely here now",
        ]),
        "score": pa.array([10.0, 30.0, 30.0, 99.0], pa.float64()),
    })
    out = (
        keep_best_per_cluster(
            ray.data.from_arrow(t).repartition(2), "score",
            threshold=0.5,
        )
        .to_pandas()
    )
    assert len(out) == 1
    assert out["cluster_id"][0] == 1
    assert out["doc_id"][0] == 2  # score tie 30.0 between 2 and 3 -> min id
    assert out["score"][0] == 30.0


def test_keep_best_label_modes_agree(ray_session):
    """The broadcast and shuffle (distributed semijoin) label-attach
    branches of keep_best_per_cluster must produce identical rows — the
    cutover is an execution-strategy switch, never a semantics switch."""
    import pandas as pd
    from debezium_incubator_ray.functions.dedup import keep_best_per_cluster

    docs = ray.data.read_parquet(
        os.path.join(SF, "documents.parquet"),
        columns=["doc_id", "text", "n_chars"],
    )

    def run(**kw):
        return (
            keep_best_per_cluster(docs, "n_chars", threshold=0.3, **kw)
            .to_pandas()
            .sort_values(["cluster_id", "doc_id"])
            .reset_index(drop=True)
        )

    bro = run(label_mode="broadcast")
    shf = run(label_mode="shuffle")
    assert len(bro) > 0
    pd.testing.assert_frame_equal(bro, shf)
    # auto with cutover=0 must take the shuffle branch and still agree
    auto0 = run(label_mode="auto", driver_cutover=0)
    pd.testing.assert_frame_equal(bro, auto0)


def test_embedding_lsh_axis_aligned_matches_numpy(ray_session):
    """axis_aligned=True (the SQL-verifiable plane family): full output
    byte-compare against an independent numpy recomputation of the band
    buckets + exact float64 in-bucket cosine."""
    from debezium_incubator_ray.functions.dedup import (
        embedding_near_dup_pairs_lsh,
    )

    rng = np.random.default_rng(7)
    n, dim, n_planes, bands, tau = 60, 16, 8, 4, 0.3
    M = rng.standard_normal((n, dim)).astype(np.float32)
    ids = np.arange(100, 100 + n, dtype=np.int64)
    t = pa.table({"vec_id": pa.array(ids),
                  "embedding": pa.array(M.tolist(), pa.list_(pa.float32()))})
    out = embedding_near_dup_pairs_lsh(
        ray.data.from_arrow(t), tau=tau, dim=dim, n_planes=n_planes,
        bands=bands, axis_aligned=True,
    ).to_pandas()

    # numpy reference: bit j = coord j > 0; band k = bits [k*r, (k+1)*r)
    r = n_planes // bands
    M64 = M.astype(np.float64)
    bits = (M64[:, :n_planes] > 0).astype(np.int64)
    band_codes = np.stack(
        [bits[:, k * r:(k + 1) * r] @ (1 << np.arange(r)) for k in range(bands)],
        axis=1,
    )  # (n, bands)
    Mn = M64 / np.linalg.norm(M64, axis=1, keepdims=True)
    cos = Mn @ Mn.T
    expect = {}
    for i in range(n):
        for j in range(i + 1, n):
            if (band_codes[i] == band_codes[j]).any() and cos[i, j] >= tau:
                expect[(ids[i], ids[j])] = round(float(cos[i, j]), 6)
    got = {(a, b): c for a, b, c in zip(out["a"], out["b"], out["cos"])}
    assert set(got) == set(expect)
    for k in got:
        assert abs(got[k] - expect[k]) < 1e-9, (k, got[k], expect[k])


def test_media_header_parse_roundtrip_and_edges():
    """synth payloads round-trip through the header parser; nulls,
    unknown magic and truncated headers degrade to NULL fields, never
    crash the flat-buffer arithmetic."""
    from debezium_incubator_ray.functions.multimodal import (
        parse_media_headers, synth_media_payloads,
    )

    ids = np.arange(0, 300, dtype=np.int64)
    p = synth_media_payloads(ids)
    out = parse_media_headers(p, id_arr=pa.array(ids)).to_pandas()
    for _, r in out.iterrows():
        s, kc = r.doc_id // 3, r.doc_id % 3
        if kc == 0:
            assert r.kind == "png" and r.width == s % 317 + 1
            assert r.height == s % 211 + 1 and r.bit_depth == 8
            assert r.channels == [1, 3, 2, 4][s % 4]
        elif kc == 1:
            assert r.kind == "bmp" and r.width == s % 509 + 1
            assert r.channels == (3 if s % 2 == 0 else 4)
        else:
            assert r.kind == "wav"
            assert r.sample_rate == [8000, 16000, 44100][s % 3]
            assert r.n_samples == s % 1000 + 1
            assert r.channels == s % 2 + 1 and r.bit_depth == 16

    # fmt chunk present but a LIST chunk sits where 'data' normally is:
    # fmt fields parse, n_samples must be NULL (never garbage)
    wav_list = bytearray(60)
    wav_list[0:4] = b"RIFF"; wav_list[8:16] = b"WAVEfmt "
    wav_list[22:24] = (2).to_bytes(2, "little")
    wav_list[24:28] = (16000).to_bytes(4, "little")
    wav_list[34:36] = (16).to_bytes(2, "little")
    wav_list[36:40] = b"LIST"
    wav_list[40:44] = (9999).to_bytes(4, "little")  # NOT a data size
    # 1-bit palette BMP: 1 channel at 1-bit depth, not channels=0
    bmp1 = bytearray(54)
    bmp1[0:2] = b"BM"
    bmp1[18:22] = (7).to_bytes(4, "little")
    bmp1[22:26] = (5).to_bytes(4, "little")
    bmp1[28:30] = (1).to_bytes(2, "little")
    weird = pa.array(
        [None, b"", b"\x89PNG", b"garbage bytes here that are long enough",
         b"RIFFxxxxWAVE" + b"\x00" * 40,   # RIFF/WAVE but no fmt chunk
         bytes(wav_list), bytes(bmp1)],
        pa.large_binary(),
    )
    w = parse_media_headers(weird).to_pandas()
    assert w["kind"].tolist()[0] is None          # null payload
    assert w["kind"].tolist()[1:4] == ["unknown"] * 3  # short/truncated/bad
    # fixed-offset WAV parse is gated on the canonical fmt-first layout
    assert w["kind"].tolist()[4] == "unknown"
    assert w["kind"].tolist()[5] == "wav"
    assert w["sample_rate"][5] == 16000 and w["channels"][5] == 2
    assert np.isnan(w["n_samples"][5])            # no 'data' at 36 -> NULL
    assert w["kind"].tolist()[6] == "bmp"
    assert w["width"][6] == 7 and w["channels"][6] == 1
    assert w["bit_depth"][6] == 1


def test_media_header_parse_webp_and_gif():
    """WebP (all three container variants) and GIF logical-screen
    headers parse vectorized; a RIFF/WEBP with an unknown first chunk
    degrades to 'unknown', never garbage dims."""
    from debezium_incubator_ray.functions.multimodal import (
        parse_media_headers, synth_webp_headers,
    )

    ids = np.arange(0, 60, dtype=np.int64)
    out = parse_media_headers(synth_webp_headers(ids),
                              id_arr=pa.array(ids)).to_pandas()
    for _, r in out.iterrows():
        s, v = r.doc_id // 3, r.doc_id % 3
        assert r.kind == "webp"
        assert r.width == s % 300 + 1 and r.height == s % 200 + 1
        assert r.channels == (3 if v == 0 else 3 + s % 2)
        assert r.bit_depth == 8 and np.isnan(r.sample_rate)

    # GIF87a and GIF89a logical-screen descriptors
    def gif(ver, w, h, depth_bits):
        b = bytearray(b"GIF" + ver)
        b += int(w).to_bytes(2, "little") + int(h).to_bytes(2, "little")
        b += bytes([0x80 | (depth_bits - 1), 0, 0])
        return bytes(b)

    t = parse_media_headers(pa.array(
        [gif(b"89a", 320, 200, 8), gif(b"87a", 7, 5, 1),
         b"RIFF\x08\x00\x00\x00WEBPXXXX\x00\x00\x00\x00"],
        pa.large_binary(),
    )).to_pandas()
    assert t["kind"].tolist() == ["gif", "gif", "unknown"]
    assert t["width"].tolist()[:2] == [320, 7]
    assert t["height"].tolist()[:2] == [200, 5]
    assert t["channels"].tolist()[:2] == [1, 1]
    assert t["bit_depth"].tolist()[:2] == [8, 1]
    assert np.isnan(t["width"][2])  # unknown chunk -> no fabricated dims


def test_media_header_parser_stage(ray_session):
    """Actor-pool stage wiring over a Dataset (the sf0.001 id space)."""
    from debezium_incubator_ray.functions.multimodal import (
        MediaHeaderParser, synth_media_payloads,
    )

    ids = np.arange(50, dtype=np.int64)

    def add(t):
        return t.append_column(
            "payload",
            synth_media_payloads(t["doc_id"].to_numpy(zero_copy_only=False)),
        )

    ds = (
        ray.data.from_arrow(pa.table({"doc_id": pa.array(ids)}))
        .repartition(4)
        .map_batches(add, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(
            MediaHeaderParser, batch_format="pyarrow", zero_copy_batch=True,
            concurrency=(1, 2),
        )
    )
    out = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(out) == 50
    assert (out["kind"] == np.array(["png", "bmp", "wav"])[ids % 3]).all()


def test_timestamp_ltz_returns_null_with_warning():
    """TIMESTAMP WITH LOCAL TIME ZONE golden: the reference emits NULL for
    every LTZ value while keeping the field in the schema
    (ORA/OracleValueConverters.java:71-73,388-390). The converter must
    return a TYPED all-null column (stable schema) and warn once."""
    import warnings

    from debezium_incubator_ray.functions import typeconv as TC

    ts = pa.chunked_array([pa.array(
        [np.datetime64("2026-01-01T00:00:01", "us"), None,
         np.datetime64("1999-12-31T23:59:59", "us")],
        pa.timestamp("us"),
    )])
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = TC.timestamp_ltz_unsupported(ts)
    assert any("LOCAL TIME ZONE" in str(x.message) for x in w)
    assert out.type == pa.string()
    assert len(out) == 3 and out.null_count == 3
    # tz-aware input (LTZ read through a session zone) is equally null
    tz = pc.assume_timezone(
        pa.array([np.datetime64("2026-01-01T00:00:01", "us")],
                 pa.timestamp("us")),
        "Europe/Berlin",
    )
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        out2 = TC.timestamp_ltz_unsupported(tz)
    assert out2.null_count == 1 and out2.type == pa.string()


def test_hash_split_deterministic_and_partition_invariant(ray_session):
    """Same id -> same split at any parallelism; salt re-rolls; bad
    fractions refused."""
    from debezium_incubator_ray.functions.sample import hash_split

    ids = pa.table({"doc_id": pa.array(np.arange(2000, dtype=np.int64))})
    a = hash_split(ray.data.from_arrow(ids)).to_pandas()
    b = hash_split(ray.data.from_arrow(ids).repartition(7)).to_pandas()
    ma = dict(zip(a["doc_id"], a["split"]))
    mb = dict(zip(b["doc_id"], b["split"]))
    assert ma == mb
    frac = a["split"].value_counts(normalize=True)
    assert 0.7 < frac["train"] < 0.9 and frac["val"] < 0.2
    s = hash_split(ray.data.from_arrow(ids), salt="e2").to_pandas()
    ms = dict(zip(s["doc_id"], s["split"]))
    assert ms != ma  # a salt re-rolls at least some assignments
    with pytest.raises(ValueError):
        hash_split(ray.data.from_arrow(ids),
                   fractions=(("train", 50), ("val", 10)))


def test_watermark_late_flags_matches_reference(ray_session):
    """Exact agreement with a sequential numpy reference, including
    across range boundaries (range_width forced tiny) and the NULL
    watermark of the globally first event."""
    from debezium_incubator_ray.functions.windows import watermark_late_flags

    rng = np.random.default_rng(5)
    n, allowed = 500, 1_000_000
    ts = rng.integers(0, 50_000_000, size=n).astype("datetime64[us]")
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts, pa.timestamp("us")),
    })
    out = (
        watermark_late_flags(
            ray.data.from_arrow(t).repartition(5), allowed_us=allowed,
            range_width=64,
        )
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    ts_us = ts.astype(np.int64)
    prev = np.maximum.accumulate(ts_us)[:-1]
    assert out["watermark_us"].isna()[0] and not out["is_late"][0]
    np.testing.assert_array_equal(
        out["watermark_us"].to_numpy()[1:], prev - allowed
    )
    np.testing.assert_array_equal(
        out["is_late"].to_numpy()[1:], ts_us[1:] < prev - allowed
    )
    assert out["is_late"].sum() > 0  # the fixture actually has late events

    # null event-times are excluded, not a crash / NaN poison
    t2 = pa.table({
        "event_id": pa.array([0, 1, 2, 3], pa.int64()),
        "ts": pa.array([10_000_000, None, 5_000_000, 20_000_000],
                       pa.timestamp("us")),
    })
    out2 = (
        watermark_late_flags(ray.data.from_arrow(t2), allowed_us=1_000_000)
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    assert out2["event_id"].tolist() == [0, 2, 3]
    assert bool(out2["is_late"][1])  # 5s < 10s - 1s watermark


def test_heavy_hitters_exact_under_truncation(ray_session):
    """Force real Misra-Gries truncation (width << vocab): items whose
    true count exceeds N/width must survive candidacy, so the final
    top-k is exactly the brute-force answer."""
    from debezium_incubator_ray.functions.sketch import heavy_hitters

    rng = np.random.default_rng(9)
    # skewed multiset: item-i frequency ~ 1/(i+1); 400 distinct, n=20k
    vocab = np.array([f"w{i:04d}" for i in range(400)])
    p = 1.0 / np.arange(1, 401)
    p /= p.sum()
    items = vocab[rng.choice(400, size=20_000, p=p)]
    t = pa.table({"text": pa.array(items)})
    ds = ray.data.from_arrow(t).repartition(8)

    out = heavy_hitters(
        ds, lambda b: b["text"].combine_chunks(), k=10, width=32
    ).to_pandas()
    # brute force
    vals, cnts = np.unique(items, return_counts=True)
    order = np.lexsort((vals, -cnts))[:10]
    assert out["item"].tolist() == list(vals[order])
    assert out["cnt"].tolist() == list(cnts[order])
    assert out["rank"].tolist() == list(range(1, 11))
    # sanity: truncation genuinely happened (width << distinct items) —
    # the exact-match asserts above are the real guarantee check
    assert len(vals) > 32


def test_resumable_write_skips_committed_buckets(tmp_path, ray_session):
    """Partitioned output with per-bucket commit markers: a re-run
    rewrites ONLY buckets without a marker; committed bytes are never
    touched; aborted (marker-less) attempts are cleared; read-back
    equals the input either way."""
    import glob
    import os as _os

    from debezium_incubator_ray.functions.output import resumable_write

    t = pa.table({
        "doc_id": pa.array(np.arange(500, dtype=np.int64)),
        "text": pa.array([f"doc {i}" for i in range(500)]),
    })
    out = str(tmp_path / "out")
    ds = ray.data.from_arrow(t).repartition(4)

    s1 = resumable_write(ds, out, "doc_id", buckets=8).to_pandas()
    assert len(s1) == 8 and not s1["skipped"].any()
    assert s1["rows"].sum() == 500
    back = ray.data.read_parquet(out).to_pandas().sort_values("doc_id")
    assert back["doc_id"].tolist() == list(range(500))

    # simulate a crash in bucket 3: marker gone, stale data file left
    b3 = _os.path.join(out, "bucket=3")
    _os.remove(_os.path.join(b3, "_SUCCESS"))
    stale = glob.glob(_os.path.join(b3, "part-*.parquet"))
    mtimes_before = {
        p: _os.path.getmtime(p)
        for p in glob.glob(_os.path.join(out, "bucket=*", "part-*.parquet"))
        if "bucket=3" not in p
    }
    s2 = resumable_write(ds, out, "doc_id", buckets=8).to_pandas()
    assert s2["skipped"].sum() == 7  # everyone but bucket 3 skipped
    assert not s2.set_index("bucket")["skipped"][3]
    # committed buckets untouched byte-for-byte (same files, same mtimes)
    for p, m in mtimes_before.items():
        assert _os.path.getmtime(p) == m
    # the aborted attempt's file was cleared, not duplicated
    assert not any(_os.path.exists(p) for p in stale)
    back2 = ray.data.read_parquet(out).to_pandas().sort_values("doc_id")
    assert back2["doc_id"].tolist() == list(range(500))
    # per-bucket row counts identical across the two runs
    assert s1.set_index("bucket")["rows"].to_dict() == \
        s2.set_index("bucket")["rows"].to_dict()


def test_resumable_write_layout_guard(tmp_path, ray_session):
    """Resuming into an out_dir with a DIFFERENT layout (bucket count or
    partition column) is refused — mixing hash spaces would silently
    duplicate or skip rows."""
    from debezium_incubator_ray.functions.output import resumable_write

    t = pa.table({"doc_id": pa.array(np.arange(50, dtype=np.int64))})
    out = str(tmp_path / "o")
    resumable_write(ray.data.from_arrow(t), out, "doc_id", buckets=8)
    with pytest.raises(ValueError, match="layout mismatch"):
        resumable_write(ray.data.from_arrow(t), out, "doc_id", buckets=16)


def test_sequence_ngram_counts_matches_pandas(ray_session):
    """n-gram sequence counts equal a pandas groupby-shift reference,
    with windows never crossing user boundaries; n=2 equals
    markov_transitions."""
    import pandas as pd
    from debezium_incubator_ray.functions.windows import (
        markov_transitions, sequence_ngram_counts,
    )

    rng = np.random.default_rng(12)
    n = 400
    df = pd.DataFrame({
        "user_id": rng.integers(0, 20, n),
        "event_type": rng.choice(list("abc"), n),
        "event_id": np.arange(n, dtype=np.int64),
    })
    ds = ray.data.from_pandas(df).repartition(5)

    got = sequence_ngram_counts(ds, n=3).to_pandas()
    s = df.sort_values(["user_id", "event_id"])
    ref = {}
    for _, g in s.groupby("user_id"):
        ts = g["event_type"].tolist()
        for i in range(len(ts) - 2):
            ref[tuple(ts[i:i + 3])] = ref.get(tuple(ts[i:i + 3]), 0) + 1
    mine = {(r.t0, r.t1, r.t2): r.cnt for r in got.itertuples()}
    assert mine == ref

    # n=2 path equals markov_transitions exactly
    a = sequence_ngram_counts(ds, n=2).to_pandas()
    b = markov_transitions(ds).to_pandas()
    ma = {(r.t0, r.t1): r.cnt for r in a.itertuples()}
    mb = {(r.prev_type, r.next_type): r.cnt for r in b.itertuples()}
    assert ma == mb

    # top-k cut: deterministic (cnt desc, types asc), rank 1..k
    topk = sequence_ngram_counts(ds, n=3, k=5).to_pandas()
    want = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [tuple([r.t0, r.t1, r.t2]) for r in topk.itertuples()] == \
        [k for k, _ in want]
    assert topk["rank"].tolist() == [1, 2, 3, 4, 5]


def test_hll_grouped_matches_global_and_exact(ray_session):
    """Grouped HLL: each group's registers equal a single-group global
    sketch over that group's rows; estimates land within the ~6.5%
    standard error of exact distinct counts."""
    import pandas as pd
    from debezium_incubator_ray.functions.sketch import (
        approx_distinct_hll, hll_grouped,
    )

    rng = np.random.default_rng(31)
    n = 8000
    df = pd.DataFrame({
        "g": rng.choice(["x", "y"], n),
        "v": rng.integers(0, 1500, n),
    })
    ds = ray.data.from_pandas(df).repartition(6)
    got = hll_grouped(ds, "g", "v").to_pandas().set_index("g")
    for gval in ("x", "y"):
        sub = ray.data.from_pandas(df[df.g == gval].reset_index(drop=True))
        solo = approx_distinct_hll(sub, "v").to_pandas()
        assert got.loc[gval, "estimate"] == solo["estimate"][0]
        assert got.loc[gval, "n_zero"] == solo["n_zero"][0]
        exact = df[df.g == gval]["v"].nunique()
        assert abs(got.loc[gval, "estimate"] - exact) / exact < 0.25


def test_minhash_estimate_tracks_exact_jaccard(ray_session):
    """The estimator finds planted near-identical pairs at high
    est_jaccard, is deterministic across runs/partitionings, and every
    estimate is a multiple of 1/n_hashes within [0, 1]."""
    from debezium_incubator_ray.functions.dedup import minhash_estimate_pairs

    base = pq.read_table(os.path.join(SF, "documents.parquet")).to_pydict()
    texts = list(base["text"][:30])
    ids = list(range(30))
    for j in range(4):  # plant: identical copies -> est 1.0
        ids.append(500 + j)
        texts.append(texts[j])
    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts)})
    a = minhash_estimate_pairs(
        ray.data.from_arrow(t), n_hashes=16, min_matches=8
    ).to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    b = minhash_estimate_pairs(
        ray.data.from_arrow(t).repartition(5), n_hashes=16, min_matches=8
    ).to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)
    got = {(r.a, r.b): r.est_jaccard for r in a.itertuples()}
    for j in range(4):
        assert got.get((j, 500 + j)) == 1.0, (j, got)
    assert ((a["est_jaccard"] * 16) % 1 == 0).all()
    assert a["est_jaccard"].between(0.5, 1.0).all()


def test_burstiness_planted_regimes(ray_session):
    """Constant gaps -> B = -1 (periodic); highly uneven gaps -> B > 0;
    single-event and all-same-instant users handled per contract."""
    from debezium_incubator_ray.functions.stats import interarrival_burstiness

    base = 1_700_000_000_000_000
    rows = []
    # user 1: periodic, gap 10s x 5
    for i in range(6):
        rows.append((1, base + i * 10_000_000))
    # user 2: bursty — many tiny gaps, one huge
    for i in range(10):
        rows.append((2, base + i * 1_000))
    rows.append((2, base + 3_600_000_000))
    # user 3: single event (no gaps -> excluded)
    rows.append((3, base))
    # user 4: two events at the SAME instant -> gap 0, B NULL
    rows.append((4, base))
    rows.append((4, base))
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(np.array([r[1] for r in rows], "datetime64[us]"),
                       pa.timestamp("us")),
    })
    out = (
        interarrival_burstiness(ray.data.from_arrow(t).repartition(3))
        .to_pandas().set_index("user_id")
    )
    assert 3 not in out.index
    assert out.loc[1, "burstiness"] == -1.0
    assert out.loc[1, "mean_gap_s"] == 10.0
    assert out.loc[2, "burstiness"] > 0.4
    assert np.isnan(out.loc[4, "burstiness"])
    assert out.loc[4, "n_gaps"] == 1


def test_baseline_codecs_round_trip():
    """The real codecs invert synth_decodable_payloads exactly: every
    decoded pixel/sample equals the closed-form formula (PNG goes
    through actual zlib inflate + unfilter; BMP through stride/padding
    and BGR->RGB; WAV through PCM16)."""
    import numpy as np

    from debezium_incubator_ray.functions.multimodal import (
        decode_payload, synth_decodable_payloads,
    )

    ids = np.arange(120, dtype=np.int64)
    payloads = synth_decodable_payloads(ids)
    for d in ids:
        d = int(d)
        kind, s = d % 4, d // 4
        arr = decode_payload(payloads[d].as_py())
        if kind in (0, 1):
            w, h = s % 13 + 1, s % 11 + 1
            r, c, ch = np.meshgrid(np.arange(h), np.arange(w),
                                   np.arange(3), indexing="ij")
            expect = ((7 * r + 11 * c + 13 * ch + s) % 256).astype(
                np.uint8
            )
            assert arr.shape == (h, w, 3)
            assert (arr == expect).all(), d
        elif kind == 3:
            # grayscale baseline JPEG: DC-only blocks decode to the
            # constant clip(128 + 2*dc) per block (q0 = 16)
            bw, bh = s % 3 + 1, s % 2 + 1
            assert arr.shape == (bh * 8, bw * 8)
            for by in range(bh):
                for bx in range(bw):
                    dc = ((5 * by + 3 * bx + s) % 201) - 100
                    want = min(255, max(0, 128 + 2 * dc))
                    blk = arr[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
                    assert (blk == want).all(), (d, by, bx)
        else:
            n = s % 200 + 1
            expect = ((17 * np.arange(n) + s) % 65536) - 32768
            assert arr.shape == (n, 1)
            assert (arr.ravel() == expect).all(), d


def test_png_decoder_all_filters():
    """decode_png_baseline reconstructs sub/up/avg/paeth rows — each
    encoded against the RECONSTRUCTED (mod-256) predictors, as the
    spec requires."""
    import struct
    import zlib

    import numpy as np

    from debezium_incubator_ray.functions.multimodal import (
        decode_png_baseline,
    )

    w, h, chn = 5, 4, 3
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (h, w, chn), dtype=np.uint8)

    def paeth(a, b, c):
        p = a + b - c
        pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
        return a if pa_ <= pb and pa_ <= pc_ else (b if pb <= pc_ else c)

    rows = []
    prev = np.zeros(w * chn, np.int64)
    for r in range(h):
        line = img[r].ravel().astype(np.int64)
        f = [1, 2, 3, 4][r]
        raw = np.empty_like(line)
        for x in range(len(line)):
            left = line[x - chn] if x >= chn else 0
            up = prev[x]
            ul = prev[x - chn] if x >= chn else 0
            if f == 1:
                raw[x] = line[x] - left
            elif f == 2:
                raw[x] = line[x] - up
            elif f == 3:
                raw[x] = line[x] - (left + up) // 2
            else:
                raw[x] = line[x] - paeth(int(left), int(up), int(ul))
        rows.append(np.concatenate(([f], raw & 0xFF)).astype(np.uint8))
        prev = line
    scan = np.concatenate(rows).tobytes()

    def chunk(t, b):
        return (struct.pack(">I", len(b)) + t + b
                + struct.pack(">I", zlib.crc32(t + b)))

    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(scan)) + chunk(b"IEND", b""))
    assert (decode_png_baseline(png) == img).all()


def test_codec_error_paths():
    """Unsupported containers raise NotImplementedError naming the
    integration point; corrupt payloads raise ValueError."""
    import pytest

    from debezium_incubator_ray.functions.multimodal import (
        decode_audio, decode_image, decode_payload,
    )

    with pytest.raises(NotImplementedError):
        decode_image(b"RIFF\x00\x00\x00\x00WEBPVP8 " + b"\x00" * 32)
    with pytest.raises(ValueError):
        # JPEG decodes for REAL now — garbage after SOI is corruption
        decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 40)
    with pytest.raises(NotImplementedError):
        decode_payload(b"\x00" * 64)
    with pytest.raises(ValueError):
        decode_audio(b"RIFF\x00\x00\x00\x00WAVE")  # no fmt/data


def test_resize_image_real_box_average():
    """ResizeImage really decodes and box-averages: every thumbnail
    byte equals the integer-exact cell mean recomputed from the
    closed-form pixel formulas (no decoder on the expected side), and
    non-image payloads yield NULL thumbs."""
    import numpy as np

    from debezium_incubator_ray.functions.multimodal import (
        ResizeImage, synth_decodable_payloads,
    )

    ids = np.array([0, 1, 4, 5, 40, 41, 2], np.int64)  # 6 png/bmp + 1 wav
    t = pa.table({
        "doc_id": pa.array(ids),
        "payload": synth_decodable_payloads(ids),
    })
    out = ResizeImage(side=4)(t)
    assert out["thumb_dims"].to_pylist()[:-1] == [[4, 4]] * 6
    assert out["thumb"].to_pylist()[-1] is None  # wav -> NULL
    for row, d in enumerate(ids[:-1]):
        d = int(d)
        s = d // 4
        w, h = s % 13 + 1, s % 11 + 1
        r, c, ch = np.meshgrid(np.arange(h), np.arange(w),
                               np.arange(3), indexing="ij")
        px = ((7 * r + 11 * c + 13 * ch + s) % 256).astype(np.int64)
        gray = px.sum(axis=2)
        expect = np.empty((4, 4), np.uint8)
        for i in range(4):
            for j in range(4):
                rlo, rhi = i * h // 4, max(i * h // 4 + 1, (i + 1) * h // 4)
                clo, chi = j * w // 4, max(j * w // 4 + 1, (j + 1) * w // 4)
                cell = gray[rlo:rhi, clo:chi]
                expect[i, j] = (int(cell.sum()) // cell.size) // 3
        got = np.frombuffer(out["thumb"].to_pylist()[row], np.uint8)
        assert (got == expect.ravel()).all(), d


def test_dup_tile_coverage_hand_fixture(ray_session):
    """Hand-computable tiles (L=4): doc 1 = 'aaaabbbbcccc' (tiles aaaa,
    bbbb, cccc), doc 2 = 'bbbbXXXXbbbb' (bbbb duplicated across AND
    within docs -> both its sites count), doc 3 shorter than one tile
    emits no row; the ragged tail is dropped."""
    from debezium_incubator_ray.functions.dedup import dup_tile_coverage

    t = pa.table({
        "doc_id": [1, 2, 3, 4],
        "text": ["aaaabbbbcccc", "bbbbXXXXbbbb", "zzz", "ccccqq"],
    })
    out = (
        dup_tile_coverage(ray.data.from_arrow(t), tile=4)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [1, 2, 4]
    # doc 1: aaaa unique, bbbb dup (3 sites), cccc dup (with doc 4)
    # doc 2: bbbb x2 dup, XXXX unique; doc 4: cccc dup, 'qq' tail dropped
    assert out["n_tiles"].tolist() == [3, 3, 1]
    assert out["n_dup_tiles"].tolist() == [2, 2, 1]
    assert out["dup_frac"].tolist() == [0.666667, 0.666667, 1.0]


def test_first_per_window_hand_fixture(ray_session):
    """Two users, one window column: first by (ts, id) survives with the
    window's total count; null keys drop; ties break by id."""
    from debezium_incubator_ray.functions.windows import first_per_window

    t = pa.table({
        "u": [1, 1, 1, 2, 2, None, 1],
        "w": [10, 10, 11, 10, 10, 10, 10],
        "ts": [5, 3, 9, 7, 7, 1, 3],
        "id": [100, 101, 102, 103, 104, 105, 106],
    })
    out = (
        first_per_window(ray.data.from_arrow(t), ["u", "w"], ["ts", "id"])
        .to_pandas().sort_values(["u", "w"]).reset_index(drop=True)
    )
    # u=1 w=10: rows (ts,id) = (5,100),(3,101),(3,106) -> first (3,101), n=3
    # u=1 w=11: (9,102) n=1; u=2 w=10: (7,103),(7,104) -> tie by id -> 103
    assert out[["u", "w", "id", "win_n"]].values.tolist() == [
        [1, 10, 101, 3], [1, 11, 102, 1], [2, 10, 103, 2]]
