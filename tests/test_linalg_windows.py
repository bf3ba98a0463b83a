"""Tests for the linear-algebra partials (gram/covariance/power
iteration) and the new windowed analytics (retention cohorts, categorical
pivot, bigram top-k) against local numpy/pandas oracles."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data


@pytest.fixture(scope="module")
def emb_ds():
    rng = np.random.default_rng(7)
    X = rng.normal(size=(200, 8)).astype(np.float32)
    t = pa.table({
        "vec_id": pa.array(np.arange(200, dtype=np.int64)),
        "embedding": pa.array(list(X), pa.list_(pa.float32())),
    })
    return X.astype(np.float64), ray.data.from_arrow(t).repartition(5)


def test_gram_matrix_matches_numpy(emb_ds):
    from debezium_incubator_ray.functions.linalg import gram_matrix

    X, ds = emb_ds
    out = gram_matrix(ds).to_pandas()
    G = X.T @ X
    assert len(out) == 8 * 9 // 2
    for _, r in out.iterrows():
        assert abs(r["gram"] - G[int(r["i"]), int(r["j"])]) < 1e-8


def test_covariance_matches_numpy(emb_ds):
    from debezium_incubator_ray.functions.linalg import covariance_matrix

    X, ds = emb_ds
    out = covariance_matrix(ds).to_pandas()
    C = np.cov(X, rowvar=False, ddof=1)
    for _, r in out.iterrows():
        assert abs(r["cov"] - C[int(r["i"]), int(r["j"])]) < 1e-8


def test_top_eigvec_power_iteration(emb_ds):
    from debezium_incubator_ray.functions.linalg import top_eigvec

    X, ds = emb_ds
    v = top_eigvec(ds, iters=200)
    G = X.T @ X
    w, V = np.linalg.eigh(G)
    ref = V[:, -1]
    # direction match up to sign
    assert abs(abs(float(v @ ref)) - 1.0) < 1e-6


def test_gram_null_and_ragged_embeddings():
    from debezium_incubator_ray.functions.linalg import (
        covariance_matrix, gram_matrix,
    )

    X = np.arange(12, dtype=np.float64).reshape(3, 4)
    t = pa.table({
        "vec_id": pa.array([0, 1, 2, 3], pa.int64()),
        "embedding": pa.array(
            [list(X[0]), None, list(X[1]), list(X[2])],
            pa.list_(pa.float32()),
        ),
    })
    ds = ray.data.from_arrow(t)
    out = gram_matrix(ds).to_pandas()
    G = X.T @ X
    for _, r in out.iterrows():
        assert abs(r["gram"] - G[int(r["i"]), int(r["j"])]) < 1e-6
    # covariance: n counts only the 3 non-null rows
    C = np.cov(X, rowvar=False, ddof=1)
    cov = covariance_matrix(ds).to_pandas()
    for _, r in cov.iterrows():
        assert abs(r["cov"] - C[int(r["i"]), int(r["j"])]) < 1e-6
    ragged = pa.table({
        "vec_id": pa.array([0, 1], pa.int64()),
        "embedding": pa.array([[1.0, 2.0], [1.0, 2.0, 3.0]],
                              pa.list_(pa.float32())),
    })
    with pytest.raises(Exception, match="ragged"):
        gram_matrix(ray.data.from_arrow(ragged))


def test_top_eigvec_zero_first_coordinate():
    from debezium_incubator_ray.functions.linalg import top_eigvec

    rng = np.random.default_rng(9)
    X = rng.normal(size=(50, 4))
    X[:, 0] = 0.0  # dead dimension: e_0 start would go NaN
    t = pa.table({
        "vec_id": pa.array(np.arange(50, dtype=np.int64)),
        "embedding": pa.array(list(X.astype(np.float32)),
                              pa.list_(pa.float32())),
    })
    v = top_eigvec(ray.data.from_arrow(t), iters=200)
    assert not np.isnan(v).any()
    G = X.T @ X
    w, V = np.linalg.eigh(G)
    assert abs(abs(float(v @ V[:, -1])) - 1.0) < 1e-6


def test_bigram_topk_case_sensitive():
    from debezium_incubator_ray.functions.text import bigram_topk

    t = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["The cat the cat", "the cat"]),
    })
    out = bigram_topk(ray.data.from_arrow(t), k=10).to_pandas()
    got = {(r.w1, r.w2): r.cnt for r in out.itertuples(index=False)}
    # case-sensitive: 'The cat' and 'the cat' are distinct bigrams
    assert got == {("the", "cat"): 2, ("The", "cat"): 1, ("cat", "the"): 1}


def test_bigram_topk_counts():
    from debezium_incubator_ray.functions.text import bigram_topk

    texts = ["a b a b c", "b c b c", "a b", "", "  ", "x"]
    t = pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts),
    })
    out = bigram_topk(ray.data.from_arrow(t).repartition(3), k=3).to_pandas()
    # exhaustive counts: (a,b)=3 (b,a)=1 (b,c)=3 (c,b)=1
    out = out.sort_values(["cnt", "w1", "w2"],
                          ascending=[False, True, True]).reset_index(drop=True)
    assert list(map(tuple, out.values)) == [
        ("a", "b", 3), ("b", "c", 3), ("b", "a", 1)]


def test_copurchase_pairs_counts():
    from debezium_incubator_ray.functions.joins import copurchase_pairs

    # orders: {1,2,3}, {1,2}, {2,3}, {4}; duplicate item in a group counts once
    g = [10, 10, 10, 11, 11, 12, 12, 13, 10]
    it = [1, 2, 3, 1, 2, 2, 3, 4, 2]
    t = pa.table({
        "okey": pa.array(g, pa.int64()),
        "item": pa.array(it, pa.int64()),
    })
    out = copurchase_pairs(
        ray.data.from_arrow(t).repartition(3), "okey", "item", k=10
    ).to_pandas()
    got = {(r.item_a, r.item_b): r.cnt for r in out.itertuples(index=False)}
    assert got == {(1, 2): 2, (2, 3): 2, (1, 3): 1}
    # k cuts with (cnt desc, a, b) tie-break
    top = copurchase_pairs(
        ray.data.from_arrow(t), "okey", "item", k=2
    ).to_pandas()
    assert [(r.item_a, r.item_b) for r in top.itertuples(index=False)] == [
        (1, 2), (2, 3)]
    # string group ids (sessions/baskets) route via stable_hash, not an
    # int cast
    ts = pa.table({
        "okey": pa.array([f"s{x}" for x in g]),
        "item": pa.array(it, pa.int64()),
    })
    got_s = copurchase_pairs(
        ray.data.from_arrow(ts).repartition(2), "okey", "item", k=10
    ).to_pandas()
    assert {(r.item_a, r.item_b): r.cnt
            for r in got_s.itertuples(index=False)} == got


def test_deterministic_shuffle_is_reproducible_permutation():
    from debezium_incubator_ray.functions.sample import deterministic_shuffle

    ids = np.arange(500, dtype=np.int64)
    t = pa.table({"doc_id": pa.array(ids)})
    a = deterministic_shuffle(
        ray.data.from_arrow(t).repartition(7)
    ).to_pandas()
    b = deterministic_shuffle(
        ray.data.from_arrow(t).repartition(2)
    ).to_pandas()
    # same global order at any parallelism
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    # a real shuffle (not identity), sorted by perm, and a bijection
    assert a["doc_id"].tolist() != ids.tolist()
    assert a["perm"].is_monotonic_increasing
    assert a["perm"].nunique() == 500


def test_weighted_sample_topk_properties():
    from debezium_incubator_ray.functions.sample import weighted_sample_topk

    rng = np.random.default_rng(21)
    n = 400
    t = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "w": pa.array(
            np.where(np.arange(n) % 7 == 0, 0.0,
                     rng.integers(1, 500, n).astype(float))
        ),
    })
    a = weighted_sample_topk(
        ray.data.from_arrow(t).repartition(5), "w", k=50, id_col="doc_id"
    ).to_pandas()
    b = weighted_sample_topk(
        ray.data.from_arrow(t).repartition(2), "w", k=50, id_col="doc_id"
    ).to_pandas()
    # identical sample at any parallelism; zero-weight rows never qualify
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])
    assert len(a) == 50 and (a["w"] > 0).all()
    # matches the direct A-Res computation
    ids = np.arange(n, dtype=np.uint64)
    mod, mult, seed = 2147483647, 2654435761, 12345
    u = ((ids % mod) * (mult % mod) + seed) % mod / float(mod)
    w = t["w"].to_numpy()
    key = np.where(w > 0, np.log(u) / np.where(w > 0, w, 1.0), -np.inf)
    order = np.lexsort((ids, -key))
    exp = set(int(i) for i in order[:50])
    assert set(int(i) for i in a["doc_id"]) == exp


def test_markov_transitions_pandas_oracle():
    from debezium_incubator_ray.functions.windows import markov_transitions

    rng = np.random.default_rng(23)
    n = 800
    users = rng.integers(0, 30, n)
    types = np.array(["x", "y", "z"])[rng.integers(0, 3, n)]
    t = pa.table({
        "user_id": pa.array(users, pa.int64()),
        "event_type": pa.array(types),
        "event_id": pa.array(rng.permutation(n).astype(np.int64)),
    })
    out = markov_transitions(
        ray.data.from_arrow(t).repartition(4)
    ).to_pandas()
    df = pd.DataFrame({
        "u": users, "ty": types,
        "eid": t["event_id"].to_numpy(),
    }).sort_values(["u", "eid"])
    df["prev"] = df.groupby("u")["ty"].shift(1)
    ref = (df.dropna(subset=["prev"])
           .groupby(["prev", "ty"]).size().rename("cnt").reset_index())
    got = {(r.prev_type, r.next_type): r.cnt
           for r in out.itertuples(index=False)}
    exp = {(r.prev, r.ty): r.cnt for r in ref.itertuples(index=False)}
    assert got == exp


def test_retention_cohorts_pandas_oracle():
    from debezium_incubator_ray.functions.windows import retention_cohorts

    rng = np.random.default_rng(3)
    n = 500
    ts = pd.Timestamp("2024-01-01") + pd.to_timedelta(
        rng.integers(0, 60 * 86400, n), unit="s")
    users = rng.integers(0, 40, n)
    t = pa.table({
        "user_id": pa.array(users, pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
    })
    out = retention_cohorts(ray.data.from_arrow(t).repartition(4)).to_pandas()

    df = pd.DataFrame({"user_id": users, "ts": ts})
    df["week"] = (df["ts"] - pd.to_timedelta(
        df["ts"].dt.dayofweek, unit="D")).dt.strftime("%Y-%m-%d")
    uw = df[["user_id", "week"]].drop_duplicates()
    cohort = uw.groupby("user_id")["week"].min().rename("cohort_week")
    ref = (uw.join(cohort, on="user_id")
           .groupby(["cohort_week", "week"]).size().rename("n_users")
           .reset_index())
    m = out.sort_values(["cohort_week", "week"]).reset_index(drop=True)
    r = ref.sort_values(["cohort_week", "week"]).reset_index(drop=True)
    assert m["cohort_week"].tolist() == r["cohort_week"].tolist()
    assert m["n_users"].tolist() == r["n_users"].tolist()


def test_pivot_counts_explicit_and_derived_types():
    from debezium_incubator_ray.functions.windows import pivot_counts

    rng = np.random.default_rng(5)
    keys = rng.integers(0, 20, 300)
    cats = np.array(["x", "y", "z"])[rng.integers(0, 3, 300)]
    t = pa.table({
        "user_id": pa.array(keys, pa.int64()),
        "event_type": pa.array(cats),
    })
    ds = ray.data.from_arrow(t).repartition(4)
    ref = pd.crosstab(keys, cats)

    for types in (["x", "y", "z"], None):
        out = pivot_counts(ds, types=types).to_pandas()
        out = out.sort_values("user_id").reset_index(drop=True)
        assert list(out.columns) == ["user_id", "n_x", "n_y", "n_z"]
        for c in "xyz":
            assert out["n_" + c].tolist() == ref[c].tolist()


def test_lag_gap_stats_matches_pandas():
    from debezium_incubator_ray.functions.windows import lag_gap_stats

    rng = np.random.default_rng(11)
    n = 400
    users = rng.integers(0, 40, n)
    # one single-event user (id 99) must emit NO row
    users[0] = 99
    users[1:][users[1:] == 99] = 1
    order = rng.permutation(n).astype(np.int64)
    ts_us = rng.integers(0, 10**9, n) * np.int64(1_000)
    t = pa.table({
        "user_id": pa.array(users, pa.int64()),
        "ts": pa.array(ts_us, pa.timestamp("us")),
        "event_id": pa.array(order),
    })
    out = (
        lag_gap_stats(ray.data.from_arrow(t).repartition(6), buckets=8)
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    )

    df = pd.DataFrame({"user_id": users, "us": ts_us, "event_id": order})
    df = df.sort_values(["user_id", "event_id"])
    df["gap"] = df.groupby("user_id")["us"].diff()
    ref = (
        df.dropna(subset=["gap"]).groupby("user_id")["gap"]
        .agg(n_gaps="count", sum_gap_us="sum", max_gap_us="max")
        .reset_index()
    )
    assert 99 not in set(out["user_id"])
    assert out["user_id"].tolist() == ref["user_id"].tolist()
    assert out["n_gaps"].tolist() == ref["n_gaps"].astype(int).tolist()
    assert out["sum_gap_us"].tolist() == ref["sum_gap_us"].astype(int).tolist()
    assert out["max_gap_us"].tolist() == ref["max_gap_us"].astype(int).tolist()


def test_shuffle_join_left_anti():
    from debezium_incubator_ray.functions.joins import shuffle_join

    left = pa.table({
        "k": pa.array(np.arange(50, dtype=np.int64)),
        "v": pa.array(np.arange(50, dtype=np.int64) * 10),
    })
    right = pa.table({
        "rk": pa.array(np.repeat(np.arange(0, 50, 2, dtype=np.int64), 3)),
    })
    out = shuffle_join(
        ray.data.from_arrow(left).repartition(4),
        ray.data.from_arrow(right).repartition(3),
        on="k", right_on="rk", join_type="left anti", buckets=8,
    ).to_pandas().sort_values("k").reset_index(drop=True)
    assert out["k"].tolist() == list(range(1, 50, 2))
    assert out["v"].tolist() == [k * 10 for k in range(1, 50, 2)]
    assert list(out.columns) == ["k", "v"]


def test_quantize_int8_stats_matches_numpy(emb_ds):
    from debezium_incubator_ray.functions.linalg import quantize_int8_stats

    X, ds = emb_ds
    out = (
        quantize_int8_stats(ds).to_pandas()
        .sort_values("i").reset_index(drop=True)
    )
    lo, hi = X.min(axis=0), X.max(axis=0)
    codes = np.clip(np.floor((X - lo) / (hi - lo) * 255 + 0.5), 0, 255)
    assert out["i"].tolist() == list(range(8))
    assert np.allclose(out["lo"], np.round(lo, 6))
    assert np.allclose(out["hi"], np.round(hi, 6))
    assert np.allclose(out["avg_code"], np.round(codes.mean(axis=0), 6))


def test_hashed_feature_counts_exact():
    from debezium_incubator_ray.functions.text import hashed_feature_counts
    from debezium_incubator_ray.functions.tokens import md5_u64

    texts = ["the cat sat", "THE the dog", "", "   ", "one"]
    t = pa.table({"text": pa.array(texts)})
    out = (
        hashed_feature_counts(ray.data.from_arrow(t).repartition(3),
                              buckets=8)
        .to_pandas().sort_values("bucket").reset_index(drop=True)
    )
    toks = [w for s in texts for w in s.strip().lower().split()]
    h = md5_u64(pa.array(toks)) % np.uint64(8)
    ref = pd.Series(h.astype(np.int64)).value_counts().sort_index()
    assert out["bucket"].tolist() == ref.index.tolist()
    assert out["n_tokens"].tolist() == ref.tolist()
    assert out["n_tokens"].sum() == 7


def test_shuffle_join_full_outer():
    from debezium_incubator_ray.functions.joins import shuffle_join

    left = pa.table({
        "k": pa.array([1, 2, 3], pa.int64()),
        "lv": pa.array([10, 20, 30], pa.int64()),
    })
    right = pa.table({
        "k": pa.array([2, 3, 4], pa.int64()),
        "rv": pa.array([200, 300, 400], pa.int64()),
    })
    out = shuffle_join(
        ray.data.from_arrow(left).repartition(2),
        ray.data.from_arrow(right).repartition(2),
        on="k", join_type="full outer", buckets=4,
    ).to_pandas().sort_values("k").reset_index(drop=True)
    assert out["k"].tolist() == [1, 2, 3, 4]
    assert out["lv"].fillna(-1).tolist() == [10, 20, 30, -1]
    assert out["rv"].fillna(-1).tolist() == [-1, 200, 300, 400]


def test_window_pair_stats_boundaries():
    import ray.data
    from debezium_incubator_ray.functions.windows import window_pair_stats

    # user 1: view at t=100; purchases at 100 (excluded: strict >),
    # 150 and 200 (in, window=100 inclusive), 201 (out).
    # user 2: purchase-only (no pairs). user 3: view at t very close to
    # the stripe end, its window must clamp inside its own stripe and
    # never probe user 4's purchases.
    rows = [
        (1, 100, "view"), (1, 100, "purchase"), (1, 150, "purchase"),
        (1, 200, "purchase"), (1, 201, "purchase"),
        (2, 50, "purchase"),
        (3, 999, "view"),
        (4, 1000, "purchase"), (4, 1001, "purchase"),
        (5, 10, "view"), (5, 60, "purchase"), (5, 110, "purchase"),
        (1, 999, "click"),
    ]
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows]),
    })
    out = (
        window_pair_stats(
            ray.data.from_arrow(t).repartition(3),
            "user_id", "ts", "event_type", "view", "purchase",
            window_us=100, buckets=1,  # buckets=1: all users one stripe run
        )
        .to_pandas().set_index("k").sort_index()
    )
    assert list(out.index) == [1, 5]
    assert int(out.loc[1, "n_pairs"]) == 2
    assert int(out.loc[1, "min_delay_us"]) == 50
    assert int(out.loc[1, "max_delay_us"]) == 100
    assert int(out.loc[5, "n_pairs"]) == 2
    assert int(out.loc[5, "min_delay_us"]) == 50
    assert int(out.loc[5, "max_delay_us"]) == 100


def test_bloom_semi_join_exact_with_tiny_filter():
    import ray.data
    from debezium_incubator_ray.functions.joins import bloom_semi_join

    # bits_log2=6 (64 bits) for 20 right keys forces false positives
    # through the prefilter; the exact semi join must still kill them
    left = pa.table({
        "k": pa.array(list(range(200)), pa.int64()),
        "v": pa.array(list(range(200)), pa.int64()),
    })
    right = pa.table({"rk": pa.array(list(range(0, 40, 2)), pa.int64())})
    out = bloom_semi_join(
        ray.data.from_arrow(left).repartition(4),
        ray.data.from_arrow(right).repartition(2),
        on="k", right_on="rk", bits_log2=6, buckets=4,
    ).to_pandas()
    assert sorted(out["k"]) == list(range(0, 40, 2))


def test_rolling_distinct_window_and_gap_days():
    import ray.data
    from debezium_incubator_ray.functions.windows import rolling_distinct

    day = 86_400_000_000
    # users 1,2 on day 0; user 2 again day 2; user 3 day 10 (gap: days
    # 3-9 have no events and must NOT be emitted)
    ts = pa.array([0, 1000, 2 * day, 10 * day], pa.timestamp("us"))
    uid = pa.array([1, 2, 2, 3], pa.int64())
    out = (
        rolling_distinct(
            ray.data.from_arrow(pa.table({"ts": ts, "user_id": uid}))
            .repartition(2),
            "ts", "user_id", window_days=7, buckets=4,
        )
        .to_pandas()
    )
    out["d"] = (out["day"].astype("int64") // day).astype(int)
    got = dict(zip(out["d"], out["n_ids"]))
    # day 0: {1,2}; day 2: {1,2} (day-0 events still inside 7-day
    # trailing window); day 10: {3} only (day-2 event is 8 days back)
    assert got == {0: 2, 2: 2, 10: 1}


def test_time_in_state_manual():
    import numpy as np
    import pyarrow as pa
    import ray.data
    from debezium_incubator_ray.functions.windows import time_in_state

    base = np.datetime64("2024-06-01T00:00:00", "us")
    h = lambda k: base + np.timedelta64(k, "h")
    # user 1: A@0h -> B@2h -> A@3h, end censors A at max ts (5h, user 2)
    # user 2: B@1h -> B@5h (5h is the global max -> last interval 0)
    rows = [
        (1, h(0), 1, "A"), (1, h(2), 2, "B"), (1, h(3), 3, "A"),
        (2, h(1), 4, "B"), (2, h(5), 5, "B"),
    ]
    t = pa.table({
        "u": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "i": pa.array([r[2] for r in rows], pa.int64()),
        "s": pa.array([r[3] for r in rows]),
    })
    out = time_in_state(
        ray.data.from_arrow(t).repartition(3), "u", "ts", "s", "i"
    ).to_pandas().set_index("state")
    # A: [0,2)=2h + [3,5)=2h = 4h over 2 intervals
    # B: [2,3)=1h + [1,5)=4h + [5,5)=0h = 5h over 3 intervals
    assert out.loc["A", "n_intervals"] == 2
    assert out.loc["A", "total_hours"] == 4.0
    assert out.loc["B", "n_intervals"] == 3
    assert out.loc["B", "total_hours"] == 5.0


def test_rfm_segments_small():
    import numpy as np
    import pyarrow as pa
    import ray.data
    from debezium_incubator_ray.functions.windows import rfm_segments

    d = lambda s: np.datetime64(s, "us")
    # 4 customers with strictly increasing freq/monetary and strictly
    # decreasing recency -> each lands in its own quartile on every axis
    rows = []
    for c, (nord, price, last) in enumerate([
        (1, 10.0, "2024-01-01"), (2, 20.0, "2024-02-01"),
        (3, 30.0, "2024-03-01"), (4, 40.0, "2024-04-01"),
    ], start=1):
        for k in range(nord):
            rows.append((c, d(last), price))
    t = pa.table({
        "o_custkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_orderdate": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "o_totalprice": pa.array([r[2] for r in rows]),
    })
    out = rfm_segments(ray.data.from_arrow(t).repartition(2)).to_pandas()
    assert len(out) == 4 and out["n_customers"].sum() == 4
    # customer 4: most orders, highest spend, most recent -> r=1, f=4, m=4
    top = out[(out["f_code"] == 4) & (out["m_code"] == 4)]
    assert len(top) == 1 and top["r_code"].iloc[0] == 1
    # customer 1: oldest, fewest, cheapest -> r=4, f=1, m=1
    bot = out[(out["f_code"] == 1) & (out["m_code"] == 1)]
    assert len(bot) == 1 and bot["r_code"].iloc[0] == 4


def test_peak_concurrency_manual():
    import numpy as np
    import pyarrow as pa
    import ray.data
    from debezium_incubator_ray.functions.windows import peak_concurrency

    base = np.datetime64("2024-06-01T00:00:00", "us")
    m = lambda k: base + np.timedelta64(k, "m")
    # u1 session [0, 10]; u2 session [5, 20]; u3 session [10, 12]
    # (overlaps BOTH at t=10: closed intervals -> peak 3); u1's second
    # session [120, 125] after a >30min gap overlaps nothing
    rows = [
        (1, m(0)), (1, m(10)),
        (2, m(5)), (2, m(20)),
        (3, m(10)), (3, m(12)),
        (1, m(120)), (1, m(125)),
    ]
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "value": pa.array([1.0] * len(rows)),
    })
    out = peak_concurrency(
        ray.data.from_arrow(t).repartition(3), buckets=4
    ).to_pandas()
    assert out["n_sessions"][0] == 4
    assert out["peak_concurrency"][0] == 3
