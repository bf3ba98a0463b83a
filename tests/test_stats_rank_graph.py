"""Unit tests (local numpy/pandas oracles) for the moment-sum statistics
operators, percent_rank, pagerank, mad_outliers and the attribution /
EWMA windows — previously covered only by the DuckDB-oracle sweep — plus
the edge cases around all-NULL columns and >256-dimension embeddings.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data


@pytest.fixture(scope="module")
def events_df():
    rng = np.random.default_rng(11)
    n = 3000
    df = pd.DataFrame({
        "user_id": rng.integers(0, 40, n),
        "event_type": rng.choice(list("abcde"), n),
        "event_id": np.arange(n, dtype=np.int64),
        "value": rng.normal(50.0, 10.0, n),
    })
    return df


def events_ds(df):
    return ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(7)


def test_group_entropy_matches_manual(events_df):
    from debezium_incubator_ray.functions.stats import group_entropy

    out = group_entropy(
        events_ds(events_df), "user_id", "event_type"
    ).to_pandas().set_index("user_id").sort_index()

    for uid, g in events_df.groupby("user_id"):
        c = g["event_type"].value_counts().to_numpy().astype(float)
        p = c / c.sum()
        h = float(-(p * np.log(p)).sum())
        row = out.loc[uid]
        assert int(row["n_events"]) == len(g)
        assert int(row["n_types"]) == len(c)
        assert abs(row["entropy"] - h) < 1e-9


def test_group_regression_matches_numpy(events_df):
    from debezium_incubator_ray.functions.stats import group_regression

    df = events_df.copy()
    df["x"] = df["event_id"].astype(float)
    df["y"] = 2.5 * df["x"] + df["value"]
    out = group_regression(
        events_ds(df), "event_type", "x", "y"
    ).to_pandas().set_index("event_type").sort_index()

    for et, g in df.groupby("event_type"):
        slope, intercept = np.polyfit(g["x"], g["y"], 1)
        corr = np.corrcoef(g["x"], g["y"])[0, 1]
        row = out.loc[et]
        assert int(row["n"]) == len(g)
        assert abs(row["slope"] - slope) < 1e-6
        assert abs(row["intercept"] - intercept) < 1e-3
        assert abs(row["corr"] - corr) < 1e-9


def test_benford_digits_matches_manual(events_df):
    from debezium_incubator_ray.functions.stats import benford_digits

    df = events_df.copy()
    # spread magnitudes so several leading digits occur
    df["value"] = np.exp(df["value"] / 10.0)
    out = benford_digits(events_ds(df), "value").to_pandas()
    out = out.set_index("digit").sort_index()

    x = df["value"].to_numpy()
    x = x[x > 0]
    digit = np.floor(x / np.power(10.0, np.floor(np.log10(x)))).astype(int)
    cnt = np.bincount(digit, minlength=10)[1:10]
    total = cnt.sum()
    for d in range(1, 10):
        row = out.loc[d]
        assert int(row["cnt"]) == cnt[d - 1]
        assert abs(row["share"] - cnt[d - 1] / total) < 1e-12
        assert abs(row["expected"] - np.log10(1 + 1 / d)) < 1e-12


def test_group_generalized_means(events_df):
    from debezium_incubator_ray.functions.stats import (
        group_generalized_means,
    )

    df = events_df.copy()
    df["value"] = np.abs(df["value"]) + 1.0  # strictly positive
    out = group_generalized_means(
        events_ds(df), "event_type", "value"
    ).to_pandas().set_index("event_type").sort_index()

    for et, g in df.groupby("event_type"):
        v = g["value"].to_numpy()
        row = out.loc[et]
        assert int(row["n"]) == len(v)
        assert abs(row["mean_arith"] - v.mean()) < 1e-9
        assert abs(row["mean_geom"] - np.exp(np.log(v).mean())) < 1e-9
        assert abs(row["mean_harm"] - len(v) / (1.0 / v).sum()) < 1e-9


def test_percent_rank_matches_pandas(events_df):
    from debezium_incubator_ray.functions.rank import percent_rank

    out = percent_rank(
        events_ds(events_df), "value", n_buckets=32
    ).to_pandas().sort_values("event_id").reset_index(drop=True)
    df = events_df.sort_values("event_id").reset_index(drop=True)
    n = len(df)
    expect = (df["value"].rank(method="min") - 1) / (n - 1)
    assert len(out) == n
    assert np.allclose(out["pr"].to_numpy(), expect.to_numpy(), atol=1e-12)


def test_percent_rank_degenerate_constant_column():
    from debezium_incubator_ray.functions.rank import percent_rank

    t = pa.table({"id": pa.array(range(10)),
                  "v": pa.array([7.0] * 10)})
    out = percent_rank(ray.data.from_arrow(t), "v").to_pandas()
    # all tied at the minimum rank -> pr 0 for every row
    assert np.allclose(out["pr"].to_numpy(), 0.0)


def test_global_min_max_all_null_raises():
    from debezium_incubator_ray.functions.quality import global_min_max

    t = pa.table({"v": pa.array([None, None, None], pa.float64())})
    with pytest.raises(ValueError, match="no non-NULL"):
        global_min_max(ray.data.from_arrow(t), "v")


def test_equi_bucket_clamps_and_degenerates():
    from debezium_incubator_ray.functions.quality import equi_bucket

    v = np.array([0.0, 2.5, 5.0, 10.0])
    b = equi_bucket(v, 0.0, 10.0, 4)
    assert b.tolist() == [0, 1, 2, 3]  # max clamps into last bucket
    assert equi_bucket(v, 3.0, 3.0, 4).tolist() == [0, 0, 0, 0]


def test_mad_outliers_matches_pandas_and_skips_all_null_group(events_df):
    from debezium_incubator_ray.functions.quality import mad_outliers

    df = events_df.copy()
    # one group entirely NULL: must be OMITTED (SQL WHERE v IS NOT NULL)
    df.loc[df["event_type"] == "e", "value"] = np.nan
    out = mad_outliers(
        events_ds(df), "event_type", "value", k=3.0
    ).to_pandas().set_index("event_type").sort_index()
    assert "e" not in out.index

    for et, g in df[df["event_type"] != "e"].groupby("event_type"):
        v = g["value"].to_numpy()
        med = np.quantile(v, 0.5)
        dev = np.abs(v - med)
        mad = np.quantile(dev, 0.5)
        n_out = int((dev > 3.0 * 1.4826 * mad).sum())
        row = out.loc[et]
        assert abs(row["median"] - med) < 1e-12
        assert abs(row["mad"] - mad) < 1e-12
        assert int(row["n_outliers"]) == n_out


def test_first_last_per_group_matches_pandas(events_df):
    from debezium_incubator_ray.functions.windows import first_last_per_group

    out = first_last_per_group(
        events_ds(events_df), "user_id", "event_id", "event_type"
    ).to_pandas().set_index("user_id").sort_index()

    g = events_df.sort_values("event_id").groupby("user_id")["event_type"]
    first, last, n = g.first(), g.last(), g.size()
    for uid in n.index:
        row = out.loc[uid]
        assert row["first_value"] == first[uid]
        assert row["last_value"] == last[uid]
        assert int(row["n_events"]) == n[uid]


def test_group_ewma_matches_pandas(events_df):
    from debezium_incubator_ray.functions.windows import group_ewma

    out = group_ewma(
        events_ds(events_df), "user_id", "event_id", "value", alpha=0.2
    ).to_pandas().set_index("user_id").sort_index()

    for uid, g in events_df.sort_values("event_id").groupby("user_id"):
        expect = g["value"].ewm(alpha=0.2, adjust=True).mean().iloc[-1]
        assert abs(out.loc[uid, "ewma"] - expect) < 1e-9
        assert int(out.loc[uid, "n_events"]) == len(g)


def test_pagerank_matches_numpy_power_iteration():
    from debezium_incubator_ray.functions.graph import pagerank

    rng = np.random.default_rng(3)
    n_nodes = 30
    src = rng.integers(0, n_nodes, 200)
    dst = (src + rng.integers(1, n_nodes, 200)) % n_nodes
    # symmetrize so every node has out-degree >= 1; pagerank's contract
    # is a DISTINCT edge set, so dedupe before handing it over
    s = np.concatenate([src, dst, np.arange(n_nodes)])
    d = np.concatenate([dst, src, (np.arange(n_nodes) + 1) % n_nodes])
    pairs = sorted({(int(a), int(b)) for a, b in zip(s, d)})
    edges = ray.data.from_arrow(pa.table({
        "src": pa.array([p[0] for p in pairs], pa.int64()),
        "dst": pa.array([p[1] for p in pairs], pa.int64()),
    })).repartition(4)

    out = pagerank(edges, iters=5, buckets=8).to_pandas()
    out = out.set_index("node").sort_index()
    A = np.zeros((n_nodes, n_nodes))
    for a, b in pairs:
        A[a, b] = 1.0
    deg = A.sum(axis=1)
    r = np.full(n_nodes, 1.0 / n_nodes)
    for _ in range(5):
        r = 0.15 / n_nodes + 0.85 * (A.T @ (r / deg))
    assert len(out) == n_nodes
    assert np.allclose(out["rank"].to_numpy(), r, atol=1e-12)
    assert np.allclose(out["rank_scaled"].to_numpy(), r * n_nodes,
                       atol=1e-10)


def test_quantize_int8_stats_wide_embeddings():
    # regression: the driver-side min/max fold must survive iter_batches
    # re-chunking the d-row partials (d > 256 spans multiple batches)
    from debezium_incubator_ray.functions.linalg import quantize_int8_stats

    rng = np.random.default_rng(5)
    d = 300
    X = rng.normal(size=(40, d))
    t = pa.table({
        "vec_id": pa.array(np.arange(40, dtype=np.int64)),
        "embedding": pa.array(list(X.astype(np.float32)),
                              pa.list_(pa.float32())),
    })
    out = quantize_int8_stats(
        ray.data.from_arrow(t).repartition(5)
    ).to_pandas().sort_values("i").reset_index(drop=True)
    assert len(out) == d
    Xf = X.astype(np.float32).astype(np.float64)
    assert np.allclose(out["lo"].to_numpy(), Xf.min(axis=0))
    assert np.allclose(out["hi"].to_numpy(), Xf.max(axis=0))


def test_grouping_sets_sum_rollup_lattice():
    from debezium_incubator_ray.functions.stats import grouping_sets_sum

    df = pd.DataFrame({
        "a": ["x", "x", "y", "y", "y"],
        "b": ["p", "q", "p", "p", "q"],
        "v": [1.0, 2.0, 3.0, 4.0, 5.0],
    })
    ds = ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(3)

    def derive(t: pa.Table) -> pa.Table:
        return t.select(["a", "b", "v"])

    out = grouping_sets_sum(
        ds, derive, ["a", "b"],
        [(2, ["a", "b"]), (1, ["a"]), (0, [])], level_col="lvl",
    ).to_pandas()

    full = out[out["lvl"] == 2].set_index(["a", "b"])
    for (a, b), g in df.groupby(["a", "b"]):
        assert abs(full.loc[(a, b), "total_value"] - g["v"].sum()) < 1e-9
        assert int(full.loc[(a, b), "n"]) == len(g)
    lvl1 = out[out["lvl"] == 1]
    assert lvl1["b"].isna().all()
    assert abs(
        lvl1.set_index("a").loc["y", "total_value"] - 12.0
    ) < 1e-9
    grand = out[out["lvl"] == 0]
    assert len(grand) == 1
    assert abs(grand["total_value"].iloc[0] - 15.0) < 1e-9
    assert int(grand["n"].iloc[0]) == 5


def test_triangle_count_matches_numpy():
    from debezium_incubator_ray.functions.graph import triangle_count

    rng = np.random.default_rng(2)
    n = 60
    A = rng.random((n, n)) < 0.15
    A = np.triu(A, 1)
    A = A | A.T
    src, dst = np.nonzero(A)
    # feed duplicated/reversed edges + self loops: cleaning is part of
    # the operator's contract
    s = np.concatenate([src, dst, np.arange(5)])
    d = np.concatenate([dst, src, np.arange(5)])
    ds = ray.data.from_arrow(pa.table({
        "src": pa.array(s, pa.int64()), "dst": pa.array(d, pa.int64()),
    })).repartition(4)

    out = triangle_count(ds, buckets=8).to_pydict()
    expect_tri = int(np.trace(np.linalg.matrix_power(
        A.astype(np.int64), 3)) // 6)
    assert out["n_triangles"][0] == expect_tri
    assert out["n_edges"][0] == int(A.sum() // 2)
    assert out["n_nodes"][0] == len(np.unique(np.concatenate([src, dst])))
    deg = A.sum(axis=1)
    expect_w = int((deg * (deg - 1) // 2).sum())
    assert out["n_wedges"][0] == expect_w
    assert abs(out["clustering_coef"][0] - 3.0 * expect_tri / expect_w) \
        < 1e-12


def test_triangle_count_triangle_free():
    from debezium_incubator_ray.functions.graph import triangle_count

    # bipartite graphs have no triangles
    left = np.repeat(np.arange(10), 4)
    right = 100 + (left * 3 + np.tile(np.arange(4), 10)) % 7
    ds = ray.data.from_arrow(pa.table({
        "src": pa.array(left, pa.int64()),
        "dst": pa.array(right, pa.int64()),
    }))
    out = triangle_count(ds, buckets=4).to_pydict()
    assert out["n_triangles"][0] == 0
    assert out["n_edges"][0] > 0


@pytest.fixture(scope="module")
def valued_ds():
    rng = np.random.default_rng(13)
    vals = rng.normal(100, 20, 5000)
    ids = rng.permutation(5000).astype(np.int64)
    t = pa.table({"id": pa.array(ids), "v": pa.array(vals)})
    return vals, ids, ray.data.from_arrow(t).repartition(6)


def test_global_row_number_total_order(valued_ds):
    from debezium_incubator_ray.functions.rank import global_row_number

    vals, ids, ds = valued_ds
    rn = global_row_number(ds, "v", "id", n_buckets=64).to_pandas()
    rn = rn.sort_values("rn").reset_index(drop=True)
    df = pd.DataFrame({"id": ids, "v": vals}).sort_values(
        ["v", "id"]).reset_index(drop=True)
    assert (rn["id"].to_numpy() == df["id"].to_numpy()).all()
    assert (rn["rn"].to_numpy() == np.arange(1, 5001)).all()


def test_global_ntile_fill_rule(valued_ds):
    from debezium_incubator_ray.functions.rank import global_ntile

    vals, ids, ds = valued_ds
    nt = global_ntile(ds, "v", "id", k=7, n_buckets=64).to_pandas()
    nt = nt.sort_values("rn")
    n_total, k = 5000, 7
    size, rem = n_total // k, n_total % k
    tiles = np.concatenate([
        np.full(size + (1 if i < rem else 0), i + 1) for i in range(k)
    ])
    assert (nt["tile"].to_numpy() == tiles).all()


def test_global_quantile_cont_matches_numpy(valued_ds):
    from debezium_incubator_ray.functions.rank import global_quantile_cont

    vals, ids, ds = valued_ds
    qs = [0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]
    qt = global_quantile_cont(ds, "v", qs, n_buckets=64).to_pydict()
    expect = np.quantile(vals, qs, method="linear")
    assert np.allclose(qt["value"], expect, atol=1e-9)


def test_ntile_from_rn_more_tiles_than_rows():
    from debezium_incubator_ray.functions.rank import ntile_from_rn

    rn = np.arange(1, 4)
    assert ntile_from_rn(rn, 3, 10).tolist() == [1, 2, 3]


def test_bfs_hops_matches_queue_bfs():
    from collections import deque

    from debezium_incubator_ray.functions.graph import bfs_hops

    rng = np.random.default_rng(4)
    n = 80
    A = rng.random((n, n)) < 0.04
    A = np.triu(A, 1)
    A = A | A.T
    src, dst = np.nonzero(A)
    ds = ray.data.from_arrow(pa.table({
        "src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64()),
    })).repartition(3)

    seeds = [0, 1, 2]
    out = bfs_hops(ds, seeds, max_hops=4, buckets=8).to_pandas()
    got = {int(r["node"]): int(r["hops"]) for _, r in out.iterrows()}

    dist = np.full(n, -1)
    dq = deque()
    for s in seeds:
        dist[s] = 0
        dq.append(s)
    while dq:
        u = dq.popleft()
        if dist[u] >= 4:
            continue
        for v in np.nonzero(A[u])[0]:
            if dist[v] < 0:
                dist[v] = dist[u] + 1
                dq.append(v)
    expect = {i: int(d) for i, d in enumerate(dist) if 0 <= d <= 4}
    assert got == expect


def test_grouped_percent_rank_matches_pandas_with_ties_and_nulls():
    from debezium_incubator_ray.functions.rank import grouped_percent_rank

    rng = np.random.default_rng(6)
    m = 4000
    df = pd.DataFrame({
        "g": rng.choice(list("abcd"), m),
        "v": np.round(rng.normal(0, 1, m), 2),  # rounding forces ties
        "id": np.arange(m),
    })
    df.loc[rng.choice(m, 50, replace=False), "v"] = np.nan
    ds = ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(5)

    out = grouped_percent_rank(ds, "g", "v", buckets=8).to_pandas()
    out = out.sort_values("id")
    sub = df.dropna(subset=["v"]).sort_values("id")
    expect = sub.groupby("g")["v"].rank(method="min")
    nn = sub.groupby("g")["v"].transform("size")
    expect = (expect - 1) / np.maximum(nn - 1, 1)
    assert len(out) == len(sub)
    assert np.allclose(out["pr"].to_numpy(), expect.to_numpy(), atol=1e-12)


def test_corr_matrix_pairwise_null_masks():
    from debezium_incubator_ray.functions.stats import corr_matrix

    rng = np.random.default_rng(8)
    m = 4000
    df = pd.DataFrame({
        "x": rng.normal(0, 1, m),
        "y": rng.normal(5, 2, m),
        "z": rng.normal(-1, 3, m),
    })
    df.loc[rng.choice(m, 100, replace=False), "y"] = np.nan
    ds = ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(6)

    out = corr_matrix(ds, ["x", "y", "z"]).to_pandas()
    out = out.set_index(["col_a", "col_b"])
    for a, b in [("x", "y"), ("x", "z"), ("y", "z")]:
        s = df[[a, b]].dropna()
        r = np.corrcoef(s[a], s[b])[0, 1]
        assert abs(out.loc[(a, b), "corr"] - r) < 1e-9
        assert int(out.loc[(a, b), "n"]) == len(s)


def test_group_higher_moments_matches_duckdb(events_df):
    import duckdb

    from debezium_incubator_ray.functions.stats import group_higher_moments

    df = events_df.copy()
    df["value"] = df["value"] ** 2  # skewed
    df.loc[df.index[:30], "value"] = np.nan
    out = group_higher_moments(
        events_ds(df), "event_type", "value"
    ).to_pandas().set_index("event_type").sort_index()

    con = duckdb.connect()
    con.register("t", df)
    exp = con.execute(
        "SELECT event_type, count(value) AS n, skewness(value) AS s, "
        "kurtosis(value) AS k FROM t WHERE value IS NOT NULL "
        "GROUP BY 1 ORDER BY 1"
    ).df()
    for _, r in exp.iterrows():
        row = out.loc[r["event_type"]]
        assert int(row["n"]) == r["n"]
        assert abs(row["skew"] - r["s"]) < 1e-8
        assert abs(row["kurt"] - r["k"]) < 1e-7


def test_group_higher_moments_tiny_groups_null():
    from debezium_incubator_ray.functions.stats import group_higher_moments

    t = pa.table({
        "g": pa.array(["a", "a", "b", "b", "b", "c", "c", "c", "c"]),
        "v": pa.array([1.0, 2.0, 1.0, 2.0, 4.0, 1.0, 2.0, 4.0, 8.0]),
    })
    out = group_higher_moments(
        ray.data.from_arrow(t), "g", "v"
    ).to_pandas().set_index("g").sort_index()
    assert pd.isna(out.loc["a", "skew"]) and pd.isna(out.loc["a", "kurt"])
    assert not pd.isna(out.loc["b", "skew"]) and pd.isna(out.loc["b", "kurt"])
    assert not pd.isna(out.loc["c", "kurt"])


def test_cosine_pairs_topk_matches_duckdb():
    import duckdb

    from debezium_incubator_ray.functions.similarity import cosine_pairs_topk

    rng = np.random.default_rng(9)
    words = np.array([
        "alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta",
        "iota", "kappa", "lam", "mu", "nu", "xi", "omicron", "pi",
    ])
    docs = [" ".join(rng.choice(words, rng.integers(5, 30)))
            for _ in range(300)]
    docs[10] = docs[20]  # exact duplicate -> cosine 1.0 pair must rank top
    ddf = pd.DataFrame({
        "doc_id": np.arange(300, dtype=np.int64), "text": docs,
    })
    ds = ray.data.from_arrow(pa.Table.from_pandas(ddf)).repartition(4)
    out = cosine_pairs_topk(ds, k=20, max_df=250, buckets=8).to_pandas()

    con = duckdb.connect()
    con.register("documents", ddf)
    exp = con.execute("""
    WITH tok AS (SELECT doc_id, unnest(string_split_regex(trim(text),
        '\\s+')) AS term FROM documents WHERE length(trim(text)) > 0),
    tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
        FROM tok GROUP BY 1, 2),
    df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
    kept AS (SELECT term, df FROM df WHERE df >= 2 AND df <= 250),
    nd AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n FROM tf),
    w AS (SELECT tf.doc_id, tf.term, tf.tf * ln(nd.n / kept.df) AS w
        FROM tf JOIN kept USING (term) CROSS JOIN nd),
    norms AS (SELECT doc_id, sqrt(sum(w*w)) AS nrm FROM w GROUP BY 1),
    dots AS (SELECT x.doc_id AS a, y.doc_id AS b, sum(x.w * y.w) AS dot
        FROM w x JOIN w y ON x.term = y.term AND x.doc_id < y.doc_id
        GROUP BY 1, 2),
    c AS (SELECT a, b, dot / (na.nrm * nb.nrm) AS cosine FROM dots
        JOIN norms na ON a = na.doc_id JOIN norms nb ON b = nb.doc_id)
    SELECT a, b, cosine FROM c ORDER BY c.cosine DESC, a, b LIMIT 20
    """).df()
    got = out.sort_values(
        ["cosine", "a", "b"], ascending=[False, True, True]
    ).reset_index(drop=True)
    assert (got["a"].to_numpy() == exp["a"].to_numpy()).all()
    assert (got["b"].to_numpy() == exp["b"].to_numpy()).all()
    assert np.allclose(got["cosine"], exp["cosine"], atol=1e-9)
    assert got["cosine"].iloc[0] > 0.999


def test_cosine_pairs_topk_empty_when_no_kept_terms():
    from debezium_incubator_ray.functions.similarity import cosine_pairs_topk

    # every doc a unique word (all df=1) -> no candidate pairs
    ddf = pd.DataFrame({
        "doc_id": np.arange(20, dtype=np.int64),
        "text": [f"word{i}" for i in range(20)],
    })
    ds = ray.data.from_arrow(pa.Table.from_pandas(ddf))
    out = cosine_pairs_topk(ds, k=5, max_df=10, buckets=4)
    assert out.num_rows == 0
    assert out.column_names == ["a", "b", "cosine"]


def test_pareto_front_matches_not_exists():
    import duckdb

    from debezium_incubator_ray.functions.quality import pareto_front

    rng = np.random.default_rng(12)
    m = 5000
    df = pd.DataFrame({
        "id": np.arange(m, dtype=np.int64),
        "x": rng.integers(1, 51, m).astype(np.int64),
        "y": np.round(rng.normal(100, 30, m), 1),
    })
    # duplicate point on the front: neither strictly dominates the other
    df.loc[0, ["x", "y"]] = [50, 500.0]
    df.loc[1, ["x", "y"]] = [50, 500.0]
    df.loc[2, "y"] = np.nan
    ds = ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(6)
    out = pareto_front(ds, "x", "y", n_buckets=16).to_pandas()
    out = out.sort_values("id")

    con = duckdb.connect()
    con.register("t", df)
    exp = con.execute("""
    SELECT id FROM t p WHERE p.x IS NOT NULL AND p.y IS NOT NULL
    AND NOT EXISTS (SELECT 1 FROM t q WHERE q.x >= p.x AND q.y >= p.y
                    AND (q.x > p.x OR q.y > p.y))
    ORDER BY id""").df()
    assert out["id"].tolist() == exp["id"].tolist()
    assert {0, 1} <= set(out["id"].tolist())


def test_pmi_topk_matches_duckdb():
    import duckdb

    from debezium_incubator_ray.functions.text import pmi_topk

    rng = np.random.default_rng(12)
    words = np.array(["alpha", "beta", "gamma", "delta",
                      "eps", "zeta", "eta", "theta"])
    docs = [" ".join(rng.choice(words, rng.integers(4, 25)))
            for _ in range(400)]
    ddf = pd.DataFrame({
        "doc_id": np.arange(400, dtype=np.int64), "text": docs,
    })
    ds = ray.data.from_arrow(pa.Table.from_pandas(ddf)).repartition(4)
    out = pmi_topk(ds, k=20, min_count=5, buckets=8).to_pandas()

    con = duckdb.connect()
    con.register("documents", ddf)
    exp = con.execute("""
    WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk
        FROM documents WHERE length(trim(text)) > 0),
    u AS (SELECT doc_id, unnest(tk) AS w,
        generate_subscripts(tk, 1) AS pos FROM t),
    b AS (SELECT a.w AS w1, c.w AS w2 FROM u a JOIN u c
        ON a.doc_id = c.doc_id AND c.pos = a.pos + 1),
    g AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS cnt
        FROM b GROUP BY 1, 2 HAVING count(*) >= 5),
    un AS (SELECT w, CAST(count(*) AS DOUBLE) AS c FROM u GROUP BY 1),
    nt AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM u),
    nb AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM b)
    SELECT g.w1, g.w2, g.cnt,
        ln((g.cnt / nb.n) / ((ua.c / nt.n) * (ub.c / nt.n))) AS pmi
    FROM g JOIN un ua ON g.w1 = ua.w JOIN un ub ON g.w2 = ub.w
    CROSS JOIN nt CROSS JOIN nb
    ORDER BY pmi DESC, w1, w2 LIMIT 20
    """).df()
    got = out.sort_values(
        ["pmi", "w1", "w2"], ascending=[False, True, True]
    ).reset_index(drop=True)
    assert got["w1"].tolist() == exp["w1"].tolist()
    assert got["w2"].tolist() == exp["w2"].tolist()
    assert np.allclose(got["pmi"], exp["pmi"], atol=1e-12)
    assert (got["cnt"].to_numpy() == exp["cnt"].to_numpy()).all()


def test_rank_family_drops_nan_values():
    from debezium_incubator_ray.functions.rank import (
        global_ntile, global_quantile_cont, grouped_percent_rank,
        percent_rank,
    )

    rng = np.random.default_rng(21)
    v = rng.normal(0, 1, 500)
    v[::50] = np.nan
    t = pa.table({
        "id": pa.array(np.arange(500, dtype=np.int64)),
        "g": pa.array(np.repeat(list("ab"), 250)),
        "v": pa.array(v),
    })
    ds = ray.data.from_arrow(t).repartition(3)
    clean = v[~np.isnan(v)]

    pr = percent_rank(ds, "v", n_buckets=32).to_pandas()
    assert len(pr) == len(clean) and not pr["v"].isna().any()

    nt = global_ntile(ds, "v", "id", k=4, n_buckets=32).to_pandas()
    assert len(nt) == len(clean)
    assert sorted(nt["rn"]) == list(range(1, len(clean) + 1))

    qt = global_quantile_cont(ds, "v", [0.5], n_buckets=32).to_pydict()
    assert abs(qt["value"][0] - np.quantile(clean, 0.5)) < 1e-12

    gp = grouped_percent_rank(ds, "g", "v", buckets=4).to_pandas()
    assert len(gp) == len(clean) and not gp["v"].isna().any()


def test_global_quantile_cont_duplicate_heavy():
    from debezium_incubator_ray.functions.rank import global_quantile_cont

    # 3 distinct values, one dominating — the (value, count) collapse
    # keeps the driver pull at #distinct rows, and order stats stay exact
    v = np.concatenate([
        np.full(9000, 5.0), np.full(600, 1.0), np.full(400, 9.0),
    ])
    rng = np.random.default_rng(3)
    rng.shuffle(v)
    ds = ray.data.from_arrow(pa.table({"v": pa.array(v)})).repartition(5)
    qs = [0.0, 0.05, 0.5, 0.95, 1.0]
    qt = global_quantile_cont(ds, "v", qs, n_buckets=16).to_pydict()
    assert np.allclose(qt["value"], np.quantile(v, qs, method="linear"))


def test_pareto_front_drops_nan_rows():
    from debezium_incubator_ray.functions.quality import pareto_front

    t = pa.table({
        "id": pa.array([0, 1, 2, 3], pa.int64()),
        "x": pa.array([1.0, 2.0, np.nan, 3.0]),
        "y": pa.array([9.0, 8.0, 99.0, 7.0]),
    })
    out = pareto_front(
        ray.data.from_arrow(t), "x", "y", n_buckets=4
    ).to_pandas()
    assert 2 not in out["id"].tolist()
    assert set(out["id"]) == {0, 1, 3}


def test_longest_streak_gaps_and_islands():
    from debezium_incubator_ray.functions.windows import longest_streak

    # user 1: days 0,1,2, 5,6 -> longest 3, n_days 5
    # user 2: days 10 -> longest 1; duplicates within a day collapse
    base = np.datetime64("2024-03-01T12:00:00")
    day = np.timedelta64(1, "D")
    ts = np.array([
        base, base + day, base + 2 * day, base + 5 * day, base + 6 * day,
        base + 5 * day,  # dup day for user 1
        base + 10 * day,
    ])
    users = np.array([1, 1, 1, 1, 1, 1, 2], dtype=np.int64)
    t = pa.table({
        "user_id": pa.array(users),
        "ts": pa.array(ts.astype("datetime64[us]")),
    })
    out = longest_streak(
        ray.data.from_arrow(t).repartition(3), "user_id", "ts", buckets=4
    ).to_pandas().set_index("user_id").sort_index()
    assert int(out.loc[1, "n_days"]) == 5
    assert int(out.loc[1, "longest_streak"]) == 3
    assert int(out.loc[2, "n_days"]) == 1
    assert int(out.loc[2, "longest_streak"]) == 1


def test_connected_components_contraction():
    from debezium_incubator_ray.functions.graph import connected_components

    # a 60-node path (deep diameter, exercises cross-block root merging
    # once repartitioned), two cliques, an isolated pair, plus dup /
    # self / null edges that must be ignored
    src = list(range(100, 159)) + [500, 500, 501, 502] + [777] + [900]
    dst = list(range(101, 160)) + [501, 502, 502, 500] + [777] + [901]
    src += [100, None]
    dst += [101, 5]
    t = pa.table({
        "src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64()),
    })
    out = (
        connected_components(
            ray.data.from_arrow(t).repartition(7), buckets=4
        )
        .to_pandas().set_index("comp").sort_index()
    )
    # self-loop node 777 still counts as a (singleton) component
    assert out.loc[100, "n_nodes"] == 60
    assert out.loc[500, "n_nodes"] == 3
    assert out.loc[900, "n_nodes"] == 2
    assert out.loc[777, "n_nodes"] == 1
    assert len(out) == 4


def test_block_cc_pointer_doubling_path():
    from debezium_incubator_ray.functions.graph import _block_cc

    n = 1000  # path graph: worst-case diameter for hash-min
    ui = np.arange(n - 1, dtype=np.int64)
    vi = np.arange(1, n, dtype=np.int64)
    lab = _block_cc(n, ui, vi)
    assert (lab == 0).all()


def test_chi2_independence_matches_scipy_formula():
    from debezium_incubator_ray.functions.stats import chi2_independence

    rng = np.random.default_rng(7)
    a = rng.integers(0, 4, 500)
    b = rng.integers(0, 3, 500)
    t = pa.table({
        "a": pa.array(a.astype(str)), "b": pa.array(b, pa.int64()),
    })
    out = chi2_independence(
        ray.data.from_arrow(t).repartition(5), "a", "b"
    ).to_pandas()
    # manual chi2
    import pandas as pd
    piv = pd.crosstab(a, b).to_numpy(dtype=float)
    e = np.outer(piv.sum(1), piv.sum(0)) / piv.sum()
    chi2 = (((piv - e) ** 2) / e).sum()
    assert abs(out["chi2"][0] - chi2) < 1e-6
    assert out["dof"][0] == 6
    assert out["n"][0] == 500


def test_chi2_excludes_nulls():
    from debezium_incubator_ray.functions.stats import chi2_independence

    t = pa.table({
        "a": pa.array(["x", "x", None, "y", "y", "y"]),
        "b": pa.array([1, 2, 1, None, 1, 2], pa.int64()),
    })
    out = chi2_independence(ray.data.from_arrow(t), "a", "b").to_pandas()
    assert out["n"][0] == 4


def test_chi2_includes_zero_observed_cells():
    from debezium_incubator_ray.functions.stats import chi2_independence

    # (x, 2) never occurs: the zero cell must still contribute E
    t = pa.table({
        "a": pa.array(["x", "x", "y", "y", "y", "y"]),
        "b": pa.array([1, 1, 1, 2, 2, 2], pa.int64()),
    })
    out = chi2_independence(ray.data.from_arrow(t), "a", "b").to_pandas()
    piv = np.array([[2.0, 0.0], [1.0, 3.0]])
    e = np.outer(piv.sum(1), piv.sum(0)) / piv.sum()
    chi2 = (((piv - e) ** 2) / e).sum()
    assert abs(out["chi2"][0] - round(chi2, 6)) < 1e-9


def test_global_dense_rank_matches_pandas(valued_ds):
    import pandas as pd

    from debezium_incubator_ray.functions.rank import global_dense_rank

    vals, ids, ds = valued_ds
    # inject duplicates so dense != row_number: round to 1 decimal
    t = pa.table({
        "id": pa.array(ids),
        "v": pa.array(np.round(vals, 1)),
    })
    out = (
        global_dense_rank(
            ray.data.from_arrow(t).repartition(6), "v", n_buckets=8
        )
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    df = pd.DataFrame({"id": ids, "v": np.round(vals, 1)}).sort_values(
        "id"
    ).reset_index(drop=True)
    exp = df["v"].rank(method="dense").astype(int)
    assert list(out["dr"]) == list(exp)


def test_spearman_matches_scipy_formula():
    from debezium_incubator_ray.functions.stats import spearman_corr

    rng = np.random.default_rng(11)
    x = rng.integers(0, 20, 800).astype(float)  # heavy ties
    y = x * 2 + rng.normal(0, 5, 800)
    y[::7] = np.nan  # NaN pairs excluded? NULLs are; use None instead
    xa = pa.array(x)
    ya = pa.array([None if np.isnan(v) else float(v) for v in y])
    t = pa.table({"a": xa, "b": ya})
    out = spearman_corr(
        ray.data.from_arrow(t).repartition(5), "a", "b"
    ).to_pandas()
    # manual tie-average-rank spearman over the non-null pairs
    import pandas as pd
    df = pd.DataFrame({"a": x, "b": [None if np.isnan(v) else v for v in y]}).dropna()
    ra = df["a"].rank(method="average")
    rb = df["b"].rank(method="average")
    want = np.corrcoef(ra, rb)[0, 1]
    assert abs(out["spearman"][0] - round(want, 6)) < 2e-6
    assert out["n"][0] == len(df)


def test_ks_two_sample_matches_manual():
    from debezium_incubator_ray.functions.stats import ks_two_sample

    rng = np.random.default_rng(3)
    v = np.concatenate([
        rng.integers(0, 30, 500).astype(float),        # group x
        rng.integers(5, 40, 700).astype(float),        # group y (shifted)
    ])
    g = np.array(["x"] * 500 + ["y"] * 700)
    # noise rows outside both groups + a NULL value must be ignored
    t = pa.table({
        "v": pa.array(list(v) + [1.0, None]),
        "g": pa.array(list(g) + ["z", "x"]),
    })
    out = ks_two_sample(
        ray.data.from_arrow(t).repartition(4), "v", "g", "x", "y"
    ).to_pandas()
    xs, ys = np.sort(v[:500]), np.sort(v[500:])
    grid = np.unique(v)
    fa = np.searchsorted(xs, grid, side="right") / 500.0
    fb = np.searchsorted(ys, grid, side="right") / 700.0
    want = np.abs(fa - fb).max()
    assert abs(out["ks_d"][0] - round(want, 6)) < 2e-6
    assert out["n_a"][0] == 500 and out["n_b"][0] == 700


def test_autocorr_daily_periodic_series():
    from debezium_incubator_ray.functions.stats import autocorr_daily

    # 28 days, strict period-7 pattern -> acf(7) == 1.0
    base = np.datetime64("2024-01-01T00:00:00", "us")
    days = np.arange(28)
    counts = (days % 7) + 1
    ts = np.repeat(base + days * np.timedelta64(86400_000_000, "us"), counts)
    t = pa.table({"ts": pa.array(ts, pa.timestamp("us"))})
    out = autocorr_daily(
        ray.data.from_arrow(t).repartition(3), "ts", lags=(1, 7, 40)
    ).to_pandas().set_index("lag")
    assert abs(out.loc[7, "acf"] - 1.0) < 1e-9
    assert out.loc[1, "acf"] < 1.0
    assert np.isnan(out.loc[40, "acf"])  # lag beyond the series
    assert (out["n_days"] == 28).all()


def test_spearman_no_complete_pairs_is_nan():
    from debezium_incubator_ray.functions.stats import spearman_corr

    t = pa.table({
        "a": pa.array([1.0, None, 3.0]),
        "b": pa.array([None, 2.0, None]),
    })
    out = spearman_corr(ray.data.from_arrow(t), "a", "b").to_pandas()
    assert out["n"][0] == 0 and np.isnan(out["spearman"][0])


def test_kendall_tau_b_matches_pandas():
    from debezium_incubator_ray.functions.stats import kendall_tau_b

    rng = np.random.default_rng(7)
    a = rng.integers(0, 12, 600).astype(float)
    b = np.where(rng.random(600) < 0.6, a // 2, rng.integers(0, 6, 600)).astype(float)
    t = pa.table({
        "a": pa.array(list(a) + [None, 1.0]),
        "b": pa.array(list(b) + [2.0, None]),
    })
    out = kendall_tau_b(
        ray.data.from_arrow(t).repartition(4), "a", "b"
    ).to_pandas()
    # brute-force O(n^2) tau-b over the 600 clean pairs
    da = np.sign(a[:, None] - a[None, :])
    db = np.sign(b[:, None] - b[None, :])
    iu = np.triu_indices(600, k=1)
    prod = (da * db)[iu]
    conc, disc = int((prod > 0).sum()), int((prod < 0).sum())
    n0 = 600 * 599 // 2
    n1 = int((da[iu] == 0).sum())
    n2 = int((db[iu] == 0).sum())
    want = (conc - disc) / np.sqrt(float(n0 - n1) * float(n0 - n2))
    assert abs(out["tau_b"][0] - round(want, 6)) < 2e-6
    assert out["n"][0] == 600


def test_kendall_tau_b_empty_is_nan():
    from debezium_incubator_ray.functions.stats import kendall_tau_b

    t = pa.table({"a": pa.array([None], pa.float64()),
                  "b": pa.array([1.0])})
    out = kendall_tau_b(ray.data.from_arrow(t), "a", "b").to_pandas()
    assert out["n"][0] == 0 and np.isnan(out["tau_b"][0])


def test_mann_whitney_matches_manual():
    from debezium_incubator_ray.functions.stats import mann_whitney_u

    rng = np.random.default_rng(5)
    xa = rng.integers(0, 25, 400).astype(float)
    xb = (rng.integers(0, 25, 300) + 3).astype(float)
    t = pa.table({
        "v": pa.array(list(xa) + list(xb) + [None, 5.0]),
        "g": pa.array(["a"] * 400 + ["b"] * 300 + ["a", "zz"]),
    })
    out = mann_whitney_u(
        ray.data.from_arrow(t).repartition(4), "v", "g", "a", "b"
    ).to_pandas()
    # manual: tie-average ranks over the combined sample
    import pandas as pd
    allv = np.concatenate([xa, xb])
    rk = pd.Series(allv).rank(method="average").to_numpy()
    ra = rk[:400].sum()
    u = ra - 400 * 401 / 2.0
    mu = 400 * 300 / 2.0
    _, tcnt = np.unique(allv, return_counts=True)
    tsum = float((tcnt.astype(np.int64) ** 3 - tcnt).sum())
    var = 400 * 300 / 12.0 * ((700 + 1) - tsum / (700 * 699.0))
    zz = (u - mu) / np.sqrt(var)
    assert abs(out["u"][0] - round(u, 6)) < 1e-9
    assert abs(out["z"][0] - round(zz, 6)) < 2e-6
    assert out["n_a"][0] == 400 and out["n_b"][0] == 300


def test_degree_assortativity_matches_numpy():
    from debezium_incubator_ray.functions.graph import degree_assortativity

    rng = np.random.default_rng(2)
    # star + ring mixture: strong disassortativity expected
    edges = {(0, i) for i in range(1, 12)} | {
        (i, i + 1) for i in range(1, 11)
    } | {tuple(sorted(p)) for p in rng.integers(1, 12, (8, 2)) if p[0] != p[1]}
    e = np.array(sorted(edges))
    t = pa.table({"src": pa.array(e[:, 0]), "dst": pa.array(e[:, 1])})
    out = degree_assortativity(
        ray.data.from_arrow(t).repartition(3), "src", "dst"
    ).to_pandas()
    deg = np.bincount(np.concatenate([e[:, 0], e[:, 1]]))
    x = np.concatenate([deg[e[:, 0]], deg[e[:, 1]]])
    y = np.concatenate([deg[e[:, 1]], deg[e[:, 0]]])
    want = np.corrcoef(x, y)[0, 1]
    assert abs(out["assortativity"][0] - round(want, 6)) < 2e-6
    assert out["m2"][0] == 2 * len(e)
    assert out["n_nodes"][0] == len(set(e.flatten()))


def test_gini_matches_bruteforce():
    from debezium_incubator_ray.functions.stats import gini_coefficient

    rng = np.random.default_rng(9)
    keys = rng.zipf(1.6, 4000) % 300  # heavy-tail activity
    t = pa.table({"k": pa.array(keys.astype(np.int64))})
    out = gini_coefficient(
        ray.data.from_arrow(t).repartition(5), "k"
    ).to_pandas()
    x = np.sort(np.bincount(keys)[np.bincount(keys) > 0])
    n = len(x)
    want = 2.0 * float((np.arange(1, n + 1) * x).sum()) / (n * x.sum()) \
        - (n + 1.0) / n
    assert abs(out["gini"][0] - round(want, 6)) < 2e-6
    assert out["n_keys"][0] == n


def test_gini_uniform_is_zero():
    from debezium_incubator_ray.functions.stats import gini_coefficient

    t = pa.table({"k": pa.array(list(range(10)) * 7, pa.int64())})
    out = gini_coefficient(ray.data.from_arrow(t), "k").to_pandas()
    assert abs(out["gini"][0]) < 1e-12


def test_cusum_finds_injected_shift():
    from debezium_incubator_ray.functions.stats import cusum_changepoint

    base = np.datetime64("2024-03-01T12:00:00", "us")
    days = np.arange(40)
    counts = np.where(days < 25, 10, 40)  # mean shift after day 24
    ts = np.repeat(base + days * np.timedelta64(86400_000_000, "us"), counts)
    t = pa.table({"ts": pa.array(ts, pa.timestamp("us"))})
    out = cusum_changepoint(
        ray.data.from_arrow(t).repartition(4), "ts"
    ).to_pandas()
    # CUSUM peaks at the last pre-shift day
    assert out["change_day"][0] == "2024-03-25"
    assert out["n_days"][0] == 40
    s = np.cumsum(counts)
    dev = np.abs(s - np.arange(1, 41) * s[-1] / 40.0)
    assert abs(out["cusum"][0] - round(dev.max(), 6)) < 1e-9


def test_welch_ttest_matches_manual():
    from debezium_incubator_ray.functions.stats import welch_ttest

    rng = np.random.default_rng(17)
    va = rng.normal(10.0, 2.0, 400)
    vb = rng.normal(9.4, 3.0, 300)
    t = pa.table({
        "g": pa.array(["a"] * 400 + ["b"] * 300 + ["other"] * 50),
        "v": pa.array(np.concatenate([va, vb, rng.normal(0, 1, 50)])),
    })
    out = welch_ttest(
        ray.data.from_arrow(t).repartition(6), "v", "g", "a", "b"
    ).to_pandas()
    na, nb = len(va), len(vb)
    ma, mb = va.mean(), vb.mean()
    sa, sb = va.var(ddof=1), vb.var(ddof=1)
    se2 = sa / na + sb / nb
    want_t = (ma - mb) / np.sqrt(se2)
    want_df = se2**2 / ((sa / na) ** 2 / (na - 1) + (sb / nb) ** 2 / (nb - 1))
    assert out["n_a"][0] == na and out["n_b"][0] == nb
    assert abs(out["t_stat"][0] - want_t) < 1e-5
    assert abs(out["df"][0] - want_df) < 1e-3


def test_welch_ttest_missing_group_empty():
    from debezium_incubator_ray.functions.stats import welch_ttest

    t = pa.table({"g": pa.array(["a", "a", "a"]),
                  "v": pa.array([1.0, 2.0, 3.0])})
    out = welch_ttest(ray.data.from_arrow(t), "v", "g", "a", "zz").to_pandas()
    # zero rows, matching the SQL oracle's empty cross join
    assert len(out) == 0
    assert list(out.columns) == ["n_a", "n_b", "mean_a", "mean_b",
                                 "t_stat", "df"]


def test_anova_matches_manual():
    from debezium_incubator_ray.functions.stats import anova_oneway

    rng = np.random.default_rng(3)
    groups = [rng.normal(m, 1.5, n) for m, n in
              [(5.0, 120), (5.6, 90), (4.7, 150)]]
    t = pa.table({
        "g": pa.array(sum([[f"g{i}"] * len(v) for i, v in
                           enumerate(groups)], [])),
        "v": pa.array(np.concatenate(groups)),
    })
    out = anova_oneway(
        ray.data.from_arrow(t).repartition(4), "v", "g"
    ).to_pandas()
    n = sum(len(v) for v in groups)
    k = len(groups)
    grand = np.concatenate(groups).mean()
    ssb = sum(len(v) * (v.mean() - grand) ** 2 for v in groups)
    ssw = sum(((v - v.mean()) ** 2).sum() for v in groups)
    want_f = (ssb / (k - 1)) / (ssw / (n - k))
    assert out["k"][0] == k and out["n"][0] == n
    assert abs(out["f_stat"][0] - want_f) < 1e-5
    assert abs(out["ms_within"][0] - ssw / (n - k)) < 1e-5


def test_anova_single_group_empty():
    from debezium_incubator_ray.functions.stats import anova_oneway

    t = pa.table({"g": pa.array(["x"] * 5),
                  "v": pa.array([1.0, 2.0, 3.0, 4.0, 5.0])})
    out = anova_oneway(ray.data.from_arrow(t), "v", "g").to_pandas()
    # degenerate (k < 2): zero rows, matching the oracle's empty
    # grouped cross join
    assert len(out) == 0


def test_mutual_info_independent_and_dependent():
    from debezium_incubator_ray.functions.stats import mutual_information

    # perfectly dependent: MI == H(a) == H(b); V == 1
    a = ["x"] * 50 + ["y"] * 50
    t = pa.table({"a": pa.array(a), "b": pa.array(a)})
    out = mutual_information(
        ray.data.from_arrow(t).repartition(3), "a", "b"
    ).to_pandas()
    assert abs(out["mi_nats"][0] - np.log(2)) < 1e-6
    assert abs(out["cramers_v"][0] - 1.0) < 1e-6
    # independent uniform grid: MI == 0, V == 0
    a2 = (["x"] * 2 + ["y"] * 2) * 25
    b2 = (["p", "q"] * 2) * 25
    t2 = pa.table({"a": pa.array(a2), "b": pa.array(b2)})
    out2 = mutual_information(ray.data.from_arrow(t2), "a", "b").to_pandas()
    assert abs(out2["mi_nats"][0]) < 1e-9
    assert abs(out2["cramers_v"][0]) < 1e-9


def test_theil_sen_recovers_trend_with_outliers():
    from debezium_incubator_ray.functions.stats import theil_sen_daily

    # 3 events on day 0, 5 on day 1, 7 on day 2 ... slope 2/day, with one
    # wild outlier day that OLS would chase but the median slope ignores
    days, counts = list(range(12)), [3 + 2 * i for i in range(12)]
    counts[6] = 500
    ts = []
    for d, c in zip(days, counts):
        base = np.datetime64("2024-03-01", "us") + np.timedelta64(d, "D")
        ts.extend([base + np.timedelta64(k, "s") for k in range(c)])
    t = pa.table({"ts": pa.array(ts, pa.timestamp("us"))})
    out = theil_sen_daily(
        ray.data.from_arrow(t).repartition(5), "ts"
    ).to_pandas()
    assert out["n_days"][0] == 12
    assert abs(out["slope_per_day"][0] - 2.0) < 0.75  # robust to the spike


def test_local_clustering_known_graph():
    from debezium_incubator_ray.functions.graph import local_clustering

    # K4 on {1,2,3,4} + pendant 5-1 + isolated-ish edge 6-7:
    # nodes 2,3,4: deg 3, tri 3 -> lcc 1.0; node 1: deg 4, tri 3 ->
    # lcc 0.5; nodes 5,6,7: deg 1 -> excluded
    E = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (5, 1), (6, 7),
         (2, 1)]  # duplicate orientation of (1,2) must collapse
    t = pa.table({
        "src": pa.array([a for a, _ in E], pa.int64()),
        "dst": pa.array([b for _, b in E], pa.int64()),
    })
    out = local_clustering(
        ray.data.from_arrow(t).repartition(3), k=10, buckets=4
    ).to_pandas().set_index("node")
    assert set(out.index) == {1, 2, 3, 4}
    for n in (2, 3, 4):
        assert out.loc[n, "lcc"] == 1.0 and out.loc[n, "tri"] == 3
    assert out.loc[1, "deg"] == 4 and out.loc[1, "tri"] == 3
    assert abs(out.loc[1, "lcc"] - 0.5) < 1e-9
    # top-k order: lcc desc then node asc
    assert list(out.index) == [2, 3, 4, 1]


def test_local_clustering_triangle_free():
    from debezium_incubator_ray.functions.graph import local_clustering

    # star K1,3: center deg 3 (lcc 0), leaves deg 1 (excluded)
    t = pa.table({
        "src": pa.array([0, 0, 0], pa.int64()),
        "dst": pa.array([1, 2, 3], pa.int64()),
    })
    out = local_clustering(ray.data.from_arrow(t), k=5,
                           buckets=4).to_pandas()
    assert list(out["node"]) == [0]
    assert out["lcc"][0] == 0.0 and out["tri"][0] == 0


def test_multi_regression_recovers_coefficients():
    from debezium_incubator_ray.functions.stats import multi_regression

    rng = np.random.default_rng(5)
    x1 = rng.uniform(0, 50, 3000)
    x2 = rng.uniform(0, 0.1, 3000)
    y = 7.0 + 2.5 * x1 - 40.0 * x2 + rng.normal(0, 0.5, 3000)
    t = pa.table({"y": pa.array(y), "x1": pa.array(x1), "x2": pa.array(x2)})
    out = multi_regression(
        ray.data.from_arrow(t).repartition(6), "y", "x1", "x2"
    ).to_pandas()
    A = np.column_stack([np.ones(3000), x1, x2])
    b_ref = np.linalg.lstsq(A, y, rcond=None)[0]
    assert abs(out["b0"][0] - b_ref[0]) < 1e-4
    assert abs(out["b1"][0] - b_ref[1]) < 1e-6
    assert abs(out["b2"][0] - b_ref[2]) < 1e-3
    assert out["r2"][0] > 0.99


def test_multi_regression_degenerate_empty():
    from debezium_incubator_ray.functions.stats import multi_regression

    # collinear x2 = 2*x1 -> singular 2x2 system -> zero rows
    x1 = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    t = pa.table({"y": pa.array(x1 * 3), "x1": pa.array(x1),
                  "x2": pa.array(2 * x1)})
    out = multi_regression(ray.data.from_arrow(t), "y", "x1", "x2"
                           ).to_pandas()
    assert len(out) == 0


def test_neyman_allocation_tracks_group_std():
    from debezium_incubator_ray.functions.sample import neyman_sample

    rng = np.random.default_rng(11)
    # equal sizes, very different stds -> wide stratum gets ~4x budget
    g = ["wide"] * 2000 + ["narrow"] * 2000
    v = np.concatenate([rng.normal(0, 8.0, 2000), rng.normal(0, 2.0, 2000)])
    ids = np.arange(4000, dtype=np.int64)
    t = pa.table({"g": pa.array(g), "id": pa.array(ids), "v": pa.array(v)})
    out = neyman_sample(
        ray.data.from_arrow(t).repartition(5), "g", "v", "id", total_k=200
    ).to_pandas()
    sizes = out.groupby("g")["id"].count()
    assert 140 <= sizes["wide"] <= 170      # ~8/(8+2) of 200
    assert 30 <= sizes["narrow"] <= 60
    # determinism across parallelism
    out2 = neyman_sample(
        ray.data.from_arrow(t).repartition(17), "g", "v", "id", total_k=200
    ).to_pandas()
    a = out.sort_values("id").reset_index(drop=True)
    b = out2.sort_values("id").reset_index(drop=True)
    assert (a["id"] == b["id"]).all() and (a["rank"] == b["rank"]).all()


def test_ngram_novelty_manual():
    from debezium_incubator_ray.functions.dedup import ngram_novelty

    # doc1 and doc2 share the shingle "a b c"; doc1 has a second,
    # globally unique shingle "b c d"; doc3 is all-unique; doc4 empty
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["a b c d", "a b c", "x y z", ""]),
    })
    out = ngram_novelty(
        ray.data.from_arrow(t).repartition(3), buckets=4
    ).to_pandas().set_index("doc_id")
    assert set(out.index) == {1, 2, 3}  # empty doc excluded
    assert out.loc[1, "n_shingles"] == 2 and out.loc[1, "uniq_shingles"] == 1
    assert out.loc[1, "novelty"] == 0.5
    assert out.loc[2, "novelty"] == 0.0   # its only shingle is shared
    assert out.loc[3, "novelty"] == 1.0


def test_kaplan_meier_manual():
    from debezium_incubator_ray.functions.stats import (
        kaplan_meier_second_event,
    )

    # users 1,2: second event after 1h and 2h; user 3: single event,
    # censored at (max_ts - its first) = 2h; max ts = u2's second event
    base = np.datetime64("2024-05-01T00:00:00", "us")
    rows = [
        (1, base, 1), (1, base + np.timedelta64(1, "h"), 2),
        (2, base, 3), (2, base + np.timedelta64(2, "h"), 4),
        (3, base, 5),
    ]
    t = pa.table({
        "u": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "i": pa.array([r[2] for r in rows], pa.int64()),
    })
    out = kaplan_meier_second_event(
        ray.data.from_arrow(t).repartition(3), "u", "ts", "i"
    ).to_pandas().set_index("t_hours")
    # t=1h: n_risk=3 (all durations >= 1h), d=1 -> S = 2/3
    # t=2h: n_risk=2 (u2 event, u3 censored at 2h), d=1 -> S = 2/3 * 1/2
    assert out.loc[1, "n_risk"] == 3 and out.loc[1, "d_events"] == 1
    assert abs(out.loc[1, "survival"] - 2 / 3) < 1e-6
    assert out.loc[2, "n_risk"] == 2 and out.loc[2, "d_events"] == 1
    assert abs(out.loc[2, "survival"] - 1 / 3) < 1e-6


def test_kaplan_meier_terminal_zero():
    from debezium_incubator_ray.functions.stats import (
        kaplan_meier_second_event,
    )

    # every user has a second event at the same duration: the single
    # event time has d == n_risk -> survival exactly 0, no ln(0) crash
    base = np.datetime64("2024-05-01T00:00:00", "us")
    rows = []
    for u in (1, 2, 3):
        rows += [(u, base, u * 10), (u, base + np.timedelta64(90, "m"),
                                     u * 10 + 1)]
    t = pa.table({
        "u": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "i": pa.array([r[2] for r in rows], pa.int64()),
    })
    out = kaplan_meier_second_event(
        ray.data.from_arrow(t), "u", "ts", "i"
    ).to_pandas()
    assert len(out) == 1
    assert out["n_risk"][0] == 3 and out["d_events"][0] == 3
    assert out["survival"][0] == 0.0


def test_cohort_ltv_manual():
    from debezium_incubator_ray.functions.windows import cohort_ltv

    # two customers in the Jan cohort, one in Feb; ages 0/1
    d = lambda s: np.datetime64(s, "us")
    t = pa.table({
        "o_custkey": pa.array([1, 1, 2, 3], pa.int64()),
        "o_orderdate": pa.array(
            [d("2024-01-05"), d("2024-02-10"), d("2024-01-20"),
             d("2024-02-01")], pa.timestamp("us")),
        "o_totalprice": pa.array([100.0, 50.0, 200.0, 70.0]),
    })
    out = cohort_ltv(
        ray.data.from_arrow(t).repartition(2)
    ).to_pandas().set_index(["cohort", "age"])
    jan = 2024 * 12 + 0
    feb = 2024 * 12 + 1
    assert out.loc[(jan, 0), "n_customers"] == 2
    assert out.loc[(jan, 0), "revenue"] == 300.0
    assert out.loc[(jan, 0), "ltv_per_customer"] == 150.0
    assert out.loc[(jan, 1), "revenue"] == 50.0
    assert out.loc[(jan, 1), "ltv_per_customer"] == 175.0  # (300+50)/2
    assert out.loc[(feb, 0), "n_customers"] == 1
    assert out.loc[(feb, 0), "ltv_per_customer"] == 70.0


def test_hll_accuracy_and_determinism():
    from debezium_incubator_ray.functions.sketch import approx_distinct_hll

    true_n = 5000
    t = pa.table({"v": pa.array(np.arange(true_n, dtype=np.int64))})
    a = approx_distinct_hll(
        ray.data.from_arrow(t).repartition(7), "v"
    ).to_pandas()
    b = approx_distinct_hll(
        ray.data.from_arrow(t).repartition(2), "v"
    ).to_pandas()
    # registers are a pure function of the value set -> identical at
    # any parallelism; m=256 -> ~6.5% std error
    assert a["estimate"][0] == b["estimate"][0]
    assert abs(a["estimate"][0] - true_n) / true_n < 0.2
    # small-range: few distincts -> linear counting is near-exact
    s = approx_distinct_hll(
        ray.data.from_arrow(pa.table({
            "v": pa.array(np.arange(30, dtype=np.int64))
        })), "v"
    ).to_pandas()
    assert abs(s["estimate"][0] - 30) < 3


def test_kcore_peel_converged_triangle_plus_tail(ray_session):
    """K4 clique + a pendant path: 3-core = exactly the K4 (peeling
    converges in 2 rounds; extra rounds are no-ops)."""
    import pyarrow as pa
    import ray.data
    from debezium_incubator_ray.functions.graph import kcore_peel

    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    tail = [(4, 5), (5, 6)]
    src, dst = zip(*(k4 + tail))
    edges = ray.data.from_arrow(pa.table({
        "src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64()),
    }))
    out = kcore_peel(edges, k=3, rounds=4, buckets=4)
    assert out["node"].to_pylist() == [1, 2, 3, 4]
    assert out["core_deg"].to_pylist() == [3, 3, 3, 3]


def test_adamic_adar_square(ray_session):
    """4-cycle: the two diagonals are the only non-adjacent pairs; each
    has two common neighbors of degree 2 -> AA = 2/ln(2)."""
    import math

    import pyarrow as pa
    import ray.data
    from debezium_incubator_ray.functions.graph import adamic_adar

    edges = ray.data.from_arrow(pa.table({
        "src": pa.array([1, 2, 3, 4], pa.int64()),
        "dst": pa.array([2, 3, 4, 1], pa.int64()),
    }))
    out = adamic_adar(edges, k=10, buckets=4)
    assert out["node_a"].to_pylist() == [1, 2]
    assert out["node_b"].to_pylist() == [3, 4]
    expect = round(2.0 / math.log(2.0), 6)
    assert out["aa_score"].to_pylist() == [expect, expect]


def test_jaccard_topk_square_plus_tail(ray_session):
    """4-cycle with a pendant node 5 on node 1: diagonals (1,3) and
    (2,4) share two neighbors; J(1,3) = 2 / (3 + 2 - 2) = 2/3,
    J(2,4) = 2 / (2 + 2 - 2) = 1. The pendant makes the degrees
    asymmetric so the union denominator is actually exercised, and
    (3,5) / (4,5)-style pairs (one common neighbor through 1) rank
    below. Adjacent pairs must not appear."""
    import pyarrow as pa
    import ray.data
    from debezium_incubator_ray.functions.graph import jaccard_topk

    edges = ray.data.from_arrow(pa.table({
        "src": pa.array([1, 2, 3, 4, 1], pa.int64()),
        "dst": pa.array([2, 3, 4, 1, 5], pa.int64()),
    }))
    out = jaccard_topk(edges, k=10, buckets=4)
    got = {(a, b): s for a, b, s in zip(out["node_a"].to_pylist(),
                                        out["node_b"].to_pylist(),
                                        out["jaccard"].to_pylist())}
    assert got[(2, 4)] == 1.0
    assert got[(1, 3)] == round(2.0 / 3.0, 6)
    # pendant wedges through node 1: J = 1 / (deg+1-1)
    assert got[(2, 5)] == 0.5
    assert got[(4, 5)] == 0.5
    # adjacent pairs excluded
    assert (1, 2) not in got and (1, 5) not in got
    # ranking: rounded score desc, then (a, b)
    assert out["node_a"].to_pylist()[0] == 2
    assert out["node_b"].to_pylist()[0] == 4


def test_abc_classes_known_split(ray_session):
    """Values 50/30/15/5: cumulative shares 0.5/0.8/0.95/1.0 — the first
    two are A (<= 0.8), the third B (<= 0.95), the last C; ties and
    order follow (value desc, key asc)."""
    import pyarrow as pa
    import ray.data
    from debezium_incubator_ray.functions.rank import abc_classes

    kv = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4], pa.int64()),
        "v": pa.array([50.0, 30.0, 15.0, 5.0]),
    }))
    out = abc_classes(kv, "k", "v", n_buckets=8)
    got = {
        r["abc_class"]: (r["n_keys"], r["revenue_share"])
        for r in out.to_pylist()
    }
    assert got["A"] == (2, 0.8)
    assert got["B"] == (1, 0.15)
    assert got["C"] == (1, 0.05)


def test_hill_tail_exact_two_point(ray_session):
    """Counts 20 and 40 with xmin=20: alpha = 1 + 2/ln(2)."""
    import math

    import pyarrow as pa
    import ray.data
    from debezium_incubator_ray.functions.stats import hill_tail_index

    keys = [1] * 20 + [2] * 40 + [3] * 5  # key 3 below xmin
    ds = ray.data.from_arrow(pa.table({"k": pa.array(keys, pa.int64())}))
    out = hill_tail_index(ds, "k", xmin=20)
    assert out["n_tail"].to_pylist() == [2]
    assert out["alpha"].to_pylist() == [round(1 + 2 / math.log(2.0), 6)]


def test_markov_stationary_two_state(ray_session):
    """Deterministic 2-cycle a->b->a: after 8 rounds from uniform the
    distribution is exactly (0.5, 0.5)."""
    import pyarrow as pa
    import ray.data
    from debezium_incubator_ray.functions.windows import markov_stationary

    ev = ray.data.from_arrow(pa.table({
        "user_id": pa.array([1] * 6, pa.int64()),
        "event_type": pa.array(["a", "b"] * 3),
        "event_id": pa.array(list(range(6)), pa.int64()),
    }))
    out = markov_stationary(ev, rounds=8)
    assert out["event_type"].to_pylist() == ["a", "b"]
    assert out["prob"].to_pylist() == [0.5, 0.5]
