"""SCD2 history, running totals, z-score outliers, unigram LM, postings."""

import numpy as np
import pyarrow as pa
import ray.data


def _changelog():
    # key 1: c(1) u(3) d(5) c(7)  -> versions 1,3 closed; 7 open
    # key 2: c(2) u(4)            -> version 2 closed; 4 open
    # key 3: c(6) d(8)            -> version 6 closed; nothing current
    return pa.table({
        "user_id": pa.array([1, 2, 1, 2, 1, 3, 1, 3], pa.int64()),
        "lsn": pa.array([1, 2, 3, 4, 5, 6, 7, 8], pa.int64()),
        "op": pa.array(["c", "c", "u", "u", "d", "c", "c", "d"]),
        "value": pa.array([10.0, 20.0, 11.0, 21.0, None, 30.0, 12.0, None]),
    })


def test_scd2_intervals_and_current():
    from debezium_incubator_ray.functions.scd import scd2_history

    ds = ray.data.from_arrow(_changelog())
    out = scd2_history(ds).to_pandas().sort_values(
        ["user_id", "valid_from"]).reset_index(drop=True)
    rows = [
        (r.user_id, r.valid_from,
         None if r.valid_to is None or np.isnan(r.valid_to) else int(r.valid_to),
         r.is_current)
        for r in out.itertuples()
    ]
    assert rows == [
        (1, 1, 3, False), (1, 3, 5, False), (1, 7, None, True),
        (2, 2, 4, False), (2, 4, None, True),
        (3, 6, 8, False),
    ]
    # exactly one current version per live key; deleted key 3 has none
    cur = out[out.is_current]
    assert sorted(cur.user_id) == [1, 2]


def test_running_total_segmented():
    from debezium_incubator_ray.functions.windows import running_total

    t = pa.table({
        "user_id": pa.array([1, 1, 2, 1, 2], pa.int64()),
        "event_id": pa.array([10, 20, 15, 30, 25], pa.int64()),
        "value": pa.array([1.0, 2.0, 5.0, 3.0, 7.0]),
    })
    out = running_total(ray.data.from_arrow(t)).to_pandas()
    got = {(r.user_id, r.event_id): r.run_total for r in out.itertuples()}
    assert got == {(1, 10): 1.0, (1, 20): 3.0, (1, 30): 6.0,
                   (2, 15): 5.0, (2, 25): 12.0}


def test_zscore_outliers_flags_only_extremes():
    from debezium_incubator_ray.functions.windows import zscore_outliers

    rng = np.random.default_rng(7)
    v = rng.normal(0, 1, 1000)
    v[0] = 100.0  # one clear outlier
    t = pa.table({
        "event_id": pa.array(np.arange(1000), pa.int64()),
        "event_type": pa.array(["a"] * 1000),
        "value": pa.array(v),
    })
    out = zscore_outliers(ray.data.from_arrow(t), threshold=10.0).to_pandas()
    assert list(out.event_id) == [0]
    assert out.z.iloc[0] > 10


def test_unigram_logprob_matches_manual():
    from debezium_incubator_ray.functions.text import unigram_logprob

    t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["a a b", "b c", ""]),
    })
    out = unigram_logprob(ray.data.from_arrow(t)).to_pandas()
    got = dict(zip(out.doc_id, out.logprob))
    # counts: a=2 b=2 c=1, total=5
    la, lb, lc = np.log(2 / 5), np.log(2 / 5), np.log(1 / 5)
    assert got[0] == round(2 * la + lb, 3)
    assert got[1] == round(lb + lc, 3)
    assert got[2] == 0.0


def test_term_postings_min_df():
    from debezium_incubator_ray.functions.text import term_postings

    t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["x y x", "x z", "x"]),
    })
    out = term_postings(ray.data.from_arrow(t), min_df=2).to_pandas()
    got = {(r.term, r.doc_id): r.tf for r in out.itertuples()}
    # only 'x' has df >= 2 (df=3); y,z have df=1
    assert got == {("x", 0): 2, ("x", 1): 1, ("x", 2): 1}


def test_chunk_token_windows_shapes_and_overlap():
    from debezium_incubator_ray.functions.pack import chunk_token_windows

    toks = " ".join(str(i) for i in range(10))  # 10 tokens
    t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([toks, "a b", ""]),
    })
    out = chunk_token_windows(
        ray.data.from_arrow(t), chunk=4, overlap=2
    ).to_pandas().sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    d0 = out[out.doc_id == 0]
    # stride 2: starts 0,2,4,6,8 -> 5 chunks, last is the 2-token tail
    assert list(d0.chunk_text) == [
        "0 1 2 3", "2 3 4 5", "4 5 6 7", "6 7 8 9", "8 9",
    ]
    assert list(d0.n_tokens) == [4, 4, 4, 4, 2]
    assert list(out[out.doc_id == 1].chunk_text) == ["a b"]
    assert len(out[out.doc_id == 2]) == 0  # empty doc -> no chunks


def test_chunk_validates_overlap():
    import pytest as _pytest
    from debezium_incubator_ray.functions.pack import chunk_token_windows

    with _pytest.raises(ValueError):
        chunk_token_windows(None, chunk=4, overlap=4)


def test_split_assign_deterministic_and_partition_invariant():
    from debezium_incubator_ray.functions.sample import split_assign

    t = pa.table({"doc_id": pa.array(np.arange(2000), pa.int64())})
    a = split_assign(ray.data.from_arrow(t)).to_pandas()
    b = split_assign(
        ray.data.from_arrow(t).repartition(7)
    ).to_pandas()
    ma = dict(zip(a.doc_id, a.split))
    mb = dict(zip(b.doc_id, b.split))
    assert ma == mb
    frac = a.split.value_counts(normalize=True)
    assert abs(frac["train"] - 0.9) < 0.03
    assert abs(frac.get("val", 0) - 0.05) < 0.02
    assert abs(frac.get("test", 0) - 0.05) < 0.02


def test_lake_reconcile_removes_deleted_tables(tmp_path):
    from debezium_incubator_ray import schema as S
    from debezium_incubator_ray.config import EngineConfig
    from debezium_incubator_ray.pipelines.lake import Lake

    root = str(tmp_path / "lake")
    lake = Lake(root)
    for n in ("a", "b", "c"):
        lake.create_table(n, S.pages_schema(), EngineConfig(num_partitions=2))
    # source now reports only {a}; b detached (kept), c deleted separately
    gone = lake.reconcile(["a", "b"])
    assert gone == ["c"] and lake.table_names() == ["a", "b"]
    gone = lake.reconcile(["a"], delete_files=True)
    assert gone == ["b"]
    for e in lake.engines.values():
        e.close()
    # restart: c re-attaches (files kept), b is gone for good
    assert Lake(root).table_names() == ["a", "c"]
