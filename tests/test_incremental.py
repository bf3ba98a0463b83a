"""Incremental view maintenance (functions/incremental.py): +after/-before
deltas telescope to the LWW final state's GROUP BY."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from debezium_incubator_ray.envelope import build_envelopes, lww_reduce
from debezium_incubator_ray.functions.incremental import (
    agg_contributions,
    incremental_groupby_agg,
)


def _env():
    # key 1: c(g=a,1) → u(g=a→b, 2) → d        : gone
    # key 2: c(g=a,10) → u(g=a,20)             : live in a, 20
    # key 3: c(g=b,5)                          : live in b, 5
    # key 4: c(g=b,7) → d → c(g=a,9)           : live in a, 9
    rows = [
        # (key, op, group, value, before_group, before_value, lsn)
        (1, "c", "a", 1.0, None, None, 1),
        (2, "c", "a", 10.0, None, None, 2),
        (3, "c", "b", 5.0, None, None, 3),
        (4, "c", "b", 7.0, None, None, 4),
        (1, "u", "b", 2.0, "a", 1.0, 5),
        (2, "u", "a", 20.0, "a", 10.0, 6),
        (1, "d", None, None, "b", 2.0, 7),
        (4, "d", None, None, "b", 7.0, 8),
        (4, "c", "a", 9.0, None, None, 9),
    ]
    after = pa.table(
        {
            "k": pa.array([r[0] for r in rows], pa.int64()),
            "g": pa.array([r[2] for r in rows], pa.string()),
            "v": pa.array([r[3] for r in rows], pa.float64()),
        }
    )
    before = pa.table(
        {
            "k": pa.array([r[0] for r in rows], pa.int64()),
            "g": pa.array([r[4] for r in rows], pa.string()),
            "v": pa.array([r[5] for r in rows], pa.float64()),
        }
    )
    env = build_envelopes(
        pa.array([r[1] for r in rows], pa.string()),
        after,
        before,
        np.zeros(len(rows), dtype=np.int32),
        np.array([r[6] for r in rows], dtype=np.int64),
        table="t",
    )
    return env


def test_contributions_kernel():
    c = agg_contributions(_env(), "g", "v")
    # afters: 7 non-null images (+1 each); befores: 4 (-1 each) → 3 live rows
    assert pc.sum(c["d_count"]).as_py() == 7 - 4
    # telescoped value sum == sum over final live rows (20 + 9 + 5)
    assert abs(pc.sum(c["d_sum"]).as_py() - 34.0) < 1e-9


def test_incremental_agg_matches_lww_groupby(ray_session):
    env = _env()
    got = (
        incremental_groupby_agg(ray.data.from_arrow(env), "g", "v")
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    # final live rows: k2 (a,20), k4 (a,9), k3 (b,5)
    assert got["g"].tolist() == ["a", "b"]
    assert got["n"].tolist() == [2, 1]
    assert np.allclose(got["total"].tolist(), [29.0, 5.0])


def test_null_group_key_contributes_to_null_group():
    # SQL GROUP BY keeps a NULL group; a valid image with a null group key
    # must land there, not be dropped
    after = pa.table(
        {
            "k": pa.array([7], pa.int64()),
            "g": pa.array([None], pa.string()),
            "v": pa.array([3.0], pa.float64()),
        }
    )
    env = build_envelopes(
        pa.array(["c"], pa.string()), after, None,
        np.zeros(1, dtype=np.int32), np.array([1], dtype=np.int64), table="t",
    )
    c = agg_contributions(env, "g", "v")
    assert c.num_rows == 1
    assert c["g"].to_pylist() == [None]
    assert c["d_count"].to_pylist() == [1]


def test_derive_rekeyed_envelopes_key_change_pairs(ray_session):
    """An update that changes the new key must produce delete+create (else
    the index accumulates stale entries); unchanged-key updates stay
    updates; deletes route by the before image."""
    from debezium_incubator_ray.pipelines.derive import derive_rekeyed_envelopes

    after = pa.table(
        {
            "g": pa.array(["A", "B", "A", None, "C"], pa.string()),
            "k": pa.array([1, 1, 2, 2, 3], pa.int64()),
        }
    )
    before = pa.table(
        {
            "g": pa.array([None, "A", None, "A", "C"], pa.string()),
            "k": pa.array([None, 1, None, 2, 3], pa.int64()),
        }
    )
    env = build_envelopes(
        pa.array(["c", "u", "c", "d", "u"], pa.string()),
        after, before,
        np.zeros(5, dtype=np.int32),
        np.array([1, 2, 3, 4, 5], dtype=np.int64),
        table="t",
    )
    schema = pa.schema([pa.field("g", pa.string()), pa.field("k", pa.int64())])
    out = derive_rekeyed_envelopes(env, schema, ("g", "k"))
    rows = sorted(
        zip(
            out["op"].to_pylist(),
            [a["g"] if a else None for a in out["after"].to_pylist()],
            [b["g"] if b else None for b in out["before"].to_pylist()],
            out["source"].combine_chunks().field("lsn").to_pylist(),
        )
    )
    # c(A,1)@1; u(A→B) → c(B)@2 + d at before(A)@2; c(A,2)@3;
    # d(A,2)@4 routes by before; u(C→C unchanged)@5 stays u
    assert rows == [
        ("c", "A", None, 1),
        ("c", "A", None, 3),
        ("c", "B", None, 2),
        ("d", None, "A", 2),
        ("d", None, "A", 4),
        ("u", "C", "C", 5),
    ]


def test_agg_view_envelopes_epochs(tmp_path):
    """The materialized-view fold: three epochs with group churn (create,
    update, group-emptying delete) keep the view lake equal to GROUP BY
    over the live state."""
    import numpy as np

    from debezium_incubator_ray.envelope import build_envelopes
    from debezium_incubator_ray.pipelines.derive import agg_view_envelopes

    def env_of(ops, gs, vals, befores, lsns):
        after = pa.table({"g": pa.array(gs, pa.string()),
                          "v": pa.array(vals, pa.float64())})
        before = pa.table({
            "g": pa.array([b[0] if b else None for b in befores], pa.string()),
            "v": pa.array([b[1] if b else None for b in befores], pa.float64()),
        })
        return build_envelopes(
            pa.array(ops, pa.string()), after, before,
            np.zeros(len(ops), dtype=np.int32),
            np.asarray(lsns, dtype=np.int64), table="t",
        )

    # epoch 1: two rows in A, one in B
    e1 = env_of(["c", "c", "c"], ["A", "A", "B"], [1.0, 2.0, 5.0],
                [None, None, None], [1, 2, 3])
    v1 = agg_view_envelopes(e1, "g", "v", None, lsn=1)
    got1 = {a["g"]: (a["n"], a["total"])
            for a in v1["after"].combine_chunks().to_pylist() if a}
    assert got1 == {"A": (2, 3.0), "B": (1, 5.0)}
    # epoch 2: row moves A->B (u), B's old row deleted -> B stays, A shrinks
    cur = pa.table({"g": ["A", "B"], "n": pa.array([2, 1], pa.int64()),
                    "total": pa.array([3.0, 5.0], pa.float64())})
    e2 = env_of(["u", "d"], ["B", "B"], [1.0, 0.0],
                [("A", 1.0), ("B", 5.0)], [4, 5])
    v2 = agg_view_envelopes(e2, "g", "v", cur, lsn=2)
    got2 = {}
    for op, a in zip(v2["op"].to_pylist(),
                     v2["after"].combine_chunks().to_pylist()):
        if a is not None:
            got2[a["g"]] = (op, a["n"], a["total"])
    assert got2["A"] == ("u", 1, 2.0)
    assert got2["B"] == ("u", 1, 1.0)
    # epoch 3: last A row deleted -> group A disappears (op 'd')
    cur3 = pa.table({"g": ["A", "B"], "n": pa.array([1, 1], pa.int64()),
                     "total": pa.array([2.0, 1.0], pa.float64())})
    e3 = env_of(["d"], ["A"], [0.0], [("A", 2.0)], [6])
    v3 = agg_view_envelopes(e3, "g", "v", cur3, lsn=3)
    assert v3["op"].to_pylist() == ["d"]


def test_agg_view_no_phantom_group_from_float_residue():
    """A group created and fully deleted within one epoch must NOT appear
    in the view, even when its +x/-x float chain leaves a residue sum."""
    import numpy as np

    from debezium_incubator_ray.envelope import build_envelopes
    from debezium_incubator_ray.pipelines.derive import agg_view_envelopes

    after = pa.table({"g": ["X", "X", "X"],
                      "v": pa.array([0.1, 0.3, 0.3], pa.float64())})
    before = pa.table({"g": [None, "X", "X"],
                       "v": pa.array([None, 0.1, 0.3], pa.float64())})
    env = build_envelopes(
        pa.array(["c", "u", "d"], pa.string()), after, before,
        np.zeros(3, dtype=np.int32), np.array([1, 2, 3], dtype=np.int64),
        table="t",
    )
    out = agg_view_envelopes(env, "g", "v", None, lsn=1)
    assert out.num_rows == 0


def test_enrich_envelopes_stream_table_join(tmp_path):
    """Stream-table join view: c/u enriched from the dim lake's LIVE
    state, missing dims yield NULLs, deleted dim rows never enrich,
    'd' facts pass through with the key intact."""
    import os
    import numpy as np
    from debezium_incubator_ray.pipelines import events_cdc as EC
    from debezium_incubator_ray.pipelines.derive import enrich_envelopes

    dim_schema = pa.schema([
        pa.field("dk", pa.int64(), nullable=False),
        pa.field("name", pa.string()),
    ])
    dim = EC.make_engine(
        str(tmp_path / "dim"), payload_schema=dim_schema,
        table="dims", key="dk",
    )
    dim.snapshot(pa.table({
        "dk": pa.array([1, 2, 3], pa.int64()),
        "name": pa.array(["one", "two", "three"]),
    }))
    # delete dim 2 via a stream epoch: its attrs must stop enriching
    del_env = build_envelopes(
        pa.array(["d"], pa.string()),
        pa.table({"dk": pa.array([2], pa.int64()),
                  "name": pa.array([None], pa.string())}),
        pa.table({"dk": pa.array([2], pa.int64()),
                  "name": pa.array(["two"], pa.string())}),
        np.array([2 % EC.NUM_PARTITIONS], dtype=np.int32),
        np.array([100], dtype=np.int64),
        table="dims",
    )
    EC.write_env_binlog(del_env, str(tmp_path / "dimlog"))
    dim.run(str(tmp_path / "dimlog"))

    fact_schema = pa.schema([
        pa.field("fk", pa.int64(), nullable=False),
        pa.field("dk_ref", pa.int64()),
    ])
    # facts: fk 10 -> dim 1 (live), fk 11 -> dim 2 (deleted), fk 12 ->
    # dim 99 (never existed), fk 13 created then deleted
    fact_env = build_envelopes(
        pa.array(["c", "c", "c", "c", "d"], pa.string()),
        pa.table({
            "fk": pa.array([10, 11, 12, 13, 13], pa.int64()),
            "dk_ref": pa.array([1, 2, 99, 1, None], pa.int64()),
        }),
        pa.table({
            "fk": pa.array([10, 11, 12, 13, 13], pa.int64()),
            "dk_ref": pa.array([None, None, None, None, 1],
                               pa.int64()),
        }),
        np.array([0, 0, 0, 0, 0], dtype=np.int32),
        np.array([1, 2, 3, 4, 5], dtype=np.int64),
        table="facts",
    )
    enriched, out_schema = enrich_envelopes(
        ray.data.from_arrow(fact_env), dim, "dk_ref", ["name"],
        fact_schema,
    )
    tb = pa.concat_tables(
        list(enriched.iter_batches(batch_format="pyarrow")),
        promote_options="permissive",
    )
    assert [f.name for f in out_schema] == ["fk", "dk_ref", "name"]
    after = tb["after"].combine_chunks()
    by_fk = {}
    for i in range(tb.num_rows):
        row = after[i].as_py()
        op = tb["op"][i].as_py()
        if row is not None:
            by_fk[(row["fk"], op)] = row
    assert by_fk[(10, "c")]["name"] == "one"
    assert by_fk[(11, "c")]["name"] is None   # dim deleted -> no attrs
    assert by_fk[(12, "c")]["name"] is None   # dim never existed
    assert by_fk[(13, "c")]["name"] == "one"
    # the delete envelope survives with a null after and its key in before
    ops = tb["op"].to_pylist()
    assert ops.count("d") == 1
    d_idx = ops.index("d")
    assert tb["before"][d_idx].as_py()["fk"] == 13
