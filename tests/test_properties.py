"""Property-based tests (hypothesis) for the LWW kernels — the algebra the
exactly-once contract rests on: for ANY event stream with distinct LSNs,
  (1) lww_reduce == "argmax lsn per key" (checked against a pandas oracle);
  (2) epoch-splitting: merging events in any chunking equals merging them
      all at once (this is why micro-batch boundaries can't change state);
  (3) replay idempotence: re-merging already-applied events is a no-op;
  (4) tombstone compaction drops exactly the delete-winner keys, and
      tombstone-retention marks them instead.
LSN uniqueness mirrors the engine's input contract (log positions are a
total order, SURVEY O2)."""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from debezium_incubator_ray import schema as S
from debezium_incubator_ray.envelope import DELETED, lww_reduce, merge_lww


@st.composite
def event_tables(draw, max_events=60, max_keys=12):
    n = draw(st.integers(0, max_events))
    keys = draw(
        st.lists(st.integers(0, max_keys - 1), min_size=n, max_size=n)
    )
    ops = draw(
        st.lists(st.sampled_from(["c", "u", "d", "r"]), min_size=n, max_size=n)
    )
    perm = np.random.RandomState(draw(st.integers(0, 2**31 - 1))).permutation(n)
    lsns = (perm + 1).astype(np.int64)  # distinct, arbitrary arrival order
    vals = draw(st.lists(st.integers(-5, 5), min_size=n, max_size=n))
    return pa.table(
        {
            "k": pa.array(keys, pa.int64()),
            "v": pa.array(vals, pa.int64()),
            "op": pa.array(ops, pa.string()),
            S.LSN: pa.array(lsns),
        }
    )


def _winners_pandas(t: pa.Table) -> pd.DataFrame:
    df = t.to_pandas()
    if df.empty:
        return df
    return (
        df.sort_values(S.LSN)
        .groupby("k", as_index=False)
        .last()
        .sort_values("k")
        .reset_index(drop=True)
    )


@given(event_tables())
@settings(max_examples=60, deadline=None)
def test_lww_reduce_matches_pandas_argmax(t):
    got = lww_reduce(t, "k").to_pandas().sort_values("k").reset_index(drop=True)
    exp = _winners_pandas(t)
    if exp.empty:
        assert got.empty
        return
    pd.testing.assert_frame_equal(
        got[["k", "v", "op", S.LSN]], exp[["k", "v", "op", S.LSN]]
    )
    # output is key-sorted (the sorted-run invariant merge_lww relies on)
    ks = got["k"].to_numpy()
    assert (ks[1:] >= ks[:-1]).all()


@given(event_tables(), st.integers(0, 60))
@settings(max_examples=60, deadline=None)
def test_epoch_splitting_invariance(t, cut):
    """merge(merge(state, epoch1), epoch2) == merge(state, all) for every
    split point of the LSN-ORDERED stream — micro-batch boundaries can't
    change the final lake.

    The LSN ordering is load-bearing: with an arbitrary (non-ordered)
    split, a delete compacted in epoch 1 can be resurrected by an OLDER
    create arriving in epoch 2 (hypothesis finds this immediately). That
    is precisely why the engine enforces per-partition LSN monotonicity
    across epochs — ordered segment delivery plus the watermark filter
    (see apply_epoch's misaligned-partial-epoch guard)."""
    t = t.sort_by([(S.LSN, "ascending")])  # the delivery contract
    cut = min(cut, t.num_rows)
    one_shot = merge_lww(None, lww_reduce(t, "k"), "k")
    s1 = merge_lww(None, lww_reduce(t.slice(0, cut), "k"), "k")
    two_step = merge_lww(s1, lww_reduce(t.slice(cut), "k"), "k")
    assert one_shot.to_pydict() == two_step.to_pydict()


@given(event_tables())
@settings(max_examples=40, deadline=None)
def test_replay_idempotence(t):
    """Re-applying the same (already-won) events changes nothing — the
    kernel-level half of exactly-once (the watermark filter is the other)."""
    ev = lww_reduce(t, "k")
    once = merge_lww(None, ev, "k")
    twice = merge_lww(once, ev, "k")
    assert once.to_pydict() == twice.to_pydict()


@given(event_tables())
@settings(max_examples=40, deadline=None)
def test_tombstone_semantics(t):
    exp = _winners_pandas(t)
    dead = set(exp[exp["op"] == "d"]["k"]) if not exp.empty else set()
    live = set(exp["k"]) - dead if not exp.empty else set()

    compacted = merge_lww(None, lww_reduce(t, "k"), "k")
    assert set(compacted["k"].to_pylist()) == live

    retained = merge_lww(None, lww_reduce(t, "k"), "k", keep_tombstones=True)
    df = retained.to_pandas()
    assert set(df["k"]) == live | dead
    assert set(df[df[DELETED]]["k"]) == dead


@given(
    st.lists(st.integers(1, 6), min_size=1, max_size=8),  # tx sizes
    st.integers(0, 40),                                   # delivered prefix
)
@settings(max_examples=40, deadline=None)
def test_tx_cutoff_prefix_soundness(sizes, delivered):
    """For any sequence of transactions and any delivered prefix of the
    stream, tx_cutoff admits exactly the maximal prefix of COMPLETE
    transactions: every admitted row's tx is fully delivered, and no
    complete-tx row below the first incomplete one is held back."""
    from debezium_incubator_ray.stages.apply import tx_cutoff

    lsn, tx_id, tx_ev = [], [], []
    next_lsn = 1
    for t, size in enumerate(sizes):
        for _ in range(size):
            lsn.append(next_lsn)
            tx_id.append(t)
            tx_ev.append(size)
            next_lsn += 1
    n = min(delivered, len(lsn))
    if n == 0:
        return
    got = tx_cutoff(
        pa.array(lsn[:n], pa.int64()),
        pa.array(tx_id[:n], pa.int64()),
        pa.array(tx_ev[:n], pa.int32()),
    )
    # reference: first lsn whose tx is not fully delivered in the prefix
    from collections import Counter

    seen = Counter(tx_id[:n])
    cut_ref = None
    for i in range(n):
        if seen[tx_id[i]] < tx_ev[i]:
            cut_ref = lsn[i]
            break
    assert got == cut_ref


@given(st.lists(st.tuples(st.integers(0, 5), st.integers(0, 3)), max_size=40))
@settings(max_examples=30, deadline=None)
def test_derived_index_equals_primary_projection(cmds):
    """For ANY consistent change stream (honest before images), the
    re-keyed stream's LWW state equals the (group, key) projection of the
    primary LWW state — no stale index entries, none missing. Groups
    include None: a NULL key component in a PRESENT before image still
    owns an index entry, and moving off it must emit the delete."""
    from debezium_incubator_ray.envelope import build_envelopes, lww_reduce
    from debezium_incubator_ray.pipelines.derive import derive_rekeyed_envelopes

    # state machine: keys upsert/delete with group values; before images
    # reflect true prior state (create only on absent, delete only on live)
    state = {}
    rows = []  # (op, after_g, after_k, before_g, before_k, lsn)
    lsn = 0
    groups = ["g0", "g1", "g2", None]
    for k, gsel in cmds:
        lsn += 1
        g = groups[gsel]
        if k in state:
            # alternate update / delete deterministically by lsn
            if lsn % 3 == 0:
                rows.append(("d", None, None, state[k], k, lsn))
                del state[k]
            else:
                rows.append(("u", g, k, state[k], k, lsn))
                state[k] = g
        else:
            rows.append(("c", g, k, None, None, lsn))
            state[k] = g
    if not rows:
        return
    after = pa.table(
        {
            "g": pa.array([r[1] for r in rows], pa.string()),
            "k": pa.array([r[2] for r in rows], pa.int64()),
        }
    )
    before = pa.table(
        {
            "g": pa.array([r[3] for r in rows], pa.string()),
            "k": pa.array([r[4] for r in rows], pa.int64()),
        }
    )
    env = build_envelopes(
        pa.array([r[0] for r in rows], pa.string()), after, before,
        np.zeros(len(rows), dtype=np.int32),
        np.array([r[5] for r in rows], dtype=np.int64), table="t",
    )
    schema = pa.schema([pa.field("g", pa.string()), pa.field("k", pa.int64())])
    derived = derive_rekeyed_envelopes(env, schema, ("g", "k"))
    # fold the derived stream by LWW on the composite key
    d_after = derived["after"].combine_chunks()
    d_before = derived["before"].combine_chunks()
    idx_state = {}
    order = np.argsort(
        derived["source"].combine_chunks().field("lsn").to_numpy(
            zero_copy_only=False
        ),
        kind="stable",
    )
    ops = derived["op"].to_pylist()
    for i in order:
        i = int(i)
        if ops[i] == "d":
            b = d_before[i].as_py()
            idx_state.pop((b["g"], b["k"]), None)
        else:
            a = d_after[i].as_py()
            idx_state[(a["g"], a["k"])] = True
    assert set(idx_state) == {(g, k) for k, g in state.items()}


# ---------------------------------------------------------------------------
# partial (per-cell) fold properties


@st.composite
def partial_event_tables(draw, max_events=60, max_keys=8):
    """Random masked event stream: distinct LSNs, per-event cell mask over
    two payload cells (bits 1=a, 2=b; bit 0 = key, always set)."""
    n = draw(st.integers(0, max_events))
    keys = draw(st.lists(st.integers(0, max_keys - 1), min_size=n, max_size=n))
    ops = draw(st.lists(st.sampled_from(["c", "u", "d"]), min_size=n, max_size=n))
    masks = draw(st.lists(st.integers(1, 7), min_size=n, max_size=n))
    avals = draw(st.lists(
        st.one_of(st.none(), st.integers(-50, 50)), min_size=n, max_size=n))
    bvals = draw(st.lists(
        st.one_of(st.none(), st.integers(0, 9).map(lambda x: f"s{x}")),
        min_size=n, max_size=n))
    perm = np.random.RandomState(draw(st.integers(0, 2**31 - 1))).permutation(n)
    lsns = perm.astype(np.int64)  # distinct, arbitrary arrival order
    from debezium_incubator_ray.envelope import SET_MASK

    return pa.table({
        "k": pa.array(keys, pa.int64()),
        "a": pa.array(avals, pa.int64()),
        "b": pa.array(bvals, pa.string()),
        "op": pa.array(ops, pa.string()),
        S.LSN: pa.array(lsns, pa.int64()),
        SET_MASK: pa.array(masks, pa.int64()),
    })


def _partial_oracle(tbl, counter_a=False):
    """Row-at-a-time per-cell reference: replay events in LSN order."""
    rows = sorted(tbl.to_pylist(), key=lambda r: r[S.LSN])
    state = {}
    for r in rows:
        k = r["k"]
        if r["op"] == "d":
            state.pop(k, None)
            continue
        cur = state.get(k, {"a": None, "b": None})
        if r["_set_mask"] >> 1 & 1:
            if counter_a:
                if r["a"] is not None:
                    cur["a"] = (cur["a"] or 0) + r["a"]
            else:
                cur["a"] = r["a"]
        if r["_set_mask"] >> 2 & 1:
            cur["b"] = r["b"]
        cur["lsn"] = r[S.LSN]
        state[k] = cur
    return {
        k: (v["a"], v["b"], v["lsn"]) for k, v in state.items()
    }


@given(partial_event_tables(), st.integers(1, 4), st.booleans())
@settings(max_examples=120, deadline=None)
def test_partial_fold_epoch_split_matches_oracle(tbl, n_chunks, counter_a):
    """For ANY masked stream, any epoch chunking of partial_fold +
    merge_partial equals the row-at-a-time per-cell replay — with or
    without a counter column."""
    from debezium_incubator_ray.envelope import merge_partial, partial_fold

    cc = ("a",) if counter_a else ()
    # chunk by LSN range (epochs are LSN-contiguous, like the engine's
    # watermark guarantees)
    order = pa.compute.sort_indices(
        tbl.select([S.LSN]), sort_keys=[(S.LSN, "ascending")]
    )
    t = tbl.take(order)
    n = t.num_rows
    lake = None
    for ci in range(n_chunks):
        lo = ci * n // n_chunks
        hi = (ci + 1) * n // n_chunks
        chunk = t.slice(lo, hi - lo)
        if chunk.num_rows == 0:
            continue
        lake = merge_partial(
            lake, partial_fold(chunk, "k", counter_cols=cc), "k",
            counter_cols=cc,
        )
    got = {}
    if lake is not None:
        for r in lake.to_pylist():
            got[r["k"]] = (r["a"], r["b"], r[S.LSN])
    exp = _partial_oracle(t, counter_a=counter_a)
    assert got == exp


@given(
    toks=st.lists(
        st.text(alphabet="ab\x1f", min_size=0, max_size=4),
        min_size=2, max_size=6,
    )
)
@settings(max_examples=200, deadline=None)
def test_bigram_key_injective_under_separator_tokens(toks):
    """The length-prefixed bigram key must be injective even when tokens
    CONTAIN the separator: distinct (w1, w2) pairs -> distinct keys."""
    pairs = [(a, b) for a in toks for b in toks]
    keys = {}
    for a, b in pairs:
        k = f"{len(a)}\x1f{a}\x1f{b}"
        if k in keys:
            assert keys[k] == (a, b), (keys[k], (a, b), k)
        keys[k] = (a, b)


@given(
    vals=st.lists(
        st.one_of(st.none(), st.floats(-100, 100, allow_nan=False)),
        min_size=1, max_size=40,
    ),
    ops=st.data(),
    lo=st.floats(-50, 50, allow_nan=False),
    hi=st.floats(-50, 50, allow_nan=False),
)
@settings(max_examples=120, deadline=None)
def test_violation_mask_matches_pandas(vals, ops, lo, hi):
    """violation_mask == the pandas reference for min/max/not_null on
    random data: deletes exempt, NULL passes min/max, first-rule reason."""
    from debezium_incubator_ray.stages.normalize import violation_mask

    n = len(vals)
    op = ops.draw(st.lists(st.sampled_from(["c", "u", "r", "d"]),
                           min_size=n, max_size=n))
    t = pa.table({
        "v": pa.array(vals, pa.float64()),
        "op": pa.array(op, pa.string()),
    })
    rules = [("v", "min", lo), ("v", "max", hi), ("v", "not_null", None)]
    bad, reason = violation_mask(t, rules)
    df = pd.DataFrame({"v": vals, "op": op})
    is_del = df["op"] == "d"
    m_min = (df["v"] < lo).fillna(False) & ~is_del
    m_max = (df["v"] > hi).fillna(False) & ~is_del
    m_nn = df["v"].isna() & ~is_del
    expect_bad = (m_min | m_max | m_nn).to_numpy()
    got_bad = bad.to_numpy(zero_copy_only=False)
    assert (got_bad == expect_bad).all()
    # first-rule reason in declaration order
    r = reason.to_pylist()
    for i in range(n):
        if m_min[i]:
            assert r[i] == "v:min"
        elif m_max[i]:
            assert r[i] == "v:max"
        elif m_nn[i]:
            assert r[i] == "v:not_null"
        else:
            assert r[i] is None


@given(
    starts=st.lists(st.integers(0, 1000), min_size=1, max_size=40),
    lens=st.data(),
)
@settings(max_examples=80, deadline=None)
def test_peak_sweep_matches_bruteforce(starts, lens):
    """The two-phase day-sweep equals the O(n^2) closed-interval overlap
    maximum for arbitrary session intervals."""
    durs = lens.draw(st.lists(st.integers(0, 500), min_size=len(starts),
                              max_size=len(starts)))
    iv = [(s, s + d) for s, d in zip(starts, durs)]
    # brute force: peak = max over endpoints of #intervals covering it
    pts = sorted({t for s, e in iv for t in (s, e)})
    brute = max(sum(1 for s, e in iv if s <= t <= e) for t in pts)
    # sweep with the engine's tie rule (+1 before -1 at equal t)
    events = sorted(
        [(s, 0, +1) for s, _ in iv] + [(e, 1, -1) for _, e in iv]
    )
    run = peak = 0
    for _, _, d in events:
        run += d
        peak = max(peak, run)
    assert peak == brute


@given(
    ids=st.lists(st.integers(0, 2**31 - 1), min_size=1, max_size=60),
)
@settings(max_examples=40, deadline=None)
def test_media_synth_parse_roundtrip_property(ids):
    """For ANY id array, parsing the synthesized container bytes recovers
    exactly the generator's formulas — the pure-kernel half of the
    multimodal_decode gate (no Ray needed)."""
    from debezium_incubator_ray.functions.multimodal import (
        parse_media_headers, synth_media_payloads,
    )

    arr = np.array(ids, dtype=np.int64)
    out = parse_media_headers(synth_media_payloads(arr),
                              id_arr=pa.array(arr)).to_pylist()
    for r in out:
        s, kc = r["doc_id"] // 3, r["doc_id"] % 3
        if kc == 0:
            assert r["kind"] == "png"
            assert r["width"] == s % 317 + 1 and r["height"] == s % 211 + 1
            assert r["channels"] == [1, 3, 2, 4][s % 4]
            assert r["bit_depth"] == 8
            assert r["sample_rate"] is None and r["n_samples"] is None
        elif kc == 1:
            assert r["kind"] == "bmp"
            assert r["width"] == s % 509 + 1 and r["height"] == s % 255 + 1
            assert r["channels"] == (3 if s % 2 == 0 else 4)
        else:
            assert r["kind"] == "wav"
            assert r["channels"] == s % 2 + 1 and r["bit_depth"] == 16
            assert r["sample_rate"] == [8000, 16000, 44100][s % 3]
            assert r["n_samples"] == s % 1000 + 1
            assert r["width"] is None and r["height"] is None


@given(st.lists(st.text(max_size=12) | st.integers(-10**9, 10**9),
                min_size=0, max_size=50))
@settings(max_examples=40, deadline=None)
def test_md5_bridge_matches_hashlib(vals):
    """md5_u64 (the DuckDB bridge every hash split / simhash oracle rests
    on) equals a direct hashlib computation for arbitrary values."""
    import hashlib

    from debezium_incubator_ray.functions.tokens import md5_u64

    arr = pa.array([str(v) for v in vals], pa.string())
    got = md5_u64(arr)
    for v, h in zip(vals, got):
        want = int.from_bytes(
            hashlib.md5(str(v).encode()).digest()[:8], "big"
        )
        assert int(h) == want


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 20),
    colort=st.sampled_from([0, 2, 4, 6]),
    filters=st.lists(st.integers(0, 4), min_size=1, max_size=20),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_round_trip_property(w, h, colort, filters, seed):
    """Any 8-bit image, any per-row filter choice: encoding against the
    spec's reconstructed-predictor definitions and decoding through
    decode_png_baseline is the identity."""
    import struct
    import zlib

    from debezium_incubator_ray.functions.multimodal import (
        _png_chunk, decode_png_baseline,
    )

    chn = {0: 1, 2: 3, 4: 2, 6: 4}[colort]
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, chn), dtype=np.uint8)

    def paeth(a, b, c):
        p = a + b - c
        pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
        return a if pa_ <= pb and pa_ <= pc_ else (b if pb <= pc_ else c)

    rows = []
    prev = np.zeros(w * chn, np.int64)
    for r in range(h):
        line = img[r].ravel().astype(np.int64)
        f = filters[r % len(filters)]
        raw = np.empty_like(line)
        for x in range(len(line)):
            left = line[x - chn] if x >= chn else 0
            up = prev[x] if r else 0
            ul = (prev[x - chn] if x >= chn else 0) if r else 0
            if f == 0:
                raw[x] = line[x]
            elif f == 1:
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
    png = (b"\x89PNG\r\n\x1a\n"
           + _png_chunk(b"IHDR",
                        struct.pack(">IIBBBBB", w, h, 8, colort, 0, 0, 0))
           + _png_chunk(b"IDAT", zlib.compress(scan))
           + _png_chunk(b"IEND", b""))
    assert (decode_png_baseline(png) == img).all()


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(1, 16),
    h=st.integers(1, 12),
    bpp=st.sampled_from([24, 32]),
    top_down=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_bmp_round_trip_property(w, h, bpp, top_down, seed):
    """Any 24/32bpp BMP (either row order, any stride padding) decodes
    back to its RGB(A) pixels exactly."""
    import struct

    from debezium_incubator_ray.functions.multimodal import decode_bmp

    chn = bpp // 8
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, chn), dtype=np.uint8)
    stride = (w * chn + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    disk = img[..., [2, 1, 0] + ([3] if chn == 4 else [])]  # RGB->BGR
    rows[:, : w * chn] = disk.reshape(h, w * chn)
    px = (rows if top_down else rows[::-1]).tobytes()
    hdr = (b"BM" + struct.pack("<IHHI", 54 + len(px), 0, 0, 54)
           + struct.pack("<IiiHHIIiiII", 40, w, -h if top_down else h,
                         1, bpp, 0, len(px), 2835, 2835, 0, 0))
    assert (decode_bmp(hdr + px) == img).all()
