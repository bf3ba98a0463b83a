"""Corpus composition operators: deterministic stratified sampling and
quality filtering — the "mix the training set" stage of a data pipeline.

Both are pure per-batch filters (no shuffle, no state): they stream at the
read's parallelism and are safely resumable — the sampling decision is a
hash of the row's id, so re-running over any subset of shards reproduces
the identical sample (no RNG, no seen-state). The reference has no
sampling; these extend the training-data surface over the same substrate.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from debezium_incubator_ray.functions.text import quality_score
from debezium_incubator_ray.functions.tokens import md5_u64

_DENOM = 1_000_000


def _per_group_lookup(
    values: pa.Array, mapping: Dict, default, dtype=np.int64
) -> np.ndarray:
    """Vectorized ``mapping.get(value, default)`` per row (one dictionary
    encode + one table take). NULL values resolve via
    ``mapping.get(None, default)`` — null is its own group, never
    conflated with any real key."""
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    de = pc.dictionary_encode(values)
    vocab = de.dictionary.to_pylist()
    table = np.array([mapping.get(v, default) for v in vocab], dtype=dtype)
    valid = pc.is_valid(de.indices).to_numpy(zero_copy_only=False)
    out = np.full(len(values), mapping.get(None, default), dtype=dtype)
    if valid.any():
        iv = de.indices.to_numpy(zero_copy_only=False)
        out[valid] = table[iv[valid].astype(np.int64)]
    return out


class StratifiedSampler:
    """Keep each row with a per-stratum probability, deterministically:
    row kept iff md5_u64(str(id)) % 1e6 < rate[stratum] * 1e6.

    md5 over the stringified id is the cross-engine bridge hash (DuckDB:
    ``('0x' || substring(md5(CAST(id AS VARCHAR)), 1, 16))::UBIGINT``) —
    any engine replays the exact same sample, which is what makes the
    sample auditable. ``default_rate`` applies to strata not listed."""

    def __init__(
        self,
        rates: Dict[str, float],
        strata_col: str = "lang",
        id_col: str = "doc_id",
        default_rate: float = 0.0,
    ):
        self.rates = dict(rates)
        self.strata_col = strata_col
        self.id_col = id_col
        self.default_rate = default_rate
        # integer thresholds precomputed once per actor, not per batch
        self._thresh = {k: int(v * _DENOM) for k, v in self.rates.items()}
        self._default_thresh = int(default_rate * _DENOM)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].combine_chunks()
        h = md5_u64(pc.cast(ids, pa.string())) % np.uint64(_DENOM)
        # per-stratum threshold via the shared dictionary lookup
        thresh = _per_group_lookup(
            batch[self.strata_col], self._thresh, self._default_thresh
        )
        return batch.filter(pa.array(h.astype(np.int64) < thresh))


def stratified_sample(
    ds,
    rates: Dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
):
    """documents → deterministic per-stratum subsample (see
    StratifiedSampler). One streaming pass, no shuffle."""
    return ds.map_batches(
        StratifiedSampler(rates, strata_col, id_col, default_rate),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def quality_filter(
    ds,
    min_tokens: int = 0,
    max_mean_token_len: Optional[float] = None,
    max_punct_ratio: Optional[float] = None,
    langs: Optional[tuple] = None,
    text_col: str = "text",
):
    """Keep documents passing cheap quality gates (token count floor, mean
    token length / punctuation ratio ceilings, language allowlist); emits
    the metric columns alongside the kept rows. One streaming pass."""

    def f(batch: pa.Table) -> pa.Table:
        q = quality_score(batch, text_col)
        keep = pc.greater_equal(q["n_tokens"], min_tokens)
        if max_mean_token_len is not None:
            keep = pc.and_(
                keep, pc.less_equal(q["mean_token_len"], max_mean_token_len)
            )
        if max_punct_ratio is not None:
            keep = pc.and_(
                keep, pc.less_equal(q["punct_ratio"], max_punct_ratio)
            )
        if langs is not None:
            keep = pc.and_(
                keep, pc.is_in(q["lang"], value_set=pa.array(list(langs)))
            )
        return q.filter(keep)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def global_histogram(ds, col: str):
    """(sorted distinct values, cumulative counts) of an integer column —
    the streaming histogram reduction behind every exact global quantile:
    each batch contributes (value, count) partials, the groupby folds them
    to one row per DISTINCT value (integer metrics have bounded
    cardinality: ~1e5 distinct lengths at any corpus size), and the driver
    holds only the metadata-sized CDF. No sort of the data, no sampling
    error (vs t-digest/quantile sketches)."""
    from ray.data.aggregate import Sum

    def counts(t: pa.Table) -> pa.Table:
        v = t[col].combine_chunks()
        if not pa.types.is_integer(v.type):
            raise TypeError(
                f"global_histogram needs an integer metric column; "
                f"{col!r} is {v.type} (bucketize/scale floats first)"
            )
        vc = v.value_counts()
        return pa.table({
            col: vc.field("values"),
            "cnt": pc.cast(vc.field("counts"), pa.int64()),
        })

    hist = (
        ds.map_batches(counts, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(col)
        .aggregate(Sum("cnt"))
        .take_all()  # one row per distinct metric value — tiny
    )
    hist.sort(key=lambda r: r[col])
    vals = np.array([r[col] for r in hist], dtype=np.int64)
    cum = np.cumsum([r["sum(cnt)"] for r in hist]) if hist else np.empty(0, np.int64)
    return vals, cum


def quantile_from_cdf(vals: np.ndarray, cum: np.ndarray, q: float) -> int:
    """T = min v such that count(rows with v' <= v) >= ceil(q * n)."""
    n = int(cum[-1]) if len(cum) else 0
    if n == 0:
        return 0
    need = int(np.ceil(q * n))
    return int(vals[np.searchsorted(cum, need)])


def global_quantile_threshold(
    ds,
    col: str = "n_chars",
    q: float = 0.8,
) -> int:
    """Exact q-quantile threshold of an integer column, distributed (see
    global_histogram for the shape)."""
    vals, cum = global_histogram(ds, col)
    return quantile_from_cdf(vals, cum, q)


def top_quantile_filter(
    ds,
    col: str = "n_chars",
    q: float = 0.8,
):
    """Keep rows with ``col`` >= the exact global q-quantile threshold
    (top (1-q) fraction plus ties) — curation by a corpus-wide bar rather
    than a hand-picked constant. Two streaming passes: histogram, then a
    stateless filter at the broadcast threshold."""
    t_val = global_quantile_threshold(ds, col=col, q=q)

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t[col], t_val))

    out = ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
    return out, t_val


def fixed_size_sample(ds, k: int, id_col: str = "doc_id",
                      unique_ids: bool = True):
    """Exactly-k uniform sample, deterministic and engine-replayable: the
    k rows with the smallest (md5_u64(str(id)), id) — a fixed token/doc
    budget rather than a rate. Any engine (or any future re-run over any
    shard subset, since the key is a pure function of the row id) selects
    the identical k rows.

    Scale shape: each batch reduces to its own top-k (hash, id) partial —
    k rows per block, metadata-sized — merged once on the driver
    (identical (hash, id) pairs from duplicate physical rows collapse to
    ONE winner slot), winner ids broadcast, source filtered in place. k is
    the documented small-side bound (a sample that doesn't fit one node
    isn't a sample). ``unique_ids=False`` adds the first-per-id pass so a
    source with re-delivered shards still yields exactly k physical
    rows."""
    from debezium_incubator_ray.functions.dedup import _broadcast_winner_filter

    def topk_partial(t: pa.Table) -> pa.Table:
        ids64 = pc.cast(t[id_col].combine_chunks(), pa.int64())
        ids = np.unique(ids64.to_numpy(zero_copy_only=False))
        # unique FIRST: duplicate physical rows inside one block must not
        # occupy several of the block's k winner slots (h is a pure
        # function of id, so deduping ids dedups (h, id) pairs)
        h = md5_u64(pc.cast(pa.array(ids, pa.int64()), pa.string()))
        if len(ids) > k:
            # argpartition selects by h alone; widen the cut to include
            # every row TIED with the k-th hash so the (h, id) tiebreak is
            # decided by the lexsort below, not by partition luck
            part = np.argpartition(h, k - 1)
            hb = h[part[k - 1]]
            keep = np.union1d(part[:k], np.nonzero(h == hb)[0])
            h, ids = h[keep], ids[keep]
        order = np.lexsort((ids, h))[:k]
        return pa.table({
            "h": pa.array(h[order], pa.uint64()),
            id_col: pa.array(ids[order], pa.int64()),
        })

    partial = ds.map_batches(
        topk_partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()  # <= k rows per block
    if not partial:
        return ds.map_batches(
            lambda t: t.slice(0, 0), batch_format="pyarrow",
            zero_copy_batch=True,
        )
    h = np.array([r["h"] for r in partial], dtype=np.uint64)
    ids = np.array([r[id_col] for r in partial], dtype=np.int64)
    # duplicate physical rows per id (re-delivered shards) contribute
    # identical (h, id) pairs from different blocks — they must occupy ONE
    # of the k winner slots, not several
    pairs = np.unique(np.stack([h, ids.view(np.uint64)], axis=1), axis=0)
    h, ids = pairs[:, 0], pairs[:, 1].view(np.int64)
    order = np.lexsort((ids, h))[:k]
    return _broadcast_winner_filter(
        ds, ids[order], id_col, unique_ids=unique_ids
    )


def domain_quota_sample(
    ds,
    quota,
    domain_col: str = "domain",
    id_col: str = "doc_id",
    buckets: int = 64,
    default_quota: int = 0,
):
    """Keep at most ``quota`` rows per domain — crawl balancing so one
    giant host can't dominate the corpus mix. Within a domain the kept
    rows are the quota smallest (md5_u64(str(id)), id), i.e. a
    deterministic uniform pick, replayable by any engine.

    ``quota`` is one cap for every group (int) OR a per-group dict —
    the dict form IS exact mixture construction: pass {stratum: count}
    to assemble a training mix with exact per-source/per-language counts
    (groups not listed get ``default_quota``).

    Scale shape: the election shuffles (domain, hash, id) only — grouped
    by a hash bucket of the domain — winner ids broadcast through the
    shared small-side filter."""
    from debezium_incubator_ray.functions.dedup import _broadcast_winner_filter
    from debezium_incubator_ray.hashing import stable_hash

    def narrow(t: pa.Table) -> pa.Table:
        dom = t[domain_col].combine_chunks()
        ids64 = pc.cast(t[id_col].combine_chunks(), pa.int64())
        h = md5_u64(pc.cast(ids64, pa.string()))
        # null domains form their OWN group: bucket them with "" (routing
        # only — the run boundary below still separates null from "")
        bucket_dom = pc.fill_null(dom, "")
        return pa.table({
            domain_col: dom,
            "h": pa.array(h, pa.uint64()),
            id_col: ids64,
            "_bucket": pa.array(
                (stable_hash(bucket_dom) % np.uint64(buckets)).astype(np.int32)
            ),
        })

    def quota_per_domain(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t, sort_keys=[(domain_col, "ascending"), ("h", "ascending"),
                          (id_col, "ascending")]
        )
        s = t.take(idx)
        dom = s[domain_col].combine_chunks()
        first = np.ones(len(s), dtype=bool)
        a, b = dom.slice(1), dom.slice(0, len(dom) - 1)
        # null-safe run boundary: null vs null = same group, null vs value
        # = new group (not_equal alone propagates null -> False -> nulls
        # would silently merge into the preceding domain's quota)
        neq = pc.or_(
            pc.fill_null(pc.not_equal(a, b), False),
            pc.xor(pc.is_null(a), pc.is_null(b)),
        )
        first[1:] = neq.to_numpy(zero_copy_only=False)
        # rank within domain run, vectorized: position - run start
        pos = np.arange(len(s), dtype=np.int64)
        run_start = np.maximum.accumulate(np.where(first, pos, 0))
        if isinstance(quota, dict):
            # per-group caps; the NULL group reads quota.get(None) — never
            # the "" entry (they are distinct groups at the run boundary)
            row_cap = _per_group_lookup(dom, quota, default_quota)
        else:
            row_cap = quota
        keep = (pos - run_start) < row_cap
        return s.filter(pa.array(keep)).select([id_col])

    winners = (
        ds.map_batches(narrow, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_bucket")
        .map_groups(quota_per_domain, batch_format="pyarrow")
    )
    return _broadcast_winner_filter(ds, winners, id_col, buckets=buckets)


def split_assign(ds, fractions=None, id_col: str = "doc_id"):
    """Deterministic train/val/test assignment: each row gets the label
    whose cumulative md5-bucket range contains md5_u64(str(id)) % 1e6 —
    the same cross-engine bridge hash as :class:`StratifiedSampler`, so
    any engine (or a resumed run over any shard subset) reproduces the
    identical split. One streaming pass, no shuffle, no RNG."""
    fractions = dict(fractions or {"train": 0.9, "val": 0.05, "test": 0.05})
    if abs(sum(fractions.values()) - 1.0) > 1e-9:
        raise ValueError("split fractions must sum to 1")
    labels = list(fractions)
    # cumulative integer thresholds over the md5 bucket space
    edges = np.cumsum([int(fractions[l] * _DENOM) for l in labels])
    edges[-1] = _DENOM  # absorb rounding so every bucket has a label

    def f(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].combine_chunks()
        h = (md5_u64(pc.cast(ids, pa.string())) % np.uint64(_DENOM)).astype(
            np.int64
        )
        li = np.searchsorted(edges, h, side="right")
        lab = np.array(labels, dtype=object)[li]
        return batch.append_column("split", pa.array(lab, pa.string()))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _lehmer_perm(ids: np.ndarray, id_col: str, seed: int, mult: int,
                 mod: int) -> np.ndarray:
    """The shared keyed permutation: perm = (id * mult + seed) % mod with
    BOTH factors reduced mod first so the product stays < 2^62 (a raw
    id*mult silently wraps uint64 for ids beyond ~6.9e9 and diverges from
    any SQL oracle). Ids must lie in [0, mod) — beyond it the map is no
    longer a bijection and sorted orders stop being deterministic."""
    ids = ids.astype(np.int64)
    if len(ids) and (ids.min() < 0 or ids.max() >= mod):
        raise ValueError(f"requires 0 <= {id_col} < {mod}")
    a = ids.astype(np.uint64) % np.uint64(mod)
    return (
        a * (np.uint64(mult) % np.uint64(mod)) + np.uint64(seed)
    ) % np.uint64(mod)


def deterministic_shuffle(
    ds,
    id_col: str = "doc_id",
    seed: int = 12345,
    mult: int = 2654435761,
    mod: int = 2147483647,
):
    """Reproducible global training-order shuffle: stamp each row with a
    Lehmer-style keyed permutation value ``perm = (id * mult + seed) %
    mod`` (computable per batch, no RNG state), then ONE distributed
    range-partitioned sort orders the corpus by it — the identical order
    at any parallelism, cluster size, or resume point, which is what a
    training run needs to be restartable mid-epoch.

    Scale shape: the sort is Ray Data's native range exchange (sample →
    range-partition → per-block sort); nothing else moves. Downstream
    consumers stream the sorted Dataset straight into sequence packing /
    batching. Returns the rows with the ``perm`` column attached (the
    sort key is evidence — rank k holds the k-th smallest perm)."""

    def stamp(t: pa.Table) -> pa.Table:
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        perm = _lehmer_perm(ids, id_col, seed, mult, mod)
        return t.append_column("perm", pa.array(perm.astype(np.int64)))

    return ds.map_batches(
        stamp, batch_format="pyarrow", zero_copy_batch=True
    ).sort("perm")


def weighted_sample_topk(
    ds,
    weight_col: str,
    k: int = 200,
    id_col: str = "doc_id",
    seed: int = 12345,
    mult: int = 2654435761,
    mod: int = 2147483647,
):
    """Deterministic weight-proportional sample WITHOUT replacement
    (Efraimidis–Spirakis A-Res): each row gets sort key u^(1/w) where u is
    a hash-derived uniform in [0, 1) (the Lehmer permutation of the id,
    normalized — no RNG state, so any engine/run/resume reproduces the
    identical sample) and w = its weight; the k largest keys are the
    sample. Rows with w <= 0 or null never qualify. Internally the
    monotone-equivalent key ln(u)/w is used (u^(1/w) clusters toward 1.0
    at large weights, squeezing boundary gaps toward float noise; the log
    form keeps selection robust against last-ulp libm differences vs a
    SQL oracle), and the float key is NOT part of the output — membership
    plus (id, weight) is the verifiable contract.

    Scale shape: the key is a per-batch column; each block keeps its
    local top-k and the driver merges #blocks x k candidates — the exact
    global top-k, no shuffle. This is how a curation pipeline draws a
    quality-weighted corpus subset reproducibly."""

    def stamp(t: pa.Table) -> pa.Table:
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        perm = _lehmer_perm(ids, id_col, seed, mult, mod)
        u = perm.astype(np.float64) / float(mod)
        w = (
            pc.cast(t[weight_col].combine_chunks(), pa.float64())
            .to_numpy(zero_copy_only=False)
        )
        ok = np.isfinite(w) & (w > 0)
        with np.errstate(divide="ignore", invalid="ignore"):
            key = np.where(ok, np.log(u) / w, np.nan)  # -inf at u=0 is legal
        out = t.filter(pa.array(ok)).append_column(
            "_skey", pa.array(key[ok])
        )
        return _local_topk_by_key(out, k, id_col)

    def _local_topk_by_key(t: pa.Table, kk: int, idc: str) -> pa.Table:
        if t.num_rows <= kk:
            return t
        order = pc.sort_indices(
            t.append_column("_neg", pc.negate(t["_skey"])),
            sort_keys=[("_neg", "ascending"), (idc, "ascending")],
        )
        return t.take(order.slice(0, kk))

    cand = ds.map_batches(stamp, batch_format="pyarrow", zero_copy_batch=True)
    blocks = [b for b in cand.iter_batches(batch_format="pyarrow")]
    if not blocks:
        # empty input: keep the documented output schema, not a 0-column table
        base = ds.schema().base_schema
        return pa.table({f.name: pa.nulls(0, f.type) for f in base})
    merged = pa.concat_tables(blocks, promote_options="permissive")
    return _local_topk_by_key(merged, k, id_col).drop_columns(["_skey"])

def neyman_sample(ds, group_col: str, value_col: str, id_col: str,
                  total_k: int = 300, seed: int = 12345,
                  mult: int = 2654435761, mod: int = 2147483647):
    """Neyman-allocation stratified sample: each stratum's budget is
    proportional to N_h * S_h (its size x value standard deviation) —
    the variance-optimal allocation for estimating the population mean,
    vs. plain proportional allocation. Strata with fewer than two
    non-null values carry no variance signal and are skipped; every
    allocated stratum gets at least one row (kh = max(1,
    floor(total_k * w_h))). Sampling within a stratum is the shared
    Lehmer permutation (deterministic, engine-replayable, no RNG).

    Scale shape: allocation comes from the welch/anova power-sum fold
    (rows never shuffle); selection keeps <= kh rows per (block, group)
    as partials, merges the metadata-sized candidate set once, and
    filters the source by the broadcast winner-id set."""
    from debezium_incubator_ray.functions.stats import _group_power_sums
    from debezium_incubator_ray.functions.dedup import (
        _broadcast_winner_filter,
    )

    def _empty():
        # zero rows in the DOCUMENTED output shape, not the source's
        try:
            g_type = ds.schema().base_schema.field(group_col).type
        except Exception:
            g_type = pa.string()
        return ray.data.from_arrow(pa.table({
            group_col: pa.array([], g_type),
            id_col: pa.array([], pa.int64()),
            "perm": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64()),
        }))

    import ray.data

    stats_rows = _group_power_sums(ds, value_col, group_col)
    weights = {}
    for r in stats_rows:
        n = int(r["n"])
        if n < 2:
            continue
        mean = r["s"] / n
        var = (r["ss"] - n * mean * mean) / (n - 1)
        if var < 0:  # float fuzz on constant strata
            var = 0.0
        weights[r["g"]] = n * float(np.sqrt(var))
    tot = sum(weights.values())
    if tot <= 0:
        return _empty()
    alloc = {g: max(1, int(np.floor(total_k * w / tot)))
             for g, w in weights.items()}

    def stamp_and_cut(t: pa.Table) -> pa.Table:
        g = t[group_col].combine_chunks()
        ids = pc.cast(t[id_col].combine_chunks(), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        perm = _lehmer_perm(ids, id_col, seed, mult, mod).astype(np.int64)
        # distinct-bounded lookup: one python dict probe per DISTINCT
        # group in the block, not per row
        enc = g.dictionary_encode()
        kmap = np.array(
            [alloc.get(x, 0) for x in enc.dictionary.to_pylist()],
            dtype=np.int64,
        )
        valid = pc.is_valid(enc.indices).to_numpy(zero_copy_only=False)
        codes = pc.fill_null(enc.indices, 0).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        kh = np.where(valid, kmap[codes], 0) \
            if len(kmap) else np.zeros(len(ids), np.int64)
        keep0 = kh > 0
        tb = pa.table({
            "g": g.filter(pa.array(keep0)),
            "id": pa.array(ids[keep0]),
            "perm": pa.array(perm[keep0]),
            "kh": pa.array(kh[keep0]),
        })
        # per-group top-kh partial: sort (g, perm, id), keep rank <= kh
        idx = pc.sort_indices(tb, sort_keys=[
            ("g", "ascending"), ("perm", "ascending"), ("id", "ascending"),
        ])
        sb = tb.take(idx)
        gs = sb["g"].combine_chunks()
        new = np.ones(len(gs), dtype=bool)
        if len(gs) > 1:
            new[1:] = pc.not_equal(
                gs.slice(1), gs.slice(0, len(gs) - 1)
            ).to_numpy(zero_copy_only=False)
        gid = np.cumsum(new) - 1
        starts = np.nonzero(new)[0]
        rank = np.arange(len(gs)) - starts[gid] + 1
        return sb.filter(
            pa.array(rank <= sb["kh"].combine_chunks().to_numpy(
                zero_copy_only=False))
        ).select(["g", "id", "perm"])

    cand = ds.map_batches(
        stamp_and_cut, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()  # <= sum(kh) rows per block — metadata-sized
    if not cand:
        return _empty()
    import pandas as pd

    df = pd.DataFrame(cand).drop_duplicates("id")
    df = df.sort_values(["g", "perm", "id"])
    df["rank"] = df.groupby("g").cumcount() + 1
    df = df[df["rank"] <= df["g"].map(alloc).astype(np.int64)]
    winners = df["id"].to_numpy(np.int64)
    rank_of = dict(zip(df["id"], df["rank"]))
    perm_of = dict(zip(df["id"], df["perm"]))

    filtered = _broadcast_winner_filter(ds, winners, id_col)

    def attach(t: pa.Table) -> pa.Table:
        ids = pc.cast(t[id_col].combine_chunks(), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        return pa.table({
            group_col: t[group_col],
            id_col: t[id_col],
            "perm": pa.array([perm_of[i] for i in ids], pa.int64()),
            "rank": pa.array([rank_of[i] for i in ids], pa.int64()),
        })

    return filtered.map_batches(attach, batch_format="pyarrow",
                                zero_copy_batch=True)


def split_labels(
    ids,
    fractions=(("train", 80), ("val", 10), ("test", 10)),
    mod: int = 100,
    salt: str = "",
):
    """The pure split kernel: md5-bridge bucket of each id string (+
    optional salt) against cumulative fraction bounds -> label array.
    Shared by hash_split and every query that derives a split from an id
    column, so the convention can never drift between them."""
    names = [n for n, _ in fractions]
    weights = np.array([w for _, w in fractions], dtype=np.int64)
    if int(weights.sum()) != mod:
        raise ValueError(f"fractions must sum to mod={mod}: {fractions}")
    bounds = np.cumsum(weights)  # upper exclusive bucket bound per split
    labels = pa.array(names, pa.string())
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    s = pc.cast(ids, pa.string())
    if salt:
        s = pc.binary_join_element_wise(s, pa.scalar(salt), pa.scalar(""))
    b = (md5_u64(s) % np.uint64(mod)).astype(np.int64)
    idx = np.searchsorted(bounds, b, side="right")
    return pc.take(labels, pa.array(idx))


def hash_split(
    ds,
    id_col: str = "doc_id",
    fractions=(("train", 80), ("val", 10), ("test", 10)),
    mod: int = 100,
    salt: str = "",
):
    """Deterministic train/val/test assignment by id hash — the standard
    leakage-safe dataset split (the same id lands in the same split on
    every run, any shard order, any engine — the property random splits
    lack). Appends a ``split`` column.

    Pure per-batch map, zero shuffle/state (same scale shape as the
    samplers above). Hash = md5 of the id string (+ optional salt) via
    the DuckDB-bridge hasher, so plain SQL reproduces the assignment
    bit-for-bit: bucket = md5_u64(id) % mod, cumulative fraction bounds
    pick the split (e.g. 80/10/10 -> train <80, val <90, test <100).
    ``salt`` re-rolls the split without touching ids (epoch re-splits)."""
    # validate eagerly (split_labels re-validates per batch)
    if int(sum(w for _, w in fractions)) != mod:
        raise ValueError(f"fractions must sum to mod={mod}: {fractions}")

    def assign(t: pa.Table) -> pa.Table:
        return t.append_column(
            "split", split_labels(t[id_col], fractions, mod, salt)
        )

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
