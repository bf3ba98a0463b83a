"""Text analysis operators for large-scale training-data pipelines.

All operators are vectorized ``map_batches`` stages (pyarrow.compute /
pandas string kernels); stateful pieces (compiled regexes, stopword tables)
live in callable-class ``__init__`` (once per actor), mirroring the
reference's load-once schema/type caches (SchemaHolder.java:28-59).

Operators: token counting, quality scoring, language ID (n-gram/stopword
heuristic), document fingerprinting (rolling hash).
"""

from __future__ import annotations

import re
from typing import Dict, List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Tokenization rule shared with the DuckDB oracle SQL:
#   tokens = regexp_split on whitespace of trimmed text; '' → 0 tokens.
_WS = r"\s+"


def token_count(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace token count per row (vectorized, oracle-SQL-matched)."""
    t = batch[text_col]
    trimmed = pc.utf8_trim_whitespace(t)
    toks = pc.split_pattern_regex(trimmed, _WS)
    n = pc.list_value_length(toks)
    # empty string → [''] → length 1; force 0 to match len(<empty split>)=0
    n = pc.if_else(pc.equal(pc.utf8_length(trimmed), 0), pa.scalar(0, pa.int32()), n)
    return batch.append_column("n_tokens", pc.cast(n, pa.int64()))


def quality_score(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Cheap quality signals: char count, token count, mean token length,
    punctuation ratio. All expressible in ANSI SQL for the oracle."""
    batch = token_count(batch, text_col)
    t = batch[text_col]
    n_chars = pc.cast(pc.utf8_length(t), pa.int64())
    punct = pc.cast(
        pc.utf8_length(pc.replace_substring_regex(t, r"[^.,;:!?]", "")), pa.int64()
    )
    n_tokens = batch["n_tokens"]
    mean_tok = pc.if_else(
        pc.greater(n_tokens, 0),
        pc.divide(
            pc.cast(pc.subtract(n_chars, pc.subtract(n_tokens, 1)), pa.float64()),
            pc.cast(n_tokens, pa.float64()),
        ),
        pa.scalar(0.0),
    )
    punct_ratio = pc.if_else(
        pc.greater(n_chars, 0),
        pc.divide(pc.cast(punct, pa.float64()), pc.cast(n_chars, pa.float64())),
        pa.scalar(0.0),
    )
    out = batch.append_column("n_chars", n_chars)
    out = out.append_column("mean_token_len", mean_tok)
    out = out.append_column("punct_ratio", punct_ratio)
    return out


_STOPWORDS: Dict[str, List[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "auf"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "que", "de", "por"],
    "pt": ["o", "a", "os", "e", "um", "uma", "que", "de", "para", "com"],
    "ru": ["и", "в", "не", "на", "что", "это", "с", "как", "по", "но"],
}


class LangId:
    """Heuristic language ID — fully vectorized and SQL-mirrorable:

    1. script shortcut: any CJK-Unified codepoint → 'zh'; any
       Hiragana/Katakana → 'ja' (one RE2 match per doc, Arrow kernel);
    2. else stopword hit-count per language over lowercase whitespace
       tokens (one pc.is_in per language over the FLAT token array +
       np.add.reduceat per doc — no per-row loop, no per-token set lookup);
    3. argmax with deterministic alphabetical tie-break; 0 hits → 'und'.

    Stopword value-sets are compiled once per actor (stateful stage,
    SchemaHolder.java:28-59 load-once pattern)."""

    LANGS = ("de", "en", "es", "fr", "pt", "ru")  # tie-break order

    def __init__(self):
        self.value_sets = {
            lang: pa.array(sorted(_STOPWORDS[lang]), type=pa.string())
            for lang in self.LANGS
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        from debezium_incubator_ray.functions.tokens import flat_tokens

        texts = batch["text"].combine_chunks()
        n = len(texts)
        is_zh = pc.match_substring_regex(texts, r"[\x{4E00}-\x{9FFF}]")
        is_ja = pc.match_substring_regex(texts, r"[\x{3040}-\x{30FF}]")
        flat, lens = flat_tokens(texts)
        starts = np.zeros(n, dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        hits = np.zeros((len(self.LANGS), n), dtype=np.int64)
        if len(flat):
            pad = np.zeros(1, dtype=np.int64)
            for li, lang in enumerate(self.LANGS):
                m = pc.is_in(flat, value_set=self.value_sets[lang])
                mv = m.to_numpy(zero_copy_only=False).astype(np.int64)
                mv = np.concatenate([mv, pad])  # sentinel for trailing empties
                h = np.add.reduceat(mv, np.minimum(starts, len(mv) - 1))
                hits[li] = np.where(lens > 0, h, 0)
        best_idx = hits.argmax(axis=0)  # first max wins → alphabetical tie-break
        best_hits = hits.max(axis=0)
        codes = np.array(self.LANGS)[best_idx]
        codes = np.where(best_hits > 0, codes, "und")
        zh = is_zh.to_numpy(zero_copy_only=False)
        ja = is_ja.to_numpy(zero_copy_only=False)
        codes = np.where(ja, "ja", codes)
        codes = np.where(zh, "zh", codes)  # zh beats ja when both present
        return batch.append_column("pred_lang", pa.array(codes.tolist(), type=pa.string()))


class Fingerprint:
    """64-bit document fingerprint: polynomial rolling hash over token
    hashes (order-sensitive — 'a b' != 'b a'), all-vectorized: one
    stable_hash call for the batch's tokens + one numpy reduction per doc.
    Content-identity key for exact dedup / shard-stable sampling at scale."""

    B = np.uint64(1000003)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from debezium_incubator_ray.hashing import stable_hash

        t = batch["text"]
        toks = pc.split_pattern_regex(pc.utf8_trim_whitespace(t), _WS)
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = toks.flatten()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        if len(flat) == 0:
            h = np.empty(0, dtype=np.uint64)
        else:
            h = stable_hash(flat).astype(np.uint64)
        out = np.zeros(len(batch), dtype=np.uint64)
        pos = 0
        with np.errstate(over="ignore"):
            for i, ln in enumerate(lens):
                if ln:
                    powers = self.B ** np.arange(ln, dtype=np.uint64)[::-1]
                    out[i] = np.uint64(np.sum(h[pos : pos + ln] * powers, dtype=np.uint64))
                pos += ln
        return batch.append_column(
            "fingerprint", pa.array(out.view(np.int64), type=pa.int64())
        )


def fingerprint_md5(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Cross-engine-verifiable document fingerprint: md5 hex of the
    whitespace-NORMALIZED text (tokens joined by single spaces) — equals
    DuckDB ``md5(array_to_string(string_split_regex(trim(text),'\\s+'),' '))``.

    The normalization is vectorized (Arrow split + join); md5 itself runs
    once per distinct normalized doc (dictionary-encode). The rolling-hash
    ``Fingerprint`` above stays the scale path; this is the oracle bridge
    (golden-value pinning, CassandraTypeDeserializerTest.java:72-447)."""
    import hashlib

    t = batch[text_col]
    toks = pc.split_pattern_regex(pc.utf8_trim_whitespace(t), _WS)
    norm = pc.binary_join(toks, " ")
    if isinstance(norm, pa.ChunkedArray):
        norm = norm.combine_chunks()
    de = pc.dictionary_encode(norm)
    vocab = [hashlib.md5(str(v).encode()).hexdigest() for v in de.dictionary.to_pylist()]
    fp = pc.take(pa.array(vocab, type=pa.string()), de.indices)
    return batch.append_column("fingerprint_md5", fp)


# ---------------------------------------------------------------------------
# TF-IDF top terms


def _flat_tokens(t: pa.Table, text_col: str = "text"):
    """(flat token StringArray, per-doc token counts) for nonempty docs —
    rows with empty/whitespace-only text contribute zero tokens."""
    txt = pc.utf8_trim_whitespace(t[text_col].combine_chunks())
    toks = pc.split_pattern_regex(txt, _WS)
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    empty = pc.equal(pc.utf8_length(txt), 0).to_numpy(zero_copy_only=False)
    lens = np.where(empty, 0, lens)
    flat = toks.flatten()
    if empty.any():
        # flatten() keeps the [''] token of empty docs; drop those slots
        keep = np.repeat(
            ~empty, pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        )
        flat = flat.filter(pa.array(keep))
    return flat, lens


def document_frequency(ds, text_col: str = "text", id_col: str = "doc_id",
                       buckets: int = 64):
    """(term, df) over the corpus + the nonempty-doc count: distinct
    (term, doc) rows shuffle once, bucketed by term hash."""
    from debezium_incubator_ray.hashing import stable_hash

    def explode_distinct(t: pa.Table) -> pa.Table:
        flat, lens = _flat_tokens(t, text_col)
        ids = np.repeat(t[id_col].to_numpy(), lens)
        tb = pa.table({"term": flat, id_col: pa.array(ids)})
        idx = pc.sort_indices(
            tb, sort_keys=[("term", "ascending"), (id_col, "ascending")]
        )
        s = tb.take(idx)
        tr = s["term"].combine_chunks()
        di = s[id_col].combine_chunks().to_numpy()
        n = len(di)
        first = np.ones(n, dtype=bool)
        if n:
            same_term = pc.equal(tr.slice(1), tr.slice(0, n - 1)).to_numpy(
                zero_copy_only=False
            )
            first[1:] = ~(same_term & (di[1:] == di[:-1]))
        d = s.filter(pa.array(first))
        b = (stable_hash(d["term"].combine_chunks()) % np.uint64(buckets)).astype(
            np.int32
        )
        return d.append_column("_bucket", pa.array(b))

    def df_in_bucket(group: pa.Table) -> pa.Table:
        tr = group["term"].combine_chunks()
        idx = pc.sort_indices(group, sort_keys=[("term", "ascending")])
        tr = pc.take(tr, idx)
        n = len(tr)
        first = np.ones(n, dtype=bool)
        if n:
            first[1:] = ~pc.equal(tr.slice(1), tr.slice(0, n - 1)).to_numpy(
                zero_copy_only=False
            )
        starts = np.nonzero(first)[0]
        counts = np.diff(np.append(starts, n))
        return pa.table(
            {"term": tr.filter(pa.array(first)), "df": pa.array(counts)}
        )

    df = (
        ds.map_batches(
            explode_distinct, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("_bucket")
        .map_groups(df_in_bucket, batch_format="pyarrow")
    )
    n_docs = ds.map_batches(
        lambda t: pa.table(
            {"n": pa.array([int((_flat_tokens(t, text_col)[1] > 0).sum())])}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).sum("n")
    return df, int(n_docs)


class TfIdfTopK:
    """Per-doc top-k TF-IDF terms. The (term -> df) vocabulary is the
    broadcast small side (Zipf makes vocab sublinear in corpus size —
    same documented assumption as exact_dedup's winner set; shard the df
    table by term hash when vocab outgrows node memory). Each document's
    text is one row, so tf and the top-k cut are exact within the batch —
    no shuffle in this pass at all."""

    def __init__(self, df_ref, n_docs: int, k: int,
                 text_col: str = "text", id_col: str = "doc_id"):
        import pandas as pd
        import ray

        df_tbl = ray.get(df_ref)
        self.df = pd.Series(
            df_tbl["df"].to_numpy(zero_copy_only=False),
            index=df_tbl["term"].to_pylist(),
        )
        self.n = n_docs
        self.k = k
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        import pandas as pd

        flat, lens = _flat_tokens(t, self.text_col)
        ids = np.repeat(t[self.id_col].to_numpy(), lens)
        tb = pa.table({"doc_id": pa.array(ids), "term": flat})
        idx = pc.sort_indices(
            tb, sort_keys=[("doc_id", "ascending"), ("term", "ascending")]
        )
        s = tb.take(idx)
        di = s["doc_id"].combine_chunks().to_numpy()
        tr = s["term"].combine_chunks()
        n = len(di)
        if n == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "term": pa.array([], pa.string()),
                 "tf": pa.array([], pa.int64()), "score": pa.array([], pa.float64()),
                 "rank": pa.array([], pa.int64())}
            )
        first = np.ones(n, dtype=bool)
        same_term = pc.equal(tr.slice(1), tr.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
        first[1:] = ~(same_term & (di[1:] == di[:-1]))
        starts = np.nonzero(first)[0]
        tf = np.diff(np.append(starts, n)).astype(np.int64)
        terms = tr.take(pa.array(starts))
        docs = di[starts]
        dfv = self.df.reindex(pd.Index(terms.to_pylist())).to_numpy(np.float64)
        score = np.round(tf * np.log(self.n / dfv), 6)
        # per-doc top-k: sort (doc, -score, term) then rank within doc
        out = pa.table(
            {"doc_id": pa.array(docs), "term": terms,
             "tf": pa.array(tf), "score": pa.array(score)}
        )
        oi = pc.sort_indices(
            out,
            sort_keys=[("doc_id", "ascending"), ("score", "descending"),
                       ("term", "ascending")],
        )
        o = out.take(oi)
        od = o["doc_id"].combine_chunks().to_numpy()
        nf = np.ones(len(od), dtype=bool)
        nf[1:] = od[1:] != od[:-1]
        dstarts = np.nonzero(nf)[0]
        rank = np.arange(len(od)) - dstarts[np.cumsum(nf) - 1] + 1
        o = o.append_column("rank", pa.array(rank.astype(np.int64)))
        return o.filter(pa.array(rank <= self.k))


def tfidf_top_terms(ds, k: int = 3, text_col: str = "text",
                    id_col: str = "doc_id"):
    """Top-k TF-IDF terms per document: one (term, doc) shuffle for df,
    then a broadcast single pass (see TfIdfTopK for the scale shape).
    score = tf * ln(N / df), ties by term ascending."""
    import ray

    df, n_docs = document_frequency(ds, text_col, id_col)
    # vocab table to the driver once (the small side), broadcast by ref
    df_tbl = pa.concat_tables(
        ray.get(df.to_arrow_refs()), promote_options="permissive"
    )
    df_ref = ray.put(df_tbl)
    return ds.map_batches(
        TfIdfTopK,
        fn_constructor_kwargs={
            "df_ref": df_ref, "n_docs": n_docs, "k": k,
            "text_col": text_col, "id_col": id_col,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
    )


# ---------------------------------------------------------------------------
# line-level boilerplate dedup (CCNet-style)

class _LineStripper:
    """map_batches stage: drop the lines whose hash is in the broadcast
    frequent-line set, rebuild each document by rejoining what's left."""

    def __init__(self, freq_ref, delim: str, text_col: str, id_col: str):
        import ray

        from debezium_incubator_ray.hashing import stable_hash

        self._hash = stable_hash
        self.freq = np.sort(ray.get(freq_ref))  # sorted uint64 hashes
        self.delim = delim
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        # null text → "" (scraped corpora routinely carry null cells; a
        # null list would corrupt the offsets arithmetic below)
        segs = pc.split_pattern(
            pc.fill_null(t[self.text_col].combine_chunks(), ""), self.delim
        )
        flat = pc.list_flatten(segs)
        offsets = segs.offsets.to_numpy(zero_copy_only=False)
        h = self._hash(flat)
        keep = ~np.isin(h, self.freq, assume_unique=False)
        counts = np.add.reduceat(
            keep.astype(np.int64), offsets[:-1]
        ) if len(flat) else np.zeros(len(segs), np.int64)
        # reduceat quirk: an empty row reuses the next slice — zero it
        row_len = offsets[1:] - offsets[:-1]
        counts = np.where(row_len == 0, 0, counts)
        new_off = np.zeros(len(segs) + 1, dtype=np.int32)
        np.cumsum(counts, out=new_off[1:])
        kept_lists = pa.ListArray.from_arrays(
            pa.array(new_off), flat.filter(pa.array(keep))
        )
        clean = pc.binary_join(kept_lists, self.delim)
        return t.append_column("text_clean", clean)


def line_dedup(
    ds,
    min_docs: int = 10,
    delim: str = "\n",
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """CCNet-style boilerplate removal: drop every LINE that occurs in >=
    ``min_docs`` distinct documents (nav bars, cookie banners, footers),
    keeping document structure otherwise intact (kept lines rejoin with the
    same delimiter). Adds ``text_clean``.

    Scale shape: pass 1 shuffles only 8-byte line hashes pre-deduped per
    document (one row per distinct (doc, line)); the global count is a
    groupby over hashes; the frequent set — by construction the SMALL side
    (lines repeated across >= min_docs docs) — broadcasts once via ray.put;
    pass 2 is a stateless vectorized strip. No driver materialization of
    anything proportional to the corpus.
    """
    import ray
    from ray.data.aggregate import Count

    from debezium_incubator_ray.hashing import stable_hash

    def seg_hashes(t: pa.Table) -> pa.Table:
        segs = pc.split_pattern(
            pc.fill_null(t[text_col].combine_chunks(), ""), delim
        )
        flat = pc.list_flatten(segs)
        n = pc.list_value_length(segs).to_numpy(zero_copy_only=False)
        doc = np.repeat(
            t[id_col].to_numpy(zero_copy_only=False), n.astype(np.int64)
        )
        h = stable_hash(flat)
        # distinct (doc, hash) within the batch — each document lives in
        # exactly one row, so this IS count-distinct-docs after the groupby
        order = np.lexsort((h, doc))
        hs, ds_ = h[order], doc[order]
        first = np.ones(len(hs), dtype=bool)
        first[1:] = (hs[1:] != hs[:-1]) | (ds_[1:] != ds_[:-1])
        return pa.table({"h": pa.array(hs[first].view(np.int64))})

    counts = (
        ds.map_batches(seg_hashes, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("h")
        .aggregate(Count(alias_name="nd"))
    )
    # vectorized threshold (one row per DISTINCT line in the corpus — a
    # per-row Python filter here would dominate pass 1)
    freq_tbl = counts.map_batches(
        lambda t, m=min_docs: t.filter(
            pc.greater_equal(t["nd"], pa.scalar(m, pa.int64()))
        ).select(["h"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).take_all()
    freq = np.array([r["h"] for r in freq_tbl], dtype=np.int64).view(np.uint64)
    freq_ref = ray.put(freq)
    return ds.map_batches(
        _LineStripper,
        fn_constructor_kwargs=dict(
            freq_ref=freq_ref, delim=delim, text_col=text_col, id_col=id_col
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
    )


# ---------------------------------------------------------------------------
# within-document repetition metrics (Gopher-style quality signal)

def repetition_metrics(
    batch: pa.Table, text_col: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    """Duplicate-2-gram fraction per document: 1 - distinct/total over
    token 2-grams — the classic within-doc repetition gate (high values =
    looping/boilerplate text). Fully vectorized: one tokenize pass, one
    adjacent-hash combine, one lexsort for per-doc distinct counts; no
    per-row Python. Stateless map_batches stage."""
    from debezium_incubator_ray.hashing import stable_hash

    txt = pc.fill_null(batch[text_col].combine_chunks(), "")
    trimmed = pc.utf8_trim_whitespace(txt)
    toks = pc.split_pattern_regex(trimmed, _WS)
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(toks)
    n_rows = batch.num_rows
    h = stable_hash(flat)
    # adjacent 2-gram hashes; positions crossing a document boundary are
    # masked out (the last token of a doc pairs with nothing)
    n_flat = len(h)
    if n_flat >= 2:
        g = (h[:-1] * np.uint64(0x9E3779B97F4A7C15)) ^ h[1:]
        pos = np.arange(n_flat - 1)
        doc_of = np.searchsorted(offsets[1:], pos, side="right")
        valid = (pos + 1) < offsets[doc_of + 1]
        g, doc_of = g[valid], doc_of[valid]
    else:
        g = np.empty(0, np.uint64)
        doc_of = np.empty(0, np.int64)
    n_grams = np.bincount(doc_of, minlength=n_rows).astype(np.int64)
    # distinct grams per doc: sort (doc, gram), count boundaries
    order = np.lexsort((g, doc_of))
    gs, ds = g[order], doc_of[order]
    if len(gs):
        first = np.ones(len(gs), dtype=bool)
        first[1:] = (gs[1:] != gs[:-1]) | (ds[1:] != ds[:-1])
        n_distinct = np.bincount(ds[first], minlength=n_rows).astype(np.int64)
    else:
        n_distinct = np.zeros(n_rows, np.int64)
    with np.errstate(invalid="ignore"):
        dup = np.where(n_grams > 0, 1.0 - n_distinct / np.maximum(n_grams, 1), 0.0)
    return pa.table(
        {
            id_col: batch[id_col],
            "n_grams": pa.array(n_grams),
            "n_distinct": pa.array(n_distinct),
            "dup_frac": pa.array(dup.astype(np.float64)),
        }
    )


_NORM_STEPS = [
    # control characters (incl. tab/newline) -> space; RE2 both sides so
    # the DuckDB oracle applies the IDENTICAL passes
    (r"[\x00-\x1f\x7f]", " "),
    (r" {2,}", " "),  # collapse runs of spaces
]


def normalize_text(col, steps=None):
    """Vectorized text cleanup (control chars -> space, whitespace
    collapse, trim): the canonical pre-dedup normalization pass — two RE2
    sweeps + one trim over the whole column, no per-row Python."""
    import pyarrow.compute as pc

    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    for pat, repl in (steps or _NORM_STEPS):
        arr = pc.replace_substring_regex(arr, pattern=pat, replacement=repl)
    # ASCII-space trim, NOT utf8_trim_whitespace: SQL trim() only strips
    # ' ', and the control-char pass above has already spaced \t/\n/\r —
    # a trailing U+00A0/U+3000 must survive identically on both sides
    return pc.utf8_trim(arr, characters=" ")


def text_normalize_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """map_batches stage: adds text_norm + n_chars_norm."""
    import pyarrow.compute as pc

    norm = normalize_text(batch[text_col])
    batch = batch.append_column("text_norm", norm)
    return batch.append_column(
        "n_chars_norm", pc.cast(pc.utf8_length(norm), pa.int64())
    )


def unigram_logprob(ds, text_col: str = "text", id_col: str = "doc_id",
                    per_token: bool = False):
    """Corpus-learned unigram language-model score per document:
    sum over tokens of ln(tf(token) / total_tokens); with
    ``per_token=True`` the length-normalized mean token logprob (the
    negative of CCNet's perplexity proxy — length-invariant, so
    thresholds rank quality, not length).

    The classic two-pass learned-filter shape for training-data curation
    (low logprob ~ unusual/garbage text): pass 1 folds per-batch partial
    term counts through one small groupby into a (term -> count) model;
    pass 2 broadcasts the model via ``ray.put`` and scores every document
    in a streaming actor pool — the corpus itself never re-shuffles.
    Vocabulary is the documented small side (Zipf: sublinear in corpus
    size); shard the model by term hash when it outgrows node memory."""
    import ray
    from ray.data.aggregate import Sum

    def partial_counts(t: pa.Table) -> pa.Table:
        flat, _ = _flat_tokens(t, text_col)
        vc = flat.value_counts()
        return pa.table({
            "term": vc.field("values"),
            "_tf": vc.field("counts"),
        })

    counts = (
        ds.map_batches(partial_counts, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("term")
        .aggregate(Sum("_tf", alias_name="tf"))
        .take_all()
    )
    import pandas as pd

    model = pd.Series(
        [r["tf"] for r in counts], index=[r["term"] for r in counts],
        dtype=np.float64,
    )
    total = float(model.sum())
    model_ref = ray.put(np.log(model / total))

    class Scorer:
        def __init__(self):
            self.logp = ray.get(model_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            flat, lens = _flat_tokens(t, text_col)
            nd = len(lens)
            if nd == 0:
                return pa.table({
                    id_col: pa.array([], pa.int64()),
                    "logprob": pa.array([], pa.float64()),
                })
            # hash each distinct token once (dictionary-encode), gather
            enc = flat.dictionary_encode()
            codes = enc.indices.to_numpy(zero_copy_only=False)
            vocab_lp = self.logp.reindex(enc.dictionary.to_pylist()).to_numpy()
            tok_lp = vocab_lp[codes]
            doc_idx = np.repeat(np.arange(nd), lens)
            sums = np.bincount(doc_idx, weights=tok_lp, minlength=nd)
            if per_token:
                sums = np.round(
                    sums / np.maximum(np.asarray(lens, np.float64), 1.0), 6
                )
            else:
                sums = np.round(sums, 3)
            return pa.table({
                id_col: t[id_col],
                "logprob": pa.array(sums),
            })

    return ds.map_batches(Scorer, batch_format="pyarrow",
                          zero_copy_batch=True, concurrency=(1, 4))


def term_postings(ds, min_df: int = 10, text_col: str = "text",
                  id_col: str = "doc_id"):
    """Inverted-index build: (term, doc_id, tf) posting rows for every
    term appearing in at least ``min_df`` documents.

    Pass 1 reuses :func:`document_frequency` (distinct (term, doc) rows
    shuffle once, bucketed by term hash); the surviving vocabulary
    broadcasts via ``ray.put`` and pass 2 emits postings per batch with
    no further shuffle — each document's text is one row, so tf is exact
    within the batch. Postings land naturally partitioned by input shard;
    re-bucket by term hash downstream if lookup locality matters."""
    import ray

    df_tbl_ds, _n = document_frequency(ds, text_col=text_col, id_col=id_col)

    def keep_terms(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t["df"], min_df)).select(["term"])

    vocab_parts = df_tbl_ds.map_batches(
        keep_terms, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    vocab = pa.array(sorted(r["term"] for r in vocab_parts), pa.string())
    vocab_ref = ray.put(vocab)

    class Postings:
        def __init__(self):
            self.vocab = ray.get(vocab_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            flat, lens = _flat_tokens(t, text_col)
            ids = np.repeat(t[id_col].to_numpy(), lens)
            tb = pa.table({"term": flat, id_col: pa.array(ids)})
            tb = tb.filter(pc.is_in(tb["term"], value_set=self.vocab))
            idx = pc.sort_indices(
                tb, sort_keys=[("term", "ascending"), (id_col, "ascending")]
            )
            s = tb.take(idx)
            tr = s["term"].combine_chunks()
            di = s[id_col].combine_chunks().to_numpy()
            n = len(di)
            if n == 0:
                return pa.table({
                    "term": pa.array([], pa.string()),
                    id_col: pa.array([], pa.int64()),
                    "tf": pa.array([], pa.int64()),
                })
            first = np.ones(n, dtype=bool)
            same_term = pc.equal(tr.slice(1), tr.slice(0, n - 1)).to_numpy(
                zero_copy_only=False
            )
            first[1:] = ~(same_term & (di[1:] == di[:-1]))
            starts = np.nonzero(first)[0]
            tf = np.diff(np.append(starts, n)).astype(np.int64)
            return pa.table({
                "term": tr.take(pa.array(starts)),
                id_col: pa.array(di[starts]),
                "tf": pa.array(tf),
            })

    return ds.map_batches(Postings, batch_format="pyarrow",
                          zero_copy_batch=True, concurrency=(1, 4))


def bigram_topk(ds, k: int = 50, text_col: str = "text"):
    """Global top-k adjacent token pairs — the counting primitive behind
    BPE-merge selection and collocation mining over a web corpus.

    Shape at 100 TB: each batch pre-reduces to its DISTINCT (w1, w2)
    partial counts (Arrow group_by — the combiner) and stamps each
    bigram's hash bucket, so only distinct bigrams per block shuffle —
    routed by an int32 bucket id (measured ~2.5x cheaper than handing Ray
    a 2-key groupby over the same rows, see joins.copurchase_pairs); the
    in-bucket Arrow group-sum finalizes counts and keeps its local top-k,
    and the driver merges #buckets × k candidate rows. The full bigram
    stream never converges to one node. Ties at the k boundary break by
    (w1, w2) ascending — the deterministic order the oracle SQL mirrors."""
    from debezium_incubator_ray.hashing import stable_hash

    def partial(t: pa.Table) -> pa.Table:
        flat, lens = _flat_tokens(t, text_col)
        n = len(flat)
        empty = pa.table({
            "w1": pa.array([], pa.string()),
            "w2": pa.array([], pa.string()),
            "cnt": pa.array([], pa.int64()),
            "_pb": pa.array([], pa.int32()),
        })
        if n == 0:
            return empty
        # drop each doc's last token position: its successor is another doc
        mask = np.ones(n, dtype=bool)
        ends = np.cumsum(lens)
        mask[ends[lens > 0] - 1] = False
        if not mask.any():
            return empty
        idx = np.nonzero(mask)[0]
        tb = pa.table({
            "w1": flat.take(pa.array(idx)),
            "w2": flat.take(pa.array(idx + 1)),
        })
        g = tb.group_by(["w1", "w2"]).aggregate([("w1", "count")])
        out = pa.table({
            "w1": g["w1"],
            "w2": g["w2"],
            "cnt": pc.cast(g["w1_count"], pa.int64()),
        })
        # asymmetric combine: a plain XOR zeroes every (w, w) bigram's
        # hash (h^h == 0), piling all repeated-token bigrams into one
        # straggler bucket
        with np.errstate(over="ignore"):
            h = (
                stable_hash(out["w1"]) * np.uint64(0x9E3779B97F4A7C15)
                ^ stable_hash(out["w2"])
            )
        pb = (h % np.uint64(64)).astype(np.int32)
        return out.append_column("_pb", pa.array(pb))

    def sum_topk(t: pa.Table) -> pa.Table:
        from debezium_incubator_ray.functions.kernels import table_topk

        if "_pb" in t.column_names:
            t = t.drop_columns(["_pb"])
        g = t.group_by(["w1", "w2"]).aggregate([("cnt", "sum")])
        t = pa.table({"w1": g["w1"], "w2": g["w2"], "cnt": g["cnt_sum"]})
        return table_topk(t, "cnt", ["w1", "w2"], k)

    cand = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_pb")
        .map_groups(sum_topk, batch_format="pyarrow")
    )
    merged = pa.concat_tables(
        [b for b in cand.iter_batches(batch_format="pyarrow")]
        or [pa.table({"w1": pa.array([], pa.string()),
                      "w2": pa.array([], pa.string()),
                      "cnt": pa.array([], pa.int64())})]
    )
    return sum_topk(merged)


def hashed_feature_counts(ds, text_col: str = "text", buckets: int = 32):
    """The hashing trick's global bucket histogram: every token routes to
    md5_u64(token) % buckets and the corpus-wide count per bucket comes
    back — the vocabulary-free featurization a streaming model trains on
    (per-doc sparse vectors use the same bucket ids; the histogram is the
    verification surface and the idf-style normalizer).

    Per batch: one vectorized tokenize + one md5 per DISTINCT token + one
    bincount — ``buckets`` int64 partial rows per block; a single tiny
    groupby folds them. md5_u64 is the cross-engine hash bridge, so a
    DuckDB oracle reproduces the routing exactly."""
    from ray.data.aggregate import Sum

    from debezium_incubator_ray.functions.tokens import flat_tokens, md5_u64

    def partial(t: pa.Table) -> pa.Table:
        flat, _lens = flat_tokens(t[text_col])
        b = (md5_u64(flat) % np.uint64(buckets)).astype(np.int64)
        cnt = np.bincount(b, minlength=buckets).astype(np.int64)
        return pa.table({
            "bucket": pa.array(np.arange(buckets, dtype=np.int64)),
            "n_tokens": pa.array(cnt),
        })

    folded = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .aggregate(Sum("n_tokens", alias_name="n_tokens"))
    )
    def finish(t: pa.Table) -> pa.Table:
        # a globally-empty bucket has no SQL GROUP BY row — drop the 0s
        t = t.filter(pc.greater(t["n_tokens"], 0))
        return pa.table({
            "bucket": t["bucket"],
            "n_tokens": pc.cast(t["n_tokens"], pa.int64()),
        })

    return folded.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Zipf slope + BM25 ranking


def zipf_slope(ds, text_col: str = "text", top_n: int = 200, buckets: int = 64):
    """Zipf's-law fit over the corpus vocabulary: least-squares slope of
    ln(freq) against ln(rank) for the ``top_n`` most frequent terms (rank
    ordered by count DESC, term ASC — deterministic under ties). A quick
    distributional-health gauge for a training corpus (natural text sits
    near slope -1; boilerplate/spam skews it).

    Pipeline: per-batch Arrow group-count partials (the combiner — shuffle
    carries per-block vocab rows, never tokens), one term-keyed groupby
    fold, a two-level top-k cut (per-block partial then final), and a
    CLOSED-FORM slope from the top_n sufficient statistics — the regression
    runs on top_n rows, so it computes inline; nothing wide ever
    materializes. Output: one row (n_terms, slope)."""
    from ray.data.aggregate import Sum

    def partial_counts(t: pa.Table) -> pa.Table:
        flat, _ = _flat_tokens(t, text_col)
        g = pa.table({"term": flat}).group_by("term").aggregate(
            [([], "count_all")]
        )
        return pa.table({
            "term": g["term"],
            "cnt": pc.cast(g["count_all"], pa.int64()),
        })

    folded = (
        ds.map_batches(
            partial_counts, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("term")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )

    def cut(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t, sort_keys=[("cnt", "descending"), ("term", "ascending")]
        )
        return t.take(idx[: min(top_n, len(idx))])

    def slope_row(t: pa.Table) -> pa.Table:
        s = cut(t)  # final cut over the merged per-block survivors
        c = s["cnt"].to_numpy(zero_copy_only=False).astype(np.float64)
        n = len(c)
        if n == 0:
            return pa.table({
                "n_terms": pa.array([0], pa.int64()),
                "slope": pa.array([None], pa.float64()),
            })
        x = np.log(np.arange(1, n + 1, dtype=np.float64))
        y = np.log(c)
        # population covariance form == SQL regr_slope(y, x)
        sl = (n * np.dot(x, y) - x.sum() * y.sum()) / (
            n * np.dot(x, x) - x.sum() ** 2
        )
        return pa.table({
            "n_terms": pa.array([n], pa.int64()),
            "slope": pa.array([round(float(sl), 6)], pa.float64()),
        })

    # per-block partial top-n keeps the repartition tiny, then one task
    # computes the closed-form fit
    return (
        folded.map_batches(cut, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(1)
        .map_batches(slope_row, batch_format="pyarrow")
    )


def bm25_topk(
    ds,
    query_terms,
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
):
    """BM25 relevance ranking of the corpus for a fixed term set: top-k
    docs by score DESC, id ASC (Robertson/Spärk Jones BM25 with the
    +1-smoothed idf — the Lucene/standard formulation).

    Two streaming passes, no wide shuffle:
      1. corpus statistics — per-batch partials for (n_docs, sum_dl) and
         per-query-term document frequency fold through one tiny groupby
         (a document is one row, so df partials are exact per block);
      2. scoring — stats broadcast in the task closure (a handful of
         floats), each batch computes tf per term via one pc.is_in over
         the flattened tokens + np.add.reduceat per doc, scores
         vectorized, and a per-batch partial top-k cut keeps k rows per
         block; a final single-partition cut emits the answer.
    Docs with zero tokens never score (no query term can match)."""
    from ray.data.aggregate import Sum

    terms = sorted(set(query_terms))
    term_arr = pa.array(terms, pa.string())

    def _tf_matrix(t: pa.Table):
        """(ids, dl, tf[n_docs x n_terms]) for one batch."""
        flat, lens = _flat_tokens(t, text_col)
        n_docs = len(lens)
        tf = np.zeros((n_docs, len(terms)), dtype=np.int64)
        doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
        for j, term in enumerate(terms):
            hit = pc.equal(flat, term).to_numpy(zero_copy_only=False)
            if hit.any():
                np.add.at(tf[:, j], doc_of[hit], 1)
        return t[id_col].combine_chunks(), lens, tf

    def stats_partial(t: pa.Table) -> pa.Table:
        _ids, lens, tf = _tf_matrix(t)
        nz = lens > 0
        return pa.table({
            "_k": pa.array([0], pa.int64()),
            "n_docs": pa.array([int(nz.sum())], pa.int64()),
            "sum_dl": pa.array([int(lens.sum())], pa.int64()),
            **{
                f"df_{j}": pa.array([int((tf[:, j] > 0).sum())], pa.int64())
                for j in range(len(terms))
            },
        })

    stat_cols = ["n_docs", "sum_dl"] + [f"df_{j}" for j in range(len(terms))]
    folded = (
        ds.map_batches(
            stats_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("_k")
        .aggregate(*[Sum(c, alias_name=c) for c in stat_cols])
        .take_all()
    )[0]
    n_corpus = int(folded["n_docs"])
    avgdl = folded["sum_dl"] / max(n_corpus, 1)
    idf = np.array([
        np.log((n_corpus - folded[f"df_{j}"] + 0.5)
               / (folded[f"df_{j}"] + 0.5) + 1.0)
        for j in range(len(terms))
    ])

    def score_partial(t: pa.Table) -> pa.Table:
        ids, lens, tf = _tf_matrix(t)
        dl = lens.astype(np.float64)
        denom = tf + k1 * (1.0 - b + b * dl[:, None] / avgdl)
        with np.errstate(invalid="ignore", divide="ignore"):
            sc = (idf[None, :] * tf * (k1 + 1.0) / denom).sum(axis=1)
        hit = tf.any(axis=1)
        tb = pa.table({
            id_col: ids.filter(pa.array(hit)),
            "score": pa.array(sc[hit]),
        })
        idx = pc.sort_indices(
            tb, sort_keys=[("score", "descending"), (id_col, "ascending")]
        )
        return tb.take(idx[: min(k, len(idx))])

    def final_cut(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t, sort_keys=[("score", "descending"), (id_col, "ascending")]
        )
        s = t.take(idx[: min(k, len(idx))])
        return s.set_column(
            s.schema.get_field_index("score"), "score",
            pc.round(s["score"], ndigits=6),
        )

    return (
        ds.map_batches(
            score_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .repartition(1)
        .map_batches(final_cut, batch_format="pyarrow")
    )


def type_token_ratio(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Per-document type-token ratio (distinct tokens / tokens) — the
    lexical-diversity quality signal (repetitive machine-generated text
    scores low). Zero-token docs are excluded (SQL: they produce no
    token rows to group).

    A document is one row, so the whole computation is a single
    embarrassingly-parallel map_batches pass — no shuffle: flatten the
    batch's tokens once, Arrow group-by (doc, term) for the distinct
    count, bincount for totals."""

    def ttr(t: pa.Table) -> pa.Table:
        flat, lens = _flat_tokens(t, text_col)
        ids = t[id_col].combine_chunks()
        nz = lens > 0
        doc_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        pairs = (
            pa.table({"d": pa.array(doc_of), "term": flat})
            .group_by(["d", "term"])
            .aggregate([])
        )
        distinct = np.bincount(
            pairs["d"].to_numpy(zero_copy_only=False), minlength=len(lens)
        ).astype(np.int64)
        out = pa.table({
            id_col: ids.filter(pa.array(nz)),
            "n_tokens": pa.array(lens[nz]),
            "n_distinct": pa.array(distinct[nz]),
            "ttr": pa.array(
                np.round(distinct[nz] * 1.0 / lens[nz], 6)
            ),
        })
        return out

    return ds.map_batches(ttr, batch_format="pyarrow", zero_copy_batch=True)


def pmi_topk(ds, k: int = 50, min_count: int = 5, text_col: str = "text",
             buckets: int = 64):
    """Top-k adjacent-pair collocations by pointwise mutual information:
    pmi(a,b) = ln( (c_ab / n_bigrams) / ((c_a / n_tokens) *
    (c_b / n_tokens)) ), over bigrams with c_ab >= ``min_count`` — the
    measure that separates true collocations from merely-frequent pairs.

    Shape: full bigram counts fold by pair-hash bucket (the bigram_topk
    combiner, but keeping every pair >= min_count, not a top-k cut);
    unigram counts fold by term hash and BROADCAST (the marginal table
    is vocab-bounded — ray.put once, in-task lookup, never a shuffle
    join); the PMI expression is evaluated in the exact same
    operation order as the SQL oracle. Ties at the k boundary break
    (pmi desc, w1, w2). Returns a pyarrow Table
    (w1, w2, cnt, pmi)."""
    from ray.data.aggregate import Sum
    from debezium_incubator_ray.hashing import stable_hash

    def bigram_partial(t: pa.Table) -> pa.Table:
        flat, lens = _flat_tokens(t, text_col)
        n = len(flat)
        empty = pa.table({
            "w1": pa.array([], pa.string()),
            "w2": pa.array([], pa.string()),
            "cnt": pa.array([], pa.int64()),
            "_pb": pa.array([], pa.int32()),
        })
        if n == 0:
            return empty
        mask = np.ones(n, dtype=bool)
        ends = np.cumsum(lens)
        mask[ends[lens > 0] - 1] = False
        if not mask.any():
            return empty
        idx = np.nonzero(mask)[0]
        tb = pa.table({
            "w1": flat.take(pa.array(idx)),
            "w2": flat.take(pa.array(idx + 1)),
        })
        g = tb.group_by(["w1", "w2"]).aggregate([("w1", "count")])
        out = pa.table({
            "w1": g["w1"],
            "w2": g["w2"],
            "cnt": pc.cast(g["w1_count"], pa.int64()),
        })
        with np.errstate(over="ignore"):
            h = (
                stable_hash(out["w1"]) * np.uint64(0x9E3779B97F4A7C15)
                ^ stable_hash(out["w2"])
            )
        return out.append_column(
            "_pb", pa.array((h % np.uint64(buckets)).astype(np.int32))
        )

    def fold_bigrams(t: pa.Table) -> pa.Table:
        g = (
            t.drop_columns(["_pb"])
            .group_by(["w1", "w2"])
            .aggregate([("cnt", "sum")])
        )
        g = g.rename_columns(["w1", "w2", "cnt"])
        return g.filter(pc.greater_equal(g["cnt"], min_count))

    bigrams = (
        ds.map_batches(bigram_partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("_pb")
        .map_groups(fold_bigrams, batch_format="pyarrow")
    )

    def unigram_partial(t: pa.Table) -> pa.Table:
        flat, _ = _flat_tokens(t, text_col)
        g = pa.table({"w": flat}).group_by("w").aggregate(
            [([], "count_all")]
        )
        return pa.table({
            "w": g["w"],
            "c": pc.cast(g["count_all"], pa.int64()),
        })

    # the unigram marginal table is vocab-bounded — the classic
    # broadcast-small side: fold once, collect, ray.put once, read
    # inside the scoring task (two shuffle joins measured ~4 s of pure
    # fixed overhead on this metadata-sized table)
    import ray

    uni_tbl = pa.concat_tables(
        b for b in (
            ds.map_batches(unigram_partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("w")
            .aggregate(Sum("c", alias_name="c"))
            .iter_batches(batch_format="pyarrow")
        )
    ).combine_chunks()
    uni_ref = ray.put(uni_tbl)

    # two scalars ride the task closures. n_bigrams is derivable without
    # a third tokenization pass: every nonempty doc contributes
    # (tokens - 1) bigrams, so n_big = n_tokens - n_nonempty_docs, and
    # counting nonempty docs is one cheap trimmed-length check.
    n_tok = float(pc.sum(uni_tbl["c"]).as_py() or 0)

    def nonempty(t: pa.Table) -> pa.Table:
        ln = pc.utf8_length(
            pc.utf8_trim_whitespace(t[text_col].combine_chunks())
        )
        return pa.table({
            "n": pa.array(
                [pc.sum(pc.cast(pc.greater(ln, 0), pa.int64())).as_py()
                 or 0],
                pa.int64(),
            )
        })

    n_docs_nonempty = float(
        ds.map_batches(nonempty, batch_format="pyarrow",
                       zero_copy_batch=True).sum("n")
    )
    n_big = n_tok - n_docs_nonempty

    def score(t: pa.Table) -> pa.Table:
        ut = ray.get(uni_ref)
        ca = pc.cast(
            ut["c"].take(pc.index_in(t["w1"], value_set=ut["w"])),
            pa.float64(),
        )
        cb = pc.cast(
            ut["c"].take(pc.index_in(t["w2"], value_set=ut["w"])),
            pa.float64(),
        )
        return pa.table({
            "w1": t["w1"],
            "w2": t["w2"],
            "cnt": pc.cast(t["cnt"], pa.int64()),
            # exact oracle expression order:
            # ln((cnt / n_big) / ((ca / n_tok) * (cb / n_tok)))
            "pmi": pc.ln(pc.divide(
                pc.divide(pc.cast(t["cnt"], pa.float64()), n_big),
                pc.multiply(pc.divide(ca, n_tok), pc.divide(cb, n_tok)),
            )),
        })

    scored = bigrams.map_batches(score, batch_format="pyarrow")

    from debezium_incubator_ray.functions.kernels import (
        merge_local_topk, table_topk,
    )

    empty = pa.table({
        "w1": pa.array([], pa.string()),
        "w2": pa.array([], pa.string()),
        "cnt": pa.array([], pa.int64()),
        "pmi": pa.array([], pa.float64()),
    })
    cand = scored.map_batches(
        lambda t: table_topk(t, "pmi", ["w1", "w2"], k),
        batch_format="pyarrow",
    )
    return merge_local_topk(cand, "pmi", ["w1", "w2"], k, empty)


def gopher_rules(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 20,
    mean_len_lo: float = 3.0,
    mean_len_hi: float = 10.0,
    min_stop_frac: float = 0.02,
    max_top_frac: float = 0.12,
    stopwords: tuple = ("the", "a"),
):
    """Gopher-style document quality rules (Rae et al. 2021 §A1.1,
    adapted to the corpus's single-space token streams): per doc the
    word count, mean word length, stopword fraction and most-frequent
    -word dominance, plus the per-rule pass bits and the overall
    ``pass_all``. The real-corpus extras (bullet/ellipsis line ratios,
    symbol ratios) gate on characters this synthetic corpus doesn't
    contain and would be constant columns — the Ray shapes are
    identical.

    Scale shape: embarrassingly parallel — one map_batches, all
    signals from Arrow kernels (split -> flatten -> per-(doc, word)
    group counts -> per-doc max); no shuffle, docs never leave their
    block."""

    def f(t: pa.Table) -> pa.Table:
        # NULL text has no tokens: drop the row (matches the SQL oracle,
        # where unnest of a NULL split emits nothing)
        t = t.filter(pc.is_valid(t[text_col]))
        txt = pc.cast(t[text_col].combine_chunks(), pa.string())
        ids = t[id_col].combine_chunks()
        words = pc.split_pattern(txt, " ")
        n_words = pc.list_value_length(words).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        n_chars = pc.utf8_length(txt).to_numpy(zero_copy_only=False)
        mean_len = np.where(
            n_words > 0,
            (n_chars - np.maximum(n_words - 1, 0)) / np.maximum(n_words, 1),
            0.0,
        )
        flat = pc.list_flatten(words)
        doc_idx = np.repeat(np.arange(len(n_words), dtype=np.int64),
                            n_words)
        # stopword fraction: one is_in over the flat words + reduceat
        stop_mask = pc.is_in(
            flat, value_set=pa.array(list(stopwords))
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        starts = np.cumsum(n_words) - n_words
        nz = n_words > 0
        stop_cnt = np.zeros(len(n_words), np.int64)
        if len(flat):
            sums = np.add.reduceat(stop_mask, np.maximum(starts, 0)[nz])
            stop_cnt[nz] = sums
        stop_frac = np.where(n_words > 0, stop_cnt / np.maximum(n_words, 1),
                             0.0)
        # top-word dominance: per-(doc, word) counts -> per-doc max
        wc = (
            pa.table({"i": pa.array(doc_idx), "w": flat})
            .group_by(["i", "w"]).aggregate([([], "count_all")])
        )
        mx = wc.group_by(["i"]).aggregate([("count_all", "max")])
        top_cnt = np.zeros(len(n_words), np.int64)
        top_cnt[mx["i"].combine_chunks().to_numpy(zero_copy_only=False)] = (
            mx["count_all_max"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
        )
        top_frac = np.where(n_words > 0, top_cnt / np.maximum(n_words, 1),
                            0.0)
        r_words = n_words >= min_words
        r_mean = (mean_len >= mean_len_lo) & (mean_len <= mean_len_hi)
        r_stop = stop_frac >= min_stop_frac
        r_top = top_frac <= max_top_frac
        return pa.table({
            id_col: ids,
            "n_words": pa.array(n_words),
            "mean_word_len": pa.array(np.round(mean_len, 6)),
            "stop_frac": pa.array(np.round(stop_frac, 6)),
            "top_frac": pa.array(np.round(top_frac, 6)),
            "r_words": pa.array(r_words),
            "r_mean_len": pa.array(r_mean),
            "r_stop": pa.array(r_stop),
            "r_top": pa.array(r_top),
            "pass_all": pa.array(r_words & r_mean & r_stop & r_top),
        })

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)

def bigram_logprob(ds, text_col: str = "text", id_col: str = "doc_id",
                   k_smooth: float = 0.5):
    """Corpus-learned bigram language-model score per document: the mean
    over a doc's adjacent token pairs of ln((c(w1 w2) + k) /
    (c_ctx(w1) + k*V)) — the next step up from :func:`unigram_logprob`
    on the CCNet-style quality ladder (fluency, not just vocabulary).
    Context counts c_ctx are bigram LEFT-side occurrences (every token
    except each doc's last), V = corpus distinct-token count; add-k
    smoothing keeps unseen continuations finite. Docs with < 2 tokens
    score 0.0 (no bigram evidence), matching the oracle's coalesce.

    Same two-pass learned-filter shape: pass 1 folds per-batch bigram
    partials through one narrow groupby (the model is the distinct-
    bigram set — Zipf-sublinear in the corpus); pass 2 broadcasts it via
    ``ray.put`` and scores in a streaming actor pool. Bigrams never
    cross document boundaries."""
    import ray
    from ray.data.aggregate import Sum

    # bigram key = f"{len(w1)}\x1f{w1}\x1f{w2}" — the length prefix makes
    # the encoding injective even when tokens CONTAIN \x1f (RE2's \s is
    # ASCII-only, so control chars survive tokenization; a bare
    # "w1\x1fw2" join would collide 'a\x1fb'+'c' with 'a'+'b\x1fc' and
    # pandas reindex raises on the duplicate labels)
    SEP = "\x1f"

    def _bigram_keys(w1, w2):
        return pc.binary_join_element_wise(
            pc.cast(pc.utf8_length(w1), pa.string()), w1, w2, SEP
        )

    def _doc_bigrams(t: pa.Table):
        """(w1 array, w2 array, per-doc bigram counts) — adjacency within
        each doc only."""
        flat, lens = _flat_tokens(t, text_col)
        n = len(flat)
        if n == 0:
            e = pa.array([], pa.string())
            return e, e, np.zeros(len(lens), np.int64)
        # position i pairs with i+1 unless i is a doc's last token
        is_last = np.zeros(n, dtype=bool)
        ends = np.cumsum(lens) - 1
        is_last[ends[lens > 0]] = True
        w1_idx = np.nonzero(~is_last)[0]
        w1 = flat.take(pa.array(w1_idx))
        w2 = flat.take(pa.array(w1_idx + 1))
        blens = np.maximum(lens - 1, 0)
        return w1, w2, blens

    def partial_counts(t: pa.Table) -> pa.Table:
        w1, w2, _ = _doc_bigrams(t)
        g = pa.table({"w1": w1, "w2": w2}).group_by(["w1", "w2"]).aggregate(
            [([], "count_all")]
        )
        return pa.table({
            "w1": g["w1"], "w2": g["w2"],
            "_c": pc.cast(g["count_all"], pa.int64()),
        })

    def vocab_partial(t: pa.Table) -> pa.Table:
        flat, _ = _flat_tokens(t, text_col)
        return pa.table({"term": flat.unique()})

    bigrams = (
        ds.map_batches(partial_counts, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby(["w1", "w2"])
        .aggregate(Sum("_c", alias_name="c"))
        .take_all()
    )
    # vocab SIZE only — count the grouped rows, never ship the terms
    v_size = float(
        ds.map_batches(vocab_partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("term")
        .count()
        .count()
    )
    import pandas as pd

    bg = pd.Series(
        [float(r["c"]) for r in bigrams],
        index=[f"{len(r['w1'])}{SEP}{r['w1']}{SEP}{r['w2']}"
               for r in bigrams],
        dtype=np.float64,
    )
    ctx = pd.Series(
        [float(r["c"]) for r in bigrams],
        index=[r["w1"] for r in bigrams],
    ).groupby(level=0).sum()
    model_ref = ray.put((bg, ctx, v_size))

    class Scorer:
        def __init__(self):
            self.bg, self.ctx, self.v = ray.get(model_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            w1, w2, blens = _doc_bigrams(t)
            nd = len(blens)
            if nd == 0:
                return pa.table({
                    id_col: pa.array([], pa.int64()),
                    "logprob": pa.array([], pa.float64()),
                })
            keys = _bigram_keys(w1, w2)
            # dictionary-encode: look each DISTINCT key/context up once
            enc = keys.dictionary_encode()
            codes = enc.indices.to_numpy(zero_copy_only=False)
            kc = self.bg.reindex(enc.dictionary.to_pylist()).fillna(0.0)
            e1 = w1.dictionary_encode()
            c1 = e1.indices.to_numpy(zero_copy_only=False)
            cc = self.ctx.reindex(e1.dictionary.to_pylist()).fillna(0.0)
            lp = np.log(
                (kc.to_numpy()[codes] + k_smooth)
                / (cc.to_numpy()[c1] + k_smooth * self.v)
            ) if len(codes) else np.array([], np.float64)
            doc_idx = np.repeat(np.arange(nd), blens)
            sums = np.bincount(doc_idx, weights=lp, minlength=nd)
            means = np.where(
                blens > 0, sums / np.maximum(blens, 1), 0.0
            )
            return pa.table({
                id_col: t[id_col],
                "logprob": pa.array(np.round(means, 6)),
            })

    return ds.map_batches(Scorer, batch_format="pyarrow",
                          zero_copy_batch=True, concurrency=(1, 4))


def json_field_stats(ds, props_col: str = "props", field: str = "k",
                     group_col: str = "event_type"):
    """Typed-field extraction from a JSON-ish string column WITHOUT a
    JSON parser in the hot path: one vectorized ``pc.extract_regex``
    pulls the integer field per row (NULL when absent/NULL props), then
    per-group (n, mean, min, max) fold.

    CONTRACT: payloads must be FLAT objects with integer-valued fields
    (the ``{"k": 42}`` event-props shape). The regex is not a JSON
    parser — nested objects, string-embedded key text, float or quoted
    values all diverge from ``json_extract`` semantics; route such
    payloads through ``sources/debezium_json.py`` instead.

    This is the "pull one property out of
    the event payload" stage every clickstream pipeline starts with.
    Per-block partials carry (group, n, sum, min, max); one narrow
    groupby folds them."""
    from ray.data.aggregate import Sum, Min, Max

    pattern = '"' + field + '":\\s*(?P<v>-?\\d+)'

    def partial(t: pa.Table) -> pa.Table:
        g = t[group_col].combine_chunks()
        props = t[props_col].combine_chunks()
        ex = pc.extract_regex(pc.fill_null(props, ""), pattern)
        v = pc.cast(pc.struct_field(ex, "v"), pa.int64())
        keep = pc.and_(pc.is_valid(v), pc.is_valid(g))
        sub = pa.table({"g": g.filter(keep), "v": v.filter(keep)})
        agg = sub.group_by("g").aggregate(
            [("v", "count"), ("v", "sum"), ("v", "min"), ("v", "max")]
        )
        return pa.table({
            "g": agg["g"],
            "n": pc.cast(agg["v_count"], pa.int64()),
            "s": pc.cast(agg["v_sum"], pa.int64()),
            "mn": agg["v_min"],
            "mx": agg["v_max"],
        })

    folded = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("g")
        .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s"),
                   Min("mn", alias_name="mn"), Max("mx", alias_name="mx"))
    )

    def finish(t: pa.Table) -> pa.Table:
        n = pc.cast(t["n"], pa.float64())
        mean = pc.round(
            pc.divide(pc.cast(t["s"], pa.float64()), n), 6
        )
        return pa.table({
            group_col: t["g"],
            "n": t["n"],
            "mean_" + field: mean,
            "min_" + field: pc.cast(t["mn"], pa.int64()),
            "max_" + field: pc.cast(t["mx"], pa.int64()),
        })

    return folded.map_batches(finish, batch_format="pyarrow")


def heaps_law(docs, group_col: str = "source", text_col: str = "text",
              buckets: int = 32):
    """Heaps'-law vocabulary-growth fit: per group (corpus source), the
    total whitespace-token count N and exact distinct-token count V, plus
    the global log-log least-squares fit V = k * N^beta across groups —
    the corpus-health gauge (a source whose vocabulary grows off-trend is
    boilerplate-heavy or spam).

    Scale shape: token totals fold as per-block partial sums; vocabulary
    counts dedupe per block to distinct (group, token) pairs (the
    combiner), shuffle ONCE by token hash so in-bucket distinct counts
    sum to the global count, and fold per group. Only O(groups) rows
    reach the driver, where the two-point-per-group regression runs. The
    fit follows SQL's regr_slope/regr_intercept (population covariance /
    variance over ln N, ln V)."""
    from ray.data.aggregate import Sum
    from debezium_incubator_ray.hashing import stable_hash

    def _nonempty(t: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim_whitespace(t[text_col].combine_chunks())
        keep = pc.greater(pc.utf8_length(trimmed), 0)
        return pa.table({group_col: t[group_col], "_tr": trimmed}).filter(keep)

    def totals(t: pa.Table) -> pa.Table:
        t2 = _nonempty(t)
        toks = pc.split_pattern_regex(t2["_tr"], _WS)
        n = pc.cast(pc.list_value_length(toks), pa.int64())
        g = pa.table({group_col: t2[group_col], "n": n}).group_by(
            group_col
        ).aggregate([("n", "sum")])
        return g.rename_columns([group_col, "n"])

    tot = (
        docs.map_batches(totals, batch_format="pyarrow",
                         zero_copy_batch=True)
        .groupby(group_col)
        .aggregate(Sum("n", alias_name="n_tokens"))
    )

    def vocab_pairs(t: pa.Table) -> pa.Table:
        t2 = _nonempty(t)
        toks = pc.split_pattern_regex(t2["_tr"], _WS).combine_chunks()
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        src = t2[group_col].take(parent)
        d = pa.table({group_col: src, "w": flat}).group_by(
            [group_col, "w"]
        ).aggregate([])
        b = (stable_hash(d["w"]) % np.uint64(buckets)).astype(np.int32)
        return d.append_column("_b", pa.array(b))

    def bucket_vocab(g: pa.Table) -> pa.Table:
        d = g.drop_columns(["_b"]).group_by([group_col, "w"]).aggregate([])
        c = d.group_by(group_col).aggregate([([], "count_all")])
        return pa.table({
            group_col: c[group_col],
            "v": pc.cast(c["count_all"], pa.int64()),
        })

    voc = (
        docs.map_batches(vocab_pairs, batch_format="pyarrow",
                         zero_copy_batch=True)
        .groupby("_b")
        .map_groups(bucket_vocab, batch_format="pyarrow")
        .groupby(group_col)
        .aggregate(Sum("v", alias_name="n_vocab"))
    )

    from debezium_incubator_ray.functions.kernels import collect_table

    t_tot, t_voc = collect_table(tot), collect_table(voc)
    j = t_tot.join(t_voc, keys=[group_col], join_type="inner").sort_by(
        [(group_col, "ascending")]
    )
    x = np.log(j["n_tokens"].to_numpy(zero_copy_only=False).astype(np.float64))
    y = np.log(j["n_vocab"].to_numpy(zero_copy_only=False).astype(np.float64))
    n = len(x)
    beta = k_coef = None
    if n >= 2:
        mx, my = x.mean(), y.mean()
        varx = ((x - mx) ** 2).mean()
        if varx > 0:
            beta = float(((x - mx) * (y - my)).mean() / varx)
            k_coef = float(np.exp(my - beta * mx))
    return pa.table({
        group_col: j[group_col],
        "n_tokens": j["n_tokens"],
        "n_vocab": j["n_vocab"],
        "heaps_beta": pa.array(
            [None if beta is None else round(beta, 6)] * n, pa.float64()
        ),
        "heaps_k": pa.array(
            [None if k_coef is None else round(k_coef, 6)] * n, pa.float64()
        ),
    })


def source_vocab_overlap(docs, group_col: str = "source",
                         text_col: str = "text", k: int = 50):
    """Pairwise vocabulary Jaccard between corpus sources: |Va ∩ Vb| /
    |Va ∪ Vb| over whitespace-token vocabularies — the corpus-similarity
    gauge behind mixture design (two sources with near-identical
    vocabularies add less diversity than their row counts suggest).

    Scale shape: documents explode to distinct (token, source) pairs per
    block (the combiner); the shared co-occurrence machinery
    (:func:`...joins.copurchase_pairs` with token as the basket) counts
    each pair's intersection with one token-hash bucketed shuffle; vocab
    sizes fold via the distinct-pair combiner. Only O(sources^2) rows
    reach the driver. Top-k by (rounded jaccard desc, a, b)."""
    from debezium_incubator_ray.functions.joins import (
        copurchase_pairs, distinct_count_per_group,
    )
    from debezium_incubator_ray.functions.kernels import (
        collect_table, table_topk,
    )

    def explode(t: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim_whitespace(t[text_col].combine_chunks())
        keep = pc.greater(pc.utf8_length(trimmed), 0)
        t2 = pa.table({group_col: t[group_col], "_tr": trimmed}).filter(keep)
        toks = pc.split_pattern_regex(t2["_tr"], _WS).combine_chunks()
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        src = t2[group_col].take(parent)
        return pa.table({"w": flat, group_col: src}).group_by(
            ["w", group_col]
        ).aggregate([])

    tok = docs.map_batches(explode, batch_format="pyarrow",
                           zero_copy_batch=True).materialize()
    pairs = copurchase_pairs(tok, "w", group_col, k=100_000)
    sizes = collect_table(
        distinct_count_per_group(tok, group_col, "w")
    ).rename_columns([group_col, "nv"])
    a_col, b_col = f"{group_col}_a", f"{group_col}_b"
    j = pairs.join(
        sizes.rename_columns([a_col, "na"]), keys=[a_col],
        join_type="inner",
    ).join(
        sizes.rename_columns([b_col, "nb"]), keys=[b_col],
        join_type="inner",
    )
    inter = pc.cast(j["cnt"], pa.float64())
    union = pc.subtract(
        pc.cast(pc.add(j["na"], j["nb"]), pa.float64()), inter
    )
    out = pa.table({
        "source_a": j[a_col],
        "source_b": j[b_col],
        "n_shared": j["cnt"],
        "jaccard": pc.round(pc.divide(inter, union), 6),
    })
    out = table_topk(out, "jaccard", ["source_a", "source_b"], k)
    order = pc.sort_indices(
        out.append_column("_neg", pc.negate(out["jaccard"])),
        sort_keys=[("_neg", "ascending"), ("source_a", "ascending"),
                   ("source_b", "ascending")],
    )
    return out.take(order)

# ---------------------------------------------------------------------------
# Persisted BM25 text index — the lake-side sibling of ann.build_ivf_index:
# postings bucketed by term hash so a query touches only its terms' buckets.
#
# Commit protocol (the lake's, applied to the index): _STATS.json is the ONE
# manifest — file list per bucket, BM25 globals, tombstone set — and every
# mutation (build, append, delete, compact) becomes visible in one atomic
# replace of it. Posting bytes on disk that the manifest does not list are
# invisible to readers; vacuum_text_index() reclaims them once in-flight
# readers (which may hold an older manifest) have drained. Mutators are
# SINGLE-WRITER, enforced loudly by an exclusive _LOCK file.
# ---------------------------------------------------------------------------


class TextIndexLockedError(RuntimeError):
    """A second concurrent index mutator — the single-writer contract."""


class _index_write_lock:
    """O_CREAT|O_EXCL lock file around a mutator's read-modify-commit
    window (same local-fs discipline as state/manifest.py's writer
    lock). Concurrent mutation raises instead of silently last-writer-
    wins-ing the manifest."""

    def __init__(self, index_dir: str):
        import os

        self.path = os.path.join(index_dir, "_LOCK")

    def __enter__(self):
        import os

        try:
            fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            raise TextIndexLockedError(
                f"another index mutator holds {self.path}; the index is "
                "single-writer (remove the stale lock only if its owner "
                "is dead)"
            ) from None
        os.write(fd, str(os.getpid()).encode())
        os.close(fd)
        return self

    def __exit__(self, *exc):
        import os

        try:
            os.remove(self.path)
        except OSError:
            pass
        return False


def _postings_fn(text_col: str, id_col: str, buckets: int):
    """THE posting extractor — build and append must tokenize and
    bucket identically or they diverge from each other and from the
    in-memory bm25_topk; one closure, used by both."""
    from debezium_incubator_ray.functions.tokens import md5_u64

    def postings(t: pa.Table) -> pa.Table:
        flat, lens = _flat_tokens(t, text_col)
        n_docs = len(lens)
        doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        part = pa.table({
            "term": flat,
            "doc_id": pa.array(ids[doc_of]),
            "tf": pa.array(np.ones(len(doc_of), np.int64)),
            "dl": pa.array(lens[doc_of]),
        }).group_by(["term", "doc_id", "dl"]).aggregate([("tf", "sum")])
        b = (md5_u64(part["term"]) % np.uint64(buckets)).astype(np.int64)
        return pa.table({
            "term": part["term"], "doc_id": part["doc_id"],
            "tf": part["tf_sum"], "dl": part["dl"],
            "bucket": pa.array(b),
        })

    return postings


def _fold_doc_stats(postings_ds) -> tuple:
    """(n_docs, sum_dl) from a postings Dataset — distributed per-doc
    first-dl fold (a doc's dl is identical on every posting; Min, not
    Sum, because a doc's postings can span batches)."""
    from ray.data.aggregate import Min, Sum

    def dl_partial(t: pa.Table) -> pa.Table:
        part = t.select(["doc_id", "dl"]).group_by("doc_id").aggregate(
            [("dl", "min")]
        )
        return pa.table({"doc_id": part["doc_id"], "dl": part["dl_min"]})

    per_doc = (
        postings_ds.map_batches(dl_partial, batch_format="pyarrow",
                                zero_copy_batch=True)
        .groupby("doc_id")
        .aggregate(Min("dl", alias_name="dl"))
    )

    def stats_partial(t: pa.Table) -> pa.Table:
        return pa.table({
            "_k": pa.array([0], pa.int64()),
            "n_docs": pa.array([t.num_rows], pa.int64()),
            "sum_dl": pa.array(
                [int(t["dl"].to_numpy(zero_copy_only=False).sum())],
                pa.int64(),
            ),
        })

    rows = (
        per_doc.map_batches(stats_partial, batch_format="pyarrow",
                            zero_copy_batch=True)
        .groupby("_k")
        .aggregate(Sum("n_docs", alias_name="n_docs"),
                   Sum("sum_dl", alias_name="sum_dl"))
        .take_all()
    )
    if not rows:
        return 0, 0
    return int(rows[0]["n_docs"]), int(rows[0]["sum_dl"])


def _read_stats(index_dir: str) -> dict:
    import json
    import os

    with open(os.path.join(index_dir, "_STATS.json")) as f:
        stats = json.load(f)
    if "files" not in stats:  # pre-manifest index: adopt the disk state
        stats["files"] = _index_files_on_disk(index_dir)
    stats.setdefault("tombstones", [])
    return stats


def _atomic_json_replace(index_dir: str, name: str, doc: dict) -> None:
    """THE visibility point of every index mutator: one atomic replace
    of a small JSON control doc (shared by the text, minhash and IVF
    index manifests — one implementation of the crash contract)."""
    import json
    import os
    import uuid

    swap = os.path.join(index_dir, f".{name}.{uuid.uuid4().hex}.swap")
    with open(swap, "w") as f:
        json.dump(doc, f)
    os.replace(swap, os.path.join(index_dir, name))


def _commit_stats(index_dir: str, stats: dict) -> None:
    _atomic_json_replace(index_dir, "_STATS.json", stats)


def _index_files_on_disk(root: str, prefix: str = "bucket=") -> dict:
    """{partition_id: [relative parquet file names]} actually present
    under ``<prefix><id>`` dirs (bucket= for the text/minhash indexes,
    cluster= for the IVF index)."""
    import os

    out = {}
    for d in sorted(os.listdir(root)):
        if not d.startswith(prefix):
            continue
        bb = int(d.split("=")[1])
        out[str(bb)] = sorted(
            f for f in os.listdir(os.path.join(root, d))
            if f.endswith(".parquet")
        )
    return out


def _promote_delta_files(
    index_dir: str, tmp: str, files: dict, tag: str,
    prefix: str = "bucket=",
) -> dict:
    """Move a delta write's partitioned parquet files into the live
    partition dirs under append-tagged names, extending ``files`` in
    place — the shared promotion step of every index append (the files
    stay INVISIBLE until the caller's manifest commit)."""
    import os

    for d in sorted(os.listdir(tmp)):
        if not d.startswith(prefix):
            continue
        bb = d.split("=")[1]
        dst_dir = os.path.join(index_dir, f"{prefix}{bb}")
        os.makedirs(dst_dir, exist_ok=True)
        for i, f in enumerate(sorted(os.listdir(os.path.join(tmp, d)))):
            if not f.endswith(".parquet"):
                continue
            name = f"append-{tag}-{i:04d}.parquet"
            os.replace(os.path.join(tmp, d, f),
                       os.path.join(dst_dir, name))
            files.setdefault(bb, []).append(name)
    return files


def build_text_index(
    ds,
    out_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 32,
) -> dict:
    """Write a persisted inverted index: ONE streaming pass over the
    CORPUS produces ``bucket=<md5_u64(term) %% buckets>/*.parquet``
    rows of ``(term, doc_id, tf, dl)`` — the doc length rides
    denormalized on every posting so search never joins a doclen
    table; the BM25 globals for ``_STATS.json`` then fold from the
    WRITTEN postings, so the corpus text is read and tokenized exactly
    once. Publish is atomic (tmp dir + rename): readers never observe
    a half-built index. Returns {"buckets": int, "n_docs": int}."""
    import os
    import shutil
    import uuid

    import ray.data

    tmp = f"{out_dir}.{uuid.uuid4().hex}.tmp"
    ds.map_batches(
        _postings_fn(text_col, id_col, buckets),
        batch_format="pyarrow", zero_copy_batch=True,
    ).write_parquet(tmp, partition_cols=["bucket"])

    n_docs, sum_dl = _fold_doc_stats(ray.data.read_parquet(tmp))
    _commit_stats(tmp, {
        "n_docs": n_docs, "sum_dl": sum_dl, "buckets": int(buckets),
        "files": _index_files_on_disk(tmp), "tombstones": [],
    })
    shutil.rmtree(out_dir, ignore_errors=True)
    os.rename(tmp, out_dir)  # the visibility point
    return {"buckets": buckets, "n_docs": n_docs}


def append_to_text_index(
    index_dir: str,
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict:
    """Incrementally add NEW documents: delta posting files land inside
    the bucket dirs but stay INVISIBLE (readers only open manifested
    files) until one atomic manifest replace publishes the new file
    list + updated globals. Tombstones CARRY FORWARD untouched. A
    crash before the commit leaves the old view byte-identical (the
    orphaned files are reclaimed by vacuum_text_index). The caller
    owns doc-id disjointness against the LIVE doc set (appending an
    existing live id would double its postings — delete and compact
    first; that three-step is the documented update contract)."""
    import os
    import shutil
    import uuid

    with _index_write_lock(index_dir):
        stats = _read_stats(index_dir)
        buckets = int(stats["buckets"])
        tag = uuid.uuid4().hex

        tmp = os.path.join(index_dir, f"_append-{tag}.tmp")
        delta = ds.map_batches(
            _postings_fn(text_col, id_col, buckets),
            batch_format="pyarrow", zero_copy_batch=True,
        ).materialize()
        if delta.count() == 0:
            # Empty delta: write_parquet creates no tmp dir for a
            # zero-block dataset, so promoting would crash — an idle
            # incremental cycle is a no-op (same guard as the IVF
            # index's append, ann.py).
            return {"appended_docs": 0, "n_docs": int(stats["n_docs"])}
        delta.write_parquet(tmp, partition_cols=["bucket"])
        d_docs, d_dl = _fold_doc_stats(delta)

        files = {k: list(v) for k, v in stats["files"].items()}
        _promote_delta_files(index_dir, tmp, files, tag)
        shutil.rmtree(tmp, ignore_errors=True)

        _commit_stats(index_dir, {
            "n_docs": int(stats["n_docs"]) + d_docs,
            "sum_dl": int(stats["sum_dl"]) + d_dl,
            "buckets": buckets, "files": files,
            "tombstones": stats["tombstones"],  # deletes survive appends
        })
        return {"appended_docs": d_docs,
                "n_docs": int(stats["n_docs"]) + d_docs}


def delete_from_text_index(index_dir: str, doc_ids) -> dict:
    """Tombstone deletion: the doc ids join the manifest's tombstone
    set in ONE atomic commit — search filters their postings out
    immediately; the bytes remain until compact_text_index rewrites
    them away. BM25 globals stay the built-corpus statistics until
    compaction (they drift slightly under heavy tombstoning, exactly
    like every tombstone-based search engine between merges)."""
    with _index_write_lock(index_dir):
        stats = _read_stats(index_dir)
        tomb = set(stats["tombstones"])
        tomb.update(int(d) for d in doc_ids)
        stats["tombstones"] = sorted(tomb)
        _commit_stats(index_dir, stats)
        return {"tombstones": len(tomb)}


def compact_text_index(index_dir: str) -> dict:
    """Rewrite every manifested posting file dropping tombstoned docs
    (one Ray task per bucket — embarrassingly parallel), adjust the
    BM25 globals ARITHMETICALLY from the removed docs' (doc_id, dl)
    pairs the rewrite tasks return (bounded by the tombstone set — no
    second pass over the surviving index), and commit files + stats +
    empty tombstone set atomically. Old files become invisible at the
    commit but stay on disk for in-flight readers holding the previous
    manifest; vacuum_text_index reclaims them once those drain."""
    import os

    import ray

    with _index_write_lock(index_dir):
        stats = _read_stats(index_dir)
        tomb = set(stats["tombstones"])
        if not tomb:
            return {"rewritten": 0, "n_docs": int(stats["n_docs"])}
        tag = __import__("uuid").uuid4().hex
        tomb_ref = ray.put(pa.array(sorted(tomb), pa.int64()))

        @ray.remote
        def rewrite_bucket(bdir: str, names: list, tag: str):
            import os as _os

            import pyarrow.compute as _pc
            import pyarrow.parquet as _pq

            t_arr = ray.get(tomb_ref)
            kept, removed = [], {}
            for i, name in enumerate(names):
                t = _pq.read_table(_os.path.join(bdir, name))
                hit = _pc.is_in(t["doc_id"], value_set=t_arr)
                gone = t.filter(hit)
                for d, l in zip(
                    gone["doc_id"].to_pylist(), gone["dl"].to_pylist()
                ):
                    removed[int(d)] = int(l)
                t = t.filter(_pc.invert(hit))
                if t.num_rows == 0:
                    continue
                out = f"compact-{tag}-{i:04d}.parquet"
                _pq.write_table(t, _os.path.join(bdir, out))
                kept.append(out)
            return kept, removed

        items = sorted(stats["files"].items())
        futs = [
            rewrite_bucket.remote(
                os.path.join(index_dir, f"bucket={bb}"), names, tag
            )
            for bb, names in items
        ]
        results = ray.get(futs)
        new_files = {
            bb: kept
            for (bb, _n), (kept, _r) in zip(items, results) if kept
        }
        removed_dl: dict = {}
        for _kept, removed in results:
            removed_dl.update(removed)  # tombstone-bounded, tiny
        n_old = sum(len(names) for _bb, names in items)
        _commit_stats(index_dir, {
            "n_docs": int(stats["n_docs"]) - len(removed_dl),
            "sum_dl": int(stats["sum_dl"]) - sum(removed_dl.values()),
            "buckets": int(stats["buckets"]),
            "files": new_files, "tombstones": [],
        })
        return {"rewritten": n_old,
                "n_docs": int(stats["n_docs"]) - len(removed_dl)}


def vacuum_text_index(index_dir: str) -> dict:
    """Remove posting files the manifest no longer lists (compaction
    leftovers, crashed-append orphans). Run once in-flight readers —
    which may hold an older manifest — have drained; the lake's
    vacuum contract."""
    import os

    with _index_write_lock(index_dir):
        stats = _read_stats(index_dir)
        live = {
            (bb, name)
            for bb, names in stats["files"].items() for name in names
        }
        removed = 0
        for d in sorted(os.listdir(index_dir)):
            if not d.startswith("bucket="):
                continue
            bb = d.split("=")[1]
            for f in os.listdir(os.path.join(index_dir, d)):
                if f.endswith(".parquet") and (bb, f) not in live:
                    os.remove(os.path.join(index_dir, d, f))
                    removed += 1
        return {"removed_files": removed}


def text_index_topk(
    index_dir: str,
    query_terms,
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
):
    """BM25 top-k through the PERSISTED index: reads ONLY the bucket
    partitions the query terms hash to (partition pruning — the
    pruned-read contract this index exists for), folds per-term df
    from the touched postings, scores each posting independently
    (idf * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl)) — BM25 is
    additive over terms), sums per doc in one narrow groupby and
    merges per-block top-k partials. Ranking parity with the
    in-memory bm25_topk is pinned by tests (same tokenizer, same
    smoothed idf)."""
    import json
    import os

    import ray.data
    from ray.data.aggregate import Count, Sum

    from debezium_incubator_ray.functions.kernels import (
        merge_local_topk, table_topk,
    )
    from debezium_incubator_ray.functions.tokens import md5_u64

    stats = _read_stats(index_dir)
    n_corpus, buckets = stats["n_docs"], stats["buckets"]
    avgdl = stats["sum_dl"] / max(n_corpus, 1)

    terms = sorted(set(query_terms))
    term_arr = pa.array(terms, pa.string())
    needed = sorted({
        int(h % np.uint64(buckets)) for h in md5_u64(term_arr)
    })
    # ray.data.read_parquet takes FILE paths when given a list. Open
    # only the MANIFESTED files of the needed buckets (partition
    # pruning + append atomicity: un-manifested files are invisible);
    # a pre-manifest index falls back to the on-disk glob
    manifest = stats["files"]
    paths = []
    for bb in needed:
        d = os.path.join(index_dir, f"bucket={bb}")
        if not os.path.isdir(d):
            continue
        paths.extend(
            os.path.join(d, f) for f in manifest.get(str(bb), [])
        )
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "score": pa.array([], pa.float64())})
    if not paths:
        return empty
    ds = ray.data.read_parquet(paths)

    tomb_arr = pa.array(
        [int(x) for x in stats["tombstones"]], pa.int64()
    )

    def filter_terms(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["term"], value_set=term_arr))
        if len(tomb_arr):
            t = t.filter(pc.invert(
                pc.is_in(t["doc_id"], value_set=tomb_arr)
            ))
        return t

    postings = ds.map_batches(
        filter_terms, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # tiny: only the query terms' postings

    dfs = {
        r["term"]: r["n"]
        for r in postings.groupby("term")
        .aggregate(Count(alias_name="n")).take_all()
    }
    idf = {
        t_: float(np.log(
            (n_corpus - dfs.get(t_, 0) + 0.5)
            / (dfs.get(t_, 0) + 0.5) + 1.0
        ))
        for t_ in terms
    }

    def score(t: pa.Table) -> pa.Table:
        tv = t["term"].combine_chunks().to_pylist()
        tf = t["tf"].combine_chunks().to_numpy(
            zero_copy_only=False
        ).astype(np.float64)
        dl = t["dl"].combine_chunks().to_numpy(
            zero_copy_only=False
        ).astype(np.float64)
        w = np.array([idf[x] for x in tv])
        sc = w * tf * (k1 + 1.0) / (
            tf + k1 * (1.0 - b + b * dl / avgdl)
        )
        part = pa.table({
            "doc_id": t["doc_id"], "score": pa.array(sc),
        }).group_by("doc_id").aggregate([("score", "sum")])
        return pa.table({"doc_id": part["doc_id"],
                         "score": part["score_sum"]})

    per_doc = (
        postings.map_batches(score, batch_format="pyarrow",
                             zero_copy_batch=True)
        .groupby("doc_id")
        .aggregate(Sum("score", alias_name="score"))
    )

    def topk_part(t: pa.Table) -> pa.Table:
        return table_topk(t.select(["doc_id", "score"]), "score",
                          ["doc_id"], k)

    cand = per_doc.map_batches(topk_part, batch_format="pyarrow",
                               zero_copy_batch=True)
    out = merge_local_topk(cand, "score", ["doc_id"], k, empty)
    order = pc.sort_indices(
        out.append_column("_neg", pc.negate(out["score"])),
        sort_keys=[("_neg", "ascending"), ("doc_id", "ascending")],
    )
    out = out.take(order)
    return out.set_column(
        out.schema.get_field_index("score"), "score",
        pc.round(out["score"], ndigits=6),
    )
