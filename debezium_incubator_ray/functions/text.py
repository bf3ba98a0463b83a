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
    """Heuristic language ID: stopword hit-rate per candidate language over
    lowercased whitespace tokens; falls back to script detection for CJK.
    Stopword sets are compiled once per actor (stateful stage)."""

    def __init__(self):
        self.sets = {lang: frozenset(ws) for lang, ws in _STOPWORDS.items()}
        self.word_re = re.compile(r"[\w']+", re.UNICODE)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd

        texts = batch["text"].to_pandas()
        toks = texts.str.lower().str.findall(self.word_re)
        langs = []
        for ts in toks:
            if not isinstance(ts, list) or not ts:
                langs.append("und")
                continue
            # CJK script shortcut
            sample = "".join(ts[:20])
            if any("一" <= ch <= "鿿" for ch in sample):
                langs.append("zh")
                continue
            if any("぀" <= ch <= "ヿ" for ch in sample):
                langs.append("ja")
                continue
            best, best_hits = "und", 0
            tset = ts[:200]
            for lang, sw in self.sets.items():
                hits = sum(1 for w in tset if w in sw)
                if hits > best_hits:
                    best, best_hits = lang, hits
            langs.append(best)
        return batch.append_column("pred_lang", pa.array(langs, type=pa.string()))


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
