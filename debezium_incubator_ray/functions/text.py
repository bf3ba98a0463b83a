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
    """64-bit document fingerprint via polynomial rolling hash over utf-8
    bytes (deterministic, order-sensitive — content-identity key for exact
    dedup at scale). Vectorized with numpy per batch."""

    B = np.uint64(1000003)
    MOD_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch["text"].combine_chunks()
        arr = col.cast(pa.large_binary())
        buf = np.frombuffer(arr.buffers()[2], dtype=np.uint8) if arr.buffers()[2] else np.empty(0, np.uint8)
        offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)
        out = np.zeros(len(arr), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for i in range(len(arr)):
                h = np.uint64(1469598103934665603)
                for b in buf[offs[i] : offs[i + 1]]:
                    h = (h * self.B + np.uint64(b)) & self.MOD_MASK
                out[i] = h
        return batch.append_column("fingerprint", pa.array(out.astype(np.int64).tolist(), type=pa.int64()))
