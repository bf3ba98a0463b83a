"""Web/URL operators for Common-Crawl-style page tables.

The north-star payload is web pages keyed by url (BASELINE.json input_hint);
dedup, grouping and politeness all start from a CANONICAL url and its
registered domain. These kernels are pure ``pyarrow.compute`` regex/string
passes (RE2 — the same engine DuckDB's ``regexp_replace`` uses, so the SQL
oracles express the identical transform): zero-copy Arrow in, Arrow out,
no per-row Python. At 100 TB this runs as a plain ``map_batches`` stage —
stateless, embarrassingly parallel, no shuffle.

Canonicalization rules (one common subset of the crawl-dedup folklore):
  1. drop the #fragment;
  2. drop the scheme (http/https/anything RFC-3986-shaped);
  3. lowercase the host, strip one leading "www.";
  4. drop utm_* tracking params (tidying the ?/& separators);
  5. strip trailing slashes.

``registered_domain`` is the last two dot-labels of the canonical host — a
deliberate simplification (no public-suffix list in this environment; a real
deployment swaps in publicsuffix2 data, same vectorized shape).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# applied IN ORDER; each entry is (pattern, replacement). Mirrored verbatim
# by the DuckDB oracle SQL in __ray_entry__.oracle_sql().
_CANON_STEPS = [
    (r"#(?s:.*)$", ""),                  # 1. fragment (incl. any newlines)
    (r"^[A-Za-z][A-Za-z0-9+.-]*://", ""),  # 2. scheme
    # 4. utm_* params. Order matters for chains: the global '&utm' pass
    #    first removes EVERY non-leading utm param in one scan
    #    ('?utm_a=1&utm_b=2&q=1' → '?utm_a=1&q=1'), then the leading form
    #    (?utm=..&rest → ?rest), then the solitary form (?utm=..$ → "")
    (r"&utm_[^&#]*", ""),
    (r"\?utm_[^&#]*&", "?"),
    (r"\?utm_[^&#]*$", ""),
    (r"/+$", ""),                        # 5. trailing slash(es)
]


def canonicalize_urls(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Vectorized URL canonicalization (rules above). ~6 RE2 passes +
    one host-lowercase rebuild over the whole column."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    s = arr
    # fragment + scheme first so the host really is the leading run
    for pat, repl in _CANON_STEPS[:2]:
        s = pc.replace_substring_regex(s, pattern=pat, replacement=repl)
    # 3. lowercase host, strip one leading www. — split at the first /?#.
    # (?s): rest must span newlines too (RE2 '.' excludes \n; a malformed
    # crawl URL with an embedded newline would otherwise null out)
    parts = pc.extract_regex(s, r"^(?P<host>[^/?#]*)(?P<rest>(?s:.*))$")
    host = pc.utf8_lower(pc.struct_field(parts, "host"))
    host = pc.replace_substring_regex(host, pattern=r"^www\.", replacement="")
    s = pc.binary_join_element_wise(host, pc.struct_field(parts, "rest"), "")
    for pat, repl in _CANON_STEPS[2:]:
        s = pc.replace_substring_regex(s, pattern=pat, replacement=repl)
    return s


def registered_domain(canon: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Registered domain of an already-canonical URL: last two dot-labels
    of the host part (see module docstring for the public-suffix caveat)."""
    arr = canon.combine_chunks() if isinstance(canon, pa.ChunkedArray) else canon
    host = pc.struct_field(
        pc.extract_regex(arr, r"^(?P<host>[^/?#]*)"), "host"
    )
    dom = pc.extract_regex(host, r"(?P<dom>[^.]+\.[^.]+)$")
    # hosts with a single label (localhost, bare IP piece) fall back to host
    return pc.coalesce(pc.struct_field(dom, "dom"), host)


class UrlCanonicalizer:
    """map_batches stage: adds url_canon + domain columns to a batch with a
    ``url`` column. Stateless — a plain function would do; the class form
    keeps the signature uniform with the other stages (and leaves room for
    a compiled public-suffix trie in __init__ at deployment)."""

    def __init__(self, url_col: str = "url"):
        self.url_col = url_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        canon = canonicalize_urls(batch[self.url_col])
        batch = batch.append_column("url_canon", canon)
        return batch.append_column("domain", registered_domain(canon))


# ---------------------------------------------------------------------------
# PII redaction

# applied in order; RE2 syntax (pyarrow + DuckDB share the engine, so the
# oracle runs the IDENTICAL passes). Deliberately conservative patterns —
# a production deployment swaps in its compliance-approved set.
PII_PATTERNS = [
    # emails
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # IPv4
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    # international-ish phone numbers (+ and 7-14 digits with separators)
    (r"\+\d[\d ()-]{6,16}\d", "<PHONE>"),
    # 13-19 digit card-like runs (with optional space/dash groups)
    (r"\b\d{4}[ -]?\d{4}[ -]?\d{4}[ -]?\d{1,7}\b", "<CARD>"),
]


def redact_pii(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Replace common PII shapes (emails, IPv4s, phone numbers, card-like
    digit runs) with typed placeholders. Pure RE2 passes over the whole
    column — stateless map_batches stage, no per-row Python."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    s = pc.fill_null(arr, "")
    for pat, repl in PII_PATTERNS:
        s = pc.replace_substring_regex(s, pattern=pat, replacement=repl)
    return s


def dedup_url_best(
    ds,
    url_col: str = "url",
    id_col: str = "doc_id",
    score_col: str = "n_chars",
    buckets: int = 64,
    unique_ids: bool = False,
):
    """Crawl URL-dedup: keep ONE row per canonical URL — the highest-score
    capture (ties to the lowest id). The CommonCrawl composition: the same
    page fetched under scheme/www/utm/fragment variants collapses to its
    best capture.

    Scale shape mirrors exact_dedup: the election shuffles only
    (url_hash128, score, id) — 32 bytes/row, never the page — grouped by a
    hash bucket of the CANONICAL url (two independent 64-bit passes: a
    single 64-bit key false-merges distinct pages at ~10^10 URLs); winner
    ids broadcast via the shared small-side filter."""
    from debezium_incubator_ray.functions.dedup import _broadcast_winner_filter
    from debezium_incubator_ray.hashing import stable_hash

    def narrow(t: pa.Table) -> pa.Table:
        canon = canonicalize_urls(t[url_col])
        h1 = stable_hash(canon, seed=42)
        h2 = stable_hash(canon, seed=1337)
        return pa.table({
            "h1": pa.array(h1.view(np.int64)),
            "h2": pa.array(h2.view(np.int64)),
            "score": pc.cast(t[score_col].combine_chunks(), pa.int64()),
            id_col: pc.cast(t[id_col].combine_chunks(), pa.int64()),
            "_bucket": pa.array((h1 % np.uint64(buckets)).astype(np.int32)),
        })

    def best_per_url(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t,
            sort_keys=[("h1", "ascending"), ("h2", "ascending"),
                       ("score", "descending"), (id_col, "ascending")],
        )
        s = t.take(idx)
        h1 = s["h1"].combine_chunks().to_numpy()
        h2 = s["h2"].combine_chunks().to_numpy()
        first = np.ones(len(s), dtype=bool)
        first[1:] = (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])
        return s.filter(pa.array(first)).select([id_col])

    winners = (
        ds.map_batches(narrow, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_bucket")
        .map_groups(best_per_url, batch_format="pyarrow")
    )
    return _broadcast_winner_filter(
        ds, winners, id_col, buckets=buckets, unique_ids=unique_ids
    )
