"""Golden tests for the URL canonicalization / domain kernels
(functions/web.py) — crawl-dedup folklore cases."""

import pyarrow as pa

from debezium_incubator_ray.functions.web import (
    UrlCanonicalizer,
    canonicalize_urls,
    registered_domain,
)


def test_canonicalize_golden():
    cases = {
        "https://www.Example.COM/Path/": "example.com/Path",
        "HTTP://News.Site.org/a#frag": "news.site.org/a",
        "http://example.com/p?utm_source=x&q=1": "example.com/p?q=1",
        "http://example.com/p?q=1&utm_campaign=y": "example.com/p?q=1",
        "http://example.com/p?utm_medium=z": "example.com/p",
        "example.com//": "example.com",          # scheme-less input
        "https://example.com": "example.com",
        # chained tracking params (the real-crawl norm) all drop
        "http://a.com/p?utm_source=x&utm_medium=y&q=1": "a.com/p?q=1",
        "http://a.com/p?utm_a=1&utm_b=2": "a.com/p",
        "http://a.com/p?utm_a=1&q=1&utm_b=2": "a.com/p?q=1",
        # malformed URL with an embedded newline still canonicalizes
        "http://A.com/p\nx": "a.com/p\nx",
        "http://wwwx.example.com/": "wwwx.example.com",  # only exact www.
        "https://example.com/CaseKept/Q?x=1": "example.com/CaseKept/Q?x=1",
    }
    got = canonicalize_urls(pa.array(list(cases))).to_pylist()
    assert got == list(cases.values())


def test_registered_domain():
    canon = pa.array(
        [
            "news.site.org/a",
            "a.b.c.example.com/x?q=1",
            "example.com",
            "localhost/admin",
        ]
    )
    assert registered_domain(canon).to_pylist() == [
        "site.org",
        "example.com",
        "example.com",
        "localhost",  # single-label fallback
    ]


def test_stage_adds_columns():
    t = pa.table({"url": ["https://www.A.com/x/", "http://b.org/y#z"]})
    out = UrlCanonicalizer()(t)
    assert out["url_canon"].to_pylist() == ["a.com/x", "b.org/y"]
    assert out["domain"].to_pylist() == ["a.com", "b.org"]


def test_redact_pii_golden():
    from debezium_incubator_ray.functions.web import redact_pii

    cases = {
        "mail bob.smith+x@corp.example.co.uk now": "mail <EMAIL> now",
        "server 10.0.121.7 down": "server <IP> down",
        "call +1 (415) 555-0133 today": "call <PHONE> today",
        "card 4111 1111 1111 1111 exp": "card <CARD> exp",
        "card 4111-1111-1111-1111": "card <CARD>",
        "clean text stays clean": "clean text stays clean",
        None: "",
    }
    got = redact_pii(pa.array(list(cases))).to_pylist()
    assert got == list(cases.values())


def test_dedup_url_best_keeps_best_capture():
    import ray.data
    from debezium_incubator_ray.functions.web import dedup_url_best

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "n_chars": pa.array([10, 50, 50, 7], pa.int64()),
        "url": [
            "http://www.Example.COM/page?utm_source=x",   # same canon...
            "https://example.com/page#frag",               # ...best score
            "HTTPS://example.com/page/",                   # tie -> id 2 wins
            "http://other.com/solo",                       # unique
        ],
    })
    out = dedup_url_best(ray.data.from_arrow(t)).to_pandas()
    assert sorted(out.doc_id) == [2, 4]
