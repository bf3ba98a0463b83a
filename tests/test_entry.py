"""Driver-contract smoke: entry() runs and the queries/oracle maps align."""

import __ray_entry__ as E


def test_queries_and_oracles_aligned():
    qs = E.queries()
    oracles = E.oracle_sql()
    assert len(qs) >= 30
    # every oracle refers to an existing query
    assert set(oracles) <= set(qs)
    # since round 2 EVERY query has a SQL oracle (no rows-only checks left)
    assert set(qs) == set(oracles)


def test_entry_smoke(ray_session):
    ds = E.entry()
    n = ds.count()
    assert n > 0
    assert set(ds.schema().names) == {"url", "warc_ts", "html", "text", "lang"}
