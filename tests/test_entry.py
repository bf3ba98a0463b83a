"""Driver-contract smoke: entry() runs and the queries/oracle maps align."""

import __ray_entry__ as E


def test_queries_and_oracles_aligned():
    qs = E.queries()
    oracles = E.oracle_sql()
    assert len(qs) >= 25
    # every oracle refers to an existing query
    assert set(oracles) <= set(qs)
    # the non-SQL ops are the expected ones
    rows_only = set(qs) - set(oracles)
    assert rows_only == {
        "dedup_minhash", "dedup_simhash", "dedup_ngram_jaccard",
        "text_lang_id", "text_fingerprint", "ann_lsh_topk",
    }


def test_entry_smoke(ray_session):
    ds = E.entry()
    n = ds.count()
    assert n > 0
    assert set(ds.schema().names) == {"url", "warc_ts", "html", "text", "lang"}
