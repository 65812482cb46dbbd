"""query_string: the +/-/phrase grammar parses strictly; matching
composes must/should/must_not over terms and phrase adjacency; scores
equal score_queries over the scoring-term set on the admitted docs."""

import pytest

from elasticsearch_approx_plugin_spark.functions.tokenize import tokenize_ws
from elasticsearch_approx_plugin_spark.operators.bm25 import score_queries
from elasticsearch_approx_plugin_spark.operators.postings import build_index
from elasticsearch_approx_plugin_spark.operators.query_string import (
    parse_query_string,
    query_string_topk,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "table scan beats hash join"),
        (1, "hash join beats table scan"),
        (2, "slow table row window"),
        (3, "hash hash hash"),
        (4, "scan table"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return df.select("doc_id", tokenize_ws("text").alias("tokens"))


@pytest.fixture(scope="module")
def index(corpus):
    return build_index(corpus, range_bits=2)


def test_parser():
    got = parse_query_string('+hash join -dup +"table scan" -"slow row"')
    assert got == [
        ("must", "term", "hash"),
        ("should", "term", "join"),
        ("must_not", "term", "dup"),
        ("must", "phrase", ["table", "scan"]),
        ("must_not", "phrase", ["slow", "row"]),
    ]
    for bad in ("", "   ", "-only", "a AND b", "field:x", "wild*", "fuzzy~2",
                'boost^2', '""'):
        with pytest.raises(ValueError):
            parse_query_string(bad)


def _ids(df):
    return sorted(r["doc_id"] for r in df.collect())


def test_must_should_not(index, corpus):
    # must hash, should join, not slow: docs 0,1,3 have hash; none slow
    assert _ids(query_string_topk(index, corpus, "+hash join -slow")) == [0, 1, 3]
    # must_not knocks out doc 3 ('hash hash hash' has no 'join')
    assert _ids(query_string_topk(index, corpus, "+hash -table")) == [3]
    # pure should = OR
    assert _ids(query_string_topk(index, corpus, "slow join")) == [0, 1, 2]


def test_phrase_clauses_gate_candidacy(index, corpus):
    # "table scan" adjacency: docs 0 and 1 (doc 4 is "scan table" —
    # reversed order must NOT match)
    got = _ids(query_string_topk(index, corpus, '+"table scan"'))
    assert got == [0, 1]
    # must_not PHRASE: scan-containing docs minus the phrase-matched
    assert _ids(query_string_topk(index, corpus, '+scan -"table scan"')) == [4]
    # should phrase in a pure-should query requires >=1 clause match
    got = _ids(query_string_topk(index, corpus, '"table scan" slow'))
    assert got == [0, 1, 2]  # phrase-matched OR slow; doc 4 excluded


def test_default_operator_and(index, corpus):
    # AND promotes shoulds to musts
    assert _ids(
        query_string_topk(index, corpus, "hash join", default_operator="and")
    ) == [0, 1]


def test_scores_equal_score_queries_on_admitted(index, corpus):
    out = query_string_topk(index, corpus, "+hash join -slow")
    want = {
        r["doc_id"]: r["score"]
        for r in score_queries(index, [(0, ["hash", "join"])], 10).collect()
    }
    for r in out.collect():
        assert r["score"] == want[r["doc_id"]]


def test_validation(index, corpus):
    with pytest.raises(ValueError):
        query_string_topk(index, corpus, "+hash", default_operator="xor")
    with pytest.raises(ValueError):
        query_string_topk(index, corpus, "-hash")  # nothing positive
