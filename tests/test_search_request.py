"""_search request replay: every query type must dispatch to its
operator and return identical results; pagination, filtered
re-ranking, and highlight composition verified by hand."""

import pytest
from pyspark.sql import functions as F

from elasticsearch_approx_plugin_spark.functions.tokenize import tokenize_ws
from elasticsearch_approx_plugin_spark.operators.bm25 import (
    bool_should_topk,
    score_queries,
)
from elasticsearch_approx_plugin_spark.operators.postings import build_index
from elasticsearch_approx_plugin_spark.plans.search import search_topk


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "table scan beats hash join"),
        (1, "the tablet is not a table"),
        (2, "slow row window flow"),
        (3, "table join table join"),
        (4, "hash hash hash"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def tokens(docs):
    return docs.select("doc_id", tokenize_ws("text").alias("tokens"))


@pytest.fixture(scope="module")
def index(tokens):
    return build_index(tokens, range_bits=2)


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_match_or_equals_score_queries(index):
    got = _rows(search_topk(index, {"query": {"match": {"text": "table join"}}}))
    want = _rows(
        score_queries(index, [(0, ["table", "join"])], 10).drop("query_id")
    )
    assert got == want and got


def test_match_and_and_msm(index):
    got = _rows(
        search_topk(
            index,
            {"query": {"match": {"text": {"query": "table join", "operator": "and"}}}},
        )
    )
    want = _rows(
        bool_should_topk(index, [(0, ["table", "join"], 2)], 10).drop("query_id")
    )
    assert got == want and got
    # msm spelled explicitly gives the same
    got2 = _rows(
        search_topk(
            index,
            {"query": {"match": {"text": {"query": "table join",
                                           "minimum_should_match": 2}}}},
        )
    )
    assert got2 == want


def test_expansion_types_dispatch(index, tokens):
    for clause in (
        {"prefix": {"text": "ta"}},
        {"fuzzy": {"text": "tabel"}},
        {"wildcard": {"text": "ta*"}},
        {"regexp": {"text": "ta.le"}},
        {"match_phrase": {"text": "table join"}},
    ):
        out = search_topk(index, {"query": clause}, tokens=tokens)
        assert out.columns == ["doc_id", "score", "rank"]
        assert out.count() > 0, clause


def test_terms_query(index):
    # terms = bool-OR of the listed terms; minimum_match maps to msm
    got = _rows(search_topk(index, {"query": {"terms": {"text": ["table", "join"]}}}))
    want = _rows(score_queries(index, [(0, ["table", "join"])], 10).drop("query_id"))
    assert got == want and got
    gated = _rows(
        search_topk(
            index,
            {"query": {"terms": {"text": ["table", "join"], "minimum_match": 2}}},
        )
    )
    want2 = _rows(bool_should_topk(index, [(0, ["table", "join"], 2)], 10).drop("query_id"))
    assert gated == want2
    with pytest.raises(ValueError):
        search_topk(index, {"query": {"terms": {"text": []}}})


def test_pagination(index):
    full = _rows(search_topk(index, {"query": {"match": {"text": "table join"}}}))
    page = _rows(
        search_topk(
            index, {"query": {"match": {"text": "table join"}}, "from": 1, "size": 2}
        )
    )
    ranks = sorted(r[2] for r in page)
    assert ranks == [2, 3]
    assert set(page) <= set(full)


def test_filtered_reranks_after_filter(index, docs):
    out = _rows(
        search_topk(
            index,
            {
                "query": {
                    "filtered": {
                        "query": {"match": {"text": "table join"}},
                        "filter": {"range": {"doc_id": {"gte": 2}}},
                    }
                }
            },
            docs=docs,
        )
    )
    assert [r[0] for r in sorted(out, key=lambda r: r[2])] == [3]
    assert out[0][2] == 1  # re-ranked from 1 after the filter


def test_query_string_dispatch(index, tokens):
    from elasticsearch_approx_plugin_spark.operators.query_string import (
        query_string_topk,
    )

    req = {"query": {"query_string": {"query": '+hash -"table scan"'}}}
    got = _rows(search_topk(index, req, tokens=tokens))
    want = _rows(
        query_string_topk(index, tokens, '+hash -"table scan"', 10).drop("query_id")
    )
    assert got == want and got


def test_constant_score(index, docs):
    out = _rows(
        search_topk(
            index,
            {
                "query": {
                    "constant_score": {
                        "filter": {"range": {"doc_id": {"gte": 2}}},
                        "boost": 1.5,
                    }
                },
                "size": 2,
            },
            docs=docs,
        )
    )
    # every match scores the boost; ranks tie-break by doc_id; size caps
    assert out == [(2, 1.5, 1), (3, 1.5, 2)]
    with pytest.raises(ValueError):
        search_topk(index, {"query": {"constant_score": {"boost": 2.0}}}, docs=docs)


def test_highlight_rides_hits(index, docs):
    out = {
        r["doc_id"]: r["snippet"]
        for r in search_topk(
            index,
            {
                "query": {"match": {"text": "table join"}},
                "highlight": {"fragment_size": 60},
            },
            docs=docs,
        ).collect()
    }
    assert out[0] == "<em>table</em> scan beats hash <em>join</em>"
    assert out[3] == "<em>table</em> <em>join</em> <em>table</em> <em>join</em>"


def test_strictness(index, docs):
    with pytest.raises(ValueError):
        search_topk(index, {"query": {"match": {"text": "x"}}, "explain": True})
    with pytest.raises(ValueError):
        search_topk(index, {"query": {"span_near": {"clauses": []}}})
    with pytest.raises(ValueError):
        search_topk(index, {"size": 10})  # no query
    with pytest.raises(ValueError):
        search_topk(index, {"query": {"match_phrase": {"text": "a b"}}})  # no tokens
    with pytest.raises(ValueError):
        search_topk(
            index,
            {"query": {"prefix": {"text": "ta"}}, "highlight": {}},
            docs=docs,
        )  # highlight needs literal terms
