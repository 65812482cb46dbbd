"""common terms query — df-based term partition, match-set discipline
(high group never expands matches), degraded all-high fallback."""

import pytest
from pyspark.sql import functions as F

from elasticsearch_approx_plugin_spark.functions.tokenize import tokenize_ws
from elasticsearch_approx_plugin_spark.operators.bm25 import (
    bool_should_topk,
    score_queries,
)
from elasticsearch_approx_plugin_spark.operators.common_terms import (
    common_terms_topk,
)
from elasticsearch_approx_plugin_spark.operators.postings import build_index


@pytest.fixture(scope="module")
def index(spark):
    rows = [
        (0, "the fast query engine the"),
        (1, "the fast table"),
        (2, "the slow query"),
        (3, "the the the scan"),
        (4, "the engine"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id", tokenize_ws("text").alias("tokens")
    )
    return build_index(df, range_bits=2)


def _rows(df):
    return {(r["query_id"], r["doc_id"]): r["score"] for r in df.collect()}


def test_high_group_never_expands_matches(index):
    # 'the' is in all 5 docs (df 1.0 > 0.5 cutoff -> high); 'query' is
    # low (df 0.4). Match set must be the 'query' docs only.
    out = _rows(common_terms_topk(index, [(1, ["the", "query"])], k=5,
                                  cutoff_frequency=0.5))
    assert {d for _, d in out} == {0, 2}
    lo = _rows(score_queries(index, [(1, ["query"])], 5))
    hi = _rows(score_queries(index, [(1, ["the"])], 5))
    for (qid, d), s in out.items():
        assert s == pytest.approx(round(lo[(1, d)] + hi[(1, d)], 6), abs=2e-6)


def test_all_high_degrades_to_plain_or(index):
    out = _rows(common_terms_topk(index, [(2, ["the", "fast"])], k=5,
                                  cutoff_frequency=0.3))
    want = _rows(score_queries(index, [(2, ["the", "fast"])], 5))
    assert out == want
    assert len({d for _, d in out}) == 5  # 'the' matches everything


def test_low_and_operator(index):
    # low group {'fast', 'query'} with and: only doc 0 has both
    out = _rows(common_terms_topk(index, [(3, ["fast", "query", "the"])], k=5,
                                  cutoff_frequency=0.5, low_freq_operator="and"))
    assert {d for _, d in out} == {0}
    m = _rows(bool_should_topk(index, [(3, ["fast", "query"], 2)], 5))
    hi = _rows(score_queries(index, [(3, ["the"])], 5))
    assert out[(3, 0)] == pytest.approx(round(m[(3, 0)] + hi[(3, 0)], 6), abs=2e-6)


def test_absolute_cutoff(index):
    # cutoff 3 (absolute df): 'the' (df 5) high, 'fast' (df 2) low
    out = _rows(common_terms_topk(index, [(4, ["the", "fast"])], k=5,
                                  cutoff_frequency=3))
    assert {d for _, d in out} == {0, 1}  # fast docs only


def test_mixed_queries_one_call(index):
    # one low+high query and one degraded all-high query in one batch
    out = common_terms_topk(
        index, [(1, ["the", "query"]), (2, ["the"])], k=5, cutoff_frequency=0.5
    )
    by_q = {}
    for r in out.collect():
        by_q.setdefault(r["query_id"], set()).add(r["doc_id"])
    assert by_q[1] == {0, 2} and by_q[2] == {0, 1, 2, 3, 4}


def test_validation(index):
    with pytest.raises(ValueError):
        common_terms_topk(index, [(1, ["x"])], k=0)
    with pytest.raises(ValueError):
        common_terms_topk(index, [(1, ["x"])], cutoff_frequency=0)
    with pytest.raises(ValueError):
        common_terms_topk(index, [(1, ["x"])], low_freq_operator="xor")
    with pytest.raises(ValueError):
        common_terms_topk(index, [])
    with pytest.raises(ValueError):
        common_terms_topk(index, [(1, ["x"])], minimum_should_match=0)


def test_search_dispatch_common(index):
    from elasticsearch_approx_plugin_spark.plans.search import search_topk

    got = sorted(
        map(tuple, search_topk(
            index,
            {"query": {"common": {"text": {
                "query": "the query", "cutoff_frequency": 0.5}}}},
        ).collect())
    )
    want = sorted(
        map(tuple, common_terms_topk(
            index, [(0, ["the", "query"])], 10, cutoff_frequency=0.5
        ).drop("query_id").collect())
    )
    assert got == want and got
    with pytest.raises(ValueError):
        search_topk(index, {"query": {"common": {"text": "plain string"}}})
    with pytest.raises(ValueError):
        search_topk(index, {"query": {"common": {"text": {
            "query": "x", "bogus": 1}}}})


def test_scale_path_equals_postings_path(index, spark):
    # the row-local fold over candidate token arrays must reproduce the
    # postings path bit-for-bit (6-dp), across regimes
    rows = [
        (0, "the fast query engine the"),
        (1, "the fast table"),
        (2, "the slow query"),
        (3, "the the the scan"),
        (4, "the engine"),
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id", tokenize_ws("text").alias("tokens")
    )
    for queries, kw in [
        ([(1, ["the", "query"])], dict(cutoff_frequency=0.5)),
        ([(3, ["fast", "query", "the"])],
         dict(cutoff_frequency=0.5, low_freq_operator="and")),
        ([(1, ["the", "query"]), (2, ["the"])], dict(cutoff_frequency=0.5)),
    ]:
        a = _rows(common_terms_topk(index, queries, k=5, **kw))
        b = _rows(common_terms_topk(index, queries, k=5, corpus=corpus, **kw))
        assert a == b, (queries, kw)
