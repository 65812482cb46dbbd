"""More-like-this: tf·idf interesting-term selection (thresholds +
cap + deterministic tie-break), then plain bool-OR BM25 — the result
must equal score_queries on the selected terms."""

import pytest

from elasticsearch_approx_plugin_spark.functions.tokenize import tokenize_ws
from elasticsearch_approx_plugin_spark.operators.bm25 import score_queries
from elasticsearch_approx_plugin_spark.operators.mlt import mlt_select, mlt_topk
from elasticsearch_approx_plugin_spark.operators.postings import build_index


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "table scan beats hash join"),
        (1, "table table hash merge"),
        (2, "slow row window flow"),
        (3, "rare rare gem"),
        (4, "table hash row window"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return df.select("doc_id", tokenize_ws("text").alias("tokens"))


@pytest.fixture(scope="module")
def index(corpus):
    return build_index(corpus, range_bits=2)


def test_min_term_freq_filters_singletons(index):
    # 'table' appears twice in the liked text, 'hash' once
    [(_, terms)] = mlt_select(
        index, [(0, "table table hash")], min_term_freq=2, min_doc_freq=1
    )
    assert terms == ["table"]


def test_min_doc_freq_filters_rare_terms(index):
    # 'rare' (df=1) fails min_doc_freq=2; 'table' (df=3) survives
    [(_, terms)] = mlt_select(
        index, [(0, "rare rare table table")], min_term_freq=2, min_doc_freq=2
    )
    assert terms == ["table"]


def test_cap_selects_highest_tf_idf(index):
    # qtf all 2 -> idf decides; df: rare=1 < row=2 < table=3 = hash=3;
    # table vs hash tie broken by term order -> hash first
    [(_, terms)] = mlt_select(
        index,
        [(0, "rare rare row row table table hash hash")],
        max_query_terms=2,
        min_term_freq=2,
        min_doc_freq=1,
    )
    assert terms == ["rare", "row"]
    [(_, terms)] = mlt_select(
        index,
        [(0, "table table hash hash")],
        max_query_terms=1,
        min_term_freq=2,
        min_doc_freq=1,
    )
    assert terms == ["hash"]  # equal tf·idf -> term-order tie-break


def test_unknown_terms_drop_out(index):
    [(_, terms)] = mlt_select(
        index, [(0, "zzz zzz table table")], min_term_freq=2, min_doc_freq=1
    )
    assert terms == ["table"]


def test_topk_equals_bool_or_and_empty(index):
    queries = [(0, "table table hash hash row row")]
    selected = [
        x for x in mlt_select(index, queries, min_term_freq=2, min_doc_freq=1)
        if x[1]
    ]
    want = sorted(map(tuple, score_queries(index, selected, 10).collect()))
    got = sorted(
        map(
            tuple,
            mlt_topk(index, queries, 10, min_term_freq=2, min_doc_freq=1).collect(),
        )
    )
    assert got == want and got
    empty = mlt_topk(index, [(0, "zzz zzz")], 10, min_doc_freq=1)
    assert empty.count() == 0
    assert empty.columns == ["query_id", "doc_id", "score", "rank"]


def test_es_defaults_and_validation(index):
    # defaults: min_term_freq=2 silently drops every singleton term
    [(_, terms)] = mlt_select(index, [(0, "table hash row")], min_doc_freq=1)
    assert terms == []
    with pytest.raises(ValueError):
        mlt_select(index, [(0, "")])
    with pytest.raises(ValueError):
        mlt_select(index, [(0, "table")], max_query_terms=0)
    with pytest.raises(ValueError):
        mlt_select(index, [(0, "table")], min_term_freq=0)
