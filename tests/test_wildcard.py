"""Wildcard queries: LIKE-translated capped term-order expansion; the
expanded disjunction must score exactly like score_queries."""

import pytest

from elasticsearch_approx_plugin_spark.functions.tokenize import tokenize_ws
from elasticsearch_approx_plugin_spark.operators.bm25 import score_queries
from elasticsearch_approx_plugin_spark.operators.postings import build_index
from elasticsearch_approx_plugin_spark.operators.wildcard import (
    literal_prefix,
    to_like,
    wildcard_expand,
    wildcard_topk,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "table scan beats hash join"),
        (1, "tables and tablet on a table"),
        (2, "slow row window flow"),
        (3, "stack stick stuck"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return df.select("doc_id", tokenize_ws("text").alias("tokens"))


@pytest.fixture(scope="module")
def index(corpus):
    return build_index(corpus, range_bits=2)


def test_pattern_translation():
    assert to_like("ta*e?") == "ta%e_"
    assert to_like("a%b_c\\d") == "a\\%b\\_c\\\\d"
    assert literal_prefix("ta*le") == "ta"
    assert literal_prefix("?able") == ""
    assert literal_prefix("plain") == "plain"


def test_expand_star_question_and_cap(index):
    got = dict(wildcard_expand(index, [(0, "st?ck"), (1, "ta*"), (2, "*ow")]))
    assert got[0] == ["stack", "stick", "stuck"]
    assert got[1] == ["table", "tables", "tablet"]
    assert got[2] == ["flow", "row", "slow", "window"]  # leading wildcard
    [(_, capped)] = wildcard_expand(index, [(0, "st?ck")], max_expansions=2)
    assert capped == ["stack", "stick"]  # term-order cap binds


def test_topk_equals_bool_or_and_empty(index):
    expanded = [x for x in wildcard_expand(index, [(0, "ta*")]) if x[1]]
    want = sorted(map(tuple, score_queries(index, expanded, 10).collect()))
    got = sorted(map(tuple, wildcard_topk(index, [(0, "ta*")], 10).collect()))
    assert got == want and got
    empty = wildcard_topk(index, [(0, "zz*zz")], 10)
    assert empty.count() == 0
    assert empty.columns == ["query_id", "doc_id", "score", "rank"]


def test_validation(index):
    with pytest.raises(ValueError):
        wildcard_expand(index, [(0, "")])
    with pytest.raises(ValueError):
        wildcard_expand(index, [(0, "a*")], max_expansions=0)
