"""Regexp queries: anchored whole-term match, capped term-order
expansion; the expanded disjunction must score exactly like
score_queries. Rejected-operator validation keeps the accepted syntax
inside the Lucene/Java/RE2 common core."""

import pytest

from elasticsearch_approx_plugin_spark.functions.tokenize import tokenize_ws
from elasticsearch_approx_plugin_spark.operators.bm25 import score_queries
from elasticsearch_approx_plugin_spark.operators.postings import build_index
from elasticsearch_approx_plugin_spark.operators.regexp import (
    literal_prefix,
    regexp_expand,
    regexp_topk,
    to_anchored,
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


def test_anchoring_and_validation():
    assert to_anchored("ta.le") == "^(?:ta.le)$"
    assert to_anchored("a\\*b") == "^(?:a\\*b)$"  # escaped meta is fine
    for bad in ("a~b", "<1-9>", "a&b", "@", "^a", "a$", "a\\"):
        with pytest.raises(ValueError):
            to_anchored(bad)


def test_literal_prefix():
    assert literal_prefix("ta.le") == "ta"
    assert literal_prefix("table") == "table"
    assert literal_prefix(".*ow") == ""
    assert literal_prefix("st(a|i)ck") == "st"
    assert literal_prefix("tab?le") == "ta"  # trailing-optional drop
    assert literal_prefix("tab*") == "ta"
    assert literal_prefix("tab{0,2}x") == "ta"
    assert literal_prefix("\\.ab") == ".ab"  # escaped meta is literal


def test_expand_whole_term_and_cap(index):
    got = dict(
        regexp_expand(index, [(0, "st.ck"), (1, "tab.*"), (2, "abl")])
    )
    assert got[0] == ["stack", "stick", "stuck"]
    assert got[1] == ["table", "tables", "tablet"]
    assert got[2] == []  # anchored: 'abl' does NOT substring-match 'table'
    [(_, capped)] = regexp_expand(index, [(0, "st.ck")], max_expansions=2)
    assert capped == ["stack", "stick"]  # term-order cap binds
    # alternation + class + leading-meta full scan
    got = dict(regexp_expand(index, [(0, "s(can|low)"), (1, ".*ow")]))
    assert got[0] == ["scan", "slow"]
    assert got[1] == ["flow", "row", "slow", "window"]


def test_topk_equals_bool_or_and_empty(index):
    expanded = [x for x in regexp_expand(index, [(0, "tab.*")]) if x[1]]
    want = sorted(map(tuple, score_queries(index, expanded, 10).collect()))
    got = sorted(map(tuple, regexp_topk(index, [(0, "tab.*")], 10).collect()))
    assert got == want and got
    empty = regexp_topk(index, [(0, "zz+x")], 10)
    assert empty.count() == 0
    assert empty.columns == ["query_id", "doc_id", "score", "rank"]


def test_validation(index):
    with pytest.raises(ValueError):
        regexp_expand(index, [(0, "")])
    with pytest.raises(ValueError):
        regexp_expand(index, [(0, "a*")], max_expansions=0)
    with pytest.raises(ValueError):
        regexp_expand(index, [(0, "a~b")])  # rejected before any job
