"""Highlighting: first-whole-word-match-anchored fragments with
whole-word tag wrapping over the BM25 top-k; ranks/scores must be
exactly score_queries'."""

import pytest
from pyspark.sql import functions as F

from elasticsearch_approx_plugin_spark.functions.tokenize import tokenize_ws
from elasticsearch_approx_plugin_spark.operators.bm25 import score_queries
from elasticsearch_approx_plugin_spark.operators.highlight import highlight_topk
from elasticsearch_approx_plugin_spark.operators.postings import build_index


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "table scan beats hash join"),
        (1, "the tablet is not a table"),
        (2, "slow row window flow"),
        (3, "join join join"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def index(docs):
    return build_index(
        docs.select("doc_id", tokenize_ws("text").alias("tokens")), range_bits=2
    )


def _by_doc(df):
    return {(r["query_id"], r["doc_id"]): r for r in df.collect()}


def test_snippet_anchors_and_wraps(index, docs):
    out = _by_doc(highlight_topk(index, docs, [(0, ["table", "join"])], k=10))
    # doc 0: first match is 'table' at the start; both terms wrapped
    assert out[(0, 0)]["snippet"] == "<em>table</em> scan beats hash <em>join</em>"
    # doc 1: 'tablet' must NOT be wrapped (whole-word only); fragment
    # anchors at ' table ' near the end
    assert out[(0, 1)]["snippet"] == "<em>table</em>"
    # doc 3: adjacent repeats wrap left-to-right non-overlapping —
    # ' join join join ' wraps occurrences 1 and 3 (shared spaces)
    assert out[(0, 3)]["snippet"] == "<em>join</em> join <em>join</em>"


def test_frag_size_truncates(index, docs):
    out = _by_doc(
        highlight_topk(index, docs, [(0, ["scan"])], k=10, frag_size=10)
    )
    # padded ' table scan beats... ' anchors at ' scan ' (pos 7);
    # 10 chars = ' scan beat'
    assert out[(0, 0)]["snippet"] == "<em>scan</em> beat"


def test_scores_equal_score_queries_and_tags(index, docs):
    queries = [(0, ["table", "join"]), (1, ["row"])]
    want = sorted(map(tuple, score_queries(index, queries, 10).collect()))
    got = highlight_topk(index, docs, queries, k=10, pre_tag="[", post_tag="]")
    assert sorted((r["query_id"], r["doc_id"], r["score"], r["rank"]) for r in got.collect()) == want
    snips = _by_doc(got)
    # fragment anchors AT the first match — no leading context
    assert snips[(1, 2)]["snippet"] == "[row] window flow"


def test_empty_and_validation(index, docs):
    empty = highlight_topk(index, docs, [(0, ["zzznope"])], k=5)
    assert empty.count() == 0
    assert empty.columns == ["query_id", "doc_id", "score", "rank", "snippet"]
    with pytest.raises(ValueError):
        highlight_topk(index, docs, [(0, [])])
    with pytest.raises(ValueError):
        highlight_topk(index, docs, [(0, ["a"])], frag_size=0)
