"""Fuzzy queries: capped Levenshtein dictionary expansion in
deterministic (distance, term) order; the expanded disjunction must
score exactly like ``score_queries`` on the expanded term list."""

import pytest

from elasticsearch_approx_plugin_spark.functions.tokenize import tokenize_ws
from elasticsearch_approx_plugin_spark.operators.bm25 import score_queries
from elasticsearch_approx_plugin_spark.operators.fuzzy import fuzzy_expand, fuzzy_topk
from elasticsearch_approx_plugin_spark.operators.postings import build_index


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "table scan beats hash join here"),
        (1, "tables and tablet stacked on a table"),
        (2, "hash hash hash collision"),
        (3, "fable about a stable label"),
        (4, "cash flow statement"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return df.select("doc_id", tokenize_ws("text").alias("tokens"))


@pytest.fixture(scope="module")
def index(corpus):
    return build_index(corpus, range_bits=2)


def test_expand_order_and_cap(index):
    # distance to 'table': table 0; fable/stable/tables/tablet 1 — cap 3
    # keeps the exact match first, then distance-1 ties in term order
    [(qid, terms)] = fuzzy_expand(index, [(7, "table")], fuzziness=2, max_expansions=3)
    assert qid == 7
    assert terms == ["table", "fable", "stable"]
    [(_, all_terms)] = fuzzy_expand(index, [(7, "table")], fuzziness=2)
    assert all_terms == ["table", "fable", "stable", "tables", "tablet"]


def test_expand_prefix_length_and_zero_match(index):
    [(_, terms)] = fuzzy_expand(index, [(0, "table")], fuzziness=2, prefix_length=2)
    assert terms == ["table", "tables", "tablet"]  # fable/label/stable pruned
    [(_, none)] = fuzzy_expand(index, [(0, "zzzzzz")], fuzziness=2)
    assert none == []


def test_expand_fuzziness_zero_is_exact(index):
    got = dict(fuzzy_expand(index, [(0, "hash"), (1, "hsah")], fuzziness=0))
    assert got == {0: ["hash"], 1: []}


def test_topk_equals_bool_or_of_expansion(index):
    expanded = [
        (qid, ts) for qid, ts in fuzzy_expand(index, [(0, "tabel")], fuzziness=2) if ts
    ]
    want = sorted(map(tuple, score_queries(index, expanded, 10).collect()))
    got = sorted(map(tuple, fuzzy_topk(index, [(0, "tabel")], 10, fuzziness=2).collect()))
    assert got == want and len(got) > 0


def test_topk_zero_match_and_validation(index):
    empty = fuzzy_topk(index, [(0, "qqqqqqq")], 10, fuzziness=1)
    assert empty.count() == 0
    assert empty.columns == ["query_id", "doc_id", "score", "rank"]
    with pytest.raises(ValueError):
        fuzzy_expand(index, [(0, "")])
    with pytest.raises(ValueError):
        fuzzy_expand(index, [(0, "x")], fuzziness=3)
    with pytest.raises(ValueError):
        fuzzy_expand(index, [(0, "x")], max_expansions=0)
    with pytest.raises(ValueError):
        fuzzy_expand(index, [(0, "x")], prefix_length=-1)


def test_multi_query_one_scan_shared_terms(index):
    got = dict(
        fuzzy_expand(index, [(0, "hash"), (1, "cash")], fuzziness=1)
    )
    assert got[0] == ["hash", "cash"] and got[1] == ["cash", "hash"]
