"""span_near / span_first: Lucene interval semantics verified by hand
on a corpus with known token positions, plus the _search dispatch."""

import pytest
from pyspark.sql import functions as F

from elasticsearch_approx_plugin_spark.functions.tokenize import tokenize_ws
from elasticsearch_approx_plugin_spark.operators.bm25 import score_queries
from elasticsearch_approx_plugin_spark.operators.postings import build_index
from elasticsearch_approx_plugin_spark.operators.span import (
    span_first_match,
    span_near_match,
    span_near_topk,
)
from elasticsearch_approx_plugin_spark.plans.search import search_topk


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        #           1     2     3     4     5      (positions)
        (0, "hash join beats table scan"),
        (1, "join the hash table now"),
        (2, "hash table hash table join"),
        (3, "join done hash"),
        (4, "table scan only"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def tokens(docs):
    return docs.select("doc_id", tokenize_ws("text").alias("tokens"))


@pytest.fixture(scope="module")
def index(tokens):
    return build_index(tokens, range_bits=2)


def _ids(df):
    return sorted(r["doc_id"] for r in df.collect())


def test_span_near_ordered_slop0_is_adjacency(index, tokens):
    # 'hash join' adjacent in order: only doc 0
    got = span_near_match(index, tokens, [(0, ["hash", "join"])], slop=0, in_order=True)
    assert _ids(got) == [0]


def test_span_near_ordered_slop_allows_gaps(index, tokens):
    # doc 1: join@1 .. hash@3 (waste 1); doc 3: join@1 .. hash@3 (waste 1)
    got = span_near_match(index, tokens, [(0, ["join", "hash"])], slop=1, in_order=True)
    assert _ids(got) == [1, 3]
    # slop 0 excludes it
    got = span_near_match(index, tokens, [(0, ["join", "hash"])], slop=0, in_order=True)
    assert _ids(got) == []


def test_span_near_unordered(index, tokens):
    # hash..join within waste 0 in ANY order: doc 0 (1,2); doc 2 has
    # hash@3, join@5 -> waste 1; doc 1 join@1 hash@3 -> waste 1;
    # doc 3 join@1 hash@3 -> waste 1
    got = span_near_match(index, tokens, [(0, ["hash", "join"])], slop=0, in_order=False)
    assert _ids(got) == [0]
    got = span_near_match(index, tokens, [(0, ["hash", "join"])], slop=1, in_order=False)
    assert _ids(got) == [0, 1, 2, 3]


def test_span_near_duplicate_terms_need_multiplicity(index, tokens):
    # two 'hash' clauses: only doc 2 has hash twice (positions 1, 3)
    got = span_near_match(index, tokens, [(0, ["hash", "hash"])], slop=1, in_order=False)
    assert _ids(got) == [2]
    # waste 1 needed (positions 1 and 3); slop=0 excludes
    got = span_near_match(index, tokens, [(0, ["hash", "hash"])], slop=0, in_order=False)
    assert _ids(got) == []
    # ordered duplicates: subsequence hash..hash within window 3
    got = span_near_match(index, tokens, [(0, ["hash", "hash"])], slop=1, in_order=True)
    assert _ids(got) == [2]


def test_span_near_three_clauses(index, tokens):
    # ordered hash,table,join: doc 2 (1,2,5) waste 2 / (3,4,5) waste 0
    got = span_near_match(
        index, tokens, [(0, ["hash", "table", "join"])], slop=0, in_order=True
    )
    assert _ids(got) == [2]
    # unordered same terms, slop 1: doc 0 (hash@1 join@2 table@4, waste
    # 1) and doc 1 (join@1 hash@3 table@4, waste 1) join doc 2
    got = span_near_match(
        index, tokens, [(0, ["hash", "table", "join"])], slop=1, in_order=False
    )
    assert _ids(got) == [0, 1, 2]


def test_span_first(index, tokens):
    # 'hash' among first 1 token: docs 0, 2
    assert _ids(span_first_match(index, tokens, [(0, "hash")], end=1)) == [0, 2]
    # among first 3: docs 0, 1, 2, 3
    assert _ids(span_first_match(index, tokens, [(0, "hash")], end=3)) == [0, 1, 2, 3]


def test_span_near_topk_scores_match_term_scorer(index, tokens):
    got = span_near_topk(
        index, tokens, [(0, ["hash", "join"])], k=10, slop=1, in_order=False
    ).collect()
    assert sorted(r["doc_id"] for r in got) == [0, 1, 2, 3]
    ref = {
        r["doc_id"]: r["score"]
        for r in score_queries(index, [(0, ["hash", "join"])], index.n_docs).collect()
    }
    for r in got:
        assert r["score"] == ref[r["doc_id"]]
    # ranks follow (score desc, doc_id)
    by_rank = sorted(got, key=lambda r: r["rank"])
    assert all(
        (a["score"], -a["doc_id"]) >= (b["score"], -b["doc_id"])
        for a, b in zip(by_rank, by_rank[1:])
    )


def test_span_search_dispatch(index, tokens):
    near = search_topk(
        index,
        {
            "query": {
                "span_near": {
                    "clauses": [
                        {"span_term": {"text": "hash"}},
                        {"span_term": {"text": "join"}},
                    ],
                    "slop": 1,
                    "in_order": True,
                }
            }
        },
        tokens=tokens,
    )
    # ordered hash..join, slop 1: doc 0 (1,2 waste 0); doc 2 (3..5 waste 1)
    assert _ids(near) == [0, 2]
    first = search_topk(
        index,
        {
            "query": {
                "span_first": {"match": {"span_term": {"text": "hash"}}, "end": 1}
            }
        },
        tokens=tokens,
    ).collect()
    assert sorted(r["doc_id"] for r in first) == [0, 2]
    ref = {
        r["doc_id"]: r["score"]
        for r in score_queries(index, [(0, ["hash"])], index.n_docs).collect()
    }
    for r in first:
        assert r["score"] == ref[r["doc_id"]]


def test_span_strictness(index, tokens):
    with pytest.raises(ValueError):
        span_near_match(index, tokens, [(0, ["a"])], slop=-1)
    with pytest.raises(ValueError):
        span_near_match(index, tokens, [(0, [])])
    with pytest.raises(ValueError):
        span_first_match(index, tokens, [(0, "a")], end=0)
    with pytest.raises(ValueError):  # non-span_term clause
        search_topk(
            index,
            {"query": {"span_near": {"clauses": [{"term": {"text": "a"}}]}}},
            tokens=tokens,
        )
    with pytest.raises(ValueError):  # span_near needs tokens
        search_topk(
            index,
            {"query": {"span_near": {"clauses": [{"span_term": {"text": "a"}}]}}},
        )


def _brute_span_near(toks, terms, slop, in_order):
    """Reference implementation of the docstring spec: a choice of one
    DISTINCT position per clause with waste <= slop (strictly
    increasing when ordered) — enumerated exhaustively."""
    from itertools import product

    m = len(terms)
    pos = [[i + 1 for i, t in enumerate(toks) if t == q] for q in terms]
    for combo in product(*pos):
        if len(set(combo)) < m:
            continue
        if in_order and any(b <= a for a, b in zip(combo, combo[1:])):
            continue
        if max(combo) - min(combo) + 1 - m <= slop:
            return True
    return False


def test_span_near_randomized_vs_brute_force(spark):
    """The row-local window witness (unordered multiplicity / ordered
    greedy subsequence) equals the Lucene waste-<=-slop spec on random
    corpora — the equivalence argument in span.py, checked."""
    import random

    rng = random.Random(7)
    vocab = ["a", "b", "c", "d"]
    corpus = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 10))))
        for i in range(40)
    ]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    toks = docs.select("doc_id", tokenize_ws("text").alias("tokens"))
    idx = build_index(toks, range_bits=2)
    tok_lists = {i: t.split() for i, t in corpus}

    for slop, in_order in [(0, False), (1, False), (2, False), (1, True)]:
        queries = [
            (qid, [rng.choice(vocab) for _ in range(rng.randint(2, 3))])
            for qid in range(6)
        ]
        got = {
            (r["query_id"], r["doc_id"])
            for r in span_near_match(
                idx, toks, queries, slop=slop, in_order=in_order
            ).collect()
        }
        want = {
            (qid, doc_id)
            for qid, terms in queries
            for doc_id, tl in tok_lists.items()
            if _brute_span_near(tl, terms, slop, in_order)
        }
        assert got == want, (slop, in_order, got ^ want)
