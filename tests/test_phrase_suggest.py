"""Phrase suggester — LM-ranked whole-phrase corrections."""

import math

import pytest
from pyspark.sql import functions as F

from elasticsearch_approx_plugin_spark.functions.tokenize import tokenize_ws
from elasticsearch_approx_plugin_spark.operators.phrase_suggest import phrase_suggest
from elasticsearch_approx_plugin_spark.operators.postings import build_index


@pytest.fixture(scope="module")
def corpus(spark):
    # 'table scan' is a frequent transition; 'cable scan' never occurs
    rows = [
        (0, "table scan runs fast"),
        (1, "table scan beats cable"),
        (2, "the table scan again"),
        (3, "cable tv"),
        (4, "table scan"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id", tokenize_ws("text").alias("tokens")
    )


@pytest.fixture(scope="module")
def index(corpus):
    return build_index(corpus, range_bits=2)


def _lm_score(corpus_rows, chain, alpha=0.1):
    from collections import Counter

    bg = Counter()
    vocab = set()
    for toks in corpus_rows:
        vocab.update(toks)
        for a, b in zip(toks, toks[1:]):
            bg[(a, b)] += 1
    head = Counter()
    for (a, _), c in bg.items():
        head[a] += c
    v = len(vocab)
    s = 0.0
    for a, b in zip(chain, chain[1:]):
        s += math.log((bg[(a, b)] + alpha) / (head[a] + alpha * v))
    return round(s, 6)


def test_corrects_to_frequent_transition(index, corpus, spark):
    out = phrase_suggest(index, corpus, "tabel scna", size=3)
    rows = out.collect()
    assert rows and rows[0]["suggestion"] == "table scan"
    corpus_rows = [r["tokens"] for r in corpus.collect()]
    assert rows[0]["score"] == pytest.approx(
        _lm_score(corpus_rows, ["table", "scan"]), abs=2e-6
    )
    # ranked: every later option scores <= the winner
    assert all(r["score"] <= rows[0]["score"] for r in rows)


def test_real_word_error(index, corpus):
    # 'cable scan' — both words in-vocabulary, but the transition never
    # occurs; the suggester must propose 'table scan' above it
    # prefix_length=0: the correction changes the first letter
    rows = phrase_suggest(index, corpus, "cable scan", size=3,
                          prefix_length=0).collect()
    assert rows[0]["suggestion"] == "table scan"
    # the identity chain is excluded
    assert all(r["suggestion"] != "cable scan" for r in rows)


def test_single_candidate_no_chains(index, corpus, spark):
    # candidates_per_token=1 keeps only the identity chain -> excluded
    out = phrase_suggest(index, corpus, "table scan", candidates_per_token=1)
    assert out.count() == 0


def test_validation(index, corpus):
    with pytest.raises(ValueError):
        phrase_suggest(index, corpus, "one")
    with pytest.raises(ValueError):
        phrase_suggest(index, corpus, "a b", size=0)
    with pytest.raises(ValueError):
        phrase_suggest(index, corpus, "a b", candidates_per_token=0)
    with pytest.raises(ValueError):
        phrase_suggest(index, corpus, "a b", alpha=0)
    with pytest.raises(ValueError):
        phrase_suggest(index, corpus, "a b c d e f g", candidates_per_token=4)


def test_suggest_block_phrase_route(index, corpus):
    from elasticsearch_approx_plugin_spark.plans.search import suggest_block

    req = {
        "suggest": {
            "fix": {"text": "tabel scna", "phrase": {"size": 2}},
        }
    }
    rows = suggest_block(index, req, tokens=corpus).collect()
    direct = phrase_suggest(index, corpus, "tabel scna", size=2).collect()
    assert [(r["suggestion"], r["score"], r["rank"]) for r in rows] == [
        (r["suggestion"], r["score"], r["rank"]) for r in direct
    ]
    assert all(r["name"] == "fix" and r["input"] == "tabel scna"
               and r["freq"] is None for r in rows)
    with pytest.raises(ValueError):  # needs tokens
        suggest_block(index, req)
    with pytest.raises(ValueError):  # term XOR phrase
        suggest_block(
            index,
            {"suggest": {"s": {"text": "x y", "term": {}, "phrase": {}}}},
            tokens=corpus,
        )
    with pytest.raises(ValueError):  # unknown phrase option
        suggest_block(
            index,
            {"suggest": {"s": {"text": "x y", "phrase": {"bogus": 1}}}},
            tokens=corpus,
        )
