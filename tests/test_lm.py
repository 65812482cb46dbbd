"""In-corpus bigram LM scoring: probabilities recomputed by hand on a
tiny corpus; repeated-transition docs must outscore novel-transition
docs; short docs emit no row."""

import math

import pytest

from elasticsearch_approx_plugin_spark.operators.lm import ngram_lm_score


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "a b a b"),    # transitions: ab, ba, ab
        (1, "a b c"),      # ab, bc
        (2, "c c"),        # cc (unique transition)
        (3, "a"),          # too short: no row
        (4, ""),           # empty: no row
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _expected(alpha=0.1):
    # corpus bigrams: ab×2, ba×1, bc×1, cc×1 ; heads: a→3, b→... wait
    # heads: c(w1): a: ab,ab, a? doc0 = a b a b -> (a,b),(b,a),(a,b);
    # doc1 = (a,b),(b,c); doc2 = (c,c)
    bg = {("a", "b"): 3, ("b", "a"): 1, ("b", "c"): 1, ("c", "c"): 1}
    c1 = {"a": 3, "b": 2, "c": 1}
    v = 3  # distinct unigrams a, b, c
    def p(w1, w2):
        return (bg.get((w1, w2), 0) + alpha) / (c1[w1] + alpha * v)
    return bg, p


def test_scores_match_hand_computation(docs):
    out = {r["doc_id"]: r for r in ngram_lm_score(docs).collect()}
    bg, p = _expected()
    exp0 = (2 * math.log(p("a", "b")) + math.log(p("b", "a"))) / 3
    exp1 = (math.log(p("a", "b")) + math.log(p("b", "c"))) / 2
    exp2 = math.log(p("c", "c"))
    assert out[0]["n_bigrams"] == 3
    assert out[0]["avg_logp"] == pytest.approx(round(exp0, 6), abs=1e-9)
    assert out[1]["avg_logp"] == pytest.approx(round(exp1, 6), abs=1e-9)
    assert out[2]["avg_logp"] == pytest.approx(round(exp2, 6), abs=1e-9)
    assert 3 not in out and 4 not in out  # <2 tokens → no transitions


def test_common_transitions_outscore_novel(docs):
    out = {r["doc_id"]: r["avg_logp"] for r in ngram_lm_score(docs).collect()}
    # doc 0 leans on the corpus's dominant a→b transition; doc 1 spends
    # half its transitions on the minority b→c — the LM must prefer
    # doc 0. (Note doc 2's c→c is NOT low-probability: c is a rare
    # head with a single continuation, so P(c|c) is high — conditional
    # probability, not global frequency, is what the score measures.)
    assert out[0] > out[1]


def test_partitioning_invariance_and_validation(docs):
    a = sorted(map(tuple, ngram_lm_score(docs).collect()))
    b = sorted(map(tuple, ngram_lm_score(docs.repartition(7)).collect()))
    assert a == b and a
    with pytest.raises(ValueError):
        ngram_lm_score(docs, alpha=0.0)
