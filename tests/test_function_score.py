"""function_score — decay closed forms, score/boost mode grammar, and
equality against hand-computed combinations of the gated scorer."""

import math

import pytest
from pyspark.sql import functions as F

from elasticsearch_approx_plugin_spark.functions.tokenize import tokenize_ws
from elasticsearch_approx_plugin_spark.operators.bm25 import score_queries
from elasticsearch_approx_plugin_spark.operators.function_score import (
    function_score_topk,
)
from elasticsearch_approx_plugin_spark.operators.postings import build_index


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "fast spark query engine", 10.0),
        (1, "spark engine fast", 100.0),
        (2, "query engine spark fast spark", 150.0),
        (3, "slow table scan fast", None),
        (4, "fast fast fast scan", 200.0),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, size double")


@pytest.fixture(scope="module")
def index(corpus):
    return build_index(
        corpus.select("doc_id", tokenize_ws("text").alias("tokens")), range_bits=9
    )


def _gauss(v, origin, scale, offset=0.0, decay=0.5):
    if v is None:
        return 1.0
    d = max(0.0, abs(v - origin) - offset)
    sigma2 = -(scale * scale) / (2.0 * math.log(decay))
    return math.exp(-(d * d) / (2.0 * sigma2))


def test_gauss_decay_matches_hand_combine(index, corpus):
    queries = [(1, ["fast"])]
    got = {
        r["doc_id"]: r["score"]
        for r in function_score_topk(
            index, corpus, queries,
            [{"gauss": {"field": "size", "origin": 100.0, "scale": 50.0}}],
            k=5,
        ).collect()
    }
    base = {
        r["doc_id"]: r["score"]
        for r in score_queries(index, queries, 5).collect()
    }
    sizes = {r["doc_id"]: r["size"] for r in corpus.collect()}
    for doc, score in got.items():
        want = round(base[doc] * round(_gauss(sizes[doc], 100.0, 50.0), 6), 6)
        assert score == pytest.approx(want, abs=2e-6)
    # decay=0.5 exactly at distance scale: doc 2 (size 150)
    assert round(_gauss(150.0, 100.0, 50.0), 6) == 0.5
    # null field -> no decay: doc 3 keeps its base score
    assert got[3] == pytest.approx(round(base[3] * 1.0, 6))


def test_linear_and_exp_forms(index, corpus):
    queries = [(1, ["fast"])]
    lin = {
        r["doc_id"]: r["score"]
        for r in function_score_topk(
            index, corpus, queries,
            [{"linear": {"field": "size", "origin": 0.0, "scale": 100.0,
                         "decay": 0.5}}],
            k=5, boost_mode="replace",
        ).collect()
    }
    # s = scale/(1-decay) = 200; value 100 -> (200-100)/200 = 0.5
    assert lin[1] == pytest.approx(0.5)
    assert lin[4] == pytest.approx(0.0)  # d=200 -> clamped at 0
    ex = {
        r["doc_id"]: r["score"]
        for r in function_score_topk(
            index, corpus, queries,
            [{"exp": {"field": "size", "origin": 0.0, "scale": 100.0}}],
            k=5, boost_mode="replace",
        ).collect()
    }
    assert ex[1] == pytest.approx(0.5)  # exp(ln(.5)/100 * 100)
    assert ex[4] == pytest.approx(0.25)


def test_score_mode_and_weight(index, corpus):
    queries = [(1, ["fast"])]
    fns = [
        {"gauss": {"field": "size", "origin": 100.0, "scale": 50.0}, "weight": 2.0},
        {"boost_factor": 3.0},
    ]
    out_sum = {
        r["doc_id"]: r["score"]
        for r in function_score_topk(
            index, corpus, queries, fns, k=5,
            score_mode="sum", boost_mode="replace",
        ).collect()
    }
    sizes = {r["doc_id"]: r["size"] for r in corpus.collect()}
    for doc, s in out_sum.items():
        assert s == pytest.approx(
            round(2.0 * _gauss(sizes[doc], 100.0, 50.0) + 3.0, 6), abs=2e-6
        )
    out_max = {
        r["doc_id"]: r["score"]
        for r in function_score_topk(
            index, corpus, queries, fns, k=5,
            score_mode="max", boost_mode="replace",
        ).collect()
    }
    assert all(v == pytest.approx(3.0) for v in out_max.values())


def test_boost_modes(index, corpus):
    queries = [(1, ["fast"])]
    base = {r["doc_id"]: r["score"] for r in score_queries(index, queries, 5).collect()}
    for mode, combine in [
        ("sum", lambda b, f: b + f),
        ("avg", lambda b, f: (b + f) / 2.0),
        ("min", min),
        ("max", max),
    ]:
        got = {
            r["doc_id"]: r["score"]
            for r in function_score_topk(
                index, corpus, queries, [{"boost_factor": 0.1}], k=5,
                boost_mode=mode,
            ).collect()
        }
        for doc, s in got.items():
            assert s == pytest.approx(round(combine(base[doc], 0.1), 6), abs=2e-6)


def test_decay_reranks_beyond_base_topk(index, corpus):
    # k=1: base winner is doc 4 (fast x3) but it is far from origin —
    # decay must be able to dethrone it (re-rank-everything semantics)
    queries = [(1, ["fast"])]
    base_top = score_queries(index, queries, 1).collect()[0]["doc_id"]
    got = function_score_topk(
        index, corpus, queries,
        [{"gauss": {"field": "size", "origin": 10.0, "scale": 20.0}}],
        k=1,
    ).collect()[0]["doc_id"]
    assert base_top == 4 and got == 0


def test_validation(index, corpus):
    q = [(1, ["fast"])]
    with pytest.raises(ValueError):
        function_score_topk(index, corpus, q, [], k=1)
    with pytest.raises(ValueError):
        function_score_topk(index, corpus, q, [{"boost_factor": 1.0}], k=0)
    with pytest.raises(ValueError):
        function_score_topk(index, corpus, q, [{}], k=1)
    with pytest.raises(ValueError):
        function_score_topk(index, corpus, q, [{"gauss": {"field": "size"}}], k=1)
    with pytest.raises(ValueError):
        function_score_topk(
            index, corpus, q,
            [{"gauss": {"field": "size", "origin": 0, "scale": 0}}], k=1,
        )
    with pytest.raises(ValueError):
        function_score_topk(
            index, corpus, q,
            [{"gauss": {"field": "size", "origin": 0, "scale": 1, "bogus": 1}}], k=1,
        )
    with pytest.raises(ValueError):
        function_score_topk(
            index, corpus, q, [{"boost_factor": 1.0}], k=1, boost_mode="bogus"
        )
    with pytest.raises(ValueError):
        function_score_topk(
            index, corpus, q, [{"boost_factor": 1.0}], k=1, score_mode="bogus"
        )
