"""Query rescorer — window discipline, weighted combine, phrase
gating, and equality against the gated scorer."""

import pytest
from pyspark.sql import functions as F

from elasticsearch_approx_plugin_spark.functions.tokenize import tokenize_ws
from elasticsearch_approx_plugin_spark.operators.bm25 import score_queries
from elasticsearch_approx_plugin_spark.operators.postings import build_index
from elasticsearch_approx_plugin_spark.operators.rescore import rescore_topk


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "fast spark query engine"),
        (1, "spark engine fast"),
        (2, "query engine spark fast spark"),
        (3, "slow table scan"),
        (4, "fast fast fast scan"),
        (5, "engine query"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id", tokenize_ws("text").alias("tokens")
    )
    return df


@pytest.fixture(scope="module")
def index(corpus):
    return build_index(corpus, range_bits=9)


def _collect(df):
    return {(r["query_id"], r["doc_id"]): (r["score"], r["rank"]) for r in df.collect()}


def test_zero_rescore_weight_is_base_ranking(index, corpus):
    queries = [(1, ["fast", "engine"])]
    out = rescore_topk(
        index, corpus, queries, {1: ["spark"]}, k=4, window_size=6,
        rescore_query_weight=0.0,
    )
    base = score_queries(index, queries, 4)
    got = _collect(out)
    want = _collect(base)
    assert got == want


def test_match_rescore_adds_term_score(index, corpus):
    # rescore score for 'spark' must equal the scorer's own BM25 for
    # the single term, so combined = base + 2 * bm25(spark)
    queries = [(1, ["fast", "engine"])]
    out = _collect(
        rescore_topk(
            index, corpus, queries, {1: ["spark"]}, k=6, window_size=6,
            rescore_query_weight=2.0,
        )
    )
    base = {r["doc_id"]: r["score"] for r in score_queries(index, queries, 6).collect()}
    spark_sc = {
        r["doc_id"]: r["score"]
        for r in score_queries(index, [(1, ["spark"])], 6).collect()
    }
    for (qid, doc), (score, _) in out.items():
        assert score == pytest.approx(
            round(base[doc] + 2.0 * spark_sc.get(doc, 0.0), 6), abs=2e-6
        )


def test_phrase_rescore_gates_on_adjacency(index, corpus):
    # phrase "spark engine": docs 1 only ("spark engine fast"); doc 0
    # has both terms but never adjacent → rescore contributes 0 there
    queries = [(1, ["fast", "engine", "spark"])]
    out = _collect(
        rescore_topk(
            index, corpus, queries, {1: ["spark", "engine"]},
            k=6, window_size=6, rescore_type="match_phrase",
            rescore_query_weight=5.0,
        )
    )
    base = {r["doc_id"]: r["score"] for r in score_queries(index, queries, 6).collect()}
    boosted = {d for (q, d), (s, _) in out.items() if s > round(base[d], 6) + 1e-9}
    assert boosted == {1}
    # the boosted doc must outrank everything else at weight 5
    assert out[(1, 1)][1] == 1


def test_window_restricts_rescoring(index, corpus):
    # narrow window: only the top-2 base docs are eligible for
    # promotion; a base hit below the window that the rescore would
    # have promoted never enters (it isn't re-scored at all)
    queries = [(7, ["fast"])]
    base = score_queries(index, queries, 6).collect()
    base_order = [r["doc_id"] for r in sorted(base, key=lambda r: r["rank"])]
    # find a 'query'-containing doc ranked below the top-2 of the base
    promoted = [d for d in base_order[2:] if d in (0, 2, 5)]
    assert promoted, "fixture must have a low-ranked doc containing 'query'"
    full = rescore_topk(
        index, corpus, queries, {7: ["query"]}, k=2, window_size=6,
        rescore_query_weight=50.0,
    )
    narrow = rescore_topk(
        index, corpus, queries, {7: ["query"]}, k=2, window_size=2,
        rescore_query_weight=50.0,
    )
    full_docs = {r["doc_id"] for r in full.collect()}
    narrow_docs = {r["doc_id"] for r in narrow.collect()}
    assert narrow_docs == set(base_order[:2])  # window caps eligibility
    assert promoted[0] in full_docs and promoted[0] not in narrow_docs


def test_unknown_rescore_term_contributes_zero(index, corpus):
    queries = [(1, ["engine"])]
    out = _collect(
        rescore_topk(index, corpus, queries, {1: ["zzz_unknown"]}, k=3, window_size=4)
    )
    want = _collect(score_queries(index, queries, 3))
    assert out == want


def test_validation(index, corpus):
    q = [(1, ["fast"])]
    with pytest.raises(ValueError):
        rescore_topk(index, corpus, q, {1: ["x"]}, k=0)
    with pytest.raises(ValueError):
        rescore_topk(index, corpus, q, {1: ["x"]}, k=5, window_size=3)
    with pytest.raises(ValueError):
        rescore_topk(index, corpus, q, {}, k=1, window_size=2)
    with pytest.raises(ValueError):
        rescore_topk(index, corpus, q, {1: []}, k=1, window_size=2)
    with pytest.raises(ValueError):
        rescore_topk(index, corpus, q, {1: ["x"]}, rescore_type="bogus")
    with pytest.raises(ValueError):
        rescore_topk(index, corpus, [], {1: ["x"]})


def test_partitioning_invariance(index, corpus, spark):
    queries = [(1, ["fast", "engine"]), (2, ["spark"])]
    rescores = {1: ["spark", "engine"], 2: ["fast"]}
    a = _collect(
        rescore_topk(index, corpus, queries, rescores, k=4, window_size=6,
                     rescore_type="match_phrase")
    )
    idx2 = build_index(corpus.repartition(7), range_bits=9)
    b = _collect(
        rescore_topk(idx2, corpus.repartition(3), queries, rescores, k=4,
                     window_size=6, rescore_type="match_phrase")
    )
    assert a == b


def test_rescore_randomized_vs_composed_reference(spark):
    """On random corpora/weights, rescore_topk equals the composition
    of its gated ingredients: score_queries (base + rescore scores) and
    phrase_match (the gate) — the combine identity, checked broadly."""
    import random

    from elasticsearch_approx_plugin_spark.operators.phrase import phrase_match

    rng = random.Random(21)
    vocab = ["red", "blue", "green", "dot"]
    for trial in range(3):
        corpus = spark.createDataFrame(
            [
                (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 9))))
                for i in range(30)
            ],
            "doc_id long, text string",
        ).select("doc_id", tokenize_ws("text").alias("tokens"))
        idx = build_index(corpus, range_bits=9)
        qterms = rng.sample(vocab, 2)
        phrase = [rng.choice(vocab), rng.choice(vocab)]
        window, k = 12, 8
        qw, rqw = round(rng.uniform(0.5, 2.0), 2), round(rng.uniform(0.0, 4.0), 2)
        got = {
            (r["doc_id"],): r["score"]
            for r in rescore_topk(
                idx, corpus, [(0, qterms)], {0: phrase}, k=k, window_size=window,
                query_weight=qw, rescore_query_weight=rqw,
                rescore_type="match_phrase",
            ).collect()
        }
        base = {
            r["doc_id"]: r["score"]
            for r in score_queries(idx, [(0, qterms)], window).collect()
        }
        resc = {
            r["doc_id"]: r["score"]
            for r in score_queries(idx, [(0, sorted(set(phrase)))], 1000).collect()
        }
        matched = {
            r["doc_id"]
            for r in phrase_match(idx, corpus, [(0, phrase)]).collect()
        }
        want = {
            d: round(qw * b + rqw * (resc.get(d, 0.0) if d in matched else 0.0), 6)
            for d, b in base.items()
        }
        expect = dict(
            sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        )
        assert {d: s for (d,), s in got.items()} == pytest.approx(expect, abs=2e-6), (
            trial, qterms, phrase, qw, rqw,
        )
