"""multi_match over per-field indexes: best_fields = dismax (+tie
breaker), most_fields = sum; per-field scores are score_queries' own
against each field's statistics."""

import pytest
from pyspark.sql import functions as F

from elasticsearch_approx_plugin_spark.functions.tokenize import tokenize_ws
from elasticsearch_approx_plugin_spark.operators.bm25 import score_queries
from elasticsearch_approx_plugin_spark.operators.multi_match import multi_match_topk
from elasticsearch_approx_plugin_spark.operators.postings import build_index


@pytest.fixture(scope="module")
def indexes(spark):
    rows = [
        (0, "table scan hash join", "alpha"),
        (1, "table table merge", "beta"),
        (2, "slow row window", "alpha table"),
        (3, "hash hash", "gamma"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, body string, title string")
    return {
        "body": build_index(
            docs.select("doc_id", tokenize_ws("body").alias("tokens")), range_bits=2
        ),
        "title": build_index(
            docs.select("doc_id", tokenize_ws("title").alias("tokens")), range_bits=2
        ),
    }


def _scores(df):
    return {(r["query_id"], r["doc_id"]): r["score"] for r in df.collect()}


def _field_scores(indexes, fld, queries):
    return {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in score_queries(indexes[fld], queries, indexes[fld].n_docs).collect()
    }


def test_most_fields_sums_and_best_fields_maxes(indexes):
    queries = [(0, ["table"])]
    body = _field_scores(indexes, "body", queries)
    title = _field_scores(indexes, "title", queries)
    most = _scores(multi_match_topk(indexes, queries, 10, match_type="most_fields"))
    best = _scores(multi_match_topk(indexes, queries, 10, match_type="best_fields"))
    keys = set(body) | set(title)
    assert set(most) == keys and set(best) == keys
    for key in keys:
        b, t = body.get(key, 0.0), title.get(key, 0.0)
        assert most[key] == pytest.approx(round(b + t, 6), abs=1e-9)
        assert best[key] == pytest.approx(round(max(b, t), 6), abs=1e-9)
    # doc 2 matches 'table' ONLY in title — multi_match must surface it
    assert (0, 2) in most


def test_tie_breaker_interpolates(indexes):
    queries = [(0, ["table"])]
    body = _field_scores(indexes, "body", queries)
    title = _field_scores(indexes, "title", queries)
    out = _scores(
        multi_match_topk(indexes, queries, 10, match_type="best_fields", tie_breaker=0.3)
    )
    for key, got in out.items():
        b, t = body.get(key, 0.0), title.get(key, 0.0)
        assert got == pytest.approx(round(max(b, t) + 0.3 * min(b, t), 6), abs=1e-9)


def test_boosts_scale_fields(indexes):
    queries = [(0, ["table"])]
    plain = _scores(multi_match_topk(indexes, queries, 10, match_type="most_fields"))
    boosted = _scores(
        multi_match_topk(
            indexes, queries, 10, match_type="most_fields",
            boosts={"title": 2.0},
        )
    )
    title = _field_scores(indexes, "title", queries)
    for key in plain:
        extra = title.get(key, 0.0)
        assert boosted[key] == pytest.approx(round(plain[key] + extra, 6), abs=1e-6)


def test_validation(indexes):
    with pytest.raises(ValueError):
        multi_match_topk({}, [(0, ["x"])])
    with pytest.raises(ValueError):
        multi_match_topk(indexes, [(0, ["x"])], match_type="cross_fields")
    with pytest.raises(ValueError):
        multi_match_topk(indexes, [(0, ["x"])], tie_breaker=1.5)
    with pytest.raises(ValueError):
        multi_match_topk(indexes, [(0, ["x"])], boosts={"nope": 2.0})
