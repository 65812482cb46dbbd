"""Percolator (reverse search) and search_after deep pagination."""

import duckdb
import pytest
from pyspark.sql import functions as F

from elasticsearch_approx_plugin_spark.functions.tokenize import tokenize_ws
from elasticsearch_approx_plugin_spark.operators.percolate import (
    percolate,
    register_queries,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "error disk full on node"),
        (1, "disk healthy"),
        (2, "error network timeout"),
        (3, "all systems normal"),
        (4, "node error error disk"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id", tokenize_ws("text").alias("tokens")
    )


def _matches(docs, reg):
    return {(r["doc_id"], r["query_id"]) for r in percolate(docs, reg).collect()}


def test_and_or_msm_exact(spark, docs):
    reg = register_queries(
        spark,
        [
            (0, ["error", "disk"], "and", None),
            (1, ["network", "timeout"], "or", None),
            (2, ["error", "disk", "node"], "or", 2),
        ],
    )
    got = _matches(docs, reg)
    # doc0: error disk node -> q0 yes, q2 (3 distinct >= 2) yes
    # doc1: disk -> q2 only 1 < 2 no
    # doc2: error network timeout -> q1 yes, q2 1 < 2 no
    # doc4: node error disk (dups collapse) -> q0 yes, q2 yes
    assert got == {(0, 0), (4, 0), (2, 1), (0, 2), (4, 2)}


def test_duplicate_terms_collapse(spark):
    d = register_queries(spark, [(0, ["x", "x", "y"], "and", None)])
    rows = d.collect()
    assert {r["term"] for r in rows} == {"x", "y"}
    assert all(r["min_match"] == 2 for r in rows)


def test_validation(spark):
    with pytest.raises(ValueError):
        register_queries(spark, [])
    with pytest.raises(ValueError):
        register_queries(spark, [(0, [], "and", None)])
    with pytest.raises(ValueError):
        register_queries(spark, [(0, ["x"], "and", 1)])  # msm with and
    with pytest.raises(ValueError):
        register_queries(spark, [(0, ["x"], "or", 2)])  # msm > n_terms
    with pytest.raises(ValueError):
        register_queries(spark, [(0, ["x"], "not", None)])
    with pytest.raises(ValueError):
        register_queries(spark, [(0, ["x"], "or", None), (0, ["y"], "or", None)])


def test_vs_duckdb(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", tokenize_ws("text").alias("tokens")
    )
    reg = register_queries(
        spark,
        [(0, ["table", "hash"], "and", None), (1, ["dup", "window", "spark"], "or", 2)],
    )
    got = _matches(docs, reg)
    want = set(
        duckdb.sql(
            f"""
        WITH tok AS (SELECT DISTINCT doc_id, t.term
                     FROM read_parquet('{sf_dir}/documents.parquet'),
                          unnest(string_split_regex(text, '\\s+')) AS t(term)
                     WHERE t.term <> ''),
        q AS (SELECT * FROM (VALUES (0, 'table', 2), (0, 'hash', 2),
                                    (1, 'dup', 2), (1, 'window', 2), (1, 'spark', 2))
              AS q(query_id, term, need))
        SELECT doc_id, query_id FROM tok JOIN q USING (term)
        GROUP BY 1, 2 HAVING count(*) >= min(need)
        """
        ).fetchall()
    )
    assert got == want and got


def test_search_after_pagination(spark, docs):
    from elasticsearch_approx_plugin_spark.operators.postings import build_index
    from elasticsearch_approx_plugin_spark.plans.search import search_topk

    index = build_index(docs, range_bits=2)
    req = {"query": {"match": {"text": "error disk"}}, "size": 2}
    page1 = search_topk(index, req).collect()
    assert [r["rank"] for r in page1] == [1, 2]
    cursor = [page1[-1]["score"], page1[-1]["doc_id"]]
    page2 = search_topk(
        index, {**req, "search_after": cursor}
    ).collect()
    # pages tile the full ranking without overlap
    full = search_topk(index, {**req, "size": 4}).collect()
    assert [r["doc_id"] for r in page1 + page2] == [r["doc_id"] for r in full]
    assert [r["rank"] for r in page2] == [1, 2]  # ranks restart per page (ES hits order)
    with pytest.raises(ValueError):
        search_topk(index, {**req, "search_after": cursor, "from": 2})
    with pytest.raises(ValueError):
        search_topk(index, {**req, "search_after": [1.0]})
    with pytest.raises(ValueError):
        search_topk(
            index,
            {**req, "search_after": cursor, "sort": [{"doc_id": "asc"}]},
            docs=docs,
        )


def test_streaming_percolate_equals_batch(spark, docs):
    from elasticsearch_approx_plugin_spark.streaming.percolate import (
        streaming_percolate,
    )

    reg = register_queries(
        spark,
        [
            (0, ["error", "disk"], "and", None),
            (1, ["network", "timeout"], "or", None),
            (2, ["error", "disk", "node"], "or", 2),
        ],
    )
    # the projection is batch/stream-agnostic: on a batch frame it must
    # equal the batch join operator exactly
    got = {(r["doc_id"], r["query_id"]) for r in streaming_percolate(docs, reg).collect()}
    assert got == _matches(docs, reg)


def test_streaming_percolate_stream_run(spark, sf_dir, tmp_path):
    import os

    from elasticsearch_approx_plugin_spark.functions.tokenize import tokenize_ws
    from elasticsearch_approx_plugin_spark.streaming.percolate import (
        streaming_percolate,
    )

    reg = register_queries(
        spark, [(0, ["table", "hash"], "and", None), (1, ["dup"], "or", None)]
    )
    path = f"{sf_dir}/documents.parquet"
    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    stream = (
        reader.parquet(path)
        if os.path.isdir(path)
        else reader.option("pathGlobFilter", "documents.parquet").parquet(sf_dir)
    )
    toks = stream.select("doc_id", tokenize_ws("text").alias("tokens"))
    name = "stream_percolate_test"
    for active in spark.streams.active:
        if active.name == name:
            active.stop()
    q = (
        streaming_percolate(toks, reg)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(r["doc_id"], r["query_id"]) for r in spark.table(name).collect()}
    batch = spark.read.parquet(path).select(
        "doc_id", tokenize_ws("text").alias("tokens")
    )
    assert got == _matches(batch, reg) and got


def test_streaming_percolate_validation(spark, docs):
    from elasticsearch_approx_plugin_spark.streaming.percolate import (
        streaming_percolate,
    )

    empty = register_queries(spark, [(0, ["x"], "or", None)]).filter("query_id < 0")
    with pytest.raises(ValueError):
        streaming_percolate(docs, empty)
