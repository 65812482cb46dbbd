"""ANN operators vs DuckDB's list_cosine_similarity exact oracle."""

import duckdb
import pytest

from elasticsearch_approx_plugin_spark.operators.ann import cosine_topk, lsh_cosine_topk

K = 5

ORACLE = """
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qvec
  FROM read_parquet('{path}') WHERE vec_id < {nq}
),
scored AS (
  SELECT q.query_id, e.vec_id,
         round(list_cosine_similarity(e.embedding::DOUBLE[], q.qvec::DOUBLE[]), 6) AS score
  FROM read_parquet('{path}') e CROSS JOIN q
)
SELECT query_id, vec_id, score,
       row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rank
FROM scored QUALIFY rank <= {k}
ORDER BY query_id, rank
"""


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def queries(emb):
    rows = emb.filter("vec_id < 3").orderBy("vec_id").collect()
    return [(r["vec_id"], list(map(float, r["embedding"]))) for r in rows]


def test_cosine_topk_matches_oracle(emb, queries, sf_dir):
    got = [
        tuple(r)
        for r in cosine_topk(emb, queries, K).orderBy("query_id", "rank").collect()
    ]
    exp = duckdb.sql(
        ORACLE.format(path=f"{sf_dir}/embeddings.parquet", nq=3, k=K)
    ).fetchall()
    assert got == [tuple(r) for r in exp]


def test_cosine_topk_partitioning_invariant(emb, queries):
    a = [tuple(r) for r in cosine_topk(emb, queries, K).orderBy("query_id", "rank").collect()]
    b = [
        tuple(r)
        for r in cosine_topk(emb.repartition(7), queries, K)
        .orderBy("query_id", "rank")
        .collect()
    ]
    assert a == b


def test_lsh_topk_self_hit_and_recall(emb, queries):
    exact = {
        (r["query_id"], r["vec_id"])
        for r in cosine_topk(emb, queries, K).collect()
    }
    approx_rows = lsh_cosine_topk(emb, queries, K, n_planes=4, n_tables=8).collect()
    approx = {(r["query_id"], r["vec_id"]) for r in approx_rows}
    # the query vector itself shares its own bucket → always rank 1
    top1 = {(r["query_id"], r["vec_id"]) for r in approx_rows if r["rank"] == 1}
    assert top1 == {(q, q) for q, _ in queries}
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.7  # deterministic given seed; 4 planes × 8 tables
