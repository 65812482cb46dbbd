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


def test_embedding_cosine_dedup(spark, emb, sf_dir):
    """Exhaustive mode matches a DuckDB pairwise oracle; LSH mode finds
    the planted near-identical pairs with exact precision."""
    from pyspark.sql import functions as F

    from elasticsearch_approx_plugin_spark.operators.dedup import embedding_cosine_dedup

    base = emb.filter("vec_id < 150")
    # plant near-dups: copies with the first component nudged
    dup = base.filter("vec_id < 5").select(
        (F.col("vec_id") + 1000).alias("vec_id"),
        F.concat(
            F.array((F.col("embedding")[0] + F.lit(0.001)).cast("float")),
            F.slice("embedding", 2, 1000),
        ).alias("embedding"),
        "label",
    )
    df = base.unionByName(dup)

    exact = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_cosine_dedup(df, 0.95, exhaustive=True).collect()
    }
    assert all((i, i + 1000) in exact for i in range(5))

    lsh = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_cosine_dedup(df, 0.95, n_planes=6, n_tables=8).collect()
    }
    assert set(lsh) <= set(exact)  # exact verification ⇒ no false positives
    assert all((i, i + 1000) in lsh for i in range(5))  # near-identical ⇒ caught


def test_ivf_topk_recall_and_determinism(spark, emb, queries):
    from elasticsearch_approx_plugin_spark.operators.ann import ivf_build, ivf_cosine_topk

    assigned, cents = ivf_build(emb, n_lists=8, n_iters=2)
    # every vector lands in exactly one list
    assert assigned.count() == emb.count()
    exact = {(r["query_id"], r["vec_id"]) for r in cosine_topk(emb, queries, K).collect()}
    got_rows = ivf_cosine_topk(assigned, cents, queries, K, nprobe=4).collect()
    got = {(r["query_id"], r["vec_id"]) for r in got_rows}
    recall = len(got & exact) / len(exact)
    assert recall >= 0.5  # deterministic given seed; probing half the lists
    # determinism across input partitioning
    assigned2, cents2 = ivf_build(emb.repartition(7), n_lists=8, n_iters=2)
    import numpy as np

    assert np.allclose(cents, cents2)
    got2 = {(r["query_id"], r["vec_id"]) for r in ivf_cosine_topk(assigned2, cents2, queries, K, nprobe=4).collect()}
    assert got == got2


def test_hyperplane_buckets_dim768(spark):
    """Real-embedding-dim LSH: plan must not blow up (round-1's
    literal-expression formulation compiled ~n_planes × dim Catalyst
    nodes per table; this asserts the Arrow path handles dim 768),
    and corpus/query bucket computations must agree."""
    import numpy as np

    from elasticsearch_approx_plugin_spark.operators.ann import (
        _bucket_ids,
        _lsh_planes,
        hyperplane_buckets,
    )

    dim, n, n_planes, n_tables = 768, 200, 10, 4
    rng = np.random.default_rng(3)
    mat = rng.standard_normal((n, dim)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    ).repartition(5)
    got = hyperplane_buckets(df, "vec_id", "embedding", dim, n_planes, n_tables, seed=42)
    rows = got.collect()
    assert len(rows) == n * n_tables
    planes = _lsh_planes(dim, n_planes, n_tables, 42)
    expected = _bucket_ids(mat.astype(np.float64), planes)
    for r in rows:
        assert r["bucket"] == expected[r["vec_id"], r["tbl"]]
    # vectors pass through unchanged (verify path needs them)
    r0 = next(r for r in rows if r["vec_id"] == 0 and r["tbl"] == 0)
    assert np.allclose(np.array(r0["embedding"]), mat[0])


def test_lsh_topk_dim768_recall(spark):
    """End-to-end LSH top-k at dim 768 with planted near-duplicates."""
    import numpy as np

    dim, n = 768, 300
    rng = np.random.default_rng(11)
    base = rng.standard_normal((n, dim))
    # plant: vectors 1000+q are tiny perturbations of query vectors q<3
    rows = [(i, [float(x) for x in base[i]]) for i in range(n)]
    for q in range(3):
        rows.append((1000 + q, [float(x) for x in base[q] + 0.01 * rng.standard_normal(dim)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = [(q, [float(x) for x in base[q]]) for q in range(3)]
    got = lsh_cosine_topk(df, queries, 3, n_planes=8, n_tables=8)
    by_q = {}
    for r in got.collect():
        by_q.setdefault(r["query_id"], set()).add(r["vec_id"])
    for q in range(3):
        assert q in by_q[q]  # self-hit: identical vector shares every bucket
        assert 1000 + q in by_q[q]  # planted near-dup found


def test_ivf_build_dim768(spark):
    """IVF k-means at a realistic embedding dim: the partial-sum build
    must not blow up in plan size or driver memory (round-1's version
    ran per-dimension avg aggregates — 768 agg columns)."""
    import numpy as np

    from elasticsearch_approx_plugin_spark.operators.ann import ivf_build

    dim, n = 768, 240
    rng = np.random.default_rng(7)
    mat = rng.standard_normal((n, dim)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    ).repartition(6)
    assigned, cents = ivf_build(df, n_lists=6, n_iters=2)
    assert cents.shape == (6, dim)
    rows = assigned.collect()
    assert len(rows) == n
    assert {r["list_id"] for r in rows} <= set(range(6))
    # assignment is nearest-centroid (verify a sample against numpy)
    for r in rows[:20]:
        v = np.array(r["embedding"], dtype=np.float64)
        d = ((cents - v) ** 2).sum(axis=1)
        assert int(d.argmin()) == r["list_id"]


def test_ivf_persistence_prunes_partitions(spark, emb, queries, tmp_path):
    """write_ivf → read_ivf round-trips results exactly, and the probe
    filter prunes list_id directories at the scan."""
    from elasticsearch_approx_plugin_spark.operators.ann import (
        ivf_build,
        ivf_cosine_topk,
        read_ivf,
        write_ivf,
    )

    assigned, cents = ivf_build(emb, n_lists=8, n_iters=2)
    orig = sorted(tuple(r) for r in ivf_cosine_topk(assigned, cents, queries, K, nprobe=3).collect())

    path = str(tmp_path / "ivf")
    write_ivf(assigned, cents, path)
    loaded, cents2 = read_ivf(spark, path)
    import numpy as np

    assert np.allclose(cents, cents2)
    q = ivf_cosine_topk(loaded, cents2, queries, K, nprobe=3)
    got = sorted(tuple(r) for r in q.collect())
    assert got == orig

    plan = q._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PartitionFilters: [list_id" in plan  # probed dirs only


def test_rrf_fuse_semantics(spark):
    """RRF (score = Σ 1/(60+rank)): a doc in BOTH rankings outranks
    docs in one; sources counts the contributing rankers; ties break
    by id; rank re-numbers densely from 1 per query."""
    from elasticsearch_approx_plugin_spark.operators.ann import rrf_fuse

    a = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (0, 12, 3)], "query_id long, doc_id long, rank long"
    )
    b = spark.createDataFrame(
        [(0, 11, 1), (0, 13, 2), (0, 12, 3)], "query_id long, doc_id long, rank long"
    )
    rows = {r["doc_id"]: r for r in rrf_fuse([a, b], k=4).collect()}
    # doc 11: 1/62 + 1/61; doc 12: 1/63 + 1/63; doc 10: 1/61; doc 13: 1/62
    assert rows[11]["rank"] == 1 and rows[11]["sources"] == 2
    assert rows[12]["rank"] == 2 and rows[12]["sources"] == 2
    assert rows[10]["rank"] == 3 and rows[10]["sources"] == 1
    assert rows[13]["rank"] == 4 and rows[13]["sources"] == 1
    assert rows[11]["rrf_score"] == round(1 / 62 + 1 / 61, 6)
    # tie (two single-source docs at the same rank) breaks by doc_id
    c = spark.createDataFrame([(1, 20, 1)], "query_id long, doc_id long, rank long")
    d = spark.createDataFrame([(1, 19, 1)], "query_id long, doc_id long, rank long")
    tied = {r["doc_id"]: r["rank"] for r in rrf_fuse([c, d], k=2).collect()}
    assert tied == {19: 1, 20: 2}
    # per-ranker weights: weighting d's ranker 3x overturns the id tie
    wtd = {r["doc_id"]: r for r in rrf_fuse([c, d], k=2, weights=[1.0, 3.0]).collect()}
    assert wtd[19]["rank"] == 1 and wtd[19]["rrf_score"] == round(3.0 / 61, 6)
    assert wtd[20]["rank"] == 2 and wtd[20]["rrf_score"] == round(1.0 / 61, 6)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="weights"):
        rrf_fuse([c, d], weights=[1.0])
    with _pytest.raises(ValueError, match="at least one"):
        rrf_fuse([])


def test_rrf_fuse_hybrid_end_to_end(spark, emb, queries, sf_dir):
    """Fusing a REAL BM25 ranking over documents with cosine over the
    paired embeddings (shared 0..n id space) — the column contract
    between score_queries and rrf_fuse is exercised, not assumed:
    every fused row's doc appears in at least one input top-k, sources
    is honest, and rank re-numbers densely per query."""
    from elasticsearch_approx_plugin_spark.functions.tokenize import tokenize_ws
    from elasticsearch_approx_plugin_spark.operators.ann import cosine_topk, rrf_fuse
    from elasticsearch_approx_plugin_spark.operators.bm25 import score_queries
    from elasticsearch_approx_plugin_spark.operators.postings import build_index

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    idx = build_index(docs.select("doc_id", tokenize_ws("text").alias("tokens")))
    bm = score_queries(
        idx, [(0, ["hash", "join"]), (1, ["table"]), (2, ["scan", "merge"])], 10
    )
    ann = cosine_topk(emb, queries, 10).withColumnRenamed("vec_id", "doc_id")
    fused = rrf_fuse([bm, ann], k=10).collect()
    in_a = {(r["query_id"], r["doc_id"]) for r in bm.collect()}
    in_b = {(r["query_id"], r["doc_id"]) for r in ann.collect()}
    per_q = {}
    for r in fused:
        assert (r["query_id"], r["doc_id"]) in (in_a | in_b)
        assert r["sources"] in (1, 2)
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    for q, ranks in per_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 10
