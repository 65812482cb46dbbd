"""Dedup operators on a corpus with planted exact and near duplicates."""

import duckdb
import pytest
from pyspark.sql import functions as F

from elasticsearch_approx_plugin_spark.functions.tokenize import tokenize_ws
from elasticsearch_approx_plugin_spark.operators.dedup import (
    dedup_exact,
    minhash_lsh_dedup,
    ngram_jaccard_pairs,
    simhash,
    simhash_candidates,
)

N_BASE = 50
N_EXACT_DUP = 5
N_NEAR_DUP = 5

ORACLE_JACCARD = """
WITH d AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS toks
  FROM read_parquet('{path}')
),
sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(generate_series(1, greatest(len(toks) - 2, 0)),
                               i -> array_to_string(toks[i:i+2], ' '))) AS shingle
  FROM d
),
sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
  FROM sh a JOIN sh b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       round(common / (za.sz + zb.sz - common), 6) AS jaccard
FROM pairs JOIN sz za ON za.doc_id = id_a JOIN sz zb ON zb.doc_id = id_b
WHERE jaccard >= {threshold}
ORDER BY id_a, id_b
"""


@pytest.fixture(scope="module")
def corpus(spark, sf_dir, tmp_path_factory):
    base = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < N_BASE)
    )
    exact = base.filter(F.col("doc_id") < N_EXACT_DUP).select(
        (F.col("doc_id") + 1000).alias("doc_id"), "text"
    )
    # near dup: drop the last word
    near = base.filter(F.col("doc_id") < N_NEAR_DUP).select(
        (F.col("doc_id") + 2000).alias("doc_id"),
        F.regexp_replace("text", r"\s+\S+$", "").alias("text"),
    )
    df = base.union(exact).union(near)
    path = str(tmp_path_factory.mktemp("dedup") / "corpus.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    return df, f"{path}/*.parquet"


def test_dedup_exact(corpus, spark):
    df, path = corpus
    got = {
        (r["doc_id"], r["dup_count"]) for r in dedup_exact(df, "text", "doc_id").collect()
    }
    exp = {
        (r[0], r[1])
        for r in duckdb.sql(
            f"SELECT min(doc_id), count(*) FROM read_parquet('{path}') GROUP BY text"
        ).fetchall()
    }
    assert got == {(i, c) for (i, c) in exp}
    assert sum(c for _, c in got) == df.count()
    assert all(c == 2 for i, c in got if i < N_EXACT_DUP)


def test_ngram_jaccard_matches_oracle(corpus):
    df, path = corpus
    toks = df.select("doc_id", tokenize_ws("text").alias("tokens"))
    got = sorted(
        tuple(r)
        for r in ngram_jaccard_pairs(toks, "tokens", "doc_id", threshold=0.5).collect()
    )
    exp = duckdb.sql(ORACLE_JACCARD.format(path=path, threshold=0.5)).fetchall()
    assert got == [tuple(r) for r in exp]
    got_ids = {(a, b) for a, b, _ in got}
    assert all((i, i + 1000) in got_ids for i in range(N_EXACT_DUP))


def test_minhash_lsh_finds_planted_pairs(corpus):
    df, path = corpus
    toks = df.select("doc_id", tokenize_ws("text").alias("tokens"))
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_lsh_dedup(toks, "tokens", "doc_id", threshold=0.8).collect()
    }
    exp = {
        (a, b): j
        for a, b, j in duckdb.sql(ORACLE_JACCARD.format(path=path, threshold=0.8)).fetchall()
    }
    # exact verification ⇒ no false positives; banding recall catches all
    # planted near-identical pairs
    assert set(got) <= set(exp)
    for i in range(N_EXACT_DUP):
        assert (i, i + 1000) in got and got[(i, i + 1000)] == 1.0
    assert len(got) >= 0.9 * len(exp)


def test_simhash_exact_dups_collide(corpus):
    df, _ = corpus
    toks = df.select("doc_id", tokenize_ws("text").alias("tokens"))
    sig = {r["id"]: r["simhash"] for r in simhash(toks, "tokens", "doc_id").collect()}
    for i in range(N_EXACT_DUP):
        assert sig[i] == sig[i + 1000]
    cand = {
        (r["id_a"], r["id_b"])
        for r in simhash_candidates(
            simhash(toks, "tokens", "doc_id").withColumnRenamed("id", "id")
        ).collect()
    }
    assert all((i, i + 1000) in cand for i in range(N_EXACT_DUP))


def test_simhash_near_dups_close(corpus):
    df, _ = corpus
    toks = df.select("doc_id", tokenize_ws("text").alias("tokens"))
    sig = {r["id"]: r["simhash"] for r in simhash(toks, "tokens", "doc_id").collect()}
    for i in range(N_NEAR_DUP):
        ham = bin((sig[i] ^ sig[i + 2000]) & (2**64 - 1)).count("1")
        assert ham <= 8  # one dropped token barely moves the signature


def test_resolve_keep_list(corpus, spark):
    from elasticsearch_approx_plugin_spark.operators.dedup import resolve_keep_list

    df, _ = corpus
    pairs = spark.createDataFrame(
        [(0, 1000), (1, 1001), (1000, 2000)], "id_a long, id_b long"
    )
    kept = resolve_keep_list(df, pairs, "doc_id")
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    # component {0,1000,2000} keeps 0; {1,1001} keeps 1
    assert 0 in kept_ids and 1 in kept_ids
    assert {1000, 1001, 2000}.isdisjoint(kept_ids)
    assert kept.count() == df.count() - 3


def test_resolve_keep_list_no_pairs(corpus, spark):
    from elasticsearch_approx_plugin_spark.operators.dedup import resolve_keep_list

    df, _ = corpus
    empty = spark.createDataFrame([], "id_a long, id_b long")
    assert resolve_keep_list(df, empty, "doc_id").count() == df.count()


def test_resolve_keep_list_distributed(spark):
    """≥10^5 pairs routes through distributed connected components
    (driver union-find bypassed), including a chain component that
    needs pointer jumping (O(log d) rounds, not O(d))."""
    from pyspark.sql import functions as F

    from elasticsearch_approx_plugin_spark.operators.dedup import resolve_keep_list

    n_stars = 110_000
    stars = spark.range(n_stars).select(
        (F.col("id") * 2).alias("id_a"), (F.col("id") * 2 + 1).alias("id_b")
    )
    chain_base = 10_000_000
    chain_len = 64
    chain = spark.range(chain_len).select(
        (F.lit(chain_base) + F.col("id")).alias("id_a"),
        (F.lit(chain_base) + F.col("id") + 1).alias("id_b"),
    )
    pairs = stars.union(chain)
    node_ids = (
        pairs.select(F.col("id_a").alias("doc_id"))
        .union(pairs.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    kept = resolve_keep_list(node_ids, pairs, "doc_id", driver_max_pairs=1000)
    kept_ids = {r["doc_id"] for r in kept.collect()}
    # one survivor per star (the even id) + one for the whole chain
    assert len(kept_ids) == n_stars + 1
    assert chain_base in kept_ids
    assert all(x not in kept_ids for x in range(chain_base + 1, chain_base + chain_len + 1))
    assert (2 * 5) in kept_ids and (2 * 5 + 1) not in kept_ids


def test_connected_components_chain_and_merge(spark):
    """Two chains that share a node merge into one component with the
    global min label."""
    from elasticsearch_approx_plugin_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(5, 4), (4, 3), (3, 2), (2, 1), (100, 3), (101, 100), (7, 8)],
        "id_a long, id_b long",
    )
    comp = {r["id"]: r["component"] for r in connected_components(pairs).collect()}
    assert all(comp[x] == 1 for x in (1, 2, 3, 4, 5, 100, 101))
    assert comp[7] == comp[8] == 7


def test_minhash_partitioning_invariant(corpus):
    """Hash-deterministic pipeline ⇒ identical pairs at any input
    partitioning (the north-rule N-vs-4N property, dedup edition)."""
    df, _ = corpus
    toks = df.select("doc_id", tokenize_ws("text").alias("tokens"))
    a = {
        tuple(r)
        for r in minhash_lsh_dedup(toks, "tokens", "doc_id", threshold=0.8).collect()
    }
    b = {
        tuple(r)
        for r in minhash_lsh_dedup(
            toks.repartition(13), "tokens", "doc_id", threshold=0.8
        ).collect()
    }
    assert a == b and a


def test_connected_components_partitioning_invariant(spark):
    from pyspark.sql import functions as F

    from elasticsearch_approx_plugin_spark.operators.dedup import connected_components

    pairs = spark.range(3000).select(
        (F.col("id") % 600).alias("id_a"), (F.col("id") + 10_000).alias("id_b")
    )
    a = {tuple(r) for r in connected_components(pairs).collect()}
    b = {tuple(r) for r in connected_components(pairs.repartition(17)).collect()}
    assert a == b and a


def test_simhash_hot_bucket_guard(spark):
    """VERDICT r2 #1: a planted hot band bucket (5,000 unrelated sigs
    sharing band 0) must NOT go quadratic — the occupancy guard
    sub-splits it by the next band's bits — while genuinely close pairs
    in cold buckets are still all found."""
    import numpy as np

    rng = np.random.default_rng(99)
    sigs: list[tuple[int, int]] = []
    # 5,000 signatures identical ONLY in band 0 (bits 0-15): unguarded,
    # band 0 alone would emit ~12.5M candidate pairs
    hot = rng.integers(-(2**63), 2**63, size=5000, dtype=np.int64)
    hot = (hot & ~np.int64(0xFFFF)) | np.int64(0x1234)
    for i, v in enumerate(hot):
        sigs.append((i, int(v)))
    # 50 planted Hamming-1 pairs in cold buckets (band 1 flips one bit
    # → bands 0, 2, 3 still match)
    base = rng.integers(-(2**63), 2**63, size=50, dtype=np.int64)
    base = np.where((base & 0xFFFF) == 0x1234, base ^ 1, base)  # keep out of the hot bucket
    planted = set()
    for j, v in enumerate(base):
        a_id, b_id = 10_000 + 2 * j, 10_001 + 2 * j
        sigs.append((a_id, int(v)))
        sigs.append((b_id, int(v ^ (1 << 20))))
        planted.add((a_id, b_id))
    sig_df = spark.createDataFrame(sigs, "id long, simhash long")
    cand = {
        (r["id_a"], r["id_b"])
        for r in simhash_candidates(sig_df, max_bucket=100).collect()
    }
    assert planted <= cand
    # hot-bucket fan-out is bounded: survivors must match TWO bands
    # (expected ~5000²/2/65536 ≈ 190 residual pairs), nowhere near the
    # ~12.5M an unguarded join would emit
    assert len(cand) < 20_000, len(cand)
