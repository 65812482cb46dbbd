"""Similarity search over embedding columns (``array<float>``).

Two paths, same contract:

- :func:`cosine_topk` — exact brute force. The (tiny) query matrix is
  broadcast to every partition; each Arrow batch is scored with one
  numpy matmul; per-partition top-k heaps shrink the shuffle to
  O(partitions × queries × k) rows before the global window. This is
  the correctness baseline and is already the right plan at 100 TB
  when the query set is small (a full scan is unavoidable for exact
  k-NN; the matmul is the fastest possible per-byte pass).
- :func:`lsh_cosine_topk` — the scale path: deterministic
  random-hyperplane signatures bucket the corpus (one shuffle);
  queries probe only their own bucket (and optional multi-probe
  neighbors), then the candidates are re-ranked exactly. Recall is
  governed by (n_planes, n_tables).

Scores are rounded to 6 decimals for cross-engine comparability (same
convention as the BM25 scorer).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SCORE_DECIMALS = 6


def _as_matrix(vecs: list[list[float]]) -> np.ndarray:
    m = np.asarray(vecs, dtype=np.float64)
    norms = np.linalg.norm(m, axis=1)
    norms[norms == 0] = 1.0
    return m / norms[:, None]


def cosine_topk(
    emb: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (query_id, vec_id, score, rank)."""
    qids = [q for q, _ in queries]
    qmat = _as_matrix([v for _, v in queries])

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        best: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        parts_ids: list[np.ndarray] = []
        parts_scores: list[np.ndarray] = []
        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            norms = np.linalg.norm(m, axis=1)
            norms[norms == 0] = 1.0
            sims = (m / norms[:, None]) @ qmat.T  # (batch, nq)
            parts_ids.append(ids)
            parts_scores.append(sims)
        if not parts_ids:
            return
        ids = np.concatenate(parts_ids)
        sims = np.round(np.concatenate(parts_scores, axis=0), SCORE_DECIMALS)
        out_q, out_id, out_s = [], [], []
        for qi, qid in enumerate(qids):
            col = sims[:, qi]
            if col.size > k:
                cut = np.partition(-col, k - 1)[k - 1]
                keep = np.flatnonzero(-col <= cut)
            else:
                keep = np.arange(col.size)
            order = np.lexsort((ids[keep], -col[keep]))[:k]
            sel = keep[order]
            out_q.extend([qid] * sel.size)
            out_id.extend(ids[sel].tolist())
            out_s.extend(col[sel].tolist())
        yield pd.DataFrame({"query_id": out_q, id_col: out_id, "score": out_s})

    local = emb.select(id_col, vec_col).mapInPandas(
        score, f"query_id long, {id_col} long, score double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc(id_col))
    return (
        local.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "score", "rank")
    )


def hyperplane_signature(
    vec_col: str, dim: int, n_planes: int = 16, seed: int = 42
) -> "F.Column":
    """Deterministic random-hyperplane LSH bucket id as a Catalyst
    expression: sign pattern of <v, p_j> packed into a long.

    The planes are a fixed function of (seed, dim) — identical on
    every executor and every cluster size.
    """
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    bucket = None
    for j in range(n_planes):
        dot = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.array(*[F.lit(float(x)) for x in planes[j]]),
                lambda a, b: a * b,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bit = F.when(dot >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, j)
        bucket = term if bucket is None else bucket.bitwiseOR(term)
    return bucket


def lsh_cosine_topk(
    emb: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 10,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k: multi-table hyperplane LSH proposes
    candidates (a vector matches if it shares the query's bucket in ANY
    table — recall = 1-(1-p^planes)^tables), exact cosine re-ranks.
    One corpus projection, broadcast probe join, no full-scan matmul."""
    dim = len(queries[0][1])
    spark = emb.sparkSession

    def _buckets(col: str) -> F.Column:
        return F.array(
            *[
                F.struct(
                    F.lit(t).alias("tbl"),
                    hyperplane_signature(col, dim, n_planes, seed + 7919 * t).alias(
                        "bucket"
                    ),
                )
                for t in range(n_tables)
            ]
        )

    bucketed = emb.select(
        id_col, vec_col, F.explode(_buckets(vec_col)).alias("tb")
    ).select(id_col, vec_col, "tb.tbl", "tb.bucket")

    qdf = spark.createDataFrame(
        [(qid, v) for qid, v in queries], "query_id long, qvec array<double>"
    )
    probes = qdf.select(
        "query_id", "qvec", F.explode(_buckets("qvec")).alias("tb")
    ).select("query_id", "qvec", "tb.tbl", "tb.bucket")

    cand = (
        bucketed.join(F.broadcast(probes), ["tbl", "bucket"])
        .select(id_col, vec_col, "query_id", "qvec")
        .dropDuplicates([id_col, "query_id"])
    )
    dot = F.aggregate(
        F.zip_with(F.col(vec_col).cast("array<double>"), F.col("qvec"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(
        F.aggregate(F.col(c).cast("array<double>"), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    scored = cand.withColumn(
        "score", F.round(dot / (norm(vec_col) * norm("qvec")), SCORE_DECIMALS)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "score", "rank")
    )


def ivf_build(
    emb: DataFrame,
    n_lists: int = 16,
    n_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> tuple[DataFrame, np.ndarray]:
    """IVF coarse quantizer: deterministic Lloyd k-means, then assign
    every vector to its nearest centroid list.

    Returns (assigned DataFrame with a ``list_id`` column, centroid
    matrix). Each iteration is one scan: assignment happens in a numpy
    matmul per Arrow batch (centroids broadcast in the closure), the
    per-list mean reduces through an ordinary groupBy — the classic
    iterate-in-driver / scan-on-cluster shape. Deterministic:
    initial centroids are the lowest-id vectors, ties in argmin break
    toward the lower list id.
    """
    init = (
        emb.select(id_col, vec_col).orderBy(id_col).limit(n_lists).collect()
    )
    centroids = np.stack([np.array(r[vec_col], dtype=np.float64) for r in init])

    def assign_fn(cents: np.ndarray):
        def fn(batches):
            for pdf in batches:
                m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                d = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
                yield pd.DataFrame(
                    {id_col: pdf[id_col], "list_id": d.argmin(axis=1).astype(np.int64)}
                )

        return fn

    v = emb.select(id_col, vec_col).persist()
    try:
        for _ in range(n_iters):
            assigned = v.mapInPandas(assign_fn(centroids), f"{id_col} long, list_id long")
            means = (
                v.join(assigned, id_col)
                .groupBy("list_id")
                .agg(
                    F.array(
                        *[
                            F.avg(F.col(vec_col)[i]).alias(f"c{i}")
                            for i in range(centroids.shape[1])
                        ]
                    ).alias("centroid")
                )
                .collect()
            )
            for r in means:  # empty lists keep their previous centroid
                centroids[int(r["list_id"])] = np.array(r["centroid"], dtype=np.float64)
        assigned = v.mapInPandas(assign_fn(centroids), f"{id_col} long, list_id long")
        out = v.join(assigned, id_col)
    finally:
        v.unpersist()
    return out, centroids


def ivf_cosine_topk(
    assigned: DataFrame,
    centroids: np.ndarray,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe each query's ``nprobe`` nearest IVF lists, exact cosine
    re-rank inside them — the classic IVF-Flat search. The probed
    fraction of the corpus is nprobe/n_lists; everything else is never
    read (at rest, partitioning by list_id makes that partition
    pruning)."""
    spark = assigned.sparkSession
    probe_rows = []
    for qid, vec in queries:
        d = ((centroids - np.asarray(vec, dtype=np.float64)) ** 2).sum(axis=1)
        for li in np.argsort(d, kind="stable")[:nprobe]:
            probe_rows.append((qid, int(li), [float(x) for x in vec]))
    probes = spark.createDataFrame(
        probe_rows, "query_id long, list_id long, qvec array<double>"
    )
    cand = assigned.join(F.broadcast(probes), "list_id")
    dot = F.aggregate(
        F.zip_with(F.col(vec_col).cast("array<double>"), F.col("qvec"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(
        F.aggregate(F.col(c).cast("array<double>"), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    scored = cand.withColumn(
        "score", F.round(dot / (norm(vec_col) * norm("qvec")), SCORE_DECIMALS)
    ).dropDuplicates([id_col, "query_id"])
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "score", "rank")
    )
