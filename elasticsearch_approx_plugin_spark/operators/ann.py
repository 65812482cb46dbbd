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

from ..functions.small_df import small_df

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
        # running per-query top-k across Arrow batches: peak memory is
        # O(batch × nq + nq × k), NOT O(partition × nq) — accumulating
        # every batch's score matrix for the whole partition would be
        # ~1 GB/task at 10^6 rows × 100 queries (the 100 TB killer)
        best_ids = [np.empty(0, dtype=np.int64) for _ in qids]
        best_scores = [np.empty(0, dtype=np.float64) for _ in qids]
        seen = False
        for pdf in batches:
            if not len(pdf):
                continue
            seen = True
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            norms = np.linalg.norm(m, axis=1)
            norms[norms == 0] = 1.0
            sims = np.round((m / norms[:, None]) @ qmat.T, SCORE_DECIMALS)
            for qi in range(len(qids)):
                cand_ids = np.concatenate([best_ids[qi], ids])
                cand_s = np.concatenate([best_scores[qi], sims[:, qi]])
                if cand_ids.size > k:
                    cut = np.partition(-cand_s, k - 1)[k - 1]
                    keep = np.flatnonzero(-cand_s <= cut)
                else:
                    keep = np.arange(cand_ids.size)
                order = np.lexsort((cand_ids[keep], -cand_s[keep]))[:k]
                sel = keep[order]
                best_ids[qi] = cand_ids[sel]
                best_scores[qi] = cand_s[sel]
        if not seen:
            return
        out_q, out_id, out_s = [], [], []
        for qi, qid in enumerate(qids):
            out_q.extend([qid] * best_ids[qi].size)
            out_id.extend(best_ids[qi].tolist())
            out_s.extend(best_scores[qi].tolist())
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


def _lsh_planes(dim: int, n_planes: int, n_tables: int, seed: int) -> np.ndarray:
    """Fixed random hyperplanes, shape (n_tables, n_planes, dim).

    A pure function of (seed, dim, n_planes, n_tables) — identical on
    the driver and every executor, at every cluster size. Per-table
    seeds are spread (seed + 7919·t) so adding a table never changes
    the existing tables' buckets.
    """
    return np.stack(
        [
            np.random.default_rng(seed + 7919 * t).standard_normal((n_planes, dim))
            for t in range(n_tables)
        ]
    )


def _bucket_ids(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """(n, dim) vectors × (tables, planes, dim) → (n, tables) packed
    sign-pattern buckets. One matmul for all tables."""
    n_tables, n_planes, dim = planes.shape
    proj = mat @ planes.reshape(n_tables * n_planes, dim).T  # (n, T*P)
    bits = (proj >= 0).astype(np.int64).reshape(mat.shape[0], n_tables, n_planes)
    weights = (1 << np.arange(n_planes, dtype=np.int64))
    return bits @ weights  # (n, tables)


def hyperplane_buckets(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_planes: int = 10,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """(id, vec, tbl, bucket) — one row per (vector, table).

    The whole multi-table projection is ONE numpy matmul per Arrow
    batch (planes live in the task closure); at dim 768 this replaces
    the ~n_planes × n_tables × dim literal Catalyst expression nodes of
    the old expression-based formulation, whose plan compile blew up
    long before the data did. Replaces the retired
    ``hyperplane_signature`` (see VERDICT r1 finding #2).
    """
    planes = _lsh_planes(dim, n_planes, n_tables, seed)

    def project(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            buckets = _bucket_ids(mat, planes)  # (n, tables)
            n = len(pdf)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy().repeat(n_tables),
                    vec_col: pdf[vec_col].to_numpy().repeat(n_tables),
                    "tbl": np.tile(np.arange(n_tables, dtype=np.int64), n),
                    "bucket": buckets.reshape(-1),
                }
            )

    vec_type = dict(df.dtypes)[vec_col]
    return df.select(id_col, vec_col).mapInPandas(
        project, f"{id_col} long, {vec_col} {vec_type}, tbl long, bucket long"
    )


def lsh_cosine_topk(
    emb: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 10,
    n_tables: int = 4,
    seed: int = 42,
    multiprobe: int = 0,
) -> DataFrame:
    """Approximate cosine top-k: multi-table hyperplane LSH proposes
    candidates (a vector matches if it shares the query's bucket in ANY
    table — recall = 1-(1-p^planes)^tables), exact cosine re-ranks.
    One corpus projection (numpy matmul per Arrow batch), broadcast
    probe join, no full-scan matmul.

    ``multiprobe=1`` additionally probes every bucket at Hamming
    distance 1 from the query's bucket in each table (the classic
    multiprobe-LSH trick): each flipped bit is the bucket the query
    would land in had one hyperplane voted the other way — the most
    likely homes of near neighbors that straddle a plane. Cost lives
    entirely on the QUERY side: the broadcast probe table grows
    ×(1+n_planes); the corpus projection, shuffle, and storage are
    unchanged, so at 100 TB this is free recall."""
    dim = len(queries[0][1])
    spark = emb.sparkSession

    bucketed = hyperplane_buckets(
        emb, id_col, vec_col, dim, n_planes, n_tables, seed
    )

    # query buckets: same planes, computed driver-side (queries are tiny)
    planes = _lsh_planes(dim, n_planes, n_tables, seed)
    qmat = np.asarray([v for _, v in queries], dtype=np.float64)
    qbuckets = _bucket_ids(qmat, planes)  # (nq, tables)
    probe_rows = []
    for qi, (qid, vec) in enumerate(queries):
        fvec = [float(x) for x in vec]
        for t in range(n_tables):
            base = int(qbuckets[qi, t])
            buckets = {base}
            if multiprobe >= 1:
                buckets |= {base ^ (1 << b) for b in range(n_planes)}
            probe_rows += [(qid, fvec, t, bkt) for bkt in sorted(buckets)]
    probes = small_df(spark, 
        probe_rows, "query_id long, qvec array<double>, tbl long, bucket long"
    )

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
    matrix). Each Lloyd iteration is ONE corpus scan with NO join and
    NO shuffle: a ``mapInPandas`` pass assigns each Arrow batch to its
    nearest centroid (numpy matmul, centroids broadcast in the task
    closure) and emits per-list PARTIAL (Σvec, count) rows — at most
    n_lists rows per batch — which the driver reduces to the new
    centroids. (Round-1 version joined the corpus back per iteration
    and ran dim-many avg() aggregates — VERDICT r1 finding #3; this
    replaces both with the partial-sum scan.) Deterministic: initial
    centroids are the lowest-id vectors; argmin ties break toward the
    lower list id; the driver reduce sorts partials before summing.
    """
    init = (
        emb.select(id_col, vec_col).orderBy(id_col).limit(n_lists).collect()
    )
    centroids = np.stack([np.array(r[vec_col], dtype=np.float64) for r in init])
    dim = centroids.shape[1]

    def partials_fn(cents: np.ndarray):
        def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if not len(pdf):
                    continue
                m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                # squared L2 via the expansion — one matmul, no (n, k, d) temp
                d = (m * m).sum(axis=1)[:, None] - 2.0 * (m @ cents.T)
                d += (cents * cents).sum(axis=1)[None, :]
                lid = d.argmin(axis=1).astype(np.int64)
                order = np.argsort(lid, kind="stable")
                lid_s = lid[order]
                uniq, starts = np.unique(lid_s, return_index=True)
                sums = np.add.reduceat(m[order], starts, axis=0)
                counts = np.diff(np.append(starts, lid_s.size))
                yield pd.DataFrame(
                    {
                        "list_id": uniq,
                        "vsum": list(sums),
                        "cnt": counts.astype(np.int64),
                    }
                )

        return fn

    def assign_fn(cents: np.ndarray):
        def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if not len(pdf):
                    continue
                m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                d = (m * m).sum(axis=1)[:, None] - 2.0 * (m @ cents.T)
                d += (cents * cents).sum(axis=1)[None, :]
                out = pdf[[id_col, vec_col]].copy()
                out["list_id"] = d.argmin(axis=1).astype(np.int64)
                yield out

        return fn

    vec_type = dict(emb.dtypes)[vec_col]
    v = emb.select(id_col, vec_col).persist()
    try:
        for _ in range(n_iters):
            rows = v.mapInPandas(
                partials_fn(centroids), "list_id long, vsum array<double>, cnt long"
            ).collect()  # ≤ n_batches × n_lists rows — small by construction
            sums = np.zeros((n_lists, dim))
            counts = np.zeros(n_lists, dtype=np.int64)
            # fixed reduce order (collect order varies with scheduling;
            # float addition is not associative)
            for r in sorted(rows, key=lambda r: (r["list_id"], r["cnt"], r["vsum"])):
                sums[r["list_id"]] += np.asarray(r["vsum"])
                counts[r["list_id"]] += r["cnt"]
            nonempty = counts > 0  # empty lists keep their previous centroid
            centroids[nonempty] = sums[nonempty] / counts[nonempty, None]
        out = v.mapInPandas(
            assign_fn(centroids), f"{id_col} long, {vec_col} {vec_type}, list_id long"
        )
    finally:
        v.unpersist(blocking=False)
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
    probes = small_df(spark, 
        probe_rows, "query_id long, list_id long, qvec array<double>"
    )
    # the probed list set is known driver-side → a static filter, which
    # becomes PARTITION PRUNING on a list_id-partitioned at-rest index
    # (write_ivf) and shrinks the join input either way
    probed = sorted({r[1] for r in probe_rows})
    cand = assigned.filter(F.col("list_id").isin(probed)).join(
        F.broadcast(probes), "list_id"
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
    ).dropDuplicates([id_col, "query_id"])
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "score", "rank")
    )


def write_ivf(
    assigned: DataFrame, centroids: np.ndarray, path: str, vec_col: str = "embedding"
) -> None:
    """Persist an IVF index: vectors hive-partitioned by ``list_id``
    (a query's probed lists prune to their directories at the parquet
    scan — the ANN analog of the text index's bucket pruning), plus the
    centroid matrix as JSON metadata."""
    import json
    import os

    assigned.write.mode("overwrite").partitionBy("list_id").parquet(
        os.path.join(path, "vectors")
    )
    with open(os.path.join(path, "centroids.json"), "w") as f:
        json.dump(
            {"centroids": centroids.tolist(), "dim": int(centroids.shape[1])}, f
        )


def read_ivf(spark, path: str) -> tuple[DataFrame, np.ndarray]:
    import json
    import os

    with open(os.path.join(path, "centroids.json")) as f:
        meta = json.load(f)
    vectors = spark.read.parquet(os.path.join(path, "vectors"))
    return vectors, np.asarray(meta["centroids"], dtype=np.float64)


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 10,
    c: int = 60,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    weights: list[float] | None = None,
) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion:
    ``score(d) = Σ_r w_r/(c + rank_r(d))`` over the input rankings
    (Cormack/Clarke/Büttcher, SIGIR'09; ``weights`` default to 1.0 —
    the plain RRF formula), then top-k per query.

    Rank-only fusion is the robust way to combine incomparable score
    scales (BM25 log-idf vs cosine in [-1, 1]) without per-collection
    calibration; ``c=60`` is the paper's constant. Each input needs
    (query_col, id_col, rank) — the contract every top-k operator in
    this package already emits (``bm25.score_queries``,
    ``ann.cosine_topk`` / ``lsh_cosine_topk`` / ``ivf_cosine_topk``).

    Plan shape: inputs are already top-k results (q × k rows each), so
    the union → groupBy → window pipeline is tiny at any corpus scale —
    the heavy lifting stays inside the upstream rankers. ``sources``
    reports how many rankers returned the doc (consensus signal).

    Each input is deduplicated per (query, id) keeping its best (min)
    rank before fusing: a ranking that repeats a doc would otherwise
    double-count its reciprocal rank and inflate ``sources`` (the
    packaged top-k operators emit unique rows, but the contract is now
    enforced rather than assumed for external callers — ADVICE r4).
    The dedup is a groupBy over q × k rows, negligible at any scale.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking (query, id, rank)")
    if weights is not None and len(weights) != len(rankings):
        raise ValueError(f"{len(weights)} weights for {len(rankings)} rankings")
    ws = weights or [1.0] * len(rankings)
    parts = [
        r.groupBy(F.col(query_col), F.col(id_col))
        .agg(F.min("rank").alias("rank"))
        .withColumn("__w", F.lit(float(w)))
        for r, w in zip(rankings, ws)
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    scored = u.groupBy(query_col, id_col).agg(
        F.round(F.sum(F.col("__w") / (F.col("rank") + F.lit(c))), SCORE_DECIMALS).alias(
            "rrf_score"
        ),
        F.count("*").alias("sources"),
    )
    w = Window.partitionBy(query_col).orderBy(F.desc("rrf_score"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .orderBy(query_col, "rank")
    )
