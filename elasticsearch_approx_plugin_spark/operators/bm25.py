"""BM25 top-k query engine over the salted posting lists.

Document-at-a-time scoring, distributed by doc range: each
``(query_id, range_id)`` group scores its range's candidates with one
vectorized numpy pass (decode varints → per-term contributions →
``np.add.at`` accumulation in sorted-term order → local top-k), then a
global window keeps the exact top-k. Per-range top-k ⊇ the global
winners inside that range, so the merge is exact — the same
partial/reduce shape as the reference's shard facets
(``README.md:289-299`` in /root/reference).

Determinism (north rule: rank-identical docIDs + scores at N vs 4N
parallelism): scores accumulate per doc in *sorted term order* with
float64, ranges are pure functions of doc_id, and ties break on
doc_id — nothing depends on physical partitioning.

Block-max metadata (``max_tfnorm``) gives every ``(query, range)`` an
upper bound ``Σ idf·max_tfnorm`` before any varint is decoded; ranges
whose bound cannot reach the best k lower-bound estimate are skipped
JVM-side (a filter on the aggregated bound — the block-max-WAND skip
re-expressed as a declarative prune instead of a cursor walk).

IDF: Lucene/BM25 ``ln(1 + (N - df + 0.5)/(df + 0.5))``, k1=1.2 b=0.75
fixed at build time.
"""

from __future__ import annotations

import math
from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.varint import delta_varint_decode, varint_decode
from .postings import InvertedIndex

SCORE_DECIMALS = 6  # scores are rounded for ordering/compare stability


def _idf(n_docs: int, df: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def _topk_select(uniq: np.ndarray, scores: np.ndarray, k: int) -> np.ndarray:
    """Indices of the top-k by (score desc, doc_id asc), deterministic."""
    if uniq.size > k:
        part = np.argpartition(-scores, k - 1)[:k]
        # argpartition breaks ties arbitrarily → re-rank deterministically
        # over a widened candidate set: all docs with score >= kth score
        kth = scores[part].min()
        cand = np.flatnonzero(scores >= kth)
    else:
        cand = np.arange(uniq.size)
    return cand[np.lexsort((uniq[cand], -scores[cand]))[:k]]


def _make_scorer(k1: float, b: float, avgdl: float, k: int):
    """Scores one doc range for ALL queries in the batch.

    Each (term, range) posting row is varint-decoded exactly once and
    its tf-component cached; queries then gather their terms' arrays in
    sorted-term order (fixed float accumulation order ⇒ deterministic
    scores at any parallelism) and keep a local top-k.
    """

    def score_group(pdf: pd.DataFrame) -> pd.DataFrame:
        decoded: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        by_term = pdf.drop_duplicates("term")
        for term, doc_b, tf_b, dl_b in zip(
            by_term["term"], by_term["doc_ids"], by_term["tfs"], by_term["dls"]
        ):
            doc_ids = delta_varint_decode(doc_b)
            tfs = varint_decode(tf_b).astype(np.float64)
            dls = varint_decode(dl_b).astype(np.float64)
            decoded[term] = (
                doc_ids,
                (tfs * (k1 + 1.0)) / (tfs + k1 * (1.0 - b + b * dls / avgdl)),
            )
        out_q, out_id, out_s = [], [], []
        for qid, qpdf in pdf.groupby("query_id", sort=True):
            qpdf = qpdf.sort_values("term", kind="stable")
            ids_parts = [decoded[t][0] for t in qpdf["term"]]
            contrib_parts = [
                idf * decoded[t][1] for t, idf in zip(qpdf["term"], qpdf["idf"])
            ]
            all_ids = np.concatenate(ids_parts)
            uniq, inv = np.unique(all_ids, return_inverse=True)
            scores = np.zeros(uniq.size, dtype=np.float64)
            np.add.at(scores, inv, np.concatenate(contrib_parts))
            scores = np.round(scores, SCORE_DECIMALS)
            sel = _topk_select(uniq, scores, k)
            out_q.extend([qid] * sel.size)
            out_id.extend(uniq[sel].astype(np.int64).tolist())
            out_s.extend(scores[sel].tolist())
        return pd.DataFrame({"query_id": out_q, "doc_id": out_id, "score": out_s})

    return score_group


def score_queries(
    index: InvertedIndex,
    queries: list[tuple[int, list[str]]],
    k: int = 10,
    prune: bool = False,
    stats: dict | None = None,
) -> DataFrame:
    """Score a batch of (query_id, terms) → (query_id, doc_id, score, rank).

    The query-term table is tiny → broadcast; the postings scan is
    filtered by ``term IN (...)`` (pushed to parquet row groups).

    ``prune=True`` enables the block-max skip (WAND's safe pruning at
    doc-range granularity): every (query, range) has the JVM-computed
    upper bound ``Σ idf·max_tfnorm`` — phase A scores only each query's
    highest-bound range to establish a threshold τ (its k-th score);
    phase B decodes only ranges with ub > τ. Safe: a skipped range
    cannot contain a top-k doc by construction, so results are
    identical to the exhaustive path (asserted in tests). Worth it when
    ranges are many and selective (large corpora / rare terms); the
    exhaustive path has lower latency on small indexes, hence the flag.
    """
    spark = index.postings.sparkSession
    terms = sorted({t for _, ts in queries for t in ts})
    # dictionary rows for the query terms: tiny collect → idf map
    dict_rows = index.dictionary.filter(F.col("term").isin(terms)).collect()
    idf = {r["term"]: _idf(index.n_docs, int(r["df"])) for r in dict_rows}
    qt = spark.createDataFrame(
        [(qid, t, idf[t]) for qid, ts in queries for t in set(ts) if t in idf],
        "query_id long, term string, idf double",
    )
    postings = index.postings
    if index.n_buckets and "bucket" in postings.columns:
        # persisted index: prune whole bucket=N directories before the
        # scan (partition pruning) — only the query terms' buckets load
        bucket_rows = (
            spark.range(1)
            .select(
                *[
                    F.pmod(F.xxhash64(F.lit(t)), F.lit(index.n_buckets)).alias(f"b{i}")
                    for i, t in enumerate(terms)
                ]
            )
            .collect()[0]
        )
        buckets = sorted({int(v) for v in bucket_rows})
        postings = postings.filter(F.col("bucket").isin(buckets))
    matched = postings.filter(F.col("term").isin(terms)).join(
        F.broadcast(qt), "term"
    )
    scorer = _make_scorer(index.k1, index.b, index.avgdl, k)
    out_schema = "query_id long, doc_id long, score double"

    if prune:
        matched = matched.persist()
        # upper bound per (query, range) — pure Catalyst, no decode
        bounds = matched.groupBy("query_id", "range_id").agg(
            F.sum(F.col("idf") * F.col("max_tfnorm")).alias("ub")
        )
        wb = Window.partitionBy("query_id").orderBy(F.desc("ub"), F.asc("range_id"))
        best = bounds.withColumn("r", F.row_number().over(wb)).filter("r = 1")
        phase_a = (
            matched.join(
                F.broadcast(best.select("query_id", "range_id")),
                ["query_id", "range_id"],
                "left_semi",
            )
            .groupBy("range_id")
            .applyInPandas(scorer, out_schema)
        )
        # τ per query = k-th best score of its densest range (tiny collect)
        wt = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
        tau_rows = (
            phase_a.withColumn("r", F.row_number().over(wt))
            .filter(F.col("r") == k)
            .select("query_id", "score")
            .collect()
        )
        tau = {r["query_id"]: r["score"] for r in tau_rows}
        spark2 = matched.sparkSession
        tau_df = F.broadcast(
            spark2.createDataFrame(
                [(qid, tau.get(qid, float("-inf"))) for qid, _ in queries],
                "query_id long, tau double",
            )
        )
        # phase B: only ranges whose bound can reach τ (skip the rest
        # without ever decoding a varint). >= not >: a range with
        # ub == τ can still hold docs tying at τ that win the doc_id
        # tie-break (including the range that produced τ itself).
        # Phase A ranges re-score — idempotent deterministic scores.
        # τ carries SCORE_DECIMALS rounding (can exceed the exact bound
        # by half an ulp of the rounding grid when a doc attains the
        # bound exactly) → compare with that slack; only over-includes.
        slack = 10.0 ** (-SCORE_DECIMALS)
        survivors = (
            bounds.join(tau_df, "query_id").filter(
                F.col("ub") >= F.col("tau") - F.lit(slack)
            )
        )
        local = (
            matched.join(
                F.broadcast(survivors.select("query_id", "range_id")),
                ["query_id", "range_id"],
                "left_semi",
            )
            .groupBy("range_id")
            .applyInPandas(scorer, out_schema)
        )
        if stats is not None:  # opt-in skip-rate accounting (cheap: bounds is tiny)
            total = bounds.count()
            scored = survivors.count()
            stats.update(
                ranges_total=total,
                ranges_scored=scored,
                skip_rate=round(1.0 - scored / max(total, 1), 4),
            )
    else:
        local = matched.groupBy("range_id").applyInPandas(scorer, out_schema)

    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    result = (
        local.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )
    if prune:
        # materialize the (≤ queries × k rows) result, release the
        # matched-postings cache — a serving session must not
        # accumulate per-query executor cache (ADVICE r1 #4)
        result = result.localCheckpoint(eager=True)
        matched.unpersist(blocking=False)
    return result


def bm25_topk(index: InvertedIndex, terms: Iterable[str], k: int = 10) -> DataFrame:
    """Single-query convenience wrapper."""
    return score_queries(index, [(0, list(terms))], k).drop("query_id")
