"""Span (proximity) queries: ``span_near`` and ``span_first``.

The reference plugin has no span support (ES 0.90 exposes Lucene's
SpanQuery family — SpanNearQuery / SpanFirstQuery — through the query
DSL, outside the plugin's facet SPIs); this module adds the proximity
capability the same way :mod:`phrase` adds adjacency: candidates come
from the NON-positional index (docs containing all clause terms — a
postings intersection), and the positional predicate is verified
row-locally on the candidate docs' token arrays. No position streams
are stored, encoded, or merged.

Semantics (Lucene, for single-term clauses — the portable core; ES
0.90's own span clauses are span_term compositions):

- ``span_near(terms, slop, in_order)``: a document matches when there
  is a choice of one occurrence position per clause term such that the
  covering interval wastes at most ``slop`` positions —
  ``max(p) - min(p) + 1 - m <= slop`` — with strictly increasing
  positions when ``in_order``.  Equivalently (and this is how the
  row-local verify runs): some token window of length ``m + slop``
  contains every clause term with its required multiplicity
  (unordered) or as a subsequence (ordered).  The equivalence is
  exact: any valid match lies inside the window starting at its
  minimum position, and any window witness has span <= m + slop.
- ``span_first(term, end)``: the term occurs among the first ``end``
  tokens (Lucene SpanFirstQuery: span.end() <= end, and a term span at
  0-based position p has end p+1).

100 TB design notes (same shape as :mod:`phrase`):

- candidate generation reads only the clause terms' postings (term IN
  pushdown + bucket pruning on persisted indexes) and is the ONLY
  distributed work besides the final top-k window;
- the verify is a pure Catalyst higher-order expression — nested
  ``exists``/``aggregate`` lambdas over the token array, no Python, no
  shuffle; per-row cost O(n_tokens × (m + slop)) on candidate docs
  only;
- scoring reuses :func:`phrase.phrase_topk`'s row-local BM25 fold, so
  the ranked variant adds no postings pass and no scoring join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.small_df import small_df, spread_small_input, width_partitioned
from .bm25 import _idf
from .phrase import _candidates, _validated
from .postings import InvertedIndex


def _window_starts(toks: Column) -> Column:
    return F.sequence(F.lit(1), F.greatest(F.size(toks), F.lit(1)))


def _ordered_hit(toks: Column, qterms: Column, length: Column) -> Column:
    """True iff some token window of ``length`` contains ``qterms`` as
    a subsequence (greedy pointer fold — greedy is exact for
    subsequence existence)."""
    m = F.size(qterms)

    def window_ok(i: Column) -> Column:
        s = F.slice(toks, i, length)
        matched = F.aggregate(
            s,
            F.lit(0),
            lambda acc, x: F.when(
                (acc < m) & (x == F.element_at(qterms, acc + 1)), acc + 1
            ).otherwise(acc),
        )
        return matched == m

    return F.exists(_window_starts(toks), window_ok)


def _unordered_hit(toks: Column, qcounts: Column, length: Column) -> Column:
    """True iff some token window of ``length`` contains every clause
    term with its required multiplicity; ``qcounts`` is
    ``array<struct<term: string, cnt: int>>``."""

    def window_ok(i: Column) -> Column:
        s = F.slice(toks, i, length)
        return F.forall(
            qcounts,
            lambda e: F.size(F.filter(s, lambda x: x == e["term"])) >= e["cnt"],
        )

    return F.exists(_window_starts(toks), window_ok)


def _span_payload(spark, queries, slop: int, in_order: bool):
    rows = []
    for qid, terms in queries:
        counts: dict[str, int] = {}
        for t in terms:
            counts[t] = counts.get(t, 0) + 1
        rows.append(
            (qid, terms, sorted(counts.items()), len(terms) + slop)
        )
    return small_df(spark, 
        rows,
        "query_id long, qterms array<string>, "
        "qcounts array<struct<term: string, cnt: int>>, length int",
    )


def span_near_match(
    index: InvertedIndex,
    corpus: DataFrame,
    queries: list[tuple[int, list[str]]],
    slop: int = 0,
    in_order: bool = False,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """(query_id, doc_id) for every live document matching the
    span_near predicate; ``queries`` = [(query_id, clause terms)]."""
    if slop < 0:
        raise ValueError(f"slop must be >= 0, got {slop}")
    queries = _validated(queries)
    spark = index.postings.sparkSession
    cand = _candidates(index, queries)
    payload = _span_payload(spark, queries, slop, in_order)
    docs = spread_small_input(  # input-skew guard, no-op when split
        corpus.select(F.col(id_col).alias("doc_id"), F.col(tokens_col).alias("_toks"))
    )
    toks, length = F.col("_toks"), F.col("length")
    hit = (
        _ordered_hit(toks, F.col("qterms"), length)
        if in_order
        else _unordered_hit(toks, F.col("qcounts"), length)
    )
    # the verify/score HOFs are CPU-dense per candidate row while the
    # candidate bytes are tiny — without an explicit width AQE coalesces
    # the intersection exchange to 1-2 tasks and the verify serializes
    # (guide §2.5/§4; measured 3.2 s single-task stage at sf0.1)
    cand = width_partitioned(cand, "doc_id")
    return (
        cand.join(docs, "doc_id")
        .join(F.broadcast(payload), "query_id")
        .filter(hit)
        .select("query_id", "doc_id")
    )


def span_first_match(
    index: InvertedIndex,
    corpus: DataFrame,
    queries: list[tuple[int, str]],
    end: int,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """(query_id, doc_id) for live documents whose first ``end`` tokens
    contain the query term (Lucene SpanFirstQuery over a span_term)."""
    if end < 1:
        raise ValueError(f"end must be >= 1, got {end}")
    qlist = [(int(qid), [str(t)]) for qid, t in queries]
    spark = index.postings.sparkSession
    cand = _candidates(index, qlist)
    payload = small_df(spark, 
        [(qid, p[0]) for qid, p in qlist], "query_id long, qterm string"
    )
    docs = spread_small_input(  # input-skew guard, no-op when split
        corpus.select(F.col(id_col).alias("doc_id"), F.col(tokens_col).alias("_toks"))
    )
    hit = F.array_position(
        F.slice(F.col("_toks"), 1, end), F.col("qterm")
    ) > 0
    # the verify/score HOFs are CPU-dense per candidate row while the
    # candidate bytes are tiny — without an explicit width AQE coalesces
    # the intersection exchange to 1-2 tasks and the verify serializes
    # (guide §2.5/§4; measured 3.2 s single-task stage at sf0.1)
    cand = width_partitioned(cand, "doc_id")
    return (
        cand.join(docs, "doc_id")
        .join(F.broadcast(payload), "query_id")
        .filter(hit)
        .select("query_id", "doc_id")
    )


def span_near_topk(
    index: InvertedIndex,
    corpus: DataFrame,
    queries: list[tuple[int, list[str]]],
    k: int = 10,
    slop: int = 0,
    in_order: bool = False,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Span-filtered BM25 top-k: (query_id, doc_id, score, rank) —
    exactly ``score_queries(index, clause terms)`` re-ranked over the
    span_near match set, same contract as :func:`phrase.phrase_topk`
    (identical idf/tfnorm arithmetic, 6-dp rounding, ties by doc_id),
    computed row-locally on the candidate docs' token arrays."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if slop < 0:
        raise ValueError(f"slop must be >= 0, got {slop}")
    queries = _validated(queries)
    spark = index.postings.sparkSession
    cand = _candidates(index, queries)
    cache = index.term_cache  # warm after _candidates
    rows = []
    for qid, terms in queries:
        counts: dict[str, int] = {}
        for t in terms:
            counts[t] = counts.get(t, 0) + 1
        qidf = [
            (t, _idf(index.n_docs, cache[t][0]))
            for t in sorted(set(terms))
            if cache[t][0] > 0
        ]
        rows.append((qid, terms, sorted(counts.items()), len(terms) + slop, qidf))
    payload = small_df(spark, 
        rows,
        "query_id long, qterms array<string>, "
        "qcounts array<struct<term: string, cnt: int>>, length int, "
        "qidf array<struct<term: string, idf: double>>",
    )
    docs = spread_small_input(  # input-skew guard, no-op when split
        corpus.select(F.col(id_col).alias("doc_id"), F.col(tokens_col).alias("_toks"))
    )
    toks, length = F.col("_toks"), F.col("length")
    hit = (
        _ordered_hit(toks, F.col("qterms"), length)
        if in_order
        else _unordered_hit(toks, F.col("qcounts"), length)
    )
    avgdl = index.avgdl or 1.0
    k1, b = index.k1, index.b
    dl = F.size(toks).cast("double")

    def _contrib(s: Column) -> Column:
        tf = F.size(F.filter(toks, lambda x: x == s["term"])).cast("double")
        return s["idf"] * (tf * (k1 + 1.0)) / (
            tf + k1 * (1.0 - b + b * dl / F.lit(avgdl))
        )

    score = F.round(
        F.aggregate(F.col("qidf"), F.lit(0.0), lambda acc, s: acc + _contrib(s)), 6
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    # the verify/score HOFs are CPU-dense per candidate row while the
    # candidate bytes are tiny — without an explicit width AQE coalesces
    # the intersection exchange to 1-2 tasks and the verify serializes
    # (guide §2.5/§4; measured 3.2 s single-task stage at sf0.1)
    cand = width_partitioned(cand, "doc_id")
    return (
        cand.join(docs, "doc_id")
        .join(F.broadcast(payload), "query_id")
        .filter(hit)
        .select("query_id", "doc_id", score.alias("score"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )
