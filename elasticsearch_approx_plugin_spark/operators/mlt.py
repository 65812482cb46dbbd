"""More-like-this queries: interesting-term selection + BM25 scoring.

ES's ``more_like_this`` query (``like_text`` form, the ES 0.90
surface) selects the "interesting" terms of the liked text — ranked
by tf·idf, thresholded by ``min_term_freq`` / ``min_doc_freq``,
capped at ``max_query_terms`` — and runs the selected disjunction
(Lucene ``MoreLikeThis``; with ES's default ``boost_terms`` off the
rewritten query is a plain unboosted bool-OR). Spark-first (see
``wildcard.py`` / ``fuzzy.py`` for the same relationship to the
reference, which is a facet pack with no query types of its own):

- the liked texts tokenize through the SAME Catalyst tokenizer as the
  index build (one tiny local-relation job — never a Python UDF), so
  selection sees exactly the indexed token stream;
- candidate stats come from one broadcast join of the (tiny) liked-
  term table against the index dictionary — df lookups never scan
  postings;
- selection is deterministic across engines: score = qtf · idf with
  the BM25 idf the scorers already use, rounded to 6 dp, ties broken
  by term order (Lucene's own priority queue breaks tf·idf ties
  arbitrarily; a distributed engine must not);
- scoring reuses ``bm25.score_queries`` on the selected term lists —
  bool-OR semantics with WAND / tombstones / bucket pruning
  inherited.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.small_df import small_df

from ..functions.tokenize import tokenize_ws
from .bm25 import score_queries
from .postings import InvertedIndex

# ES more_like_this defaults (0.90 era and unchanged since)
DEFAULT_MAX_QUERY_TERMS = 25
DEFAULT_MIN_TERM_FREQ = 2
DEFAULT_MIN_DOC_FREQ = 5


def _validated(queries: list[tuple[int, str]]) -> list[tuple[int, str]]:
    if not queries or any(not t or not str(t).strip() for _, t in queries):
        raise ValueError("like_text must be a non-empty string per query")
    return [(int(qid), str(t)) for qid, t in queries]


def _selection_df(
    index: InvertedIndex,
    queries: list[tuple[int, str]],
    max_query_terms: int,
    min_term_freq: int,
    min_doc_freq: int,
) -> DataFrame:
    """The interesting-term selection as a DataFrame (collected by
    :func:`mlt_select`; exposed separately so the plan is auditable).
    Output: (query_id, term) capped at ``max_query_terms`` per query."""
    spark = index.postings.sparkSession
    liked = small_df(spark, queries, "query_id long, like_text string")
    qtf = (
        liked.select(
            "query_id", F.explode(tokenize_ws("like_text")).alias("term")
        )
        .groupBy("query_id", "term")
        .agg(F.count("*").cast("double").alias("qtf"))
        .filter(F.col("qtf") >= min_term_freq)
    )
    idf = F.log(
        1.0
        + (F.lit(float(index.n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    # the liked-term table is tiny -> broadcast it INTO the dictionary
    # scan; df lookups never touch postings
    return (
        index.dictionary.join(F.broadcast(qtf), "term")
        .filter(F.col("df") >= min_doc_freq)
        .withColumn("sel_score", F.round(F.col("qtf") * idf, 6))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("sel_score").desc(), F.col("term")
                )
            ),
        )
        .filter(F.col("rn") <= max_query_terms)
        .select("query_id", "term")
    )


def mlt_select(
    index: InvertedIndex,
    queries: list[tuple[int, str]],
    max_query_terms: int = DEFAULT_MAX_QUERY_TERMS,
    min_term_freq: int = DEFAULT_MIN_TERM_FREQ,
    min_doc_freq: int = DEFAULT_MIN_DOC_FREQ,
) -> list[tuple[int, list[str]]]:
    """Select each query's interesting terms, tf·idf order (ties by
    term). Queries whose every term fails a threshold → []."""
    if max_query_terms < 1:
        raise ValueError(f"max_query_terms must be >= 1, got {max_query_terms}")
    if min_term_freq < 1 or min_doc_freq < 1:
        raise ValueError("min_term_freq and min_doc_freq must be >= 1")
    queries = _validated(queries)
    rows = _selection_df(
        index, queries, max_query_terms, min_term_freq, min_doc_freq
    ).collect()
    out: dict[int, list[str]] = {qid: [] for qid, _ in queries}
    for r in sorted(rows, key=lambda r: (r["query_id"], r["term"])):
        out[int(r["query_id"])].append(r["term"])
    return [(qid, terms) for qid, terms in out.items()]


def mlt_topk(
    index: InvertedIndex,
    queries: list[tuple[int, str]],
    k: int = 10,
    max_query_terms: int = DEFAULT_MAX_QUERY_TERMS,
    min_term_freq: int = DEFAULT_MIN_TERM_FREQ,
    min_doc_freq: int = DEFAULT_MIN_DOC_FREQ,
    prune: bool = False,
) -> DataFrame:
    """BM25 top-k for more_like_this queries: (query_id, doc_id,
    score, rank). Scores exactly like ``score_queries`` on the
    selected term list (unboosted bool-OR, ES ``boost_terms`` off);
    queries with no surviving terms yield no rows."""
    selected = [
        (qid, ts)
        for qid, ts in mlt_select(
            index, queries, max_query_terms, min_term_freq, min_doc_freq
        )
        if ts
    ]
    if not selected:
        spark = index.postings.sparkSession
        return spark.createDataFrame(
            [], "query_id long, doc_id long, score double, rank long"
        )
    return score_queries(index, selected, k, prune=prune)
