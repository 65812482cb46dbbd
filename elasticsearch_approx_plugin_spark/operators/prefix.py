"""Prefix queries: capped dictionary expansion + BM25 scoring.

ES exposes ``prefix`` / ``match_phrase_prefix`` queries that expand a
prefix against the term dictionary (in term order, capped by
``max_expansions``, default 50 in Lucene) and run the expanded
disjunction. The reference plugin itself has no query types (it is a
facet pack), but its facets run inside such queries; this module adds
the capability Spark-first:

- expansion is ONE dictionary scan with an OR-of-``startswith``
  predicate built from literals, so each ``StringStartsWith`` pushes
  into the parquet dictionary scan of a persisted index (no join, no
  regex); the per-query cap is a ``row_number`` over term order —
  Lucene's deterministic expansion order — and the collect is bounded
  by queries × max_expansions;
- scoring reuses ``bm25.score_queries`` on the expanded term lists —
  the expanded disjunction scores exactly like a bool-OR of term
  queries, so every downstream property (WAND pruning, tombstones,
  bucket pruning, rank determinism) is inherited, not re-implemented.

At 100 TB the dictionary is billions of terms; the cap is what keeps a
short prefix ("a") from expanding into a scan-sized disjunction —
same reason Lucene enforces it.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .bm25 import score_queries
from .postings import InvertedIndex

DEFAULT_MAX_EXPANSIONS = 50  # Lucene's max_expansions default


def prefix_expand(
    index: InvertedIndex,
    prefixes: list[tuple[int, str]],
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
) -> list[tuple[int, list[str]]]:
    """Expand each (query_id, prefix) against the dictionary: the first
    ``max_expansions`` matching terms in term (dictionary) order.
    Queries whose prefix matches nothing expand to []."""
    if max_expansions < 1:
        raise ValueError(f"max_expansions must be >= 1, got {max_expansions}")
    if not prefixes or any(not p for _, p in prefixes):
        raise ValueError("prefixes must be non-empty strings")
    cond = reduce(
        lambda a, b: a | b, [F.col("term").startswith(p) for _, p in prefixes]
    )
    # a term can match several queries' prefixes: assign via a literal
    # CASE array + explode, still one scan, no join
    matches = (
        index.dictionary.filter(cond)
        .select(
            "term",
            F.explode(
                F.filter(
                    F.array(
                        *[
                            F.when(F.col("term").startswith(p), F.lit(qid))
                            for qid, p in prefixes
                        ]
                    ),
                    lambda x: x.isNotNull(),
                )
            ).alias("query_id"),
        )
        .withColumn(
            "rn", F.row_number().over(Window.partitionBy("query_id").orderBy("term"))
        )
        .filter(F.col("rn") <= max_expansions)
        .select("query_id", "term")
        .collect()
    )
    out: dict[int, list[str]] = {int(qid): [] for qid, _ in prefixes}
    for r in sorted(matches, key=lambda r: (r["query_id"], r["term"])):
        out[int(r["query_id"])].append(r["term"])
    return [(qid, terms) for qid, terms in out.items()]


def prefix_topk(
    index: InvertedIndex,
    prefixes: list[tuple[int, str]],
    k: int = 10,
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
    prune: bool = False,
) -> DataFrame:
    """BM25 top-k for prefix queries: (query_id, doc_id, score, rank).
    The expanded disjunction scores exactly like ``score_queries`` on
    the expanded term list (bool-OR semantics); zero-match prefixes
    yield no rows."""
    expanded = [(qid, ts) for qid, ts in prefix_expand(index, prefixes, max_expansions) if ts]
    if not expanded:
        spark = index.postings.sparkSession
        return spark.createDataFrame(
            [], "query_id long, doc_id long, score double, rank long"
        )
    return score_queries(index, expanded, k, prune=prune)
