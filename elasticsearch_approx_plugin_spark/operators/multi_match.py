"""Multi-field search: ES ``multi_match`` over per-field indexes.

ES indexes every field separately (own postings, own length norms,
own df) and ``multi_match`` runs the analyzed text against a list of
fields, combining per-field scores:

- ``best_fields`` (the ES default, Lucene DisjunctionMaxQuery):
  score = max over fields + ``tie_breaker`` · (sum of the others);
- ``most_fields``: score = sum over fields.

Spark-first composition (the reference is a facet pack with no query
types of its own): each field is its own :class:`InvertedIndex` —
exactly ES's per-field postings — and this operator unions the
per-field BM25 results (every field scored by the SAME
``score_queries`` scorer against its own corpus statistics, boosts
applied per field) and reduces per (query, doc) in one uniform-key
aggregation. Per-field scoring runs UNCAPPED (the scorers compute all
scores before their group-limit anyway), because a top-k-per-field
union under-counts ``most_fields`` — a doc ranked k+1 in two fields
can out-sum a doc ranked k in one.

Scores are combined on the 6-dp-rounded per-field values and
re-rounded, which is what makes the DuckDB oracle reproduce the
result bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.rounding import round6_oracle
from .bm25 import score_queries
from .postings import InvertedIndex

MATCH_TYPES = ("best_fields", "most_fields")


def multi_match_topk(
    indexes: dict[str, InvertedIndex],
    queries: list[tuple[int, list[str]]],
    k: int = 10,
    match_type: str = "best_fields",
    tie_breaker: float = 0.0,
    boosts: dict[str, float] | None = None,
) -> DataFrame:
    """Multi-field BM25 top-k: (query_id, doc_id, score, rank).

    ``indexes`` maps field name → that field's index (same doc-id
    space). Every query's terms run against every field; a term absent
    from a field's dictionary contributes nothing there. Documents
    matching no field in no term yield no rows.
    """
    if not indexes:
        raise ValueError("multi_match needs at least one field index")
    if match_type not in MATCH_TYPES:
        raise ValueError(f"match_type must be one of {MATCH_TYPES}, got {match_type!r}")
    if not (0.0 <= tie_breaker <= 1.0):
        raise ValueError(f"tie_breaker must be in [0, 1], got {tie_breaker}")
    unknown = set(boosts or {}) - set(indexes)
    if unknown:
        raise ValueError(f"boost for unindexed field(s) {sorted(unknown)}")
    parts = []
    for fld in sorted(indexes):
        idx = indexes[fld]
        b = float((boosts or {}).get(fld, 1.0))
        scored = score_queries(idx, queries, idx.n_docs, ranked=False)
        parts.append(
            scored.select(
                "query_id",
                "doc_id",
                (F.col("score") * F.lit(b)).alias("fscore"),
            )
        )
    union = parts[0]
    for p in parts[1:]:
        union = union.unionByName(p)
    agg = union.groupBy("query_id", "doc_id").agg(
        F.max("fscore").alias("best"), F.sum("fscore").alias("total")
    )
    if match_type == "most_fields":
        combined = F.col("total")
    else:
        combined = F.col("best") + F.lit(float(tie_breaker)) * (
            F.col("total") - F.col("best")
        )
    return (
        agg.select("query_id", "doc_id", round6_oracle(combined).alias("score"))
        .withColumn(
            "rank",
            F.row_number()
            .over(
                Window.partitionBy("query_id").orderBy(
                    F.col("score").desc(), F.col("doc_id")
                )
            )
            .cast("long"),
        )
        .filter(F.col("rank") <= k)
    )
