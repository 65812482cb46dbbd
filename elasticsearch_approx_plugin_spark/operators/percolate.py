"""Percolator — reverse search (the ES ``percolate`` API).

ES 0.90 ships the percolator: queries are REGISTERED (an index of
queries), and each incoming document returns the ids of the queries
it matches — the alerting / routing / classification primitive.  The
reference plugin's deployments sit on the same API surface, so this
module re-expresses the percolator Spark-first for the BATCH shape
(percolate a micro-batch or backfill of documents against the whole
registered-query table at once — the shape a cluster actually runs,
vs ES's one-doc-per-call loop):

- registered queries are rows ``(query_id, terms, operator, msm)``
  with ES ``match``-query semantics: ``operator="and"`` requires every
  distinct term, ``"or"`` requires ``minimum_should_match`` distinct
  terms (default 1);
- matching is ONE join: exploded (query_id, term) pairs against the
  documents' DISTINCT tokens, then a (doc_id, query_id) groupBy
  counts matched terms and the and/or/msm predicate gates — the exact
  inverted-intersection shape of ``phrase._candidates``, with the
  roles of query and corpus swapped;
- scale: the registered-query side is millions of rows at most
  (queries × terms) — it BROADCASTS when small (the common alerting
  case) and falls back to a plain uniform-key shuffle join on term
  when not; the doc side never moves twice.  A hot term appearing in
  many queries multiplies only that term's candidate rows — the
  groupBy key (doc_id, query_id) stays uniform.

Per-query metadata (``operator``/``msm``) rides the exploded rows as
constants, so the gate predicate is a HAVING on the groupBy — no
second join (the ``phrase._candidates`` trick).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.small_df import small_df, spread_small_input


def register_queries(
    spark, queries: list[tuple[int, list[str], str, int | None]]
) -> DataFrame:
    """Validate and shape registered queries →
    ``(query_id, term, n_terms, min_match)`` exploded rows.

    ``queries``: (query_id, terms, operator, minimum_should_match)
    tuples; ``operator`` ``"and"`` or ``"or"``; ``msm`` only with
    ``"or"`` (None → 1).  Duplicate terms within a query collapse
    (match queries count DISTINCT matched terms).
    """
    if not queries:
        raise ValueError("percolator needs at least one registered query")
    rows = []
    seen = set()
    for qid, terms, operator, msm in queries:
        if qid in seen:
            raise ValueError(f"duplicate query_id {qid}")
        seen.add(qid)
        uniq = sorted({str(t) for t in terms if str(t)})
        if not uniq:
            raise ValueError(f"query {qid}: terms must be non-empty")
        if operator == "and":
            if msm is not None:
                raise ValueError(f"query {qid}: msm only applies to operator='or'")
            need = len(uniq)
        elif operator == "or":
            need = 1 if msm is None else int(msm)
            if not 1 <= need <= len(uniq):
                raise ValueError(
                    f"query {qid}: msm must be in [1, {len(uniq)}], got {need}"
                )
        else:
            raise ValueError(f"query {qid}: operator must be and/or, got {operator!r}")
        rows.extend((int(qid), t, len(uniq), need) for t in uniq)
    return small_df(spark, 
        rows, "query_id long, term string, n_terms int, min_match int"
    )


def percolate(
    docs: DataFrame,
    registered: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    broadcast_queries: bool | None = None,
) -> DataFrame:
    """Match every doc against every registered query →
    ``(doc_id, query_id)`` rows, one per match.

    ``registered``: the output of :func:`register_queries` (or any
    table with its schema — e.g. one PERSISTED once and read back,
    the registered-queries-index posture).  ``broadcast_queries=True``
    forces the broadcast; ``False``/``None`` defer to Spark's
    threshold and AQE (no hint is emitted — ADVICE r6).
    """
    doc_terms = spread_small_input(  # input-skew guard, no-op when split
        docs.select(F.col(id_col).alias("doc_id"), F.col(tokens_col))
    ).select(
        "doc_id",
        F.explode(F.array_distinct(F.col(tokens_col))).alias("term"),
    )
    q = registered
    if broadcast_queries is True:
        q = F.broadcast(q)
    matched = (
        doc_terms.join(q, "term")
        .groupBy("doc_id", "query_id")
        .agg(
            F.count("*").alias("_hit"),
            F.min("min_match").alias("_need"),
        )
        .filter(F.col("_hit") >= F.col("_need"))
        .select("doc_id", "query_id")
    )
    return matched
