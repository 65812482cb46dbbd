"""Streaming percolator — continuous alert matching.

The batch percolator (``operators.percolate``) joins exploded doc
terms against the registered-query table — right when the rule set is
large. A STREAM of documents wants the opposite trade: the rule set
is small (alerting deployments run thousands of rules, not millions)
and the matcher must be STATELESS so it runs in append mode with no
watermark, no state store, and no shuffle. This module evaluates the
rules per-row:

- the registered queries collect ONCE driver-side and ride the plan
  as a literal ``array<struct<query_id, terms, need>>`` (the
  broadcast-rules posture every streaming alerting engine uses);
- per document: ``size(array_intersect(array_distinct(tokens),
  q.terms)) >= q.need`` — distinct-matched-term counting, the exact
  and/or/msm semantics of the batch operator (asserted equal in
  tests) — then ``explode`` of the matching ids;
- a pure Catalyst projection: works identically on a batch or
  streaming DataFrame, append mode, zero exchanges added.

Above ~thousands of rules the literal plan grows too large — use the
batch join operator inside ``foreachBatch`` instead (documented
trade; this module raises past ``MAX_LITERAL_RULES``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_LITERAL_RULES = 5000


def streaming_percolate(
    stream: DataFrame,
    registered: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Match each arriving doc against the registered queries →
    ``(doc_id, query_id)`` append rows.

    ``registered``: the :func:`operators.percolate.register_queries`
    output (exploded rows) — re-grouped and collected here (bounded:
    one row per registered query).
    """
    rules = (
        registered.groupBy("query_id")
        .agg(
            F.collect_set("term").alias("terms"),
            F.min("min_match").alias("need"),
        )
        .collect()
    )
    if not rules:
        raise ValueError("percolator needs at least one registered query")
    if len(rules) > MAX_LITERAL_RULES:
        raise ValueError(
            f"{len(rules)} rules exceed the literal-plan cap "
            f"({MAX_LITERAL_RULES}); percolate per micro-batch with the "
            "batch join operator via foreachBatch instead"
        )
    lit_rules = F.array(
        *[
            F.struct(
                F.lit(int(r["query_id"])).cast("long").alias("query_id"),
                F.array(*[F.lit(t) for t in sorted(r["terms"])]).alias("terms"),
                F.lit(int(r["need"])).alias("need"),
            )
            for r in rules
        ]
    )
    toks = F.array_distinct(F.col(tokens_col))
    hits = F.filter(
        lit_rules,
        lambda q: F.size(F.array_intersect(toks, q["terms"])) >= q["need"],
    )
    return stream.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.transform(hits, lambda q: q["query_id"])).alias("query_id"),
    )
