"""Core ES facet family — terms / statistical / histogram / range /
terms_stats.

The reference plugin (/root/reference) registers its date and term-list
facets alongside Elasticsearch 0.90's built-in facet module
(``README.md`` shows them issued in the same ``facets`` request block),
so a user of the reference runs these five core facets in the very same
queries.  This module re-expresses the 0.90 built-in facet semantics
Spark-first; each facet lowers to ONE key shuffle (a ``groupBy`` on the
facet key), with every summary statistic either folded into the same
aggregate or carried by a broadcast of a single-row summary.

Semantics mirrored from the public ES 0.90 facet module:

- **terms**: per-term document counts over a (possibly multi-valued)
  field.  Lucene fielddata stores each document's values as a distinct
  ordinal set, so a term is counted ONCE per document that contains it
  (``array_distinct`` before the explode).  The response carries
  ``missing`` (docs with no value), ``total`` (sum of counts over ALL
  collected terms) and ``other`` (``total`` minus the returned
  entries' counts).  ``exclude``-ed terms are skipped at collection
  time — they contribute to none of the three.  ``order`` grammar:
  ``count`` (desc), ``term`` (asc), ``reverse_count``, ``reverse_term``;
  ES leaves count ties unspecified, we define term-ascending so the
  top-``size`` cut is deterministic on any cluster size.
- **statistical**: count/total/min/max/mean/sum_of_squares plus
  POPULATION variance ``sumsq/n − mean²`` and its square root, exactly
  the running-sums formula the ES ``StatisticalFacetExecutor`` uses.
- **histogram**: bucket key ``floor(value / interval) * interval`` (a
  ``long``, floor — not truncate-toward-zero — so negative values land
  one bucket LOW, matching both ES and the engine's TimeValue date
  buckets).  With a ``value_field``: per-bucket ``total_count``, min,
  max, total, mean over the value field.  Empty buckets are absent.
- **range**: half-open ``[from, to)`` intervals; either bound may be
  absent.  Ranges may OVERLAP — a document contributes to every range
  that contains it, which rules out a single group-by key; we explode
  a per-row array of matching range indices instead (no join — the
  range list is a literal in the plan).
- **terms_stats**: per-key stats over a value field — ``count`` (docs),
  ``total_count`` (non-null values), min/max/total/mean — with the
  terms-facet order grammar extended by ``total``, ``min``, ``max``,
  ``mean`` (each descending, term-ascending ties) and ``size=0``
  meaning ALL terms (``all_terms``-style).

Each facet returns ONE DataFrame rendering the full ES response
payload: entry columns plus the response-level ``missing`` / ``total``
/ ``other`` repeated per row (a denormalized but hash-stable rendering
— the driver's oracle recomputes every column).  Doubles are rounded
to 6 dp at the edge, the repo-wide oracle convention.

Scale: the only wide exchange per facet is the groupBy on the facet
key.  Entry selection (top-``size``) lowers to TakeOrderedAndProject —
no global sort.  Summary rows (1 row) ride a broadcast cross join.
The range facet's membership test is a per-row filter over a literal
array of range structs — zero extra exchanges, cost |ranges| per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.small_df import small_df

_ORDERS = {
    "count": lambda ent: [F.col("count").desc(), F.col("term").asc()],
    "reverse_count": lambda ent: [F.col("count").asc(), F.col("term").asc()],
    "term": lambda ent: [F.col("term").asc()],
    "reverse_term": lambda ent: [F.col("term").desc()],
}

_STATS_ORDERS = {"total", "min", "max", "mean"}


def _term_rows(df: DataFrame, field: str) -> DataFrame:
    """One row per (doc, distinct term), with a NULL term standing in
    for a document that has no value — so a single groupBy yields both
    the per-term counts and the ``missing`` total."""
    c = F.col(field)
    if isinstance(df.schema[field].dataType, T.ArrayType):
        vals = F.when(
            c.isNull() | (F.size(c) == 0), F.array(F.lit(None).cast("string"))
        ).otherwise(F.array_distinct(c.cast("array<string>")))
    else:
        # a NULL scalar survives the array wrap as [NULL]
        vals = F.array(c.cast("string"))
    return df.select(F.explode(vals).alias("term"))


def terms_facet(
    df: DataFrame,
    field: str,
    size: int = 10,
    order: str = "count",
    exclude: tuple[str, ...] = (),
) -> DataFrame:
    """ES terms facet → (term, count, total, other, missing).

    ``total``/``other``/``missing`` are response-level values repeated
    per entry row.  One shuffle (groupBy term); the summary is an
    aggregate OF the grouped result (partial-aggregated, tiny) and
    returns via a single-row broadcast.
    """
    if order not in _ORDERS:
        raise ValueError(f"order must be one of {sorted(_ORDERS)}, got {order!r}")
    if size <= 0:
        raise ValueError("terms facet size must be positive")
    counts = _term_rows(df, field).groupBy("term").agg(F.count("*").alias("count"))
    if exclude:
        counts = counts.filter(
            F.col("term").isNull() | ~F.col("term").isin(list(exclude))
        )
    # no cache: entries and summary consume the SAME exchange and AQE
    # reuses it (ReusedExchange); an explicit cache leaked storage across
    # facet calls in a long-lived session (ADVICE r6) and cost an extra
    # materialization pass per call
    summary = counts.agg(
        F.coalesce(F.sum(F.when(F.col("term").isNotNull(), F.col("count"))), F.lit(0))
        .cast("long")
        .alias("total"),
        F.coalesce(F.sum(F.when(F.col("term").isNull(), F.col("count"))), F.lit(0))
        .cast("long")
        .alias("missing"),
    )
    entries = (
        counts.filter(F.col("term").isNotNull())
        .orderBy(*_ORDERS[order](None))
        .limit(size)
    )
    ret_sum = entries.agg(
        F.coalesce(F.sum("count"), F.lit(0)).cast("long").alias("__returned__")
    )
    return (
        entries.crossJoin(F.broadcast(summary))
        .crossJoin(F.broadcast(ret_sum))
        .select(
            "term",
            "count",
            "total",
            (F.col("total") - F.col("__returned__")).alias("other"),
            "missing",
        )
    )


def statistical_facet(df: DataFrame, field: str) -> DataFrame:
    """ES statistical facet → one row of the running-sums statistics.

    A single partial-aggregating job; NULLs are skipped (ES collects
    only docs with a value).  Variance is the population form
    ``sumsq/n − mean²`` computed from the same running sums the ES
    executor keeps, THEN rounded — not Spark's sample ``var_samp``.
    """
    c = F.col(field).cast("double")
    agg = df.agg(
        F.count(c).alias("count"),
        F.sum(c).alias("_total"),
        F.min(c).alias("_min"),
        F.max(c).alias("_max"),
        F.sum(c * c).alias("_sumsq"),
    )
    mean = F.col("_total") / F.col("count")
    var = F.col("_sumsq") / F.col("count") - mean * mean
    # clamp: running-sums variance can go epsilon-negative on constant
    # columns; ES reports 0 there (sqrt of a negative would NaN)
    var = F.greatest(var, F.lit(0.0))
    return agg.select(
        F.col("count").cast("long").alias("count"),
        F.round("_total", 6).alias("total"),
        F.round("_min", 6).alias("min"),
        F.round("_max", 6).alias("max"),
        F.round(mean, 6).alias("mean"),
        F.round("_sumsq", 6).alias("sum_of_squares"),
        F.round(var, 6).alias("variance"),
        F.round(F.sqrt(var), 6).alias("std_deviation"),
    )


def histogram_facet(
    df: DataFrame,
    key_field: str,
    interval: float,
    value_field: str | None = None,
) -> DataFrame:
    """ES histogram facet → (key, count[, total_count, min, max, total,
    mean]).

    ``key = floor(key_field / interval) * interval`` cast to long —
    floor, so negative keys bucket LOW (the same pre-1970 posture as
    the engine's date buckets; an intentional divergence from ES
    0.90's ``(long)(value/interval)*interval``, which truncates toward
    zero and lands negative values one bucket HIGH — ADVICE r6).
    One groupBy on the bucket key.
    """
    if interval <= 0:
        raise ValueError("histogram interval must be positive")
    k = F.col(key_field).cast("double")
    # the long key is FLOOR of the bucket start, not a long cast: for a
    # fractional interval the start (e.g. -14 × 10.33 = -144.62) is not
    # integral, and a cast truncates toward zero in Spark but rounds in
    # other engines — floor is the one convention every engine shares
    # (exact-product intervals are unaffected)
    key = F.floor(F.floor(k / F.lit(float(interval))) * F.lit(interval))
    base = df.filter(k.isNotNull()).select(
        key.alias("key"),
        *([F.col(value_field).cast("double").alias("__v__")] if value_field else []),
    )
    if value_field is None:
        return base.groupBy("key").agg(F.count("*").alias("count"))
    v = F.col("__v__")
    return base.groupBy("key").agg(
        F.count("*").alias("count"),
        F.count(v).alias("total_count"),
        F.round(F.min(v), 6).alias("min"),
        F.round(F.max(v), 6).alias("max"),
        F.round(F.sum(v), 6).alias("total"),
        F.round(F.sum(v) / F.count(v), 6).alias("mean"),
    )


def range_facet(
    df: DataFrame,
    field: str,
    ranges: list[tuple[float | None, float | None]],
    value_field: str | None = None,
) -> DataFrame:
    """ES range facet → one row per range: (range_from, range_to,
    count, total_count, min, max, total, mean).

    Half-open ``[from, to)``; a document lands in EVERY range that
    contains it (ranges may overlap), so membership is an exploded
    per-row filter over a literal array of range indices — no join, no
    extra exchange; the one shuffle is the groupBy on the range index.
    Empty ranges still appear (count 0, NULL stats), matching the ES
    response, via a right join against the tiny literal range table.
    """
    if not ranges:
        raise ValueError("range facet needs at least one range")
    for lo, hi in ranges:
        if lo is None and hi is None:
            raise ValueError("a range must have at least one bound")
        if lo is not None and hi is not None and not lo < hi:
            raise ValueError(f"empty range [{lo}, {hi})")
    k = F.col(field).cast("double")
    val = F.col(value_field).cast("double") if value_field else k

    def member(i: int) -> Column:
        lo, hi = ranges[i]
        cond = k.isNotNull()
        if lo is not None:
            cond = cond & (k >= F.lit(float(lo)))
        if hi is not None:
            cond = cond & (k < F.lit(float(hi)))
        return cond

    hits = F.filter(
        F.array(*[F.when(member(i), F.lit(i)) for i in range(len(ranges))]),
        lambda x: x.isNotNull(),
    )
    grouped = (
        df.select(F.explode(hits).alias("__r__"), val.alias("__v__"))
        .groupBy("__r__")
        .agg(
            F.count("*").alias("count"),
            F.count("__v__").alias("total_count"),
            F.round(F.min("__v__"), 6).alias("min"),
            F.round(F.max("__v__"), 6).alias("max"),
            F.round(F.sum("__v__"), 6).alias("total"),
            F.round(F.sum("__v__") / F.count("__v__"), 6).alias("mean"),
        )
    )
    spark = df.sparkSession
    spec = small_df(spark, 
        [(i, lo, hi) for i, (lo, hi) in enumerate(ranges)],
        T.StructType(
            [
                T.StructField("__r__", T.IntegerType(), False),
                T.StructField("range_from", T.DoubleType(), True),
                T.StructField("range_to", T.DoubleType(), True),
            ]
        ),
    )
    return (
        grouped.join(F.broadcast(spec), "__r__", "right")
        .select(
            "range_from",
            "range_to",
            F.coalesce(F.col("count"), F.lit(0)).cast("long").alias("count"),
            F.coalesce(F.col("total_count"), F.lit(0)).cast("long").alias("total_count"),
            "min",
            "max",
            "total",
            "mean",
        )
    )


def filter_facet(df: DataFrame, predicate: Column) -> DataFrame:
    """ES filter facet → one row ``(count)``: how many docs in the
    facet scope match the filter. A single partial-aggregating count —
    the predicate fuses into the scan (pushdown-eligible)."""
    return df.filter(predicate).agg(F.count("*").cast("long").alias("count"))


def query_facet(df: DataFrame, predicate: Column) -> DataFrame:
    """ES query facet — identical to :func:`filter_facet` here: the
    0.90 query facet counts query-matched docs, and this engine lowers
    filter-context queries to predicates (``lower_query``); scored
    queries have no count-changing effect."""
    return filter_facet(df, predicate)


def terms_stats_facet(
    df: DataFrame,
    key_field: str,
    value_field: str,
    size: int = 10,
    order: str = "count",
) -> DataFrame:
    """ES terms_stats facet → (term, count, total_count, min, max,
    total, mean, missing).

    ``count`` counts documents per key; ``total_count`` the non-null
    values among them.  ``missing`` (docs with a NULL key) repeats per
    row.  ``size=0`` returns every term (ES ``all_terms`` posture).
    Order grammar = terms facet's four plus total/min/max/mean, each
    descending with the deterministic term-ascending tie.
    """
    if order not in _ORDERS and order not in _STATS_ORDERS:
        raise ValueError(
            f"order must be one of {sorted(set(_ORDERS) | _STATS_ORDERS)}, got {order!r}"
        )
    if size < 0:
        raise ValueError("terms_stats size must be >= 0 (0 = all terms)")
    key = F.col(key_field).cast("string")
    v = F.col(value_field).cast("double")
    grouped = (
        df.select(key.alias("term"), v.alias("__v__"))
        .groupBy("term")
        .agg(
            F.count("*").alias("count"),
            F.count("__v__").alias("total_count"),
            F.round(F.min("__v__"), 6).alias("min"),
            F.round(F.max("__v__"), 6).alias("max"),
            F.round(F.sum("__v__"), 6).alias("total"),
            F.round(F.sum("__v__") / F.count("__v__"), 6).alias("mean"),
        )
        # no cache: all consumers share the one exchange via AQE
        # ReusedExchange (see terms_facet) — ADVICE r6
    )
    missing = grouped.agg(
        F.coalesce(F.sum(F.when(F.col("term").isNull(), F.col("count"))), F.lit(0))
        .cast("long")
        .alias("missing")
    )
    entries = grouped.filter(F.col("term").isNotNull())
    if order in _ORDERS:
        entries = entries.orderBy(*_ORDERS[order](None))
    else:
        entries = entries.orderBy(F.col(order).desc(), F.col("term").asc())
    if size:
        entries = entries.limit(size)
    return entries.crossJoin(F.broadcast(missing))
