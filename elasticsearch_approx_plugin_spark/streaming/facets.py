"""Structured Streaming date facets.

The reference is strictly query-time (facets re-run per search;
SURVEY.md §2.2 "Streaming: none"), but its mergeable-sketch design is
a commutative monoid — which is exactly what incremental streaming
aggregation needs. This module is the forward-looking port: tumbling
windows ≙ date-facet buckets, watermark ≙ bucket finalization,
``approx_count_distinct`` ≙ the tipped (HLL) regime of
CountThenEstimate. State stays bounded because the watermark expires
per-window aggregation state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_INTERVAL_SQL = {
    "day": "1 day",
    "hour": "1 hour",
    "minute": "1 minute",
    "second": "1 second",
}


def streaming_date_facet(
    stream: DataFrame,
    key_field: str,
    interval: str,
    slice_field: str | None = None,
    distinct_field: str | None = None,
    rsd: float = 0.05,
    watermark: str = "1 hour",
) -> DataFrame:
    """Windowed facet over a streaming DataFrame.

    Returns ``time`` (window start), optional ``term`` slice, ``cnt``
    and (if ``distinct_field``) an HLL ``distinct_cnt`` — the
    streaming analog of :func:`..operators.date_facet.date_facet`
    counting/sliced/distinct modes in append mode.
    """
    span = _INTERVAL_SQL.get(interval, interval)
    ts = F.col(key_field).cast("timestamp")
    src = stream.withColumn("__ts", ts).withWatermark("__ts", watermark)
    keys = [F.window("__ts", span).alias("w")]
    if slice_field:
        keys.append(F.col(slice_field).alias("term"))
    aggs = [F.count("*").alias("cnt")]
    if distinct_field:
        aggs.append(F.approx_count_distinct(distinct_field, rsd).alias("distinct_cnt"))
    out = src.groupBy(*keys).agg(*aggs)
    cols = [F.col("w.start").alias("time")]
    if slice_field:
        cols.append(F.col("term"))
    return out.select(*cols, "cnt", *(["distinct_cnt"] if distinct_field else []))
