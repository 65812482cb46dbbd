"""Date facets — the reference's ``date_facet`` re-expressed as
declarative groupBy pipelines.

Four modes, chosen exactly like ``DateFacetExecutor.java:36-59``
(/root/reference) on which optional fields are present:

- counting            (no value/distinct/slice)   → op 5
- sliced              (slice_field)               → op 6
- distinct            (distinct_field)            → op 7
- sliced distinct     (slice + distinct)          → op 8

``value_field`` and ``distinct_field`` are mutually exclusive, as in
``DateFacetParser.java:159-160``. Buckets are half-open
``[start, next_start)`` (a property of ``date_trunc``), results sorted
chronologically (``ChronologicalOrder.java:11-33``), and the facet-level
``distinct_count`` is the distinct over the *whole* result — a merge of
bucket sketches, not a sum (``InternalDistinctFacet.java:188-236``) —
exposed here via ``totals=True`` → ``ROLLUP(bucket)``.

Interval grammar: the calendar names the reference accepts
(``DateFacetParser.java:47-63``) plus arbitrary ``TimeValue`` spans like
``"24h"`` / ``"90m"`` (epoch-floor arithmetic). Reference quirks NOT
replicated (SURVEY.md appendix A): ``"1m"`` is *minute* by explicit
choice here, ``"year"`` is a real year (not yearOfCentury), value-mode
counting attributes values to their own row's timestamp.

Timezone semantics: ``pre_zone`` re-interprets the instant in a zone
before truncation and shifts back (bucket boundaries move, instants
don't); ``post_zone`` shifts the *label* of the bucket; pre/post
offsets add fixed spans before/after truncation — matching
``DateFacetParser.java:223-249``.

Distinct methods: ``hybrid`` (CountThenEstimate — exact below
``exact_threshold``, HLL above; the plugin's headline), ``exact``
(``count(DISTINCT)``), ``approx`` (Spark's native HLL++,
``approx_count_distinct(col, rsd)``).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.hll import HLL_DEFAULT_RSD
from .distinct_count import sketch_agg

_CALENDAR = {
    "year": "year",
    "1y": "year",
    "quarter": "quarter",
    "month": "month",
    "week": "week",
    "1w": "week",
    "day": "day",
    "1d": "day",
    "hour": "hour",
    "1h": "hour",
    "minute": "minute",
    "1m": "minute",  # reference quirk (DateFacetParser.java:52,60): minute wins
    "second": "second",
    "1s": "second",
}

_TIMEVALUE = re.compile(r"^(\d+)(ms|s|m|h|d|w)$")
_UNIT_MS = {"ms": 1, "s": 1000, "m": 60_000, "h": 3_600_000, "d": 86_400_000, "w": 604_800_000}

_OFFSET = re.compile(r"^([+-]?)(\d+)(ms|s|m|h|d|w)$")


def _offset_ms(spec: str | int | None) -> int:
    if spec is None:
        return 0
    if isinstance(spec, int):
        return spec
    m = _OFFSET.match(spec)
    if not m:
        raise ValueError(f"bad offset {spec!r}")
    sign, n, unit = m.groups()
    return (-1 if sign == "-" else 1) * int(n) * _UNIT_MS[unit]


_LARGE_MS = 12 * 3_600_000  # ES 0.90 TimeZoneRounding's large-interval bar
_LARGE_CALENDAR = {"day", "week", "month", "quarter", "year"}


def bucket_expr(
    key_field: str,
    interval: str,
    pre_zone: str | None = None,
    post_zone: str | None = None,
    pre_offset: str | int | None = None,
    post_offset: str | int | None = None,
    factor: float | None = None,
    key_type=None,
    pre_zone_adjust_large_interval: bool = False,
) -> Column:
    """Timezone-aware truncation of ``key_field`` to ``interval`` buckets.

    ``factor`` mirrors the reference builder (``DateFacetBuilder.java``):
    a numeric key is multiplied before being read as epoch millis
    (e.g. 1000 for seconds-stored keys). Only meaningful for numeric
    key columns; the reference requires a long key
    (``DateFacetParser.java:208-221``) — we additionally accept real
    timestamps, the idiomatic Spark type.

    ``pre_zone_adjust_large_interval`` (default false, matching
    ``DateFacetBuilder.java:176-180`` / ES 0.90 ``TimeZoneRounding``):
    for LARGE intervals (unit ≥ 12 h — day and above, or a TimeValue
    span ≥ 12 h), the local-time-truncated bucket is treated as
    already-UTC (no shift back) unless this flag is true; small
    intervals always shift back so bucket instants stay comparable.
    """
    if key_type is not None and isinstance(key_type, (T.LongType, T.IntegerType)):
        ts = F.timestamp_millis(
            (F.col(key_field) * F.lit(factor or 1)).cast("long")
        )
    else:
        # parquet TIMESTAMP_NTZ → session-TZ timestamp (session pinned UTC,
        # an identity re-tag; unix_millis/zone fns need TIMESTAMP)
        ts = F.col(key_field).cast("timestamp")
    pre = _offset_ms(pre_offset)
    if pre:
        ts = F.timestamp_millis(F.unix_millis(ts) + F.lit(pre))
    if pre_zone:
        ts = F.from_utc_timestamp(ts, pre_zone)
    key = interval.lower()
    if key in _CALENDAR:
        b = F.date_trunc(_CALENDAR[key], ts)
        large = _CALENDAR[key] in _LARGE_CALENDAR
    else:
        m = _TIMEVALUE.match(key)
        if not m:
            raise ValueError(f"unsupported interval {interval!r}")
        span = int(m.group(1)) * _UNIT_MS[m.group(2)]
        # floor (not truncate-toward-zero): pre-1970 timestamps have
        # negative epoch millis, and the bucket start must be the span
        # boundary at-or-before the instant on both engines (DuckDB's
        # `//` floors; a long-cast of float division truncates and would
        # land negative instants one span high) — VERDICT r5 #3
        b = F.timestamp_millis(F.floor(F.unix_millis(ts) / span).cast("long") * span)
        large = span >= _LARGE_MS
    if pre_zone and (not large or pre_zone_adjust_large_interval):
        b = F.to_utc_timestamp(b, pre_zone)
    if post_zone:
        b = F.from_utc_timestamp(b, post_zone)
    post = _offset_ms(post_offset)
    if post:
        b = F.timestamp_millis(F.unix_millis(b) + F.lit(post))
    return b


def _maybe_explode(df: DataFrame, field: str) -> tuple[DataFrame, str]:
    """Multi-valued (array) fields count each value — README.md:113-116."""
    if isinstance(df.schema[field].dataType, T.ArrayType):
        return df.withColumn(f"__{field}_v", F.explode(field)), f"__{field}_v"
    return df, field


def date_facet(
    df: DataFrame,
    key_field: str,
    interval: str,
    value_field: str | None = None,
    distinct_field: str | None = None,
    slice_field: str | None = None,
    exact_threshold: int = 1000,
    rsd: float = HLL_DEFAULT_RSD,
    distinct_method: str = "hybrid",
    pre_zone: str | None = None,
    post_zone: str | None = None,
    pre_offset: str | int | None = None,
    post_offset: str | int | None = None,
    factor: float | None = None,
    totals: bool = False,
    pre_zone_adjust_large_interval: bool = False,
) -> DataFrame:
    """Run the date facet; returns a chronologically sorted DataFrame.

    Columns: ``time`` (bucket timestamp; NULL = facet-total row when
    ``totals=True``), ``term`` (slice label, sliced modes), ``count``,
    ``distinct_count`` (+ ``tipped`` for hybrid) per mode.
    """
    if value_field and distinct_field:
        raise ValueError("value_field and distinct_field are mutually exclusive")
    # the reference supports multi-valued fields in ALL roles including
    # the timestamp key (README.md:113-116; TimestampFirstCollector.java:
    # 147-189 iterates per-doc timestamps — counting mode emits one
    # count per timestamp value): an array key explodes first, so every
    # timestamp value lands in its own bucket
    df, key_col = _maybe_explode(df, key_field)
    b = bucket_expr(
        key_col, interval, pre_zone, post_zone, pre_offset, post_offset,
        factor, df.schema[key_col].dataType, pre_zone_adjust_large_interval,
    )
    df = df.filter(F.col(key_col).isNotNull()).withColumn("time", b)

    keys = ["time"]
    if slice_field is not None:
        df, slice_col = _maybe_explode(df, slice_field)
        df = df.withColumn("term", F.col(slice_col).cast("string"))
        keys.append("term")

    if distinct_field is not None:
        df, dcol = _maybe_explode(df, distinct_field)
        if distinct_method == "hybrid":
            out = sketch_agg(df, keys, dcol, exact_threshold, rsd, totals=totals)
        else:
            agg = [
                F.count(dcol).alias("count"),
                (
                    F.countDistinct(dcol)
                    if distinct_method == "exact"
                    else F.approx_count_distinct(dcol, rsd)
                ).alias("distinct_count"),
            ]
            grouped = df.rollup(*keys) if totals else df.groupBy(*keys)
            out = grouped.agg(*agg)
        return out.orderBy(*[F.asc_nulls_last(k) for k in keys])

    if value_field is not None:
        df, vcol = _maybe_explode(df, value_field)
        df = df.filter(F.col(vcol).isNotNull())

    grouped = df.rollup(*keys) if totals else df.groupBy(*keys)
    out = grouped.agg(F.count("*").alias("count"))
    return out.orderBy(*[F.asc_nulls_last(k) for k in keys])
