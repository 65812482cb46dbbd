"""Randomized facet sweep — the reference's RandomizedApproxReadWriteTest
analog (`/root/reference/src/test/java/.../RandomizedApproxReadWriteTest.java:80-140`):
seeded random data, a grid of interval × zone × offset × mode combos,
every result checked against an independently-constructed exact oracle
(DuckDB here, the reference's *QueryResultChecker there).

The oracle mirrors the SEMANTICS (ES 0.90 TimeZoneRounding) but is
built from scratch in SQL: fixed-offset zones are interval arithmetic,
calendar truncation is DuckDB's date_trunc, TimeValue spans are
epoch-floor — a different engine and a different formulation of the
same spec.
"""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from elasticsearch_approx_plugin_spark.operators.date_facet import (
    _CALENDAR,
    _LARGE_CALENDAR,
    _LARGE_MS,
    _TIMEVALUE,
    _UNIT_MS,
    date_facet,
)

N_EVENTS = 4000


@pytest.fixture(scope="module")
def rand_events(spark, tmp_path_factory):
    rng = np.random.default_rng(99)
    t0 = 1367000000000  # 2013-04-26, matching the reference fixtures' era
    ts = t0 + rng.integers(0, 200 * 86_400_000, N_EVENTS)  # ~200 days
    rows = [
        (int(ts[i]), int(rng.integers(0, 150)), ["a", "b", "c"][int(rng.integers(0, 3))])
        for i in range(N_EVENTS)
    ]
    df = spark.createDataFrame(rows, "ts_ms long, user_id long, etype string").select(
        F.timestamp_millis("ts_ms").alias("ts"), "user_id", "etype"
    )
    path = str(tmp_path_factory.mktemp("randfacet") / "events.parquet")
    df.write.mode("overwrite").parquet(path)
    return df, f"{path}/*.parquet"


def _zone_minutes(zone: str) -> int:
    sign = -1 if zone.startswith("-") else 1
    hh, mm = zone.lstrip("+-").split(":")
    return sign * (int(hh) * 60 + int(mm))


def _oracle_bucket(interval: str, pre_zone, pre_offset_ms, post_offset_ms, adjust):
    """Epoch-ms bucket expression over a DuckDB TIMESTAMPTZ column
    ``dt`` — an independent SQL formulation of bucket_expr's spec."""
    expr = "dt"
    if pre_offset_ms:
        expr = f"({expr} + INTERVAL '{pre_offset_ms}' MILLISECOND)"
    shift = _zone_minutes(pre_zone) if pre_zone else 0
    if shift:
        expr = f"({expr} + INTERVAL '{shift}' MINUTE)"
    key = interval.lower()
    if key in _CALENDAR:
        out = f"epoch_ms(date_trunc('{_CALENDAR[key]}', {expr})::TIMESTAMP)"
        large = _CALENDAR[key] in _LARGE_CALENDAR
    else:
        m = _TIMEVALUE.match(key)
        span = int(m.group(1)) * _UNIT_MS[m.group(2)]
        out = f"(epoch_ms({expr}) // {span}) * {span}"
        large = span >= _LARGE_MS
    if shift and (not large or adjust):
        out = f"({out} - {shift * 60_000})"
    if post_offset_ms:
        out = f"({out} + {post_offset_ms})"
    return out


CASES = [
    # (interval, pre_zone, pre_offset, post_offset, adjust, mode)
    ("minute", None, None, None, False, "counting"),
    ("hour", "+05:30", None, None, False, "counting"),
    ("day", "+05:30", None, None, False, "counting"),
    ("day", "-08:00", None, None, True, "counting"),
    ("week", "+05:30", None, None, False, "counting"),
    ("month", None, "+6h", None, False, "counting"),
    ("quarter", None, None, "+30m", False, "counting"),
    ("year", "-08:00", None, None, True, "counting"),
    ("90m", None, None, None, False, "counting"),
    ("6h", "+05:30", None, None, False, "counting"),
    ("24h", "+05:30", None, None, False, "counting"),  # span ≥ 12h = large
    ("45s", None, "-90m", None, False, "counting"),
    ("day", "+05:30", None, None, False, "sliced"),
    ("day", "-08:00", "+1h", None, True, "distinct"),
    ("week", None, None, None, False, "hybrid"),
]


@pytest.mark.parametrize("interval,zone,pre_off,post_off,adjust,mode", CASES)
def test_random_facet_matches_oracle(
    rand_events, interval, zone, pre_off, post_off, adjust, mode
):
    df, path = rand_events
    kwargs = dict(
        pre_zone=zone,
        pre_offset=pre_off,
        post_offset=post_off,
        pre_zone_adjust_large_interval=adjust,
    )
    off = lambda s: 0 if s is None else (
        (-1 if s.startswith("-") else 1)
        * int(s.lstrip("+-")[:-1])
        * _UNIT_MS[s[-1]]
    )
    bucket = _oracle_bucket(interval, zone, off(pre_off), off(post_off), adjust)
    src = (
        f"(SELECT to_timestamp(epoch_ms(ts) / 1000.0) AS dt, user_id, etype "
        f"FROM read_parquet('{path}'))"
    )

    if mode == "counting":
        got = {
            (r["t"], r["count"])
            for r in date_facet(df, "ts", interval, **kwargs)
            .select(F.unix_millis(F.col("time").cast("timestamp")).alias("t"), "count")
            .collect()
        }
        exp = set(
            duckdb.sql(
                f"SELECT {bucket} AS t, count(*) FROM {src} GROUP BY 1"
            ).fetchall()
        )
    elif mode == "sliced":
        got = {
            (r["t"], r["term"], r["count"])
            for r in date_facet(df, "ts", interval, slice_field="etype", **kwargs)
            .select(
                F.unix_millis(F.col("time").cast("timestamp")).alias("t"),
                "term",
                "count",
            )
            .collect()
        }
        exp = set(
            duckdb.sql(
                f"SELECT {bucket} AS t, etype, count(*) FROM {src} GROUP BY 1, 2"
            ).fetchall()
        )
    else:  # distinct / hybrid
        method = "exact" if mode == "distinct" else "hybrid"
        extra = {} if mode == "distinct" else {"exact_threshold": -1}
        got = {
            (r["t"], r["count"], r["distinct_count"])
            for r in date_facet(
                df, "ts", interval, distinct_field="user_id",
                distinct_method=method, **extra, **kwargs,
            )
            .select(
                F.unix_millis(F.col("time").cast("timestamp")).alias("t"),
                "count",
                "distinct_count",
            )
            .collect()
        }
        exp = set(
            duckdb.sql(
                f"SELECT {bucket} AS t, count(user_id), count(DISTINCT user_id) "
                f"FROM {src} GROUP BY 1"
            ).fetchall()
        )
    assert got == exp


NESTED_CASES = [
    ("day", "+05:30", None, None, False, "counting"),
    ("6h", "+05:30", None, None, False, "sliced"),
    ("day", "-08:00", "+1h", None, True, "distinct"),
    ("week", None, None, None, False, "hybrid"),
]


@pytest.mark.parametrize("interval,zone,pre_off,post_off,adjust,mode", NESTED_CASES)
def test_random_nested_facet_matches_oracle(
    rand_events, interval, zone, pre_off, post_off, adjust, mode
):
    """The nested lowering composed with the tz/offset grammar: wrap
    the random events into parent docs (one per user, array<struct>
    children), facet through DateFacetQuery(nested=...), and check the
    SAME DuckDB oracle the flat sweep uses. ``distinct`` modes keep
    ``user_id`` at ROOT scope, exercising root-field carry-through
    (each parent's id replicated onto its exploded children)."""
    from elasticsearch_approx_plugin_spark.plans.facet_query import DateFacetQuery

    df, path = rand_events
    parents = df.groupBy("user_id").agg(
        F.collect_list(F.struct("ts", "etype")).alias("acts")
    )
    off = lambda s: 0 if s is None else (
        (-1 if s.startswith("-") else 1)
        * int(s.lstrip("+-")[:-1])
        * _UNIT_MS[s[-1]]
    )
    bucket = _oracle_bucket(interval, zone, off(pre_off), off(post_off), adjust)
    src = (
        f"(SELECT to_timestamp(epoch_ms(ts) / 1000.0) AS dt, user_id, etype "
        f"FROM read_parquet('{path}'))"
    )
    kwargs = dict(
        pre_zone=zone,
        pre_offset=pre_off,
        post_offset=post_off,
        pre_zone_adjust_large_interval=adjust,
        nested="acts",
    )
    t_ms = F.unix_millis(F.col("time").cast("timestamp")).alias("t")

    if mode == "counting":
        q = DateFacetQuery("acts.ts", interval, **kwargs)
        got = {(r["t"], r["count"]) for r in q.run(parents).select(t_ms, "count").collect()}
        exp = set(duckdb.sql(f"SELECT {bucket} AS t, count(*) FROM {src} GROUP BY 1").fetchall())
    elif mode == "sliced":
        q = DateFacetQuery("acts.ts", interval, slice_field="acts.etype", **kwargs)
        got = {
            (r["t"], r["term"], r["count"])
            for r in q.run(parents).select(t_ms, "term", "count").collect()
        }
        exp = set(
            duckdb.sql(f"SELECT {bucket} AS t, etype, count(*) FROM {src} GROUP BY 1, 2").fetchall()
        )
    else:  # distinct over the ROOT-scope user_id
        method = "exact" if mode == "distinct" else "hybrid"
        extra = {} if mode == "distinct" else {"exact_threshold": -1}
        q = DateFacetQuery(
            "acts.ts", interval, distinct_field="user_id",
            distinct_method=method, **extra, **kwargs,
        )
        got = {
            (r["t"], r["count"], r["distinct_count"])
            for r in q.run(parents).select(t_ms, "count", "distinct_count").collect()
        }
        exp = set(
            duckdb.sql(
                f"SELECT {bucket} AS t, count(user_id), count(DISTINCT user_id) "
                f"FROM {src} GROUP BY 1"
            ).fetchall()
        )
    assert got == exp


# facet_filter lowering (round 5) composed with the tz/offset grammar.
# Each case: (ES filter DSL, equivalent SQL predicate, interval, zone).
# etype is null for user_id % 7 == 0 rows, so the ES null semantics are
# live: a positive filter never matches a missing field; must_not DOES.
FILTER_CASES = [
    (
        {"range": {"user_id": {"from": 20, "to": 120, "include_upper": False}}},
        "user_id >= 20 AND user_id < 120",
        "day", "+05:30",
    ),
    ({"term": {"etype": "a"}}, "etype = 'a'", "hour", None),
    (
        {"bool": {"must": [{"range": {"user_id": {"gte": 10}}}],
                  "must_not": [{"term": {"etype": "b"}}]}},
        "user_id >= 10 AND NOT coalesce(etype = 'b', false)",
        "6h", "+05:30",
    ),
    (
        {"bool": {"should": [{"term": {"etype": "a"}},
                             {"range": {"user_id": {"lt": 30}}}]}},
        "(coalesce(etype = 'a', false) OR coalesce(user_id < 30, false))",
        "week", None,
    ),
    (
        {"bool": {"must": [{"exists": {"field": "etype"}}]}},
        "etype IS NOT NULL",
        "month", "-08:00",
    ),
    (
        {"bool": {"must_not": [{"exists": {"field": "etype"}}]}},
        "NOT coalesce(etype IS NOT NULL, false)",
        "day", None,
    ),
]


@pytest.mark.parametrize("dsl,sql_pred,interval,zone", FILTER_CASES)
def test_random_facet_filter_matches_oracle(rand_events, dsl, sql_pred, interval, zone):
    """A full REQUEST JSON whose facet carries ``facet_filter`` replays
    through parse_request and matches the DuckDB oracle running the
    equivalent WHERE clause — over data WITH nulls, so the coalesce
    null semantics of the lowering are what make the numbers agree."""
    from elasticsearch_approx_plugin_spark.plans.request_parser import parse_request

    df, path = rand_events
    df = df.withColumn(
        "etype", F.when(F.col("user_id") % 7 == 0, F.lit(None)).otherwise(F.col("etype"))
    )
    request = {
        "query": {"match_all": {}},
        "facets": {
            "h": {
                "date_facet": {"key_field": "ts", "interval": interval,
                               **({"pre_zone": zone} if zone else {})},
                "facet_filter": dsl,
            }
        },
    }
    (_, spec), = parse_request(request).items()
    got = {
        (r["t"], r["count"])
        for r in spec.run(df)
        .select(F.unix_millis(F.col("time").cast("timestamp")).alias("t"), "count")
        .collect()
    }
    bucket = _oracle_bucket(interval, zone, 0, 0, False)
    src = (
        f"(SELECT to_timestamp(epoch_ms(ts) / 1000.0) AS dt, user_id, "
        f"CASE WHEN user_id % 7 = 0 THEN NULL ELSE etype END AS etype "
        f"FROM read_parquet('{path}'))"
    )
    exp = set(
        duckdb.sql(
            f"SELECT {bucket} AS t, count(*) FROM {src} WHERE {sql_pred} GROUP BY 1"
        ).fetchall()
    )
    assert got == exp and len(got) > 0
