"""Date facet modes vs DuckDB exact oracles (the reference's
exact-oracle cross-check pattern, CountingQueryResultChecker.java /
DistinctQueryResultChecker.java with 1% HLL tolerance)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from elasticsearch_approx_plugin_spark.operators.date_facet import date_facet
from elasticsearch_approx_plugin_spark.operators.distinct_count import sketch_agg


@pytest.fixture(scope="module")
def events(spark, sf_dir_med):
    return spark.read.parquet(f"{sf_dir_med}/events.parquet")


def _duck(sf_dir, sql):
    return duckdb.sql(sql.format(ev=f"read_parquet('{sf_dir}/events.parquet')")).fetchall()


def test_counting_facet(events, sf_dir_med):
    got = [
        (r["time"], r["count"])
        for r in date_facet(events, "ts", "hour").collect()
    ]
    exp = _duck(
        sf_dir_med,
        "SELECT date_trunc('hour', ts) AS time, count(*) AS count FROM {ev} GROUP BY 1 ORDER BY 1",
    )
    assert got == exp


def test_counting_facet_totals_chronological(events, sf_dir_med):
    rows = date_facet(events, "ts", "day", totals=True).collect()
    times = [r["time"] for r in rows if r["time"] is not None]
    assert times == sorted(times)  # ChronologicalOrder.java analog
    total = [r["count"] for r in rows if r["time"] is None]
    assert total == [events.count()]


def test_sliced_facet(events, sf_dir_med):
    got = [
        (r["time"], r["term"], r["count"])
        for r in date_facet(events, "ts", "day", slice_field="event_type").collect()
    ]
    exp = _duck(
        sf_dir_med,
        "SELECT date_trunc('day', ts)::TIMESTAMP AS time, event_type AS term, count(*) AS count "
        "FROM {ev} GROUP BY 1, 2 ORDER BY 1, 2",
    )
    assert got == exp


def test_distinct_facet_exact(events, sf_dir_med):
    got = [
        (r["time"], r["count"], r["distinct_count"])
        for r in date_facet(
            events, "ts", "day", distinct_field="user_id", distinct_method="exact"
        ).collect()
    ]
    exp = _duck(
        sf_dir_med,
        "SELECT date_trunc('day', ts)::TIMESTAMP AS time, count(user_id) AS count, "
        "count(DISTINCT user_id) AS distinct_count FROM {ev} GROUP BY 1 ORDER BY 1",
    )
    assert got == exp


def test_distinct_facet_hybrid_exact_regime(events, sf_dir_med):
    """Below threshold the hybrid sketch must be EXACT (never tipped)."""
    got = {
        r["time"]: (r["count"], r["distinct_count"], r["tipped"])
        for r in date_facet(
            events, "ts", "day", distinct_field="user_id",
            exact_threshold=-1, distinct_method="hybrid",
        ).collect()
    }
    exp = _duck(
        sf_dir_med,
        "SELECT date_trunc('day', ts)::TIMESTAMP AS time, count(user_id) AS count, "
        "count(DISTINCT user_id) AS distinct_count FROM {ev} GROUP BY 1",
    )
    for time, count, dc in exp:
        g_count, g_dc, tipped = got[time]
        assert (g_count, g_dc) == (count, dc)
        assert not tipped


def test_distinct_facet_hybrid_tipped_within_tolerance(events, sf_dir_med):
    """threshold=0 → always HLL; estimates within 2% (BASELINE.md)."""
    got = {
        r["time"]: (r["distinct_count"], r["tipped"])
        for r in date_facet(
            events, "ts", "day", distinct_field="user_id",
            exact_threshold=0, distinct_method="hybrid",
        ).collect()
    }
    exp = _duck(
        sf_dir_med,
        "SELECT date_trunc('day', ts)::TIMESTAMP AS time, count(DISTINCT user_id) AS dc "
        "FROM {ev} GROUP BY 1",
    )
    for time, dc in exp:
        est, tipped = got[time]
        assert tipped
        assert abs(est - dc) <= max(0.02 * dc, 1)


def test_sliced_distinct_and_overall_total(events, sf_dir_med):
    rows = date_facet(
        events, "ts", "day", distinct_field="user_id", slice_field="event_type",
        exact_threshold=-1, distinct_method="hybrid", totals=True,
    ).collect()
    got = {
        (r["time"], r["term"]): (r["count"], r["distinct_count"]) for r in rows
    }
    exp = _duck(
        sf_dir_med,
        "SELECT date_trunc('day', ts)::TIMESTAMP AS time, event_type AS term, "
        "count(user_id) AS count, count(DISTINCT user_id) AS dc FROM {ev} GROUP BY 1, 2",
    )
    for time, term, count, dc in exp:
        assert got[(time, term)] == (count, dc)
    # facet-level total = distinct across whole result, not Σ buckets
    overall_exp = _duck(sf_dir_med, "SELECT count(user_id), count(DISTINCT user_id) FROM {ev}")[0]
    assert got[(None, None)] == overall_exp


def test_24h_interval_equals_day(events):
    """RandomizedApproxReadWriteTest 24h≡day regression analog."""
    a = [(r["time"], r["count"]) for r in date_facet(events, "ts", "24h").collect()]
    b = [(r["time"], r["count"]) for r in date_facet(events, "ts", "day").collect()]
    assert a == b


def test_1m_means_minute(events):
    a = [tuple(r) for r in date_facet(events, "ts", "1m").limit(5).collect()]
    b = [tuple(r) for r in date_facet(events, "ts", "minute").limit(5).collect()]
    assert a == b


def test_pre_zone_shifts_boundaries(events, sf_dir_med):
    # pre_zone_adjust_large_interval=True: local truncation, shifted
    # back to UTC (ES TimeTimeZoneRoundingFloor semantics)
    got = [
        (r["time"], r["count"])
        for r in date_facet(
            events, "ts", "day", pre_zone="+05:30",
            pre_zone_adjust_large_interval=True,
        ).collect()
    ]
    exp = _duck(
        sf_dir_med,
        "SELECT (date_trunc('day', ts + INTERVAL '330' MINUTE) - INTERVAL '330' MINUTE)::TIMESTAMP AS time, "
        "count(*) AS count FROM {ev} GROUP BY 1 ORDER BY 1",
    )
    assert got == exp


def test_pre_zone_large_interval_default_no_shift_back(events, sf_dir_med):
    # reference DEFAULT (preZoneAdjustLargeInterval=false,
    # DateFacetBuilder.java:176-180): for day+ intervals the
    # local-truncated bucket is treated as already-UTC — no shift back
    # (ES DayTimeZoneRoundingFloor semantics)
    got = [
        (r["time"], r["count"])
        for r in date_facet(events, "ts", "day", pre_zone="+05:30").collect()
    ]
    exp = _duck(
        sf_dir_med,
        "SELECT date_trunc('day', ts + INTERVAL '330' MINUTE)::TIMESTAMP AS time, "
        "count(*) AS count FROM {ev} GROUP BY 1 ORDER BY 1",
    )
    assert got == exp
    # small intervals always shift back, flag irrelevant
    a = [tuple(r) for r in date_facet(events, "ts", "hour", pre_zone="+05:30").collect()]
    b = [
        tuple(r)
        for r in date_facet(
            events, "ts", "hour", pre_zone="+05:30",
            pre_zone_adjust_large_interval=True,
        ).collect()
    ]
    assert a == b


def test_pre_offset(events, sf_dir_med):
    got = [
        (r["time"], r["count"])
        for r in date_facet(events, "ts", "day", pre_offset="+6h").collect()
    ]
    exp = _duck(
        sf_dir_med,
        "SELECT date_trunc('day', ts + INTERVAL '6' HOUR)::TIMESTAMP AS time, count(*) AS count "
        "FROM {ev} GROUP BY 1 ORDER BY 1",
    )
    assert got == exp


def test_value_distinct_mutually_exclusive(events):
    with pytest.raises(ValueError):
        date_facet(events, "ts", "day", value_field="value", distinct_field="user_id")


def test_sketch_agg_global(events, sf_dir_med):
    row = sketch_agg(events, [], "user_id", exact_threshold=-1).collect()[0]
    exp = _duck(sf_dir_med, "SELECT count(user_id), count(DISTINCT user_id) FROM {ev}")[0]
    assert (row["count"], row["distinct_count"]) == exp


def test_sketch_agg_null_group_key_retained(spark):
    """A null group key is ONE group (SQL GROUP BY semantics), not
    dropped (single-col path) or NaN-fragmented (multi-col path)."""
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), (None, 3), (None, 3), (None, 4), ("b", 5)],
        "k string, v int",
    ).repartition(3)
    got = {
        r["k"]: (r["count"], r["distinct_count"])
        for r in sketch_agg(df, ["k"], "v", exact_threshold=-1).collect()
    }
    assert got == {"a": (2, 2), None: (3, 2), "b": (1, 1)}
    # multi-column path: (null, x) keys merge across partitions too
    df2 = spark.createDataFrame(
        [(None, "x", 1), (None, "x", 2), (None, "y", 1), ("a", "x", 1)],
        "k1 string, k2 string, v int",
    ).repartition(3)
    got2 = {
        (r["k1"], r["k2"]): (r["count"], r["distinct_count"])
        for r in sketch_agg(df2, ["k1", "k2"], "v", exact_threshold=-1).collect()
    }
    assert got2 == {(None, "x"): (2, 2), (None, "y"): (1, 1), ("a", "x"): (1, 1)}


def test_sketch_agg_any_negative_threshold_never_tips(spark):
    """Reference parity: ANY negative exactThreshold = never tip
    (DateFacetParser: exactThreshold < 0 → Integer.MAX_VALUE)."""
    df = spark.createDataFrame([(i,) for i in range(500)], "v int")
    for th in (-1, -2, -100):
        row = sketch_agg(df, [], "v", exact_threshold=th).collect()[0]
        assert row["distinct_count"] == 500 and not row["tipped"]


def _formatted_plan(df):
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_facet_plan_pushdown_and_pruning(events):
    """The counting facet's scan must read ONLY the key column and push
    the null filter into parquet — the 100 TB contract."""
    plan = _formatted_plan(date_facet(events, "ts", "day"))
    assert "PushedFilters: [IsNotNull(ts)]" in plan
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "ts" in read_schema and "user_id" not in read_schema and "props" not in read_schema
    assert "MapInPandas" not in plan  # counting mode is pure Catalyst


def test_term_list_uncapped_stays_jvm(spark, sf_dir_med):
    """max_per_partition=None must NOT route through the Python capping
    pass (VERDICT r1 finding #5)."""
    from elasticsearch_approx_plugin_spark.operators.term_list import term_list

    docs = spark.read.parquet(f"{sf_dir_med}/documents.parquet")
    fast = _formatted_plan(term_list(docs, "source", max_per_partition=None))
    assert "MapInPandas" not in fast
    capped = _formatted_plan(term_list(docs, "source", max_per_partition=10))
    assert "MapInPandas" in capped
