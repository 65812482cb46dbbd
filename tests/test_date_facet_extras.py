"""Reference-parity extras: numeric key + factor, multi-valued (array)
fields in every role, value-mode counting, post_zone label shift."""

import pytest
from pyspark.sql import functions as F

from elasticsearch_approx_plugin_spark.operators.date_facet import date_facet


@pytest.fixture(scope="module")
def multival(spark):
    # ts at second resolution stored as LONG SECONDS (factor=1000 case),
    # multi-valued tokens + multi-valued slices per doc
    rows = [
        (0, 3600, ["a", "b", "b"], ["x"]),
        (1, 3600 + 60, ["a"], ["x", "y"]),
        (2, 7200, ["c", None], ["y"]),
        (3, 7200 + 1, [], ["x"]),
    ]
    return spark.createDataFrame(
        rows, "id long, ts_sec long, vals array<string>, slices array<string>"
    )


def test_factor_long_key(multival):
    got = {(r["time"].isoformat(), r["count"]) for r in
           date_facet(multival, "ts_sec", "hour", factor=1000).collect()}
    assert got == {("1970-01-01T01:00:00", 2), ("1970-01-01T02:00:00", 2)}


def test_value_mode_counts_occurrences(multival):
    # value mode: one count per VALUE occurrence (README.md:46-49 intended
    # semantics, not the reference's first-timestamp quirk)
    got = {(r["time"].hour, r["count"]) for r in
           date_facet(multival, "ts_sec", "hour", factor=1000, value_field="vals").collect()}
    # hour 1: doc0 3 vals + doc1 1 val = 4; hour 2: doc2 1 non-null val
    assert got == {(1, 4), (2, 1)}


def test_multivalued_slice(multival):
    got = {(r["time"].hour, r["term"], r["count"]) for r in
           date_facet(multival, "ts_sec", "hour", factor=1000, slice_field="slices").collect()}
    assert got == {(1, "x", 2), (1, "y", 1), (2, "y", 1), (2, "x", 1)}


def test_multivalued_distinct(multival):
    got = {(r["time"].hour, r["distinct_count"]) for r in
           date_facet(multival, "ts_sec", "hour", factor=1000,
                      distinct_field="vals", distinct_method="exact").collect()}
    # hour1 distinct {a,b}; hour2 distinct {c}
    assert got == {(1, 2), (2, 1)}


def test_post_zone_shifts_labels_only(spark, sf_dir_med):
    ev = spark.read.parquet(f"{sf_dir_med}/events.parquet")
    plain = date_facet(ev, "ts", "day").collect()
    shifted = date_facet(ev, "ts", "day", post_zone="+02:00").collect()
    assert [r["count"] for r in plain] == [r["count"] for r in shifted]
    for a, b in zip(plain, shifted):
        assert (b["time"] - a["time"]).total_seconds() == 7200


def test_quarter_year_week_intervals(spark, sf_dir_med):
    """Calendar intervals the reference supports beyond day/hour/minute
    (DateFacetParser.java:47-63): quarter (Joda quarter), year (real
    year — NOT the yearOfCentury quirk A#2), week."""
    import duckdb

    ev = spark.read.parquet(f"{sf_dir_med}/events.parquet")
    for interval in ("quarter", "year", "week"):
        got = {
            (r["time"], r["count"])
            for r in date_facet(ev, "ts", interval).collect()
        }
        exp = set(
            duckdb.sql(
                f"SELECT date_trunc('{interval}', ts)::TIMESTAMP AS time, count(*) "
                f"FROM read_parquet('{sf_dir_med}/events.parquet') GROUP BY 1"
            ).fetchall()
        )
        assert got == exp, interval


def test_post_offset_shifts_labels(spark, sf_dir_med):
    ev = spark.read.parquet(f"{sf_dir_med}/events.parquet")
    plain = date_facet(ev, "ts", "day").collect()
    shifted = date_facet(ev, "ts", "day", post_offset="+90m").collect()
    assert [r["count"] for r in plain] == [r["count"] for r in shifted]
    for a, b in zip(plain, shifted):
        assert (b["time"] - a["time"]).total_seconds() == 5400


def test_value_and_slice_combined(multival):
    """value_field + slice_field: value occurrences counted per slice
    label (intended cross-count semantics README.md:46-49 — the
    reference zips instead, quirk A#4, not replicated)."""
    got = {
        (r["time"].hour, r["term"], r["count"])
        for r in date_facet(
            multival, "ts_sec", "hour", factor=1000,
            value_field="vals", slice_field="slices",
        ).collect()
    }
    # doc0: 3 vals × slice x → (1,x,3); doc1: 1 val × {x,y};
    # doc2: 1 val × y; doc3: 0 vals → absent
    assert got == {(1, "x", 4), (1, "y", 1), (2, "y", 1)}


def test_date_facet_array_key(spark):
    """Multi-valued timestamp KEY (reference README.md:113-116 /
    TimestampFirstCollector.java:147-189): counting mode emits one
    count per timestamp VALUE; empty/null arrays contribute nothing."""
    import datetime as dt

    from pyspark.sql import functions as F

    from elasticsearch_approx_plugin_spark.operators.date_facet import date_facet

    rows = [
        ([dt.datetime(2024, 1, 1, 5), dt.datetime(2024, 1, 2, 6)], "a", 1),
        ([dt.datetime(2024, 1, 1, 7)], "b", 2),
        ([], "a", 3),
        (None, "a", 4),
    ]
    df = spark.createDataFrame(rows, "tsa array<timestamp>, et string, uid long")
    out = {
        r["d"]: r["count"]
        for r in date_facet(df, "tsa", "day")
        .select(F.date_format("time", "yyyy-MM-dd").alias("d"), "count")
        .collect()
    }
    assert out == {"2024-01-01": 2, "2024-01-02": 1}
    # array key composes with slice + distinct
    sliced = {
        (r["d"], r["term"]): (r["count"], r["distinct_count"])
        for r in date_facet(
            df, "tsa", "day", slice_field="et", distinct_field="uid",
            distinct_method="exact",
        )
        .select(
            F.date_format("time", "yyyy-MM-dd").alias("d"),
            "term", "count", "distinct_count",
        )
        .collect()
    }
    assert sliced == {
        ("2024-01-01", "a"): (1, 1),
        ("2024-01-01", "b"): (1, 1),
        ("2024-01-02", "a"): (1, 1),
    }
