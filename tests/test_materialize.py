"""External JSON response shape parity (TimePeriod/Slice/Constants
analog; golden-file shape from distinct_exact RESPONSE fixtures)."""

import pytest

from elasticsearch_approx_plugin_spark.operators.date_facet import date_facet
from elasticsearch_approx_plugin_spark.operators.materialize import (
    facet_response,
    term_list_response,
)
from elasticsearch_approx_plugin_spark.operators.term_list import term_list


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def test_counting_response(events):
    resp = facet_response(date_facet(events, "ts", "day"))
    assert resp["_type"] == "counting_date_facet"
    assert resp["count"] == events.count()
    times = [e["time"] for e in resp["entries"]]
    assert times == sorted(times) and all(isinstance(t, int) for t in times)
    assert sum(e["count"] for e in resp["entries"]) == events.count()


def test_distinct_response_overall(events):
    resp = facet_response(
        date_facet(
            events, "ts", "day", distinct_field="user_id",
            distinct_method="exact", totals=True,
        )
    )
    assert resp["_type"] == "distinct_date_facet"
    exact_overall = events.select("user_id").distinct().count()
    assert resp["distinct_count"] == exact_overall  # merge-of-buckets, not Σ
    assert all("distinct_count" in e for e in resp["entries"])


def test_sliced_response(events):
    resp = facet_response(date_facet(events, "ts", "day", slice_field="event_type"))
    assert resp["_type"] == "sliced_date_facet"
    e0 = resp["entries"][0]
    assert {s["term"] for s in e0["slices"]} <= {
        r["event_type"] for r in events.select("event_type").distinct().collect()
    }
    assert e0["count"] == sum(s["count"] for s in e0["slices"])


def test_sliced_distinct_response_total_wired(events):
    # reference bug A#5: sliced-distinct _total always 0 — ours is wired
    resp = facet_response(
        date_facet(
            events, "ts", "day", slice_field="event_type",
            distinct_field="user_id", exact_threshold=-1, totals=True,
        )
    )
    assert resp["_type"] == "sliced_distinct_date_facet"
    assert resp["count"] == events.count()
    assert resp["distinct_count"] == events.select("user_id").distinct().count()


def test_term_list_response(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    resp = term_list_response(term_list(docs, "lang"))
    assert resp["_type"] == "term_list"
    assert set(resp["entries"]) == {
        r["lang"] for r in docs.select("lang").distinct().collect()
    }
