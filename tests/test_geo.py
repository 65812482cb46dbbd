"""geo_distance filter + facet — haversine against known distances,
NULL posture, and a DuckDB cross-check on derived coordinates."""

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from elasticsearch_approx_plugin_spark.operators.geo import (
    EARTH_RADIUS_KM,
    geo_distance_facet,
    geo_distance_filter,
    haversine_km,
)


@pytest.fixture(scope="module")
def points(spark):
    rows = [
        (0, 48.8566, 2.3522),     # Paris
        (1, 51.5074, -0.1278),    # London  (~343.5 km from Paris)
        (2, 40.7128, -74.0060),   # New York (~5837 km)
        (3, 48.8566, 2.3522),     # Paris again (0 km)
        (4, None, 10.0),          # missing lat
        (5, -48.8566, -177.6478), # near the antipode
    ]
    return spark.createDataFrame(rows, "id long, lat double, lon double")


def _hav(lat1, lon1, lat2, lon2):
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dp, dl = math.radians(lat2 - lat1), math.radians(lon2 - lon1)
    h = math.sin(dp / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2
    return 2 * EARTH_RADIUS_KM * math.asin(math.sqrt(min(h, 1.0)))


def test_haversine_known_distances(points):
    got = {
        r["id"]: r["d"]
        for r in points.select(
            "id", F.round(haversine_km("lat", "lon", 48.8566, 2.3522), 3).alias("d")
        ).collect()
        if r["d"] is not None
    }
    assert got[3] == 0.0
    assert got[1] == pytest.approx(_hav(51.5074, -0.1278, 48.8566, 2.3522), abs=1e-3)
    assert 343 < got[1] < 345  # the textbook Paris-London figure
    assert got[2] == pytest.approx(_hav(40.7128, -74.0060, 48.8566, 2.3522), abs=1e-3)
    # antipode: clamped, no NaN, close to half the circumference
    assert got[5] == pytest.approx(math.pi * EARTH_RADIUS_KM, rel=1e-3)


def test_filter_radius_and_null(points):
    kept = {
        r["id"]
        for r in geo_distance_filter(points, "lat", "lon", 48.8566, 2.3522, 400.0).collect()
    }
    assert kept == {0, 1, 3}  # Paris x2 + London; NULL row never matches
    with pytest.raises(ValueError):
        geo_distance_filter(points, "lat", "lon", 48.8566, 2.3522, 0.0)
    with pytest.raises(ValueError):
        haversine_km("lat", "lon", 91.0, 0.0)


def test_facet_buckets(points):
    out = {
        (r["range_from"], r["range_to"]): r["count"]
        for r in geo_distance_facet(
            points, "lat", "lon", 48.8566, 2.3522,
            [(None, 1.0), (1.0, 1000.0), (1000.0, None)],
        ).collect()
    }
    assert out == {(None, 1.0): 2, (1.0, 1000.0): 1, (1000.0, None): 2}


def test_vs_duckdb_derived_coords(spark, sf_dir):
    # deterministic coordinates derived from events (no external data):
    # the same arithmetic on both sides
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id",
        ((F.col("user_id") % 180) - 90 + 0.5).cast("double").alias("lat"),
        ((F.col("event_id") % 360) - 180 + 0.5).cast("double").alias("lon"),
        "value",
    )
    got = {
        (r["range_from"], r["range_to"], r["count"], r["total"])
        for r in geo_distance_facet(
            ev, "lat", "lon", 0.0, 0.0, [(None, 5000.0), (2500.0, 12000.0)],
            value_field="value",
        ).collect()
    }
    want = set(
        duckdb.sql(
            f"""
        WITH pts AS (
          SELECT ((user_id % 180) - 90 + 0.5)::DOUBLE AS lat,
                 ((event_id % 360) - 180 + 0.5)::DOUBLE AS lon, value
          FROM read_parquet('{sf_dir}/events.parquet')
        ),
        d AS (
          SELECT round(2 * {EARTH_RADIUS_KM!r} * asin(sqrt(least(
                   pow(sin(radians(lat) / 2), 2)
                   + cos(radians(lat)) * 1.0 * pow(sin(radians(lon) / 2), 2), 1.0))), 6) AS dist,
                 value
          FROM pts
        )
        SELECT CAST(NULL AS DOUBLE), 5000.0, count(*), round(sum(value), 6)
        FROM d WHERE dist < 5000.0
        UNION ALL
        SELECT 2500.0, 12000.0, count(*), round(sum(value), 6)
        FROM d WHERE dist >= 2500.0 AND dist < 12000.0
        """
        ).fetchall()
    )
    assert got == want
