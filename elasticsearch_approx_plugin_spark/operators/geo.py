"""Geo distance — the ES ``geo_distance`` filter and facet.

ES 0.90 ships a ``geo_distance`` filter (docs within ``distance`` of a
point) and a ``geo_distance`` facet (range buckets over the distance,
with per-bucket value stats) over ``geo_point`` fields.  This module
re-expresses both Spark-first over plain (lat, lon) double columns:

- the distance is the ES ``ARC`` (default) distance type — the
  haversine great-circle formula on the sphere ES uses
  (``GeoDistance.ARC``, earth radius 6371.0087714 km, the same
  constant as Lucene/ES's ``GeoUtils.EARTH_MEAN_RADIUS``):

      d = 2R · asin( sqrt( sin²(Δφ/2) + cosφ₁·cosφ₂·sin²(Δλ/2) ) )

  evaluated as a per-row Catalyst expression — codegen'd JVM trig, no
  UDF, engine-reproducible (the oracle runs the identical formula;
  the 6-dp edge rounding absorbs last-ulp libm differences);
- the FILTER is that expression ``<= distance_km`` — a zero-shuffle
  predicate that fuses into the scan (with lat/lon column pruning);
- the FACET reuses :func:`facets.range_facet`'s overlapping
  half-open range machinery on the computed distance column — one
  groupBy, the audited core-facet shape.

A row with a NULL coordinate never matches the filter and never lands
in a facet bucket (ES: docs without the geo point are skipped).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0087714  # ES/Lucene GeoUtils.EARTH_MEAN_RADIUS


def haversine_km(
    lat_col: Column | str, lon_col: Column | str, lat: float, lon: float
) -> Column:
    """Great-circle distance (km) from each row's point to (lat, lon),
    as a single codegen'd expression."""
    if not -90.0 <= lat <= 90.0 or not -180.0 <= lon <= 180.0:
        raise ValueError(f"origin out of range: ({lat}, {lon})")
    la = F.radians(F.col(lat_col) if isinstance(lat_col, str) else lat_col)
    lo = F.radians(F.col(lon_col) if isinstance(lon_col, str) else lon_col)
    la0, lo0 = math.radians(lat), math.radians(lon)
    dphi = la - F.lit(la0)
    dlmb = lo - F.lit(lo0)
    h = F.pow(F.sin(dphi / 2), 2) + F.cos(la) * F.lit(math.cos(la0)) * F.pow(
        F.sin(dlmb / 2), 2
    )
    # clamp: float error can push h epsilon past 1 at antipodes
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(F.least(h, F.lit(1.0))))


def geo_distance_filter(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    lat: float,
    lon: float,
    distance_km: float,
) -> DataFrame:
    """ES geo_distance filter: rows within ``distance_km`` of the
    point. NULL coordinates never match (ES missing-field posture)."""
    if distance_km <= 0:
        raise ValueError(f"distance_km must be positive, got {distance_km}")
    # the comparison runs on the 6-dp-rounded distance so the member
    # set is engine-invariant even when a point sits within libm's
    # last ulp of the boundary (same posture as the facet buckets)
    d = F.round(haversine_km(lat_col, lon_col, lat, lon), 6)
    return df.filter(
        F.col(lat_col).isNotNull()
        & F.col(lon_col).isNotNull()
        & (d <= F.lit(float(distance_km)))
    )


def geo_distance_facet(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    lat: float,
    lon: float,
    ranges: list[tuple[float | None, float | None]],
    value_field: str | None = None,
) -> DataFrame:
    """ES geo_distance facet: the core range facet over the computed
    distance — one row per range (overlap allowed, half-open
    [from, to) km), count + value stats, empty ranges kept."""
    from .facets import range_facet

    d = F.round(haversine_km(lat_col, lon_col, lat, lon), 6)
    base = df.filter(F.col(lat_col).isNotNull() & F.col(lon_col).isNotNull())
    proj = [d.alias("__dist__")]
    if value_field:
        proj.append(F.col(value_field))
    return range_facet(
        base.select(*proj),
        "__dist__",
        ranges,
        value_field=value_field,
    )
