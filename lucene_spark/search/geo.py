"""Geo-spatial queries over lat/lon doc columns.

≙ the reference's LatLonPoint surface (core/document/LatLonPoint.java):
``newBoxQuery`` (:219) and ``newDistanceQuery`` (:295) filter points, and
``LatLonDocValuesField.newDistanceSort`` orders by distance.  The
reference encodes points into a BKD tree and walks cells; here lat/lon
are plain numeric doc columns (the columnar substrate — SURVEY.md §1.1),
so a box is two Catalyst range predicates (parquet min/max pruned) and a
distance circle is the box of its bounding rectangle plus an exact
haversine post-filter — the same two-phase shape as the BKD walk's
relate-cell-then-check-point.

Distance uses the haversine great-circle formula on the reference's
mean earth radius TO_METERS = 6_371_008.7714 m
(core/util/SloppyMath.java:183).  SloppyMath approximates asin/cos with
table-driven polynomials for speed; we use exact libm trig — documented
deviation, sub-centimeter, identical on the DuckDB twin.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

TO_METERS = 6_371_008.7714  # SloppyMath.java:183 (mean earth radius)


def haversine_meters(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in meters (SloppyMath.haversinMeters:47-58):
    2R * asin(min(1, sqrt(h/2))) with h the haversine sort key."""
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    h = (
        F.pow(F.sin(dlat / 2), 2)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.pow(F.sin(dlon / 2), 2)
    )
    return F.lit(2.0 * TO_METERS) * F.asin(
        F.least(F.lit(1.0), F.sqrt(h * 0.5 * 2.0))
    )


def box_predicate(
    lat_col: str,
    lon_col: str,
    min_lat: float,
    max_lat: float,
    min_lon: float,
    max_lon: float,
) -> Column:
    """LatLonPoint.newBoxQuery:219 — a lat range AND a lon range; when
    min_lon > max_lon the box crosses the dateline and the lon predicate
    becomes the union of the two halves (the reference splits the BKD
    query range the same way)."""
    lat = F.col(lat_col)
    lon = F.col(lon_col)
    pred = (lat >= min_lat) & (lat <= max_lat)
    if min_lon <= max_lon:
        pred = pred & (lon >= min_lon) & (lon <= max_lon)
    else:  # dateline crossing
        pred = pred & ((lon >= min_lon) | (lon <= max_lon))
    return pred


def distance_predicate(
    lat_col: str, lon_col: str, lat: float, lon: float, radius_m: float
) -> Column:
    """LatLonPoint.newDistanceQuery:295 — points within ``radius_m``
    meters of (lat, lon): a bounding-box pre-filter (cheap, scan-pruned)
    AND the exact haversine check, mirroring GeoUtils.Circle -> bounding
    rectangle -> per-point distance."""
    # bounding rectangle (clamped at the poles; lon box widens by the
    # radius scaled at this latitude)
    dlat = math.degrees(radius_m / TO_METERS)
    min_lat, max_lat = max(-90.0, lat - dlat), min(90.0, lat + dlat)
    box = (F.col(lat_col) >= min_lat) & (F.col(lat_col) <= max_lat)
    cos_lat = math.cos(math.radians(min(89.9999, abs(lat) + dlat)))
    if cos_lat > 1e-9:
        dlon = math.degrees(radius_m / (TO_METERS * cos_lat))
        if dlon < 180.0:
            lo, hi = lon - dlon, lon + dlon
            if lo >= -180.0 and hi <= 180.0:
                box = box & (F.col(lon_col) >= lo) & (F.col(lon_col) <= hi)
            # else: dateline wrap — skip the lon pre-filter, exact check rules
    exact = (
        haversine_meters(
            F.lit(float(lat)), F.lit(float(lon)), F.col(lat_col), F.col(lon_col)
        )
        <= radius_m
    )
    return box & exact


def distance_topk(
    docs: DataFrame,
    lat_col: str,
    lon_col: str,
    lat: float,
    lon: float,
    radius_m: float,
    k: int,
) -> DataFrame:
    """(doc_id, ..., dist_m): the k nearest docs within ``radius_m`` of
    the center, distance asc — newDistanceQuery composed with
    LatLonDocValuesField.newDistanceSort.  TakeOrderedAndProject keeps
    the global cut at k rows; the distance expression is pure JVM."""
    d = haversine_meters(
        F.lit(float(lat)), F.lit(float(lon)), F.col(lat_col), F.col(lon_col)
    )
    return (
        docs.filter(distance_predicate(lat_col, lon_col, lat, lon, radius_m))
        .withColumn("dist_m", d)
        .orderBy(F.asc("dist_m"), F.asc("doc_id"))
        .limit(k)
    )


def polygon_predicate(
    lat_col: str, lon_col: str, vertices: list
) -> Column:
    """LatLonPoint.newPolygonQuery analog (core/document/LatLonPoint.java;
    geo/Polygon.java): point-in-polygon by ray casting (odd crossing
    number), the same test GeoUtils applies per point after BKD cell
    relation.  ``vertices`` = [(lat, lon), ...] of a simple polygon
    (closing edge implied).  Boundary points follow the crossing-number
    convention (left/bottom edges inside), matching the reference's
    tie-handling in spirit; exact on-edge behavior is undefined there
    too.

    Pure JVM: the edge list is a literal array; F.aggregate folds the
    crossing count — no UDF, whole-stage codegen keeps it in the scan
    filter."""
    px, py = F.col(lon_col), F.col(lat_col)
    n = len(vertices)
    edges = F.array(
        *[
            F.struct(
                F.lit(float(vertices[i][1])).alias("x1"),
                F.lit(float(vertices[i][0])).alias("y1"),
                F.lit(float(vertices[(i + 1) % n][1])).alias("x2"),
                F.lit(float(vertices[(i + 1) % n][0])).alias("y2"),
            )
            for i in range(n)
        ]
    )
    crossings = F.aggregate(
        edges,
        F.lit(0),
        lambda acc, e: acc
        + F.when(
            ((e["y1"] > py) != (e["y2"] > py))
            & (
                px
                < (e["x2"] - e["x1"]) * (py - e["y1"]) / (e["y2"] - e["y1"])
                + e["x1"]
            ),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    return crossings % 2 == 1


def polygon_sql_predicate(lat_expr: str, lon_expr: str, vertices: list) -> str:
    """DuckDB twin of polygon_predicate — identical crossing fold."""
    n = len(vertices)
    terms = []
    for i in range(n):
        y1, x1 = float(vertices[i][0]), float(vertices[i][1])
        y2, x2 = float(vertices[(i + 1) % n][0]), float(vertices[(i + 1) % n][1])
        terms.append(
            f"(CASE WHEN (({y1!r} > {lat_expr}) <> ({y2!r} > {lat_expr}))"
            f" AND {lon_expr} < ({x2!r} - {x1!r}) * ({lat_expr} - {y1!r})"
            f" / ({y2!r} - {y1!r}) + {x1!r} THEN 1 ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ") % 2 = 1"
