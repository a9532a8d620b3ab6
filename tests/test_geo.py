"""LatLonPoint analog: box/distance predicates vs a brute-force python
haversine (core/document/LatLonPoint.java:219,295;
core/util/SloppyMath.java:47-58,183)."""

import math

import pytest
from pyspark.sql import functions as F

from lucene_spark.search.geo import (
    TO_METERS,
    box_predicate,
    distance_predicate,
    distance_topk,
    haversine_meters,
)


def brute_haversine(lat1, lon1, lat2, lon2):
    dlat = math.radians(lat2 - lat1)
    dlon = math.radians(lon2 - lon1)
    h = (
        math.sin(dlat / 2) ** 2
        + math.cos(math.radians(lat1))
        * math.cos(math.radians(lat2))
        * math.sin(dlon / 2) ** 2
    )
    return 2 * TO_METERS * math.asin(min(1.0, math.sqrt(h)))


@pytest.fixture(scope="module")
def pts(spark):
    import random

    rnd = random.Random(42)
    rows = [
        (i, rnd.uniform(-85, 85), rnd.uniform(-180, 180)) for i in range(500)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lat double, lon double")
    return df, rows


def test_haversine_matches_brute(spark, pts):
    df, rows = pts
    got = {
        r.doc_id: r.d
        for r in df.select(
            "doc_id",
            haversine_meters(
                F.lit(10.0), F.lit(20.0), F.col("lat"), F.col("lon")
            ).alias("d"),
        ).collect()
    }
    for i, la, lo in rows[:100]:
        assert got[i] == pytest.approx(brute_haversine(10.0, 20.0, la, lo), rel=1e-9)


def test_distance_predicate_exact(pts):
    df, rows = pts
    r_m = 3_000_000.0
    got = {
        r.doc_id
        for r in df.filter(
            distance_predicate("lat", "lon", 45.0, -30.0, r_m)
        ).collect()
    }
    want = {i for i, la, lo in rows if brute_haversine(45.0, -30.0, la, lo) <= r_m}
    assert got == want and got  # non-trivial


def test_box_predicate_dateline(pts):
    df, rows = pts
    # box crossing the dateline: lon in [170, 180] U [-180, -170]
    got = {
        r.doc_id
        for r in df.filter(box_predicate("lat", "lon", -60, 60, 170, -170)).collect()
    }
    want = {
        i
        for i, la, lo in rows
        if -60 <= la <= 60 and (lo >= 170 or lo <= -170)
    }
    assert got == want and got


def test_distance_topk_order(pts):
    df, rows = pts
    top = distance_topk(df, "lat", "lon", 0.0, 0.0, 8_000_000.0, 5).collect()
    want = sorted(
        (brute_haversine(0.0, 0.0, la, lo), i)
        for i, la, lo in rows
        if brute_haversine(0.0, 0.0, la, lo) <= 8_000_000.0
    )[:5]
    assert [r.doc_id for r in top] == [i for _, i in want]
    for r, (d, _) in zip(top, want):
        assert r.dist_m == pytest.approx(d, rel=1e-9)


def test_polygon_predicate_ray_casting(pts):
    from lucene_spark.search.geo import polygon_predicate

    df, rows = pts
    poly = [(5.0, -60.0), (55.0, -5.0), (20.0, 70.0), (-30.0, 10.0)]

    def brute_inside(la, lo):
        n = len(poly)
        c = 0
        for i in range(n):
            y1, x1 = poly[i]
            y2, x2 = poly[(i + 1) % n]
            if (y1 > la) != (y2 > la) and lo < (x2 - x1) * (la - y1) / (y2 - y1) + x1:
                c += 1
        return c % 2 == 1

    got = {
        r.doc_id
        for r in df.filter(polygon_predicate("lat", "lon", poly)).collect()
    }
    want = {i for i, la, lo in rows if brute_inside(la, lo)}
    assert got == want and got
