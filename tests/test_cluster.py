"""connected_components (large-star/small-star) vs a union-find oracle."""

import random

import pytest

from lucene_spark.pipeline.cluster import connected_components


def _uf_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return sorted((x, find(x)) for x in parent)


def _run(spark, edges, driver_threshold=200_000):
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = connected_components(df, driver_threshold=driver_threshold)
    return sorted((r["node"], r["component"]) for r in got.collect())


def test_empty(spark):
    df = spark.createDataFrame([], "doc_a long, doc_b long")
    assert connected_components(df).collect() == []


def test_single_edge(spark):
    assert _run(spark, [(5, 2)]) == [(2, 2), (5, 2)]


def test_self_loop_only(spark):
    df = spark.createDataFrame([(3, 3)], "doc_a long, doc_b long")
    assert connected_components(df).collect() == []


@pytest.mark.parametrize("thr", [0, 200_000])
def test_long_chain(spark, thr):
    # path graph: worst case for naive label propagation (diameter = n),
    # large-star/small-star must still converge within the round bound;
    # thr=0 forces the distributed rounds, default takes driver union-find
    n = 64
    edges = [(i, i + 1) for i in range(n)]
    random.Random(7).shuffle(edges)
    got = _run(spark, edges, driver_threshold=thr)
    assert got == [(i, 0) for i in range(n + 1)]


def test_two_cliques_and_bridge(spark):
    a = [(i, j) for i in range(10, 15) for j in range(i + 1, 15)]
    b = [(i, j) for i in range(20, 25) for j in range(i + 1, 25)]
    got = _run(spark, a + b + [(14, 20)])
    expect = [(i, 10) for i in range(10, 15)] + [(i, 10) for i in range(20, 25)]
    assert got == sorted(expect)


@pytest.mark.parametrize("seed,thr", [(1, 0), (2, 0), (3, 0), (1, 200_000)])
def test_random_graphs_vs_union_find(spark, seed, thr):
    rng = random.Random(seed)
    n = 200
    edges = [
        (rng.randrange(n), rng.randrange(n))
        for _ in range(150)
    ]
    edges = [(u, v) for u, v in edges if u != v]
    assert _run(spark, edges, driver_threshold=thr) == _uf_components(edges)
