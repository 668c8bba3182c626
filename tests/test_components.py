"""Connected components (large-star/small-star) vs a union-find oracle."""

import random

import pytest

from kapra_timeseries_anonymization_spark.operators.components import (
    connected_components,
)


def _uf_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        if a == b:
            continue  # operator contract: self-loops are ignored entirely
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def _run(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["component_id"]
        for r in connected_components(df).collect()
    }
    assert got == _uf_components(edges)


def test_two_triangles_and_isolated_edge(spark):
    _run(spark, [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (20, 21)])


def test_long_path_converges_logarithmically(spark):
    # a 64-node chain: label propagation would need 63 rounds; the
    # star alternation must finish in far fewer (O(log n))
    edges = [(i, i + 1) for i in range(63)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = dict(
        connected_components(df, max_iter=12).collect()
    )  # raises RuntimeError if >12 rounds
    assert set(got.values()) == {0}
    assert set(got) == set(range(64))


def test_duplicates_reversals_selfloops(spark):
    _run(spark, [(2, 1), (1, 2), (3, 3), (3, 2), (5, 4), (4, 5), (6, 6)])


@pytest.mark.parametrize("seed", [0, 1])
def test_random_graph(spark, seed):
    rng = random.Random(seed)
    n = 400
    edges = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(300)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    _run(spark, edges)


def test_empty(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert connected_components(df).count() == 0
