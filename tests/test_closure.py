"""Transitive-closure correctness vs a networkx oracle (SURVEY.md §5),
on hand-built graphs: chain, star, two components, self-loop,
duplicate edges, plus a randomized (fixed-seed) graph."""

import networkx as nx
import pytest

from polars_iptools_spark.operators.closure import connected_components

CASES = {
    "chain": [(1, 2), (2, 3), (3, 4), (4, 5)],
    "star": [(10, 1), (10, 2), (10, 3)],
    "two_components": [(1, 2), (2, 3), (7, 8)],
    "self_loop": [(1, 1), (1, 2), (5, 5)],
    "dup_edges": [(1, 2), (2, 1), (1, 2), (3, 4)],
}


def oracle(edges):
    g = nx.Graph()
    g.add_edges_from(edges)
    out = {}
    for comp in nx.connected_components(g):
        root = min(comp)
        for n in comp:
            out[n] = root
    return out


def spark_cc(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = connected_components(df).collect()
    return {r.node: r.component for r in rows}


@pytest.mark.parametrize("name", list(CASES))
def test_closure_matches_networkx(spark, name):
    edges = CASES[name]
    assert spark_cc(spark, edges) == oracle(edges)


def test_closure_random_graph(spark):
    import random

    rnd = random.Random(42)
    edges = [(rnd.randrange(200), rnd.randrange(200)) for _ in range(300)]
    edges = [(a, b) for a, b in edges]
    assert spark_cc(spark, edges) == oracle(edges)
