"""Flagship-four correctness vs the independent oracle, on the tiny
hand-checkable graph and the p2p-like skewed graph (FIXTURES.md §2-3).
Mirrors the reference's golden strategy: allclose for floats
(``test_app.py:206-215``), exact for integers (``:189-200``)."""

import math

import pytest

from graphscope_spark.operators import cdlp, pagerank, triangles, wcc
from graphscope_spark.operators.triangles import global_triangle_count
from graphscope_spark.sources.synthetic import TINY_EDGES, TINY_VERTICES, gen_edges

from tests.conftest import df_to_dict, make_graph
from tests.oracle import cdlp_oracle, pagerank_oracle, triangles_oracle, wcc_oracle

P2P = gen_edges(n=120, m=700, seed=42)

GRAPHS = {
    "tiny": (TINY_VERTICES, TINY_EDGES),
    "p2p_like": P2P,
}


@pytest.mark.parametrize("name", list(GRAPHS))
@pytest.mark.parametrize("directed", [True, False])
def test_pagerank(spark, name, directed):
    vs, es = GRAPHS[name]
    g = make_graph(spark, vs, es, directed=directed)
    if not directed:
        g = make_graph(spark, vs, es, directed=True).undirected()
    got = df_to_dict(pagerank(g, alpha=0.85, max_iter=100, tol=1e-06))
    want = pagerank_oracle(vs, es, alpha=0.85, max_iter=100, tol=1e-06,
                           directed=directed)
    assert set(got) == set(want)
    for v in vs:
        assert math.isclose(got[v], want[v], abs_tol=1e-06), (v, got[v], want[v])


def test_pagerank_fixed_rounds(spark):
    vs, es = GRAPHS["p2p_like"]
    g = make_graph(spark, vs, es, directed=True)
    got = df_to_dict(pagerank(g, alpha=0.85, max_iter=10, tol=0.0))
    want = pagerank_oracle(vs, es, alpha=0.85, max_iter=10, tol=0.0)
    for v in vs:
        assert math.isclose(got[v], want[v], abs_tol=1e-09), (v, got[v], want[v])


@pytest.mark.parametrize("name", list(GRAPHS))
def test_wcc(spark, name):
    vs, es = GRAPHS[name]
    g = make_graph(spark, vs, es, directed=True)
    got = df_to_dict(wcc(g))
    want = wcc_oracle(vs, es)
    assert got == want


def test_wcc_no_pointer_jumping(spark):
    vs, es = GRAPHS["tiny"]
    g = make_graph(spark, vs, es)
    assert df_to_dict(wcc(g, pointer_jumping=False)) == wcc_oracle(vs, es)


@pytest.mark.parametrize("name", list(GRAPHS))
def test_cdlp(spark, name):
    vs, es = GRAPHS[name]
    g = make_graph(spark, vs, es, directed=True)
    got = df_to_dict(cdlp(g, max_round=10))
    want = cdlp_oracle(vs, es, max_round=10, directed=True)
    assert got == want


@pytest.mark.parametrize("name", list(GRAPHS))
def test_triangles(spark, name):
    vs, es = GRAPHS[name]
    g = make_graph(spark, vs, es, directed=True)
    got = df_to_dict(triangles(g))
    want = triangles_oracle(vs, es)
    assert got == want
    assert global_triangle_count(g) == sum(want.values()) // 3
