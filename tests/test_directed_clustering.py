"""Directed clustering coefficient (Fagiolo) vs a pure-Python oracle —
reference ``apps/clustering/clustering.h`` semantics."""

from __future__ import annotations

import math
from collections import defaultdict

from graphscope_spark.operators.clustering import directed_clustering
from graphscope_spark.sources.synthetic import gen_edges
from tests.conftest import make_graph

VS, ES = gen_edges(n=50, m=300, seed=23)


def _oracle(vertices, edges):
    arcs = {(u, v) for u, v in edges if u != v}
    w = defaultdict(int)
    nbrs = defaultdict(set)
    for u, v in arcs:
        w[(u, v)] += 1
        w[(v, u)] += 1
        nbrs[u].add(v)
        nbrs[v].add(u)
    dtot = defaultdict(int)
    for u, v in arcs:
        dtot[u] += 1
        dtot[v] += 1
    rec = {
        v: sum(1 for u in nbrs[v] if (u, v) in arcs and (v, u) in arcs)
        for v in vertices
    }
    out = {}
    for v in vertices:
        t = 0
        ns = sorted(nbrs[v])
        for i, u in enumerate(ns):
            for x in ns[i + 1:]:
                if x in nbrs[u]:
                    t += w[(v, u)] * w[(u, x)] * w[(x, v)]
        d = dtot[v]
        denom = d * (d - 1) - 2 * rec.get(v, 0)
        out[v] = (t / denom) if (d >= 2 and denom > 0) else 0.0
    return out


def test_directed_clustering(spark):
    # the generator makes a directed graph where some pairs end up
    # reciprocal — exercising the d_rec and w=2 terms
    assert any((v, u) in set(ES) for u, v in ES), "need reciprocal pairs"
    g = make_graph(spark, VS, ES, directed=True)
    got = {r["id"]: r["cc"] for r in directed_clustering(g).collect()}
    want = _oracle(VS, ES)
    assert set(got) == set(want)
    for v in want:
        assert math.isclose(got[v], want[v], abs_tol=1e-09), (v, got[v], want[v])
