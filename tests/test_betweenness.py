"""Brandes betweenness vs a pure-Python oracle (directed, undirected,
sampled sources, normalized)."""

from __future__ import annotations

import math
from collections import defaultdict, deque

import pytest

from graphscope_spark.operators.betweenness import betweenness_centrality
from graphscope_spark.sources.synthetic import gen_edges
from tests.conftest import make_graph

VS, ES = gen_edges(n=60, m=240, seed=17)


def _brandes(vertices, edges, directed, sources=None, normalized=False):
    adj = defaultdict(list)
    for u, v in set(edges):
        adj[u].append(v)
        if not directed:
            adj[v].append(u)
    if not directed:
        for k in adj:
            adj[k] = sorted(set(adj[k]))
    bc = dict.fromkeys(vertices, 0.0)
    for s in (sources if sources is not None else vertices):
        # forward BFS: sigma + predecessor lists
        sigma = defaultdict(float)
        sigma[s] = 1.0
        dist = {s: 0}
        preds = defaultdict(list)
        order = []
        q = deque([s])
        while q:
            u = q.popleft()
            order.append(u)
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
                if dist[v] == dist[u] + 1:
                    sigma[v] += sigma[u]
                    preds[v].append(u)
        delta = defaultdict(float)
        for w in reversed(order):
            for v in preds[w]:
                delta[v] += sigma[v] / sigma[w] * (1.0 + delta[w])
            if w != s:
                bc[w] += delta[w]
    n = len(vertices)
    if normalized and n > 2:
        scale = 1.0 / ((n - 1) * (n - 2))
    else:
        scale = 1.0 if directed else 0.5
    return {v: b * scale for v, b in bc.items()}


@pytest.mark.parametrize("directed", [True, False])
def test_betweenness_full(spark, directed):
    g = make_graph(spark, VS, ES, directed=directed)
    got = {r["id"]: r["bc"]
           for r in betweenness_centrality(g).collect()}
    want = _brandes(VS, ES, directed)
    assert set(got) == set(want)
    for v in want:
        assert math.isclose(got[v], want[v], abs_tol=1e-08), (v, got[v], want[v])


def test_betweenness_sampled_normalized(spark):
    g = make_graph(spark, VS, ES, directed=True)
    srcs = sorted(VS)[::7]
    sdf = spark.createDataFrame([(int(s),) for s in srcs], "id long")
    got = {r["id"]: r["bc"]
           for r in betweenness_centrality(
               g, sources=sdf, normalized=True).collect()}
    want = _brandes(VS, ES, True, sources=srcs, normalized=True)
    for v in want:
        assert math.isclose(got[v], want[v], abs_tol=1e-10)


def _edge_brandes(vertices, edges, directed, sources=None,
                  normalized=False):
    from collections import defaultdict, deque

    adj = defaultdict(list)
    for u, v in set(edges):
        adj[u].append(v)
        if not directed:
            adj[v].append(u)
    if not directed:
        for k in adj:
            adj[k] = sorted(set(adj[k]))
    eb = defaultdict(float)
    for s in (sources if sources is not None else vertices):
        sigma = defaultdict(float)
        sigma[s] = 1.0
        dist = {s: 0}
        preds = defaultdict(list)
        order = []
        q = deque([s])
        while q:
            u = q.popleft()
            order.append(u)
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
                if dist[v] == dist[u] + 1:
                    sigma[v] += sigma[u]
                    preds[v].append(u)
        delta = defaultdict(float)
        for w in reversed(order):
            for v in preds[w]:
                c = sigma[v] / sigma[w] * (1.0 + delta[w])
                key = (v, w) if directed else (min(v, w), max(v, w))
                eb[key] += c
                delta[v] += c
    n = len(vertices)
    if normalized and n > 1:
        scale = 1.0 / (n * (n - 1))
    else:
        scale = 1.0 if directed else 0.5
    return {k: v * scale for k, v in eb.items()}


@pytest.mark.parametrize("directed", [True, False])
def test_edge_betweenness(spark, directed):
    from graphscope_spark.operators.betweenness import (
        edge_betweenness_centrality,
    )

    g = make_graph(spark, VS, ES, directed=directed)
    got = {(r["src"], r["dst"]): r["eb"]
           for r in edge_betweenness_centrality(g).collect()}
    want = _edge_brandes(VS, ES, directed)
    assert set(got) == set(want)
    for k in want:
        assert math.isclose(got[k], want[k], abs_tol=1e-08), k
