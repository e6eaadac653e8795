"""SSSP path family + APSP against pure-Python oracles.

Reference semantics under test:
- ``apps/sssp/sssp_path.h`` — (pred, node, dist) tree rows
- ``apps/sssp/sssp_has_path.h`` — source→target reachability
- ``apps/sssp/sssp_average_length.h`` — mean of all-pairs sssp lengths
- ``apps/apsp/all_pairs_shortest_path_length.h`` — per-source BFS depth
"""

from __future__ import annotations

import heapq
import math
from collections import defaultdict

from graphscope_spark.operators.traversal import (
    apsp_lengths,
    multi_source_sssp,
    sssp_average_length,
    sssp_has_path,
    sssp_path,
)
from graphscope_spark.sources.synthetic import gen_edges, gen_weighted_edges
from tests.conftest import make_graph, make_weighted_graph

VS, WES = gen_weighted_edges(n=80, m=400, seed=13)
UVS, UES = gen_edges(n=70, m=260, seed=5)


def _dijkstra(adj, src):
    dist = {src: 0.0}
    pq = [(0.0, src)]
    while pq:
        d, u = heapq.heappop(pq)
        if d > dist.get(u, math.inf):
            continue
        for v, w in adj[u]:
            nd = d + w
            if nd < dist.get(v, math.inf):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    return dist


def _adj(wedges):
    adj = defaultdict(list)
    for u, v, w in wedges:
        adj[u].append((v, float(w)))
    return adj


def test_sssp_path_tree(spark):
    g = make_weighted_graph(spark, VS, WES)
    src = min(VS)
    adj = _adj(WES)
    dist = _dijkstra(adj, src)
    rows = {r["id"]: (r["pred"], r["dist"])
            for r in sssp_path(g, src).collect()}
    assert set(rows) == set(dist)
    for v, (pred, d) in rows.items():
        assert math.isclose(d, dist[v], abs_tol=1e-09)
        if v == src:
            assert pred is None
        else:
            # pred is the MIN id among edges u→v with dist(u)+w = dist(v)
            cands = [u for u, vv, w in WES
                     if vv == v and u in dist
                     and math.isclose(dist[u] + w, d, abs_tol=1e-09)]
            assert pred == min(cands)


def test_sssp_has_path(spark):
    g = make_graph(spark, UVS, UES)
    out = defaultdict(set)
    for u, v in UES:
        out[u].add(v)

    def reach(s):
        seen, stack = {s}, [s]
        while stack:
            u = stack.pop()
            for v in out[u]:
                if v not in seen:
                    seen.add(v)
                    stack.append(v)
        return seen

    src = min(UVS)
    r = reach(src)
    hit = max(r)
    miss = next(v for v in sorted(UVS) if v not in r) if r != set(UVS) else None
    assert sssp_has_path(g, src, hit) is True
    if miss is not None:
        assert sssp_has_path(g, src, miss) is False
    assert sssp_has_path(g, src, src) is True


def test_multi_source_and_avg_length(spark):
    g = make_weighted_graph(spark, VS, WES)
    srcs = sorted(VS)[:5]
    adj = _adj(WES)
    want = {}
    for s in srcs:
        for v, d in _dijkstra(adj, s).items():
            want[(s, v)] = d
    sdf = spark.createDataFrame([(int(s),) for s in srcs], "id long")
    got = {(r["source"], r["id"]): r["dist"]
           for r in multi_source_sssp(g, sdf).collect()}
    assert set(got) == set(want)
    for k in want:
        assert math.isclose(got[k], want[k], abs_tol=1e-09)

    pairs = [d for (s, v), d in want.items() if s != v]
    want_avg = sum(pairs) / len(pairs)
    got_avg = sssp_average_length(g, sources=sdf)
    assert math.isclose(got_avg, want_avg, rel_tol=1e-09)


def test_apsp_lengths_unweighted(spark):
    g = make_graph(spark, UVS, UES)
    srcs = sorted(UVS)[:4]
    out = defaultdict(set)
    for u, v in UES:
        out[u].add(v)
    want = {}
    for s in srcs:
        depth = {s: 0}
        frontier = [s]
        d = 0
        while frontier:
            d += 1
            nxt = []
            for u in frontier:
                for v in out[u]:
                    if v not in depth:
                        depth[v] = d
                        nxt.append(v)
            frontier = nxt
        for v, dd in depth.items():
            want[(s, v)] = dd
    sdf = spark.createDataFrame([(int(s),) for s in srcs], "id long")
    got = {(r["source"], r["id"]): r["dist"]
           for r in apsp_lengths(g, sources=sdf).collect()}
    assert got == want
