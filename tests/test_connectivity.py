"""SCC (trim + coloring + pivot reach) vs a pure-Python Kosaraju
oracle — reference ``apps/flash/connectivity/scc.h`` semantics with
min-member-id labels."""

from __future__ import annotations

from collections import defaultdict

import pytest

from graphscope_spark.operators.connectivity import scc
from graphscope_spark.sources.synthetic import gen_edges
from tests.conftest import make_graph


def _kosaraju(vertices, edges):
    out, rev = defaultdict(set), defaultdict(set)
    for u, v in edges:
        if u != v:
            out[u].add(v)
            rev[v].add(u)
    visited, order = set(), []
    for s in vertices:
        if s in visited:
            continue
        stack = [(s, iter(list(out.get(s, ()))))]
        visited.add(s)
        while stack:
            node, it = stack[-1]
            advanced = False
            for w in it:
                if w not in visited:
                    visited.add(w)
                    stack.append((w, iter(list(out.get(w, ())))))
                    advanced = True
                    break
            if not advanced:
                order.append(node)
                stack.pop()
    label = {}
    for s in reversed(order):
        if s in label:
            continue
        comp, stack = [], [s]
        label[s] = s
        while stack:
            u = stack.pop()
            comp.append(u)
            for w in rev.get(u, ()):
                if w not in label:
                    label[w] = s
                    stack.append(w)
        mn = min(comp)
        for u in comp:
            label[u] = mn
    return label


@pytest.mark.parametrize("seed,n,m", [(31, 40, 90), (7, 60, 150)])
def test_scc(spark, seed, n, m):
    vs, es = gen_edges(n=n, m=m, seed=seed)
    g = make_graph(spark, vs, es)
    got = {r["id"]: r["scc"] for r in scc(g).collect()}
    want = _kosaraju(vs, es)
    assert got == want


def test_scc_dag_all_singletons(spark):
    vs = list(range(10))
    es = [(i, j) for i in vs for j in vs if i < j and (i + j) % 3 == 0]
    g = make_graph(spark, vs, es)
    got = {r["id"]: r["scc"] for r in scc(g).collect()}
    assert got == {v: v for v in vs}


def test_scc_two_cycles_and_bridge(spark):
    # 0→1→2→0 and 5→6→5, bridged 2→5; plus isolated 9
    vs = [0, 1, 2, 5, 6, 9]
    es = [(0, 1), (1, 2), (2, 0), (5, 6), (6, 5), (2, 5)]
    g = make_graph(spark, vs, es)
    got = {r["id"]: r["scc"] for r in scc(g).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 5: 5, 6: 5, 9: 9}
