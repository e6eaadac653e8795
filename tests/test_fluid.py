"""Deterministic synchronous fluid communities vs a pure-Python
replay of the identical update rule, plus a planted-partition sanity
check."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from graphscope_spark.functions.text import h60_py
from graphscope_spark.graph import Graph
from graphscope_spark.operators.fluid import fluid_community


def _graph(spark, edges, nodes, parts=4):
    edf = spark.createDataFrame(sorted(edges), "src long, dst long")
    vdf = spark.createDataFrame([(i,) for i in sorted(nodes)], "id long")
    return Graph.from_edges(edf, directed=True, vertices=vdf,
                            num_partitions=parts).undirected()


def _py_fluid(nodes, edges, s, rounds):
    """Reference replay: same seeds, same synchronous rule."""
    adj = {v: set() for v in nodes}
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    seeds = sorted(nodes, key=lambda v: (h60_py(f"f:{v}"), v))[:s]
    lab = {v: (v if v in seeds else None) for v in nodes}
    plab = {v: None for v in nodes}
    for _ in range(rounds):
        cnt: dict[int, int] = {}
        for v in nodes:
            if lab[v] is not None:
                cnt[lab[v]] = cnt.get(lab[v], 0) + 1
        new = {}
        for v in nodes:
            k: dict[int, int] = {}
            if lab[v] is not None:
                k[lab[v]] = 1
            for u in adj[v]:
                if lab[u] is not None:
                    k[lab[u]] = k.get(lab[u], 0) + 1
            if not k:
                new[v] = lab[v]
                continue
            best = max(k, key=lambda l: (k[l] / cnt[l], -l))
            bd = k[best] / cnt[best]
            improves = (lab[v] is None
                        or bd > k.get(lab[v], 0) / cnt[lab[v]] + 1e-10)
            flip_back = plab[v] is not None and best == plab[v]
            new[v] = best if improves and not flip_back else lab[v]
        plab = dict(lab)
        lab = new
    return {v: (l if l is not None else -1) for v, l in lab.items()}


def test_fluid_matches_python_replay(spark):
    random.seed(31)
    n = 80
    edges = set()
    while len(edges) < 200:
        u, v = random.randrange(n), random.randrange(n)
        if u != v:
            edges.add((min(u, v), max(u, v)))
    g = _graph(spark, edges, range(n))
    got = {r["id"]: r["community"]
           for r in fluid_community(g, num_communities=6,
                                    rounds=8).collect()}
    assert got == _py_fluid(range(n), edges, 6, 8)


def test_fluid_separates_planted_cliques(spark):
    # two 10-cliques joined by one edge; 2 communities must split
    # them (node ids 2..21: the two min-h60 seeds, 11 and 16, land
    # one per clique)
    edges = set()
    for base in (2, 12):
        for i in range(10):
            for j in range(i + 1, 10):
                edges.add((base + i, base + j))
    edges.add((11, 12))
    g = _graph(spark, edges, range(2, 22))
    rows = fluid_community(g, num_communities=2, rounds=8).collect()
    left = {r["community"] for r in rows if r["id"] < 12}
    right = {r["community"] for r in rows if r["id"] >= 12}
    assert len(left) == 1 and len(right) == 1 and left != right
    assert -1 not in left | right


def test_louvain_separates_planted_cliques(spark):
    from graphscope_spark.graph import Graph
    from graphscope_spark.operators.louvain import louvain_one_level
    from itertools import combinations

    # two 5-cliques joined by one bridge edge
    edges = (
        list(combinations(range(5), 2))
        + list(combinations(range(10, 15), 2))
        + [(4, 10)]
    )
    g = Graph.from_edges(
        spark.createDataFrame(edges, ["src", "dst"]), directed=False
    )
    out = {r["id"]: r["community"] for r in
           louvain_one_level(g, rounds=4).collect()}
    left = {out[v] for v in range(5)}
    right = {out[v] for v in range(10, 15)}
    # each clique collapses to one community, and they differ
    assert len(left) == 1 and len(right) == 1 and left != right


def test_louvain_deterministic(spark):
    from graphscope_spark.graph import Graph
    from graphscope_spark.operators.louvain import louvain_one_level

    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5), (5, 3)]
    g = Graph.from_edges(
        spark.createDataFrame(edges, ["src", "dst"]), directed=False
    )
    a = sorted(map(tuple, louvain_one_level(g, rounds=4).collect()))
    b = sorted(map(tuple, louvain_one_level(g, rounds=4).collect()))
    assert a == b


def test_louvain_multilevel_weighted_contraction(spark):
    from graphscope_spark.graph import Graph
    from graphscope_spark.operators.louvain import louvain, louvain_one_level
    from itertools import combinations

    edges = (
        list(combinations(range(5), 2))
        + list(combinations(range(10, 15), 2))
        + [(4, 10)]
    )
    g = Graph.from_edges(
        spark.createDataFrame(edges, ["src", "dst"]), directed=False
    )
    lvl1 = {r["id"]: r["community"] for r in
            louvain_one_level(g, rounds=4).collect()}
    lvl2 = {r["id"]: r["community"] for r in
            louvain(g, levels=2, rounds=4).collect()}
    # weighted contraction keeps the two cliques separate at level 2
    # (an unweighted contraction would see a bare 2-vertex edge and
    # wrongly merge them)
    assert len(set(lvl2.values())) == 2
    # level-2 labels are a coarsening of level 1: same-community
    # vertices never split
    for u in lvl1:
        for v in lvl1:
            if lvl1[u] == lvl1[v]:
                assert lvl2[u] == lvl2[v]


def test_modularity_two_cliques(spark):
    from itertools import combinations
    from graphscope_spark.graph import Graph
    from graphscope_spark.operators.louvain import (
        louvain_one_level, modularity)

    edges = (list(combinations(range(5), 2))
             + list(combinations(range(10, 15), 2)) + [(4, 10)])
    g = Graph.from_edges(
        spark.createDataFrame(edges, ["src", "dst"]), directed=False
    )
    asg = louvain_one_level(g, rounds=4)
    q = modularity(g, asg).first()["modularity"]
    # two 10-edge cliques + 1 bridge, perfect split:
    # Q = 2 * (10/21 - (21/42)^2) = 20/21 - 0.5
    assert abs(q - (20 / 21 - 0.5)) < 1e-6
