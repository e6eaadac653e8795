"""Round-3 batch 2: coloring, onion layers, min edge cover, directed
triangle variants — each checked against an independent pure-Python
implementation of the same deterministic protocol."""

from __future__ import annotations

import hashlib
import random

import networkx as nx
import pytest

from graphscope_spark.graph import Graph
from graphscope_spark.operators.clustering import onion_layers
from graphscope_spark.operators.coloring import greedy_coloring
from graphscope_spark.operators.misc import min_edge_cover
from graphscope_spark.operators.triangles import directed_triangle_variants


def h60py(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


@pytest.fixture(scope="module")
def rand_graph(spark):
    random.seed(11)
    n = 60
    edges = set()
    while len(edges) < 150:
        u, v = random.randrange(n), random.randrange(n)
        if u != v:
            edges.add((min(u, v), max(u, v)))
    G = nx.Graph(sorted(edges))
    G.add_nodes_from(range(n))
    edf = spark.createDataFrame(sorted(edges), "src long, dst long")
    vdf = spark.createDataFrame([(i,) for i in range(n)], "id long")
    g = Graph.from_edges(edf, directed=False, vertices=vdf,
                         num_partitions=4)
    return g, G


def test_coloring_is_proper_and_matches_priority_greedy(spark, rand_graph):
    g, G = rand_graph
    got = {r["id"]: r["color"]
           for r in greedy_coloring(g).collect()}
    # proper coloring
    for u, v in G.edges():
        assert got[u] != got[v], f"edge ({u},{v}) monochromatic"
    # fixpoint == sequential greedy along decreasing (deg, id) priority
    order = sorted(G.nodes(), key=lambda v: (G.degree(v), v), reverse=True)
    exp: dict[int, int] = {}
    for v in order:
        used = {exp[u] for u in G.neighbors(v) if u in exp}
        c = 0
        while c in used:
            c += 1
        exp[v] = c
    assert got == exp


def test_onion_layers_matches_python_peel(spark, rand_graph):
    g, G = rand_graph
    got = {r["id"]: (r["core"], r["layer"])
           for r in onion_layers(g).collect()}
    core = nx.core_number(G) if G.number_of_edges() else {}
    # python peel replicating the operator's protocol
    d = {
        v: sum(1 for u in G.neighbors(v) if core[u] >= core[v])
        for v in G.nodes()
    }
    layer = {v: -1 for v in G.nodes()}
    i = 0
    while True:
        newly = [v for v in G.nodes()
                 if layer[v] == -1 and d[v] <= core[v]]
        if not newly:
            break
        for v in newly:
            layer[v] = i
        ns = set(newly)
        for v in newly:
            for u in G.neighbors(v):
                if layer[u] == -1 and core[u] == core[v]:
                    d[u] -= 1
        _ = ns
        i += 1
    exp = {v: (core[v], layer[v]) for v in G.nodes()}
    assert got == exp


def test_min_edge_cover_matches_python_protocol(spark, rand_graph):
    g, G = rand_graph
    rows = min_edge_cover(g).collect()
    got_pairs = sum(1 for r in rows if r["partner"] >= 0) // 2
    got_cover = got_pairs + sum(
        1 for r in rows if r["partner"] == -1 and r["d"] > 0
    )
    # python edge-local-dominance maximal matching, same h60 priority
    active = {(u, v) for u, v in G.edges()}
    active = {(min(u, v), max(u, v)) for u, v in active}
    matched: set[int] = set()
    pairs = 0
    while active:
        pri = {e: (h60py(f"e:{e[0]}:{e[1]}"), e[0], e[1]) for e in active}
        vmin: dict[int, tuple] = {}
        for e, p in pri.items():
            for v in e:
                if v not in vmin or p < vmin[v]:
                    vmin[v] = p
        winners = [e for e, p in pri.items()
                   if vmin[e[0]] == p and vmin[e[1]] == p]
        assert winners, "no progress"
        for u, v in winners:
            matched.update((u, v))
            pairs += 1
        active = {e for e in active
                  if e[0] not in matched and e[1] not in matched}
    exp_cover = pairs + sum(
        1 for v in G.nodes() if v not in matched and G.degree(v) > 0
    )
    assert (got_pairs, got_cover) == (pairs, exp_cover)


def test_directed_triangle_variants_match_bruteforce(spark):
    random.seed(13)
    n = 40
    edges = set()
    while len(edges) < 160:
        u, v = random.randrange(n), random.randrange(n)
        if u != v:
            edges.add((u, v))
    edf = spark.createDataFrame(sorted(edges), "src long, dst long")
    vdf = spark.createDataFrame([(i,) for i in range(n)], "id long")
    g = Graph.from_edges(edf, directed=True, vertices=vdf,
                         num_partitions=4)
    got = directed_triangle_variants(g)

    E = edges
    out = {u: {v for (a, v) in E if a == u} for u in range(n)}
    inn = {u: {v for (v, a) in E if a == u} for u in range(n)}
    acyclic = sum(len(out[u] & out[v]) for (u, v) in E)
    recip = [(u, v) for (u, v) in E if (v, u) in E]
    in_plus = sum(len(out[u] & out[v]) for (u, v) in recip if u < v)
    out_plus = sum(len(inn[u] & inn[v]) for (u, v) in recip if u < v)
    cycle_plus = sum(len(inn[u] & out[v]) for (u, v) in recip)
    assert got == (acyclic, in_plus, out_plus, cycle_plus)


def test_ivf_full_probe_equals_exact(spark):
    """With n_probe == n_centroids the IVF search is exhaustive and
    must equal brute-force cosine_topk exactly; with n_probe=1 it
    returns a subset ranking with the same determinism contract."""
    import numpy as np

    from graphscope_spark.functions.similarity import (
        cosine_topk, ivf_topk,
    )

    rng = np.random.default_rng(3)
    rows = [(i, [float(x) for x in rng.normal(size=16)])
            for i in range(120)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    q = emb.where("vec_id < 4").selectExpr(
        "vec_id as query_id", "embedding"
    )
    exact = {(r["query_id"], r["vec_id"], r["cos"])
             for r in cosine_topk(emb, q, k=5).collect()}
    full = {(r["query_id"], r["vec_id"], r["cos"])
            for r in ivf_topk(emb, q, k=5, n_centroids=6,
                              n_probe=6).collect()}
    assert full == exact
    part = ivf_topk(emb, q, k=5, n_centroids=6, n_probe=1).collect()
    assert len(part) <= 20 and all(r["cos"] <= 1.0 for r in part)
    # probe-1 results are a subset of each query's bucket, still
    # correctly ranked: cos non-increasing per query
    per_q: dict[int, list[float]] = {}
    for r in sorted(part, key=lambda r: (r["query_id"], -r["cos"])):
        per_q.setdefault(r["query_id"], []).append(r["cos"])
    for vals in per_q.values():
        assert vals == sorted(vals, reverse=True)


def test_degeneracy_ordering_is_valid(spark):
    from graphscope_spark.graph import Graph
    from graphscope_spark.operators.clustering import degeneracy_ordering

    # triangle + pendant chain: degeneracy 2
    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4)]
    g = Graph.from_edges(
        spark.createDataFrame(edges, ["src", "dst"]), directed=True
    ).undirected()
    pos = {r["id"]: r["pos"] for r in degeneracy_ordering(g).collect()}
    assert sorted(pos.values()) == list(range(5))
    sym = {(a, b) for a, b in edges} | {(b, a) for a, b in edges}
    # validity: every vertex has at most 2 (the degeneracy) neighbors
    # LATER in the order
    for v in pos:
        later = sum(
            1 for (a, b) in sym if a == v and pos[b] > pos[v]
        )
        assert later <= 2, (v, later)


def test_link_prediction_family(spark):
    import math
    from graphscope_spark.graph import Graph
    from graphscope_spark.operators.linkpred import (
        adamic_adar, jaccard_coefficient, preferential_attachment)

    # square 0-1-2-3-0: candidates are the two diagonals (0,2), (1,3)
    edges = [(0, 1), (1, 2), (2, 3), (3, 0)]
    g = Graph.from_edges(
        spark.createDataFrame(edges, ["src", "dst"]), directed=False
    )
    jc = {(r["u"], r["v"]): r["jaccard"]
          for r in jaccard_coefficient(g).collect()}
    # N(0)={1,3}, N(2)={1,3}: inter 2, union 2 -> 1.0
    assert jc == {(0, 2): 1.0, (1, 3): 1.0}
    pa = {(r["u"], r["v"]): r["pa"]
          for r in preferential_attachment(g).collect()}
    assert pa == {(0, 2): 4, (1, 3): 4}
    aa = {(r["u"], r["v"]): r["aa"] for r in adamic_adar(g).collect()}
    want = round(2.0 / math.log(2.0), 6)
    assert aa == {(0, 2): want, (1, 3): want}


def test_link_prediction_excludes_existing_edges(spark):
    from graphscope_spark.graph import Graph
    from graphscope_spark.operators.linkpred import jaccard_coefficient

    # triangle: every pair is adjacent -> no candidates at all
    g = Graph.from_edges(
        spark.createDataFrame([(0, 1), (1, 2), (2, 0)], ["src", "dst"]),
        directed=False,
    )
    assert jaccard_coefficient(g).count() == 0
