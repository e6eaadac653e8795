"""FLASH-family extras: personalized PageRank, harmonic centrality,
double-sweep diameter, deterministic Luby MIS — vs pure-Python
oracles / structural properties."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

from pyspark.sql import functions as F

from graphscope_spark.operators.centrality import harmonic_centrality
from graphscope_spark.operators.misc import (
    diameter_approx,
    maximal_independent_set,
)
from graphscope_spark.operators.pagerank import personalized_pagerank
from graphscope_spark.sources.synthetic import gen_edges
from tests.conftest import make_graph

VS, ES = gen_edges(n=60, m=280, seed=29)


def _ppr_oracle(vertices, edges, src, alpha, rounds):
    out = defaultdict(list)
    for u, v in edges:
        out[u].append(v)
    r = {v: (1.0 if v == src else 0.0) for v in vertices}
    dangling = alpha * sum(r[v] for v in vertices if not out[v])
    for _ in range(rounds):
        nxt = dict.fromkeys(vertices, 0.0)
        for u in vertices:
            if out[u]:
                share = r[u] / len(out[u])
                for v in out[u]:
                    nxt[v] += alpha * share
        nxt[src] += (1.0 - alpha) + dangling
        r = nxt
        dangling = alpha * sum(r[v] for v in vertices if not out[v])
    return r


def test_personalized_pagerank(spark):
    g = make_graph(spark, VS, ES)
    src = min(VS)
    got = {r["id"]: r["rank"]
           for r in personalized_pagerank(
               g, src, alpha=0.85, max_iter=8, tol=0.0).collect()}
    want = _ppr_oracle(VS, ES, src, 0.85, 8)
    for v in VS:
        assert math.isclose(got[v], want[v], abs_tol=1e-09), v


def test_harmonic_centrality(spark):
    g = make_graph(spark, VS, ES, directed=False)
    nbrs = defaultdict(set)
    for u, v in ES:
        nbrs[u].add(v)
        nbrs[v].add(u)
    srcs = sorted(VS)[:6]

    def hc(s):
        depth = {s: 0}
        fr, d = [s], 0
        while fr:
            d += 1
            nf = []
            for u in fr:
                for w in nbrs[u]:
                    if w not in depth:
                        depth[w] = d
                        nf.append(w)
            fr = nf
        return sum(1.0 / dd for v, dd in depth.items() if dd > 0)

    sdf = spark.createDataFrame([(int(s),) for s in srcs], "id long")
    got = {r["id"]: r["hc"]
           for r in harmonic_centrality(g, sources=sdf).collect()}
    for s in srcs:
        assert math.isclose(got[s], hc(s), abs_tol=1e-09), s


def test_diameter_approx(spark):
    g = make_graph(spark, VS, ES)
    nbrs = defaultdict(set)
    for u, v in ES:
        nbrs[u].add(v)
        nbrs[v].add(u)

    def ecc(s):
        depth = {s: 0}
        fr, d = [s], 0
        while fr:
            d += 1
            nf = []
            for u in fr:
                for w in nbrs[u]:
                    if w not in depth:
                        depth[w] = d
                        nf.append(w)
            fr = nf
        return depth

    d1 = ecc(min(VS))
    e1 = max(d1.values())
    far = min(v for v, d in d1.items() if d == e1)
    lb_want = max(ecc(far).values())
    lb, got_far, got_e1 = diameter_approx(g)
    assert (lb, got_far, got_e1) == (lb_want, far, e1)
    # lower bound property vs the true diameter
    true_diam = max(max(ecc(s).values()) for s in VS)
    assert lb <= true_diam


def test_mis_properties_and_determinism(spark):
    g = make_graph(spark, VS, ES)
    got = {r["id"]: r["in_mis"]
           for r in maximal_independent_set(g).collect()}
    mis = {v for v, m in got.items() if m == 1}
    nbrs = defaultdict(set)
    for u, v in ES:
        if u != v:
            nbrs[u].add(v)
            nbrs[v].add(u)
    # independent: no two members adjacent
    for v in mis:
        assert not (nbrs[v] & mis), v
    # maximal: every non-member has a member neighbor
    for v in set(VS) - mis:
        assert nbrs[v] & mis, v

    # determinism: replay Luby with the same h60 priorities
    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    pri = {v: (h60(f"m:{v}"), v) for v in VS}
    active, want = set(VS), set()
    while active:
        winners = {v for v in active
                   if all(pri[v] < pri[u]
                          for u in nbrs[v] if u in active)}
        want |= winners
        rem = set(winners)
        for w in winners:
            rem |= nbrs[w] & active
        active -= rem
    assert mis == want


def test_articlerank(spark):
    from graphscope_spark.operators.pagerank import articlerank

    g = make_graph(spark, VS, ES)
    out = defaultdict(list)
    for u, v in ES:
        out[u].append(v)
    n = len(VS)
    avg = sum(len(out[v]) for v in VS) / n
    d = 0.85
    r = dict.fromkeys(VS, 0.0)
    for _ in range(6):
        nxt = dict.fromkeys(VS, 0.0)
        for u in VS:
            if out[u]:
                share = d * r[u] / (len(out[u]) + avg)
                for v in out[u]:
                    nxt[v] += share
        r = {v: nxt[v] + (1 - d) for v in VS}
    got = {row["id"]: row["rank"]
           for row in articlerank(g, max_iter=6).collect()}
    for v in VS:
        assert math.isclose(got[v], r[v], abs_tol=1e-09), v


def test_maximal_matching_properties_and_determinism(spark):
    from graphscope_spark.operators.misc import maximal_matching

    g = make_graph(spark, VS, ES)
    got = {(r["src"], r["dst"]) for r in maximal_matching(g).collect()}
    und = {(min(u, v), max(u, v)) for u, v in ES if u != v}
    assert got <= und
    # valid matching: no vertex in two pairs
    seen = set()
    for u, v in got:
        assert u not in seen and v not in seen
        seen.update((u, v))
    # maximal: every remaining edge touches a matched vertex
    for u, v in und - got:
        assert u in seen or v in seen, (u, v)

    # determinism: replay the local-min rounds with the same priorities
    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    ep = {e: (h60(f"e:{e[0]}:{e[1]}"), e[0], e[1]) for e in und}
    active, want = set(und), set()
    while active:
        vmin = {}
        for e in active:
            for x in e:
                if x not in vmin or ep[e] < vmin[x]:
                    vmin[x] = ep[e]
        winners = {e for e in active
                   if ep[e] == vmin[e[0]] and ep[e] == vmin[e[1]]}
        want |= winners
        mv = {x for e in winners for x in e}
        active = {e for e in active if e[0] not in mv and e[1] not in mv}
    assert got == want


def test_rectangle_count(spark):
    from graphscope_spark.operators.triangles import rectangle_count

    g = make_graph(spark, VS, ES)
    nbrs = defaultdict(set)
    for u, v in ES:
        if u != v:
            nbrs[u].add(v)
            nbrs[v].add(u)
    # brute force: unordered 4-cycles
    want = 0
    vs = sorted(VS)
    for i, a in enumerate(vs):
        for c in vs[i + 1:]:
            w = len(nbrs[a] & nbrs[c])
            want += w * (w - 1) // 2
    want //= 2
    assert rectangle_count(g) == want


def test_densest_subgraph_approx(spark):
    from graphscope_spark.operators.clustering import (
        densest_subgraph_approx,
    )

    g = make_graph(spark, VS, ES)
    density, rnd, members = densest_subgraph_approx(g, eps=0.5)
    got = {r["id"] for r in members.collect()}

    und = {(min(u, v), max(u, v)) for u, v in ES if u != v}
    nbrs = defaultdict(set)
    for u, v in und:
        nbrs[u].add(v)
        nbrs[v].add(u)
    cur, best, bestk, bestset, k = set(VS), -1.0, -1, None, 0
    while cur:
        m = sum(1 for a, b in und if a in cur and b in cur)
        rho = m / len(cur)
        if rho > best:
            best, bestk, bestset = rho, k, set(cur)
        deg = defaultdict(int)
        for a, b in und:
            if a in cur and b in cur:
                deg[a] += 1
                deg[b] += 1
        cur = {v for v in cur if deg[v] > 3.0 * rho}
        k += 1
    assert got == bestset
    assert rnd == bestk
    assert math.isclose(density, best, abs_tol=1e-09)


def test_directed_triangle_census(spark):
    from graphscope_spark.operators.triangles import (
        directed_triangle_census,
    )
    from itertools import combinations

    g = make_graph(spark, VS, ES)
    arcs = {(u, v) for u, v in ES if u != v}
    nbrs = defaultdict(set)
    for u, v in arcs:
        nbrs[u].add(v)
        nbrs[v].add(u)
    want_cyc = want_tr = 0
    for a, b, c in combinations(sorted(VS), 3):
        if b in nbrs[a] and c in nbrs[b] and c in nbrs[a]:
            f = {p: int(p in arcs)
                 for p in [(a, b), (b, a), (b, c), (c, b), (a, c), (c, a)]}
            if (f[(a, b)] + f[(b, a)] == 1
                    and f[(b, c)] + f[(c, b)] == 1
                    and f[(a, c)] + f[(c, a)] == 1):
                cyc = ((f[(a, b)] and f[(b, c)] and f[(c, a)])
                       or (f[(b, a)] and f[(c, b)] and f[(a, c)]))
                if cyc:
                    want_cyc += 1
                else:
                    want_tr += 1
    got_cyc, got_tr = directed_triangle_census(g)
    assert (got_cyc, got_tr) == (want_cyc, want_tr)


def test_k4_count(spark):
    from graphscope_spark.operators.triangles import k4_count
    from itertools import combinations

    g = make_graph(spark, VS, ES)
    nbrs = defaultdict(set)
    for u, v in ES:
        if u != v:
            nbrs[u].add(v)
            nbrs[v].add(u)
    want = sum(
        1
        for a, b, c, d in combinations(sorted(VS), 4)
        if b in nbrs[a] and c in nbrs[a] and d in nbrs[a]
        and c in nbrs[b] and d in nbrs[b] and d in nbrs[c]
    )
    assert k4_count(g) == want
