"""misc/lpa_u2i apps vs inline pure-Python oracles."""

import math
from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from graphscope_spark.operators.lpa_u2i import lpa_u2i
from graphscope_spark.operators.misc import (
    average_degree_connectivity,
    degree_assortativity,
    node_boundary,
    voterank,
)
from graphscope_spark.sources.synthetic import gen_edges

from tests.conftest import make_graph

VS, ES = gen_edges(n=60, m=300, seed=21)


def test_degree_assortativity(spark):
    g = make_graph(spark, VS, ES)
    outd = defaultdict(int)
    ind = defaultdict(int)
    for u, v in ES:
        outd[u] += 1
        ind[v] += 1
    xs = [outd[u] for u, v in ES]
    ys = [ind[v] for u, v in ES]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    cov = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    sx = math.sqrt(sum((x - mx) ** 2 for x in xs))
    sy = math.sqrt(sum((y - my) ** 2 for y in ys))
    want = cov / (sx * sy)
    assert math.isclose(degree_assortativity(g), want, abs_tol=1e-09)


def test_average_degree_connectivity(spark):
    g = make_graph(spark, VS, ES)
    nbrs = defaultdict(set)
    for u, v in ES:
        if u != v:
            nbrs[u].add(v)
            nbrs[v].add(u)
    per_k = defaultdict(list)
    for v in VS:
        for u in nbrs[v]:
            per_k[len(nbrs[v])].append(len(nbrs[u]))
    want = {k: sum(vals) / len(vals) for k, vals in per_k.items()}
    got = {
        r["degree"]: r["avg_nbr_degree"]
        for r in average_degree_connectivity(g).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert math.isclose(got[k], want[k], abs_tol=1e-09)


def test_node_boundary(spark):
    g = make_graph(spark, VS, ES)
    s = [v for v in VS if v % 5 == 0]
    nbrs = defaultdict(set)
    for u, v in ES:
        if u != v:
            nbrs[u].add(v)
            nbrs[v].add(u)
    want = set()
    for v in s:
        want |= nbrs[v]
    want -= set(s)
    sdf = spark.createDataFrame([(int(x),) for x in s], "id long")
    got = {r["id"] for r in node_boundary(g, sdf).collect()}
    assert got == want


def _voterank_oracle(vertices, edges, num_seeds):
    out_nbrs = defaultdict(list)
    in_nbrs = defaultdict(list)
    for u, v in edges:
        out_nbrs[u].append(v)
        in_nbrs[v].append(u)
    n = len(vertices)
    # NetworkX ⟨k⟩ counts both endpoints of every directed edge: 2m/n
    dampen = n / (2.0 * len(edges))
    va = {v: 1.0 for v in vertices}
    elected = []
    for _ in range(num_seeds):
        # NetworkX: for edge (n, nbr) vote_rank[n] += va[nbr] —
        # score(v) sums the abilities of v's OUT-neighbors
        score = {
            v: sum(va[u] for u in out_nbrs[v])
            for v in vertices
            if v not in set(elected)
        }
        winner = max(score.items(), key=lambda kv: (kv[1], -kv[0]))
        if winner[1] <= 0:
            break
        w = winner[0]
        elected.append(w)
        va[w] = 0.0
        for x in out_nbrs[w]:
            va[x] = max(va[x] - dampen, 0.0)
    return elected


def test_voterank(spark):
    g = make_graph(spark, VS, ES)
    got = [
        r["id"]
        for r in voterank(g, num_seeds=5).orderBy("rank").collect()
    ]
    assert got == _voterank_oracle(VS, ES, 5)


def _lpa_u2i_oracle(be, rounds):
    users = sorted({u for u, _, _ in be})
    items = sorted({i for _, i, _ in be})
    ul = {u: u for u in users}
    il = {i: i for i in items}
    by_item = defaultdict(list)
    by_user = defaultdict(list)
    for u, i, w in be:
        by_item[i].append((u, w))
        by_user[u].append((i, w))
    for _ in range(rounds):
        nil = {}
        for i in items:
            votes = defaultdict(float)
            for u, w in by_item[i]:
                votes[ul[u]] += w
            nil[i] = (
                max(votes.items(), key=lambda kv: (kv[1], -kv[0]))[0]
                if votes else il[i]
            )
        il = nil
        nul = {}
        for u in users:
            votes = defaultdict(float)
            for i, w in by_user[u]:
                votes[il[i]] += w
            nul[u] = (
                max(votes.items(), key=lambda kv: (kv[1], -kv[0]))[0]
                if votes else ul[u]
            )
        ul = nul
    return ul, il


def test_lpa_u2i(spark):
    import random

    rng = random.Random(9)
    be = []
    seen = set()
    for _ in range(160):
        u, i = rng.randrange(30), 100 + rng.randrange(25)
        if (u, i) in seen:
            continue
        seen.add((u, i))
        be.append((u, i, float(rng.randint(1, 5))))
    df = spark.createDataFrame(be, "user long, item long, weight double")
    ulab, ilab = lpa_u2i(df, max_round=4)
    want_u, want_i = _lpa_u2i_oracle(be, 4)
    assert {r["user"]: r["label"] for r in ulab.collect()} == want_u
    assert {r["item"]: r["label"] for r in ilab.collect()} == want_i
