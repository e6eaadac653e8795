"""Deterministic random walks."""
from pyspark.sql import functions as F

from graphscope_spark.graph import Graph
from graphscope_spark.operators.walks import random_walks


def _graph(spark, num_partitions=None):
    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2), (10, 11), (11, 12)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    return Graph.from_edges(df, directed=True).undirected()


def test_walks_are_valid_and_deterministic(spark):
    g = _graph(spark)
    out = random_walks(g, length=3, seed_mod=10)
    rows = sorted(
        ((r["walk_id"], r["step"], r["v"]) for r in out.collect())
    )
    # seeds: 0 and 10, each walked 3 steps on a connected component —
    # no dead ends on an undirected graph, so 2 * 4 rows
    assert len(rows) == 8
    assert {r[0] for r in rows} == {0, 10}
    # every step moves along an edge
    sym = {(a, b) for a, b in
           [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2), (10, 11), (11, 12)]}
    sym |= {(b, a) for a, b in sym}
    by_walk = {}
    for wid, step, v in rows:
        by_walk.setdefault(wid, {})[step] = v
    for wid, path in by_walk.items():
        assert path[0] == wid
        for s in range(1, 4):
            assert (path[s - 1], path[s]) in sym, (wid, s, path)
    # identical output again (pure function of the graph)
    rows2 = sorted(
        ((r["walk_id"], r["step"], r["v"])
         for r in random_walks(g, length=3, seed_mod=10).collect())
    )
    assert rows == rows2


def test_walks_dead_end_truncates(spark):
    # directed path 0 -> 1 -> 2: walk from 0 stops at the sink
    df = spark.createDataFrame([(0, 1), (1, 2)], ["src", "dst"])
    g = Graph.from_edges(df, directed=True)
    out = random_walks(g, length=5, seed_mod=10)
    rows = sorted((r["step"], r["v"]) for r in out.collect())
    assert rows == [(0, 0), (1, 1), (2, 2)]


def test_sample_neighbors_bounds_and_determinism(spark):
    g = _graph(spark)
    out = [
        (r["src"], r["nbr"])
        for r in __import__("graphscope_spark.operators.walks",
                            fromlist=["sample_neighbors"])
        .sample_neighbors(g, k=2, strategy="hash").collect()
    ]
    sym = {(a, b) for a, b in
           [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2), (10, 11), (11, 12)]}
    sym |= {(b, a) for a, b in sym}
    assert set(out) <= sym
    from collections import Counter
    per_src = Counter(s for s, _ in out)
    assert max(per_src.values()) <= 2
    # vertex 11 has degree 2 -> both kept; vertex 3 degree 2 -> both
    assert per_src[11] == 2
    out2 = [
        (r["src"], r["nbr"])
        for r in __import__("graphscope_spark.operators.walks",
                            fromlist=["sample_neighbors"])
        .sample_neighbors(g, k=2, strategy="hash").collect()
    ]
    assert sorted(out) == sorted(out2)


def test_sample_neighbors_topk(spark):
    g = _graph(spark)
    from graphscope_spark.operators.walks import sample_neighbors

    out = {(r["src"], r["nbr"])
           for r in sample_neighbors(g, k=1, strategy="topk").collect()}
    # topk keeps the smallest neighbor id
    assert (0, 1) in out and (2, 0) in out and (11, 10) in out


def test_negative_sampling_properties(spark):
    from graphscope_spark.operators.walks import negative_sampling
    from tests.conftest import make_graph

    g = make_graph(spark, list(range(10)),
                   [(0, 1), (1, 2), (2, 3), (0, 2)], directed=True)
    neg = negative_sampling(g, k=3)
    rows = [(r["src"], r["neg_dst"]) for r in neg.collect()]
    real = {(0, 1), (1, 2), (2, 3), (0, 2)}
    # no sampled pair is a real edge or a self-loop; ≤ k per vertex
    assert all(p not in real and p[0] != p[1] for p in rows)
    from collections import Counter
    assert max(Counter(s for s, _ in rows).values()) <= 3
    # deterministic
    rows2 = [(r["src"], r["neg_dst"]) for r in negative_sampling(g, k=3).collect()]
    assert sorted(rows) == sorted(rows2)
    # dense-id direct addressing agrees with the ranked dictionary
    # when ids are already 0..n-1
    direct = negative_sampling(g, k=3, dense_rank=False)
    assert sorted(rows) == sorted(
        (r["src"], r["neg_dst"]) for r in direct.collect()
    )
