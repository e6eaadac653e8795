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


def _n2v_py(sym_edges, length, seed_mod, p_inv, q_inv, salt="n2v"):
    """Local replica of the integer-replication biased-draw rule."""
    from graphscope_spark.functions.text import h60_py

    adj = {}
    for a, b in sym_edges:
        adj.setdefault(a, set()).add(b)
    adj = {k: sorted(v) for k, v in adj.items()}
    rows = []
    for seed in sorted({a for a, _ in sym_edges} | {b for _, b in sym_edges}):
        if seed % seed_mod:
            continue
        prev, v = None, seed
        rows.append((seed, 0, seed))
        for s in range(1, length + 1):
            if v not in adj:
                break
            best = None
            for d in adj[v]:
                if d == prev:
                    w = p_inv
                elif prev is not None and d in adj.get(prev, ()):
                    w = 1
                else:
                    w = q_inv
                for r in range(w):
                    h = h60_py(f"{salt}:{seed}:{s}:{v}:{d}:{r}")
                    if best is None or (h, d) < best:
                        best = (h, d)
            prev, v = v, best[1]
            rows.append((seed, s, v))
    return sorted(rows)


def test_node2vec_matches_local_replica_and_is_biased(spark):
    from graphscope_spark.operators.walks import node2vec_walks

    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2), (2, 4), (4, 0),
             (10, 11), (11, 12), (12, 10)]
    sym = edges + [(b, a) for a, b in edges]
    df = spark.createDataFrame(edges, ["src", "dst"])
    g = Graph.from_edges(df, directed=True).undirected()
    for p_inv, q_inv in [(2, 3), (1, 1), (5, 1)]:
        got = sorted(
            (r["walk_id"], r["step"], r["v"])
            for r in node2vec_walks(
                g, length=4, seed_mod=10, p_inv=p_inv, q_inv=q_inv
            ).collect()
        )
        want = _n2v_py(sym, 4, 10, p_inv, q_inv)
        assert got == want, (p_inv, q_inv)
    # every step follows an edge
    sym_set = set(sym)
    by_walk = {}
    for wid, step, v in want:
        by_walk.setdefault(wid, {})[step] = v
    for wid, path in by_walk.items():
        for s in range(1, len(path)):
            assert (path[s - 1], path[s]) in sym_set


def test_node2vec_partitioning_invariant(spark):
    from graphscope_spark.operators.walks import node2vec_walks

    edges = [(0, 1), (1, 2), (2, 0), (0, 3), (3, 4), (4, 0)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    a = node2vec_walks(
        Graph.from_edges(df, directed=True).undirected(), length=3,
        seed_mod=10,
    )
    b = node2vec_walks(
        Graph.from_edges(df.repartition(7), directed=True).undirected(),
        length=3, seed_mod=10,
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_skipgram_pairs_window(spark):
    from graphscope_spark.operators.walks import skipgram_pairs

    walks = spark.createDataFrame(
        [(0, 0, 5), (0, 1, 6), (0, 2, 7), (0, 3, 5),
         (9, 0, 1), (9, 1, 2)],
        ["walk_id", "step", "v"],
    )
    got = {(r["center"], r["context"]): r["pair_count"]
           for r in skipgram_pairs(walks, window=2).collect()}
    # walk 0 positions: 5,6,7,5; walk 9: 1,2.  window=2 pairs by hand:
    want = {}
    for wk in ([(0, 5), (1, 6), (2, 7), (3, 5)], [(0, 1), (1, 2)]):
        for i, (si, vi) in enumerate(wk):
            for j, (sj, vj) in enumerate(wk):
                if i != j and abs(si - sj) <= 2:
                    want[(vi, vj)] = want.get((vi, vj), 0) + 1
    assert got == want


def test_node2vec_rejects_non_positive_weights(spark):
    import pytest
    from graphscope_spark.operators.walks import node2vec_walks

    g = _graph(spark)
    for bad in [(0, 3), (2, 0), (2, 1.5)]:
        with pytest.raises(ValueError):
            node2vec_walks(g, p_inv=bad[0], q_inv=bad[1])
