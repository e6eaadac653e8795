"""Round-5 operators: attribute/numeric assortativity, edge_boundary,
all_simple_edge_paths — NetworkX parity on small graphs (the same
test strategy the reference uses for its nx-wrapped builtins)."""
import math

import networkx as nx
import pytest
from pyspark.sql import functions as F

from graphscope_spark.graph import Graph
from graphscope_spark.operators.misc import (
    attribute_assortativity,
    edge_boundary,
    numeric_assortativity,
)
from graphscope_spark.operators.paths import (
    all_simple_edge_paths,
    all_simple_paths,
)

# a small skewed graph with a categorical + numeric vertex property
VERTS = [
    (0, "a", 1), (1, "a", 2), (2, "b", 3), (3, "b", 4),
    (4, "c", 5), (5, "a", 2), (6, "b", 3), (7, "c", 1),
]
EDGES = [
    (0, 1), (0, 2), (1, 2), (2, 3), (3, 4), (4, 5),
    (5, 0), (5, 6), (6, 7), (7, 0), (1, 3), (2, 6),
]


def _graph(spark, directed=True):
    v = spark.createDataFrame(VERTS, "id long, cat string, num long")
    e = spark.createDataFrame(EDGES, "src long, dst long")
    return Graph.from_edges(e, directed=directed, vertices=v,
                            num_partitions=4)


def _nxg(directed=True):
    g = nx.DiGraph() if directed else nx.Graph()
    for i, c, x in VERTS:
        g.add_node(i, cat=c, num=x)
    g.add_edges_from(EDGES)
    return g


@pytest.mark.parametrize("directed", [True, False])
def test_attribute_assortativity_nx_parity(spark, directed):
    got = attribute_assortativity(_graph(spark, directed), "cat")
    want = nx.attribute_assortativity_coefficient(_nxg(directed), "cat")
    assert got == pytest.approx(want, abs=1e-12)


@pytest.mark.parametrize("directed", [True, False])
def test_numeric_assortativity_nx_parity(spark, directed):
    got = numeric_assortativity(_graph(spark, directed), "num")
    want = nx.numeric_assortativity_coefficient(_nxg(directed), "num")
    assert got == pytest.approx(want, abs=1e-9)


def test_attribute_assortativity_single_category_nan(spark):
    v = spark.createDataFrame([(0, "x"), (1, "x")], "id long, cat string")
    e = spark.createDataFrame([(0, 1)], "src long, dst long")
    g = Graph.from_edges(e, directed=True, vertices=v, num_partitions=2)
    assert math.isnan(attribute_assortativity(g, "cat"))


@pytest.mark.parametrize("directed", [True, False])
def test_edge_boundary_nx_parity(spark, directed):
    g = _graph(spark, directed)
    s_ids = [0, 1, 2]
    s = spark.createDataFrame([(i,) for i in s_ids], "id long")
    got = {(r["src"], r["dst"])
           for r in edge_boundary(g, s).collect()}
    want = set(nx.edge_boundary(_nxg(directed), s_ids))
    if not directed:
        # nx yields arbitrary orientation; ours anchors the S end first
        want = {(a, b) if a in s_ids else (b, a) for a, b in want}
    assert got == want


def test_edge_boundary_explicit_target(spark):
    g = _graph(spark, directed=True)
    s = spark.createDataFrame([(0,), (1,), (2,)], "id long")
    t = spark.createDataFrame([(3,), (6,)], "id long")
    got = {(r["src"], r["dst"])
           for r in edge_boundary(g, s, t).collect()}
    want = set(nx.edge_boundary(_nxg(True), [0, 1, 2], [3, 6]))
    assert got == want


def test_shortest_path_any_nx_parity(spark):
    """ANY_SHORTEST: every returned path is a valid shortest path
    (hop count == nx distance, consecutive pairs are edges), one row
    per reached vertex."""
    from graphscope_spark.gie import traversal

    g = _graph(spark, directed=True)
    rows = traversal(g).V(0).shortestPath().collect()
    nxd = nx.single_source_shortest_path_length(_nxg(True), 0)
    assert {r["id"] for r in rows} == set(nxd)
    eset = set(EDGES)
    for r in rows:
        p = list(r["path"])
        assert r["hops"] == nxd[r["id"]] == len(p) - 1
        assert p[0] == 0 and p[-1] == r["id"]
        assert all(pair in eset for pair in zip(p, p[1:]))


def test_shortest_path_target_and_all_shortest(spark):
    from graphscope_spark.gie import traversal

    g = _graph(spark, directed=True)
    one = traversal(g).V(0).shortestPath(target=3).collect()
    assert len(one) == 1 and one[0]["id"] == 3
    allp = {tuple(r["path"]) for r in
            traversal(g).V(0)
            .shortestPath(target=3, all_shortest=True).collect()}
    want = {tuple(p) for p in nx.all_shortest_paths(_nxg(True), 0, 3)}
    assert allp == want


def test_shortest_path_undirected_and_gremlin_string(spark):
    from graphscope_spark.gremlin import gremlin

    g = _graph(spark, directed=False)
    df = gremlin(g, "g.V(6).shortestPath()")
    nxd = nx.single_source_shortest_path_length(_nxg(False), 6)
    got = {r["id"]: r["hops"] for r in df.collect()}
    assert got == nxd


def test_all_simple_edge_paths_is_pair_projection(spark):
    g = _graph(spark, directed=True)
    vp = {tuple(r["path"])
          for r in all_simple_paths(g, 0, 4, cutoff=4).collect()}
    ep = {tuple((p["src"], p["dst"]) for p in r["epath"])
          for r in all_simple_edge_paths(g, 0, 4, cutoff=4).collect()}
    assert ep == {tuple(zip(p, p[1:])) for p in vp}
    want = {tuple(pth) for pth in
            nx.all_simple_edge_paths(_nxg(True), 0, 4, cutoff=4)}
    assert ep == want


def _semdedup_reference(vecs, n_centroids, threshold):
    """Pure-python replica of similarity.semantic_dedup's decision
    rule: h60-seeded centroids, argmax 6-dp cosine assignment (ties
    to smallest cid), drop when any smaller-id cluster-mate clears
    the threshold."""
    import numpy as np

    from graphscope_spark.functions.text import h60_py

    ids = sorted(vecs)
    seeds = sorted(ids, key=lambda i: (h60_py(f"c:{i}"), i))[:n_centroids]
    cm = np.array([vecs[i] for i in seeds], dtype="float64")
    cn = np.linalg.norm(cm, axis=1)
    cid, norm = {}, {}
    for i in ids:
        v = np.array(vecs[i], dtype="float64")
        norm[i] = np.linalg.norm(v)
        cos = np.round((cm @ v) / (cn * norm[i]), 6)
        cid[i] = int(np.argmax(cos))  # argmax takes the first (smallest cid) tie
    keep = {}
    for i in ids:
        vi = np.array(vecs[i], dtype="float64")
        keep[i] = not any(
            cid[j] == cid[i]
            and round(float(np.dot(vi, vecs[j])) / (norm[i] * norm[j]), 6)
            >= threshold
            for j in ids if j < i
        )
    return cid, keep


def test_semantic_dedup_matches_reference_rule(spark):
    from graphscope_spark.functions.similarity import semantic_dedup

    # 3 tight groups of near-duplicates + isolated vectors, 8-dim
    base = {
        0: [1, 0, 0, 0, 0, 0, 0, 0],
        1: [0, 1, 0, 0, 0, 0, 0, 0],
        2: [0, 0, 1, 0, 0, 0, 1, 0],
    }
    vecs = {}
    for gid, v in base.items():
        for k in range(4):
            w = [x + 0.01 * k * (j % 3) for j, x in enumerate(v)]
            vecs[gid * 10 + k] = w
    vecs[99] = [1.0] * 8  # equidistant-ish singleton
    rows = [(i, [float(x) for x in v]) for i, v in sorted(vecs.items())]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: (r["cid"], r["keep"])
        for r in semantic_dedup(df, threshold=0.95, n_centroids=3).collect()
    }
    cid, keep = _semdedup_reference(vecs, 3, 0.95)
    assert got == {i: (cid[i], keep[i]) for i in vecs}
    # the tight groups must actually deduplicate: ≥1 drop per group
    dropped = {i for i, (_, k) in got.items() if not k}
    assert dropped, "no duplicates dropped in a corpus full of near-dups"


def test_semantic_dedup_cluster_size_guard(spark):
    from graphscope_spark.functions.similarity import semantic_dedup

    rows = [(i, [1.0, float(i % 2)]) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="max_cluster_size"):
        semantic_dedup(df, n_centroids=1, max_cluster_size=10)


def test_random_multi_bfs_nx_parity(spark):
    from graphscope_spark.functions.text import h60_py
    from graphscope_spark.operators.traversal import random_multi_bfs

    g = _graph(spark, directed=True)
    got = {r["id"]: r["res"]
           for r in random_multi_bfs(g, k=3).collect()}
    nxg = _nxg(True)
    srcs = sorted((i for i, _, _ in VERTS),
                  key=lambda i: (h60_py(f"rmb:{i}"), i))[:3]
    want = {}
    for i, _, _ in VERTS:
        ds = []
        for s in srcs:
            try:
                ds.append(nx.shortest_path_length(nxg, s, i))
            except nx.NetworkXNoPath:
                pass
        want[i] = max(ds) if ds else -1
    assert got == want
