"""Property-based tests (hypothesis): random small graphs checked
against pure-Python reference implementations.  Complements the
fixed-oracle suite — these vary the graph SHAPE, catching edge cases
(self-contained components, stars, parallel-free paths) a fixed
fixture never exercises.  Example counts are kept small because every
example pays Spark job overhead."""
from hypothesis import given, settings, strategies as st

from graphscope_spark.graph import Graph

# up to 10 vertices, up to 14 distinct undirected edges
edge_lists = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(
        lambda e: e[0] != e[1]
    ),
    min_size=1,
    max_size=14,
    unique_by=lambda e: (min(e), max(e)),
)


def _spark():
    from pyspark.sql import SparkSession

    return SparkSession.getActiveSession()


def _graph(edges):
    df = _spark().createDataFrame(edges, ["src", "dst"])
    return Graph.from_edges(df, directed=False)


@settings(max_examples=6, deadline=None)
@given(edge_lists)
def test_wcc_matches_union_find(spark, edges):
    g = _graph(edges)
    got = {r["id"]: r["comp"] for r in
           __import__("graphscope_spark.operators.wcc",
                      fromlist=["wcc"]).wcc(g).collect()}
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    verts = {v for e in edges for v in e}
    want_groups = {}
    for v in verts:
        want_groups.setdefault(find(v), set()).add(v)
    got_groups = {}
    for v, c in got.items():
        got_groups.setdefault(c, set()).add(v)
    assert sorted(map(sorted, want_groups.values())) == sorted(
        map(sorted, got_groups.values())
    )


@settings(max_examples=6, deadline=None)
@given(edge_lists)
def test_triangle_count_matches_bruteforce(spark, edges):
    from itertools import combinations

    from graphscope_spark.operators.triangles import global_triangle_count

    g = _graph(edges)
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = sum(
        1
        for u, v, w in combinations(sorted(adj), 3)
        if v in adj[u] and w in adj[u] and w in adj[v]
    )
    assert global_triangle_count(g) == want


@settings(max_examples=6, deadline=None)
@given(edge_lists)
def test_pagerank_mass_conservation(spark, edges):
    from pyspark.sql import functions as F

    from graphscope_spark.operators.pagerank import pagerank

    g = _graph(edges)
    total = pagerank(g, max_iter=4).agg(F.sum("rank")).first()[0]
    assert abs(total - 1.0) < 1e-9


@settings(max_examples=6, deadline=None)
@given(edge_lists)
def test_link_jaccard_bounds_and_candidacy(spark, edges):
    from graphscope_spark.operators.linkpred import jaccard_coefficient

    g = _graph(edges)
    sym = {(a, b) for a, b in edges} | {(b, a) for a, b in edges}
    for r in jaccard_coefficient(g).collect():
        assert 0.0 < r["jaccard"] <= 1.0
        assert r["u"] < r["v"]
        assert (r["u"], r["v"]) not in sym  # candidates are non-edges
