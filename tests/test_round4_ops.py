"""Round-4 additions: Gremlin string front-end, labeled
PropertyGraph, LSH sentinel hot-bucket fix, full APSP, wcc warm-start
guard, weighted multi-level Louvain."""
from __future__ import annotations

from collections import deque

import pytest
from pyspark.sql import functions as F

from graphscope_spark.graph import Graph
from tests.conftest import make_graph


# ------------------------------------------------ gremlin string parse
def _gg(spark):
    # 0→1→2→3, 0→2, 3→0 ; vertex properties color + label
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (0, 2), (3, 0)], ["src", "dst"]
    )
    v = spark.createDataFrame(
        [(0, "red", "person"), (1, "blue", "person"),
         (2, "red", "place"), (3, "blue", "place")],
        ["id", "color", "label"],
    )
    return Graph.from_edges(e, directed=True, vertices=v)


def test_gremlin_strings_match_fluent(spark):
    from graphscope_spark.gie import traversal
    from graphscope_spark.gremlin import gremlin

    g = _gg(spark)
    fl = traversal(g)
    # ≥10 reference-style query strings; each must agree with the
    # equivalent fluent chain (same semantics ⇒ same results)
    cases = [
        ("g.V().count()", lambda: fl.V().count()),
        ("g.E().count()", lambda: fl.E().count()),
        ("g.V(0).out().out().count()",
         lambda: fl.V(0).out().out().count()),
        ("g.V(0, 1).out().out().dedup().count()",
         lambda: fl.V(0, 1).out().out().dedup().count()),
        ("g.V(2).in().count()", lambda: fl.V(2).in_().count()),
        ("g.V(0).both().dedup().count()",
         lambda: fl.V(0).both().dedup().count()),
        ("g.V(2).inE().otherV().count()",
         lambda: fl.V(2).inE().otherV().count()),
        ("g.V().hasId(0, 3).out().dedup().count()",
         lambda: fl.V().hasId(0, 3).out().dedup().count()),
        ("g.V(0).repeat(out()).times(2).count()",
         lambda: fl.V(0).repeat("out", 2).count()),
        ("g.V().outE().count()", lambda: fl.V().outE().count()),
        ("g.V(0).out().limit(1).count()",
         lambda: fl.V(0).out().limit(1).count()),
    ]
    for q, fluent in cases:
        assert gremlin(g, q) == fluent(), q


def test_gremlin_dataframe_terminals(spark):
    from graphscope_spark.gremlin import gremlin

    g = _gg(spark)
    reds = gremlin(g, "g.V().has('color', 'red').values('color')")
    assert sorted(r["id"] for r in reds.collect()) == [0, 2]
    ppl = gremlin(g, "g.V().hasLabel('person').values('label')")
    assert sorted(r["id"] for r in ppl.collect()) == [0, 1]
    gc = {r["id"]: r["n"] for r in
          gremlin(g, "g.V(0, 1).out().groupCount()").collect()}
    assert gc == {1: 1, 2: 2}
    paths = sorted(
        tuple(r["path"])
        for r in gremlin(g, "g.V(0).out().out().path()").collect()
    )
    assert paths == [(0, 1, 2), (0, 2, 3)]


def test_gremlin_rejects_unsafe_or_unknown(spark):
    from graphscope_spark.gremlin import gremlin

    g = _gg(spark)
    with pytest.raises(ValueError):
        gremlin(g, "V().count()")  # no source
    with pytest.raises(ValueError):
        gremlin(g, "g.V().drop()")  # unsupported step
    with pytest.raises((ValueError, SyntaxError)):
        gremlin(g, "g.V(__import__('os')).count()")  # non-literal arg


# ---------------------------------------------------- property graph
def test_property_graph_project_and_prune(spark):
    from graphscope_spark.property_graph import PropertyGraph

    parts = spark.createDataFrame(
        [(1, 9.5, "junk"), (2, 3.0, "junk"), (3, 1.0, "junk")],
        ["id", "price", "unused"],
    )
    co = spark.createDataFrame(
        [(1, 2, 4), (2, 3, 7)], ["src", "dst", "c"]
    )
    pg = PropertyGraph(directed=False)
    pg.add_vertices(parts, "part").add_edges(co, "co", "part", "part")
    g = pg.project("part", "co", vprop="price", eprop="c")
    # one property each; the unused column is pruned out
    assert set(g.vertices.columns) == {"id", "price"}
    assert set(g.edges.columns) == {"src", "dst", "weight"}
    s = {r["id"]: r["s"] for r in
         g.symmetrized_edges().groupBy(F.col("src").alias("id"))
         .agg(F.sum("weight").alias("s")).collect()}
    assert s == {1: 4.0, 2: 11.0, 3: 7.0}
    with pytest.raises(KeyError):
        pg.project("nope", "co")


def test_property_graph_bipartite_lpa(spark):
    from graphscope_spark.operators.lpa_u2i import lpa_u2i
    from graphscope_spark.property_graph import PropertyGraph

    users = spark.createDataFrame([(1,), (2,)], ["id"])
    items = spark.createDataFrame([(101,), (102,)], ["id"])
    buys = spark.createDataFrame(
        [(1, 101, 2.0), (1, 102, 1.0), (2, 102, 5.0)],
        ["src", "dst", "w"],
    )
    pg = PropertyGraph(directed=True)
    pg.add_vertices(users, "user").add_vertices(items, "item")
    pg.add_edges(buys, "buys", "user", "item")
    g = pg.bipartite("buys", eprop="w")
    assert g.vertices.count() == 4
    # the projected edge table is exactly the lpa_u2i input shape
    ulab, ilab = lpa_u2i(
        g.edges, max_round=2, user_col="src", item_col="dst",
        weight_col="weight",
    )
    assert ulab.count() == 2 and ilab.count() == 2


def test_property_graph_to_graph_union(spark):
    from graphscope_spark.property_graph import PropertyGraph

    a = spark.createDataFrame([(1, "x")], ["id", "p1"])
    b = spark.createDataFrame([(2, 7.0)], ["id", "p2"])
    e1 = spark.createDataFrame([(1, 2)], ["src", "dst"])
    pg = PropertyGraph()
    pg.add_vertices(a, "A").add_vertices(b, "B")
    pg.add_edges(e1, "rel", "A", "B")
    g = pg.to_graph()
    # union-of-schemas with null filling, like Graph.add_labels
    assert set(g.vertices.columns) == {"id", "p1", "p2"}
    assert g.vertices.count() == 2
    assert "vertices" in pg.schema()


# ------------------------------------------- LSH sentinel hot bucket
def test_lsh_no_shingle_docs_generate_zero_candidates(spark):
    from graphscope_spark.functions.dedup import (
        lsh_candidate_pairs,
        minhash_dedup_pairs,
        minhash_signatures,
        word_shingles,
    )

    # 1000 short docs (< n tokens ⇒ no shingles) + 2 real near-dups
    rows = [(i, "tiny doc") for i in range(1000)]
    rows += [(2000, "alpha beta gamma delta"),
             (2001, "alpha beta gamma delta")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    sh = word_shingles(df, n=3)
    nonempty = sh.select("doc_id").distinct()
    sigs = minhash_signatures(df, num_hashes=12, n=3).join(
        nonempty, "doc_id", "left_semi"
    )
    cands = lsh_candidate_pairs(sigs, bands=4, rows_per_band=3)
    # NOT ~500k sentinel pairs — only the real near-dup pair
    assert cands.count() == 1
    pairs = minhash_dedup_pairs(df, threshold=0.5).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(2000, 2001)]


def test_lsh_bucket_size_cap(spark):
    from graphscope_spark.functions.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    # 50 identical docs: one bucket of 50 per band → 1225 pairs uncapped
    rows = [(i, "alpha beta gamma delta") for i in range(50)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    sigs = minhash_signatures(df, num_hashes=12, n=3)
    assert lsh_candidate_pairs(sigs, 4, 3).count() == 50 * 49 // 2
    assert lsh_candidate_pairs(sigs, 4, 3, max_bucket_size=10).count() == 0


# ------------------------------------- embedding near-dup LSH parity
def test_embedding_near_dup_lsh_subset_of_brute(spark):
    from graphscope_spark.functions.dedup import embedding_near_dup_pairs
    from graphscope_spark.functions.similarity import cosine_lsh_pairs

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    brute = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in embedding_near_dup_pairs(emb, threshold=0.4).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in cosine_lsh_pairs(
            emb, threshold=0.4, num_planes=12, bands=4, dim=64
        ).collect()
    }
    # LSH recall < 1 by construction, but every LSH pair must be a
    # true pair with the identical cosine (6dp)
    assert set(lsh) <= set(brute)
    for k, v in lsh.items():
        assert abs(brute[k] - v) < 1e-9
    assert len(lsh) > 0


# ------------------------------------------------------- full APSP
def _bfs_all(vertices, edges):
    adj = {v: [] for v in vertices}
    for a, b in edges:
        adj[a].append(b)
        adj[b].append(a)
    out = {}
    for s in vertices:
        dist = {s: 0}
        dq = deque([s])
        while dq:
            u = dq.popleft()
            for w in adj[u]:
                if w not in dist:
                    dist[w] = dist[u] + 1
                    dq.append(w)
        for t, d in dist.items():
            out[(s, t)] = d
    return out


def test_apsp_full_matches_python_bfs(spark):
    from graphscope_spark.operators.traversal import apsp_full_lengths

    verts = list(range(9))
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (0, 4), (5, 6), (6, 7)]
    g = make_graph(spark, verts, edges, directed=False)
    want = _bfs_all(verts, edges)
    got = {
        (r["source"], r["id"]): r["dist"]
        for r in apsp_full_lengths(g, batch_count=3).collect()
    }
    assert got == want
    # batching never changes results
    got1 = {
        (r["source"], r["id"]): r["dist"]
        for r in apsp_full_lengths(g, batch_count=1).collect()
    }
    assert got1 == want


# ------------------------------------------------ wcc warm-start guard
def test_wcc_init_labels_absent_vertex_dropped(spark):
    from graphscope_spark.operators.wcc import wcc

    g = make_graph(spark, [10, 11, 12], [(10, 11)], directed=False)
    # stale label 3 points at a vertex no longer in the graph: without
    # the guard it would persist forever as a bogus minimum
    stale = spark.createDataFrame(
        [(10, 3), (11, 3), (12, 12)], "id long, comp long"
    )
    res = {r["id"]: r["comp"] for r in wcc(g, init_labels=stale).collect()}
    assert res == {10: 10, 11: 10, 12: 12}


# ------------------------------------- weighted multi-level louvain
def test_louvain_three_levels_weighted_contraction(spark):
    from graphscope_spark.operators.louvain import louvain, modularity

    # two 4-cliques + a bridge: communities must be the cliques at any
    # level count; levels=3 exercises the carried weighted contraction
    def clique(base):
        vs = list(range(base, base + 4))
        return [(a, b) for a in vs for b in vs if a < b]

    edges = clique(0) + clique(10) + [(3, 10)]
    verts = list(range(0, 4)) + list(range(10, 14))
    g = make_graph(spark, verts, edges, directed=False)
    res2 = louvain(g, levels=2, rounds=4)
    res3 = louvain(g, levels=3, rounds=4)
    m2 = modularity(g, res2).collect()[0][0]
    m3 = modularity(g, res3).collect()[0][0]
    # extra levels never lose quality on an already-converged split
    assert m3 >= m2 - 1e-9
    comm = {r["id"]: r["community"] for r in res3.collect()}
    assert len({comm[v] for v in range(0, 4)}) == 1
    assert len({comm[v] for v in range(10, 14)}) == 1
    assert comm[0] != comm[10]


def test_gremlin_compiles_to_identical_plans(spark):
    """The string front-end must produce the SAME analyzed DataFrame
    plan as the fluent chain, not merely the same results."""
    from graphscope_spark.gie import traversal
    from graphscope_spark.gremlin import gremlin

    g = _gg(spark)
    fl = traversal(g)
    pairs = [
        ("g.V(0).out().out()", lambda: fl.V(0).out().out()),
        ("g.V(2).inE().otherV()", lambda: fl.V(2).inE().otherV()),
        ("g.V().hasId(0, 3).out().dedup()",
         lambda: fl.V().hasId(0, 3).out().dedup()),
        ("g.V(0).repeat(both()).times(3)",
         lambda: fl.V(0).repeat("both", 3)),
        ("g.V().has('color', 'red')",
         lambda: fl.V().has("color", "red")),
    ]
    for q, fluent in pairs:
        a = gremlin(g, q).toDF()._jdf.queryExecution().analyzed().toString()
        b = fluent().toDF()._jdf.queryExecution().analyzed().toString()
        # exprIds differ between two builds of the same plan; strip them
        import re
        strip = lambda s: re.sub(r"#\d+L?", "#", s)  # noqa: E731
        assert strip(a) == strip(b), q


# ----------------------------------------------------------------- dfs
def _dfs_py(adj, source):
    """Recursive-spec oracle: preorder DFS, ascending-id neighbors."""
    rank, order = {source: 0}, [source]

    def visit(v):
        for u in sorted(adj.get(v, [])):
            if u not in rank:
                rank[u] = len(order)
                order.append(u)
                visit(u)

    visit(source)
    return rank, order


def test_dfs_matches_recursive_oracle(spark):
    from graphscope_spark.operators.dfs import dfs

    verts = list(range(8))
    edges = [(0, 1), (0, 4), (1, 2), (1, 3), (2, 4), (4, 5), (3, 5),
             (6, 7)]
    g = make_graph(spark, verts, edges, directed=True)
    adj = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
    want_rank, want_order = _dfs_py(adj, 0)
    got = {r["id"]: r["rank"] for r in dfs(g, source=0).collect()}
    assert got == {v: want_rank.get(v, -1) for v in verts}
    # successors = consecutive-rank pairs (reference dfs.h:181-196)
    succ = [(r["src"], r["dst"]) for r in
            dfs(g, source=0, output_format="successors").collect()]
    assert succ == [(want_order[i], want_order[i + 1])
                    for i in range(len(want_order) - 1)]
    pred = [(r["src"], r["dst"]) for r in
            dfs(g, source=0, output_format="predecessors").collect()]
    assert pred == [(b, a) for a, b in succ]


def test_dfs_undirected_and_scale_gate(spark):
    from graphscope_spark.operators.dfs import dfs

    g = make_graph(spark, [0, 1, 2], [(0, 1), (1, 2)], directed=False)
    got = {r["id"]: r["rank"] for r in dfs(g).collect()}
    assert got == {0: 0, 1: 1, 2: 2}
    with pytest.raises(ValueError, match="inherently sequential"):
        dfs(g, max_collect_edges=1)
    # the vertex-id collect is gated too: few edges, many vertices
    g2 = make_graph(spark, list(range(10)), [(0, 1)], directed=False)
    with pytest.raises(ValueError, match="vertex ids"):
        dfs(g2, max_collect_edges=4)


def test_dfs_via_run_app(spark):
    from graphscope_spark.app import run_app

    g = make_graph(spark, [0, 1, 2], [(0, 1), (0, 2)], directed=True)
    got = {r["id"]: r["rank"] for r in run_app(g, "dfs").collect()}
    assert got == {0: 0, 1: 1, 2: 2}


def test_gremlin_reference_shapes_extended(spark):
    """Step shapes lifted from the reference's interactive test corpus
    (as/select, order().by, valueMap, bothV, label hops, coin)."""
    from graphscope_spark.gremlin import gremlin
    from graphscope_spark.property_graph import PropertyGraph

    g = _gg(spark)
    # as('a').out().as('b').select('a','b') — tag pairs ride the hop
    ab = gremlin(g, "g.V().as('a').out().as('b').select('a', 'b')")
    pairs = sorted((r["a"], r["b"]) for r in ab.collect())
    assert pairs == [(0, 1), (0, 2), (1, 2), (2, 3), (3, 0)]
    # order().by('color'): blues (1, 3) before reds (0, 2)
    ordered = [r["id"] for r in
               gremlin(g, "g.V().order().by('color')").toDF().collect()]
    assert ordered == [1, 3, 0, 2]
    # valueMap with and without explicit props
    vm = gremlin(g, "g.V(0).valueMap()")
    assert set(vm.columns) == {"id", "color", "label"}
    # bothV: each edge contributes both endpoints (bag of 10 for 5 edges)
    assert gremlin(g, "g.E().bothV().count()") == 10
    # coin: deterministic — same subset on rerun, and a subset of V
    c1 = sorted(gremlin(g, "g.V().coin(0.5)").toList())
    c2 = sorted(gremlin(g, "g.V().coin(0.5)").toList())
    assert c1 == c2 and set(c1) <= {0, 1, 2, 3}
    assert gremlin(g, "g.V().coin(1.0)").count() == 4

    # label-filtered hop over a property-graph projection that keeps
    # the edge label column
    v = spark.createDataFrame([(0,), (1,), (2,)], ["id"])
    e = spark.createDataFrame(
        [(0, 1, "knows"), (0, 2, "has"), (1, 2, "knows")],
        ["src", "dst", "label"],
    )
    from graphscope_spark.graph import Graph as _G
    lg = _G.from_edges(e, directed=True, vertices=v)
    assert gremlin(lg, "g.V().out('knows').count()") == 2
    assert gremlin(lg, "g.V(0).out('has').count()") == 1


def test_property_graph_project_from_dicts(spark):
    """The reference client's dict-style projection signature."""
    from graphscope_spark.property_graph import PropertyGraph

    parts = spark.createDataFrame([(1, 9.5), (2, 3.0)], ["id", "price"])
    co = spark.createDataFrame([(1, 2, 4)], ["src", "dst", "c"])
    pg = PropertyGraph(directed=False)
    pg.add_vertices(parts, "part").add_edges(co, "co", "part", "part")
    g = pg.project_from_dicts({"part": ["price"]}, {"co": ["c"]})
    assert set(g.vertices.columns) == {"id", "price"}
    assert set(g.edges.columns) == {"src", "dst", "weight"}
    g2 = pg.project_from_dicts({"part": []}, {"co": []})
    assert set(g2.edges.columns) == {"src", "dst"}
    with pytest.raises(ValueError, match="ONE property"):
        pg.project_from_dicts({"part": ["price", "price"]}, {"co": []})
