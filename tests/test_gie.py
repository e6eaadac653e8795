"""Gremlin-flavored traversal surface (GIE user API)."""
from pyspark.sql import functions as F

from graphscope_spark.gie import traversal
from graphscope_spark.graph import Graph


def _g(spark):
    # 0→1→2→3, 0→2, 3→0 ; vertex property "color"
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (0, 2), (3, 0)], ["src", "dst"]
    )
    v = spark.createDataFrame(
        [(0, "red"), (1, "blue"), (2, "red"), (3, "blue")],
        ["id", "color"],
    )
    return Graph.from_edges(e, directed=True, vertices=v)


def test_hops_and_bag_semantics(spark):
    g = traversal(_g(spark))
    # out().out() keeps duplicate traversers (bag semantics):
    # 0→{1,2}→{2,3}: paths 0-1-2, 0-2-3 -> two traversers
    assert sorted(g.V(0).out().out().toList()) == [2, 3]
    # bag sizes: {0,1} -out-> {1,2,2} -out-> {2,3,3}: 3 traversers
    assert g.V(0, 1).out().out().count() == 3
    assert g.V(0, 1).out().out().dedup().count() == 2


def test_direction_steps(spark):
    g = traversal(_g(spark))
    assert sorted(g.V(2).in_().toList()) == [0, 1]
    assert sorted(g.V(0).both().dedup().toList()) == [1, 2, 3]
    assert g.E().count() == 5
    assert g.V(0).outE().count() == 2
    assert sorted(g.V(0).outE().otherV().toList()) == [1, 2]


def test_has_filter_and_values(spark):
    g = traversal(_g(spark))
    reds = (
        g.V().out().dedup().values("color")
        .where(F.col("color") == "red")
        .collect()
    )
    assert sorted(r["id"] for r in reds) == [0, 2]
    # property filter mid-traversal via values→ids would be has() on
    # a joined frame; hasId narrows the frontier
    assert g.V().hasId(0, 3).out().dedup().count() == 3


def test_limit_deterministic(spark):
    g = traversal(_g(spark))
    a = g.V().limit(2).toList()
    b = g.V().limit(2).toList()
    assert a == b == [0, 1]


def test_path_tracking(spark):
    g = traversal(_g(spark))
    paths = sorted(
        tuple(r["path"])
        for r in g.V(0, track_path=True).out().out().path().collect()
    )
    assert paths == [(0, 1, 2), (0, 2, 3)]


def test_repeat_and_group_count(spark):
    g = traversal(_g(spark))
    # repeat(out, 2) == out().out()
    assert sorted(g.V(0).repeat("out", 2).toList()) == sorted(
        g.V(0).out().out().toList()
    )
    gc = {r["id"]: r["n"]
          for r in g.V(0, 1).out().groupCount().collect()}
    # {0,1} -out-> bag {1, 2, 2}
    assert gc == {1: 1, 2: 2}


def test_inE_otherV_anchor(spark):
    g = traversal(_g(spark))
    # 2's incoming edges are 1→2 and 0→2; otherV() must return the
    # OPPOSITE endpoint (the sources), not 2 itself
    assert sorted(g.V(2).inE().otherV().toList()) == [0, 1]
    # and symmetrically outE().otherV() stays the destinations
    assert sorted(g.V(2).outE().otherV().toList()) == [3]
    # hasId on an edge traversal filters the ANCHORED endpoint
    assert g.V().inE().hasId(2).count() == 2  # edges INTO 2
    assert g.V().outE().hasId(0).count() == 2  # edges OUT of 0


def test_tags_and_path_ride_through_edge_steps(spark):
    g = traversal(_g(spark))
    # as_('a') before an edge hop must survive outE/inE + otherV
    rows = sorted(
        (r["a"],) for r in
        g.V(2).as_("a").inE().otherV().select_("a").collect()
    )
    assert rows == [(2,), (2,)]  # one traverser per incoming edge
    # select both the tag and the landed vertex
    t = g.V(2).as_("a").inE().otherV().as_("b")
    pairs = sorted((r["a"], r["b"]) for r in t.select_("a", "b").collect())
    assert pairs == [(2, 0), (2, 1)]
    # path() history appends the landed vertex after an edge step
    paths = sorted(
        tuple(r["path"]) for r in g.V(2, track_path=True)
        .outE().otherV().path().collect()
    )
    assert paths == [(2, 3)]
    # bothV keeps tags too (one traverser per endpoint)
    n = g.V(2).as_("a").outE().bothV().select_("a").count()
    assert n == 2


def test_edge_source_path_tracking(spark):
    from graphscope_spark.gremlin import gremlin

    g = traversal(_g(spark))
    paths = sorted(tuple(r["path"]) for r in g.E(track_path=True)
                   .otherV().path().collect())
    assert paths == [(0, 1), (0, 2), (1, 2), (2, 3), (3, 0)]
    # and through the string front-end
    df = gremlin(_g(spark), "g.E().otherV().path()")
    assert sorted(tuple(r["path"]) for r in df.collect()) == paths


def test_vertex_property_has_and_dedup_with_path(spark):
    g = traversal(_g(spark))
    # canonical g.V().has('prop', v) joins the property in on demand
    assert sorted(g.V().has("color", "red").toList()) == [0, 2]
    # ... and still works after a hop
    assert sorted(g.V().out().has("color", "red").dedup().toList()) == [0, 2]
    # dedup collapses by CURRENT element even when paths diverge
    n = g.V(0, 1, track_path=True).out().out().dedup().count()
    assert n == g.V(0, 1).out().out().dedup().count()


def test_both_bag_semantics_and_edge_coin(spark):
    # reciprocal directed edges = TWO incident edges
    e = spark.createDataFrame([(0, 1), (1, 0), (1, 2)], ["src", "dst"])
    g = traversal(Graph.from_edges(e, directed=True))
    got = {r["id"]: r["n"] for r in g.V(0).both().groupCount().collect()}
    assert got == {1: 2}
    assert g.V(1).both().count() == 3  # 0 twice + 2 once
    # undirected storage-agnostic: one-direction table, each unordered
    # edge once per side
    gu = traversal(Graph.from_edges(
        spark.createDataFrame([(0, 1)], ["src", "dst"]), directed=False))
    assert gu.V(0).both().toList() == [1]
    # edge coin hashes the edge, not the anchor: fractions differ
    # per-edge on a star (the anchored hash kept all or none)
    star = spark.createDataFrame([(0, i) for i in range(1, 30)],
                                 ["src", "dst"])
    gs = traversal(Graph.from_edges(star, directed=True))
    kept = gs.V(0).outE().coin(0.5).count()
    assert 0 < kept < 29


def test_repeat_emit_unions_levels(spark):
    g = traversal(_g(spark))
    # levels from 0: out¹={1,2}, out²={2,3}, out³={3,0} — emit is
    # their bag union
    want = sorted([1, 2] + [2, 3] + [3, 0])
    got = sorted(g.V(0).repeat("out", 3, emit=True).toList())
    assert got == want
    # emit=False unchanged: just the final level
    assert sorted(g.V(0).repeat("out", 3).toList()) == [0, 3]


def test_simple_path_filters_revisits(spark):
    g = traversal(_g(spark))
    # 3 hops from 0: 0-1-2-3, 0-2-3-0 — the second revisits 0
    paths = {tuple(r["path"]) for r in
             g.V(0, track_path=True).repeat("out", 3)
             .simplePath().path().collect()}
    assert paths == {(0, 1, 2, 3)}
    # without simplePath both traversers survive
    allp = {tuple(r["path"]) for r in
            g.V(0, track_path=True).repeat("out", 3).path().collect()}
    assert allp == {(0, 1, 2, 3), (0, 2, 3, 0)}


def test_gremlin_string_emit_and_simple_path(spark):
    from graphscope_spark.gremlin import gremlin

    gr = _g(spark)
    # string twin of the fluent emit union
    got = sorted(
        r["id"] for r in
        gremlin(gr, "g.V(0).repeat(out()).emit().times(3)").toDF().collect()
    )
    want = sorted(
        traversal(gr).V(0).repeat("out", 3, emit=True).toList()
    )
    assert got == want
    # simplePath through the string surface
    paths = {tuple(r["path"]) for r in
             gremlin(gr, "g.V(0).repeat(out()).times(3).simplePath().path()")
             .collect()}
    assert paths == {(0, 1, 2, 3)}


def test_simple_path_string_without_path_step(spark):
    from graphscope_spark.gremlin import gremlin

    # simplePath() alone must enable path tracking (review fix)
    t = gremlin(_g(spark), "g.V(0).repeat(out()).times(3).simplePath()")
    assert sorted(t.toList()) == [3]
    # emit with a predicate argument is rejected, not ignored
    import pytest as _pytest
    with _pytest.raises(ValueError, match="emit"):
        gremlin(_g(spark), "g.V(0).repeat(out()).emit(has('x', 1)).times(2)")


def test_repeat_emit_times_zero_rejected(spark):
    import pytest as _pytest

    g = traversal(_g(spark))
    with _pytest.raises(ValueError, match="times"):
        g.V(0).repeat("out", 0, emit=True)
