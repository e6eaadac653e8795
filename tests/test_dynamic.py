"""DynamicGraph — NetworkX-flavored mutations over delta-log
snapshots (reference dynamic_fragment / MODIFY_EDGES surface)."""
from __future__ import annotations

from pyspark.sql import functions as F

from graphscope_spark.dynamic import DynamicGraph


def test_mutations_fold_into_snapshots(spark):
    dg = DynamicGraph(spark, directed=True)
    dg.add_edges_from([(0, 1), (1, 2), (2, 0), (2, 3)])
    assert dg.number_of_nodes() == 4
    assert dg.number_of_edges() == 4
    assert dg.has_edge(0, 1) and not dg.has_edge(1, 0)

    dg.remove_edge(2, 3)
    dg.remove_node(3)
    assert dg.number_of_edges() == 3
    assert dg.number_of_nodes() == 3

    # apps run on snapshots unchanged
    from graphscope_spark.app import run_app

    comp = {r["id"]: r["comp"]
            for r in run_app(dg.snapshot(), "wcc").collect()}
    assert comp == {0: 0, 1: 0, 2: 0}


def test_remove_node_drops_incident_edges(spark):
    dg = DynamicGraph(spark, directed=False)
    dg.add_edges_from([(0, 1), (1, 2)])
    dg.remove_node(1)
    assert dg.number_of_edges() == 0
    assert dg.number_of_nodes() == 2  # 0 and 2 remain


def test_undirected_removal_matches_either_direction(spark):
    dg = DynamicGraph(spark, directed=False)
    dg.add_edge(5, 7)
    dg.remove_edge(7, 5)  # reversed orientation must still match
    assert dg.number_of_edges() == 0


def test_compact_reanchors_base(spark):
    dg = DynamicGraph(spark, directed=True)
    dg.add_edges_from([(0, 1), (1, 2)])
    dg2 = dg.compact()
    dg2.add_edge(2, 3)
    dg2.remove_edge(0, 1)
    assert dg2.number_of_edges() == 2
    assert sorted(
        (r["src"], r["dst"]) for r in dg2.snapshot().edges.collect()
    ) == [(1, 2), (2, 3)]


def test_base_tables_plus_deltas(spark):
    base_e = spark.createDataFrame([(0, 1)], "src long, dst long")
    dg = DynamicGraph(spark, edges=base_e, directed=True)
    dg.add_edge(1, 2)
    dg.add_node(9)  # isolated vertex
    g = dg.snapshot()
    assert g.edges.count() == 2
    assert g.vertices.where(F.col("id") == 9).count() == 1


def test_remove_then_readd_resurrects(spark):
    """Order matters: a remove followed by a re-add must leave the
    element PRESENT (NetworkX replay), not let the deletion win."""
    dg = DynamicGraph(spark, directed=True)
    dg.add_edge(0, 1)
    dg.remove_edge(0, 1)
    dg.add_edge(0, 1)
    assert dg.has_edge(0, 1)
    assert dg.number_of_edges() == 1
    # node: remove wipes incident edges; re-add gives a bare node
    dg2 = DynamicGraph(spark, directed=True)
    dg2.add_edge(1, 2)
    dg2.remove_node(1)
    dg2.add_node(1)
    assert dg2.number_of_edges() == 0
    assert sorted(r["id"] for r in dg2.snapshot().vertices.collect()) == [1, 2]
    # an edge added AFTER the node removal re-exists
    dg3 = DynamicGraph(spark, directed=True)
    dg3.add_edge(1, 2)
    dg3.remove_node(1)
    dg3.add_edge(1, 3)
    assert not dg3.has_edge(1, 2)
    assert dg3.has_edge(1, 3)


def test_undirected_edge_is_one_key(spark):
    dg = DynamicGraph(spark, directed=False)
    dg.add_edge(5, 7)
    dg.add_edge(7, 5)
    assert dg.number_of_edges() == 1
    # removing via the reversed orientation removes THE edge
    dg.remove_edge(5, 7)
    assert dg.number_of_edges() == 0
