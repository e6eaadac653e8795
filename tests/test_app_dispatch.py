"""RUN_APP string dispatch."""
import pytest

from graphscope_spark.app import _resolve, list_apps, run_app
from graphscope_spark.graph import Graph


def test_all_registered_apps_resolve():
    for name in list_apps():
        assert callable(_resolve(name)), name


def test_run_app_dispatch_end_to_end(spark):
    from pyspark.sql import functions as F

    g = Graph.from_edges(
        spark.createDataFrame(
            [(0, 1), (1, 2), (2, 0), (2, 3)], ["src", "dst"]
        ),
        directed=False,
    )
    pr = run_app(g, "pagerank", max_iter=5)
    assert abs(pr.agg(F.sum("rank")).first()[0] - 1.0) < 1e-9
    comp = run_app(g, "wcc")
    assert comp.count() == 4
    tri = run_app(g, "triangle_count")
    assert tri == 1  # scalar apps pass through run_app too


def test_run_app_unknown_name(spark):
    g = Graph.from_edges(
        spark.createDataFrame([(0, 1)], ["src", "dst"])
    )
    with pytest.raises(KeyError, match="unknown app"):
        run_app(g, "nope")


def test_top_level_app_access(spark):
    """graphscope.pagerank(g)-style call sites port directly."""
    import graphscope_spark as gs
    from tests.conftest import make_graph

    g = make_graph(spark, [0, 1, 2], [(0, 1), (1, 2), (2, 0)])
    pr = gs.pagerank(g, max_iter=5, tol=0.0)
    assert abs(sum(r["rank"] for r in pr.collect()) - 1.0) < 1e-9
    comp = {r["id"]: r["comp"] for r in gs.wcc(g).collect()}
    assert set(comp.values()) == {0}
    import pytest as _pt
    with _pt.raises(AttributeError):
        gs.not_an_app
