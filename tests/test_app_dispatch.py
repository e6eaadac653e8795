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
