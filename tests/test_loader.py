"""Loader: suffix sniffing, CSV options, pandas input, graph assembly."""
from graphscope_spark.sources.loader import load_graph, load_table


def test_csv_roundtrip_with_types(spark, tmp_path):
    p = str(tmp_path / "edges.csv")
    with open(p, "w") as f:
        f.write("src|dst|weight\n0|1|0.5\n1|2|1.5\n")
    df = load_table(
        spark, p, delimiter="|",
        column_types={"src": "long", "dst": "long", "weight": "double"},
    )
    assert df.dtypes == [
        ("src", "bigint"), ("dst", "bigint"), ("weight", "double")
    ]
    assert df.count() == 2


def test_parquet_sniffing(spark, tmp_path):
    p = str(tmp_path / "v.parquet")
    spark.createDataFrame([(1,), (2,)], ["id"]).write.parquet(p)
    assert load_table(spark, p).count() == 2


def test_pandas_input_and_graph_assembly(spark, tmp_path):
    import pandas as pd

    edges = pd.DataFrame({"from": [0, 1, 2], "to": [1, 2, 0]})
    g = load_graph(
        spark, edges, src_col="from", dst_col="to", directed=False
    )
    assert sorted(r["id"] for r in g.vertices.collect()) == [0, 1, 2]
    assert g.edges.count() == 3


def test_csv_graph_end_to_end(spark, tmp_path):
    p = str(tmp_path / "e.csv")
    with open(p, "w") as f:
        f.write("src,dst\n0,1\n1,2\n2,0\n")
    from graphscope_spark.operators.wcc import wcc

    g = load_graph(
        spark, p, column_types={"src": "long", "dst": "long"}
    )
    comp = {r["id"]: r["comp"] for r in wcc(g).collect()}
    assert len(set(comp.values())) == 1


def test_add_labels_union(spark):
    from pyspark.sql import functions as F
    from graphscope_spark.graph import Graph

    g = Graph.from_edges(
        spark.createDataFrame([(0, 1)], ["src", "dst"]), directed=True
    )
    more_v = spark.createDataFrame([(5, "red")], ["id", "color"])
    more_e = spark.createDataFrame([(5, 0)], ["src", "dst"])
    g2 = g.add_labels(vertices=more_v, edges=more_e)
    assert sorted(r["id"] for r in g2.vertices.collect()) == [0, 1, 5]
    assert g2.edges.count() == 2
    # schema union keeps the new property, null for old vertices
    colors = {r["id"]: r["color"] for r in g2.vertices.collect()}
    assert colors[5] == "red" and colors[0] is None
    # app still runs on the merged graph
    from graphscope_spark.operators.wcc import wcc
    comp = wcc(g2.undirected())
    assert comp.count() == 3


def test_orc_sniffing(spark, tmp_path):
    p = str(tmp_path / "v.orc")
    spark.createDataFrame([(1,), (2,), (3,)], ["id"]).write.orc(p)
    assert load_table(spark, p).count() == 3
