"""Edge/vertex table loader — the Spark face of the reference's
``Loader`` (``python/graphscope/framework/loader.py:94-260``): format
sniffing by suffix (``.parquet`` / ``.orc``, everything else CSV,
``loader.py:254-260``), CSV header/delimiter/type options
(``CSVOptions``, ``loader.py:44-91``), and in-memory pandas input
(``loader.py:201-239``).

Spark-first mapping: CSV options become ``spark.read.csv`` options
(schemas as explicit ``StructType``-style strings, never
``inferSchema`` on a big file — inference is a full extra pass over
100 TB); parquet/ORC are native readers with pushdown; a pandas
DataFrame becomes a distributed DataFrame via Arrow.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def load_table(
    spark: SparkSession,
    source,
    delimiter: str = ",",
    header_row: bool = True,
    column_types: dict[str, str] | None = None,
) -> DataFrame:
    """Load a table from a path (format sniffed by suffix: parquet /
    orc / csv) or an in-memory pandas DataFrame.

    ``column_types`` maps column name → Spark SQL type string (e.g.
    ``{"src": "long", "weight": "double"}``); for CSV it becomes the
    explicit schema (reference CSVOptions ``column_types``), which at
    scale replaces ``inferSchema``'s extra full scan.  Unlisted CSV
    columns load as strings.
    """
    if not isinstance(source, str):  # pandas / list-of-rows input
        df = spark.createDataFrame(source)
        return _cast(df, column_types)
    low = source.lower()
    if low.endswith(".parquet") or low.endswith(".pq"):
        return _cast(spark.read.parquet(source), column_types)
    if low.endswith(".orc"):
        return _cast(spark.read.orc(source), column_types)
    reader = (
        spark.read.option("sep", delimiter)
        .option("header", "true" if header_row else "false")
    )
    if column_types:
        df = reader.csv(source)
        return _cast(df, column_types)
    return reader.option("inferSchema", "true").csv(source)


def load_graph(
    spark: SparkSession,
    edges,
    vertices=None,
    src_col: str = "src",
    dst_col: str = "dst",
    directed: bool = True,
    vertex_options: dict | None = None,
    **options,
):
    """Reference ``session.load_from(edges=…, vertices=…)`` analog:
    load edge (and optional vertex) tables through :func:`load_table`
    and assemble a :class:`..graph.Graph`.

    ``**options`` (delimiter / header_row / column_types) apply to the
    EDGE table only; pass ``vertex_options={...}`` for the vertex
    table — the two tables rarely share a schema, and silently reusing
    edge ``column_types`` on the vertex side mistypes it."""
    from pyspark.sql import functions as F

    from ..graph import Graph

    e = load_table(spark, edges, **options)
    e = e.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst"),
        *[c for c in e.columns if c not in (src_col, dst_col)],
    )
    v = None
    if vertices is not None:
        v = load_table(spark, vertices, **(vertex_options or {}))
        if "id" not in v.columns:
            v = v.withColumnRenamed(v.columns[0], "id")
    return Graph.from_edges(e, directed=directed, vertices=v)


def _cast(df: DataFrame, column_types: dict[str, str] | None) -> DataFrame:
    if not column_types:
        return df
    from pyspark.sql import functions as F

    return df.select(
        *[
            F.col(c).cast(column_types[c]).alias(c)
            if c in column_types
            else F.col(c)
            for c in df.columns
        ]
    )
