"""Path utilities: is_simple_path / all_simple_paths / path sampling.

Reference semantics:

- ``apps/simple_path/is_simple_path.h`` (103 LoC): given a vertex
  list, true iff consecutive pairs are edges and no vertex repeats
  (NetworkX ``is_simple_path``) — one distributed semi-join of the
  consecutive pairs against the edge table.
- ``apps/simple_path/all_simple_paths.h`` (279 LoC): all simple paths
  source→target up to a cutoff, frontier BFS carrying the partial
  path and pruning repeats.
- ``apps/sampling_path/sampling_path.h`` (142 LoC): enumerate paths
  matching a fixed-length pattern, truncated to a result limit; the
  reference truncates in arrival order (partitioning-dependent), here
  the limit keeps the lexicographically-first paths so the sample is
  deterministic and SQL-reproducible.

Scale shape: path expansion is one self-join per hop over the (sparse)
edge table with the partial path carried as an array column; the
simple-path filter is ``array_contains`` on that column, evaluated
JVM-side.  Lexicographic top-k truncation is Spark's TakeOrdered — no
global materialization of the path set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import Graph


def is_simple_path(graph: Graph, nodes: list[int]) -> bool:
    """True iff ``nodes`` is a simple path in the graph (edges taken
    from the symmetrized set when the graph is undirected)."""
    if len(nodes) == 0:
        return False
    if len(nodes) == 1:
        return True
    if len(set(nodes)) != len(nodes):
        return False
    spark = graph.vertices.sparkSession
    pairs = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(nodes, nodes[1:])],
        "src long, dst long",
    )
    edges = (graph.edges if graph.directed
             else graph.symmetrized_edges()).select("src", "dst")
    missing = pairs.join(edges, ["src", "dst"], "left_anti").count()
    return missing == 0


def sample_paths(
    graph: Graph, length: int = 2, limit: int = 100
) -> DataFrame:
    """Deterministic sample of simple paths with ``length`` edges:
    columns ``(v0, …, v{length})``, the lexicographically smallest
    ``limit`` paths.  Directed edges; repeated vertices pruned."""
    edges = graph.edges.select("src", "dst")
    df = edges.select(F.col("src").alias("v0"), F.col("dst").alias("v1"))
    for j in range(2, length + 1):
        ext = edges.select(
            F.col("src").alias(f"v{j - 1}"), F.col("dst").alias(f"v{j}")
        )
        df = df.join(ext, f"v{j - 1}")
        cond = None
        for i in range(j - 1):
            c = F.col(f"v{i}") != F.col(f"v{j}")
            cond = c if cond is None else (cond & c)
        df = df.where(cond)
    cols = [f"v{i}" for i in range(length + 1)]
    return df.select(*cols).orderBy(*cols).limit(limit)


def all_simple_paths(
    graph: Graph,
    source: int,
    target: int,
    cutoff: int = 4,
    symmetrize: bool = False,
) -> DataFrame:
    """All simple paths source→target with ≤ ``cutoff`` edges, one row
    per path: ``(path array<long>, hops int)`` (reference
    ``all_simple_paths.h``; NetworkX ``all_simple_paths`` semantics).
    Frontier expansion carries the partial path; ``array_contains``
    prunes revisits; paths hitting the target leave the frontier."""
    edges = (graph.symmetrized_edges() if symmetrize
             else graph.edges).select("src", "dst")
    spark = graph.vertices.sparkSession
    frontier = spark.createDataFrame(
        [([int(source)], int(source))], "path array<long>, last long"
    )
    done: list[DataFrame] = []
    for _ in range(cutoff):
        if frontier.limit(1).count() == 0:
            break
        nxt = (
            frontier.join(edges.withColumnRenamed("src", "last"), "last")
            .where(~F.array_contains("path", F.col("dst")))
            .select(
                F.concat("path", F.array(F.col("dst"))).alias("path"),
                F.col("dst").alias("last"),
            )
            .localCheckpoint(eager=True)
        )
        done.append(nxt.where(F.col("last") == int(target))
                    .select("path"))
        frontier = nxt.where(F.col("last") != int(target))
    if not done:
        return spark.createDataFrame([], "path array<long>, hops int")
    acc = done[0]
    for p in done[1:]:
        acc = acc.unionByName(p)
    return acc.select(
        "path", (F.size("path") - 1).cast("int").alias("hops")
    )


def all_simple_edge_paths(
    graph: Graph,
    source: int,
    target: int,
    cutoff: int = 4,
    symmetrize: bool = False,
) -> DataFrame:
    """All simple paths source→target rendered as EDGE lists, one row
    per path: ``(epath array<struct<src,dst>>, hops int)`` — the nx
    wrapper ``python/graphscope/nx/algorithms/builtin.py:933``
    (``all_simple_edge_paths``).  A pure projection of
    :func:`all_simple_paths`: each vertex path ``[v0 … vk]`` becomes
    its consecutive-pair list ``[(v0,v1) … (v{k-1},vk)]`` via a
    JVM-side array ``transform`` — no extra joins or shuffles beyond
    the vertex-path expansion itself."""
    p = all_simple_paths(graph, source, target, cutoff, symmetrize)
    return p.select(
        F.expr(
            "transform(slice(path, 1, size(path) - 1),"
            " (x, i) -> struct(x AS src, path[i + 1] AS dst))"
        ).alias("epath"),
        "hops",
    )
