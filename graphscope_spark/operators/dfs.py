"""Depth-first search — the reference's one remaining app
(``analytical_engine/apps/dfs/dfs.h``, 227 LoC).

Semantics (``dfs.h:60-175``, ``dfs_context.h:46-57``): a SINGLE
cursor walks the graph from ``source``; every vertex gets ``rank`` =
its DFS preorder number (source = 0, unreached = -1); at each step
the cursor moves to the first unvisited out-neighbor, backtracking to
the parent when none remain.  Output formats: per-vertex ranks,
``edges``/``successors`` (consecutive-rank pairs), ``predecessors``.

Why this is driver-side: the reference itself is strictly sequential
— ONE active vertex globally, passed fragment-to-fragment as a token
message (``dfs.h:88-137``: each ``IncEval`` advances the cursor until
it crosses a fragment boundary, then ships it).  Total work is
O(V + E) sequential steps no matter how many workers exist; there is
no parallelism to re-express.  The honest Spark shape is therefore:
collect the (sorted) adjacency to the driver and run the identical
cursor walk locally, behind an explicit scale gate — above the gate
the operator refuses loudly instead of pretending a 10^12-edge DFS is
runnable (it isn't, on the reference either: its token walk would
take O(V) message rounds).

Determinism pin: the reference explores out-neighbors in
fragment-adjacency order, which depends on the partitioning; we pin
ascending-id order (the same pin cdlp/mis/matching use for their
tie-breaks) so results are partitioning-invariant.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..graph import Graph

#: refuse to collect adjacencies beyond this many edges — DFS is
#: inherently sequential (see module docstring); the gate makes the
#: scale ceiling explicit instead of OOMing the driver
MAX_COLLECT_EDGES = 20_000_000


def dfs(
    graph: Graph,
    source: int | None = None,
    output_format: str = "ranks",
    max_collect_edges: int = MAX_COLLECT_EDGES,
) -> DataFrame:
    """DFS from ``source`` (default: min vertex id).

    ``output_format``:

    - ``"ranks"`` — ``(id, rank)`` preorder numbers, -1 if unreached
      (reference default output, ``dfs.h:215-226``);
    - ``"edges"`` / ``"successors"`` — ``(src, dst)`` pairs of
      consecutive ranks r→r+1 (``dfs.h:181-196``);
    - ``"predecessors"`` — the same pairs reversed
      (``dfs.h:197-213``).
    """
    spark = graph.vertices.sparkSession
    n_edges = graph.edges.count()
    if n_edges > max_collect_edges:
        raise ValueError(
            f"dfs is inherently sequential (reference dfs.h passes one "
            f"cursor token); refusing to collect {n_edges} edges "
            f"(> max_collect_edges={max_collect_edges}) to the driver"
        )
    # the vertex-id list is collected too (for the -1 unreached rows)
    # — gate it as well: a near-edgeless graph can still carry a huge
    # explicit vertex table
    n_vertices = graph.vertices.count()
    if n_vertices > max_collect_edges:
        raise ValueError(
            f"dfs refuses to collect {n_vertices} vertex ids "
            f"(> max_collect_edges={max_collect_edges}) to the driver"
        )
    if source is None:
        source = graph.vertices.agg(F.min("id")).first()[0]
    e = graph.edges if graph.directed else graph.symmetrized_edges()
    # sorted neighbor lists: deterministic exploration order
    adj_rows = (
        e.groupBy("src").agg(F.sort_array(F.collect_set("dst")).alias("ns"))
        .collect()
    )
    adj = {r["src"]: r["ns"] for r in adj_rows}
    all_ids = [r[0] for r in graph.vertices.select("id").collect()]

    rank: dict[int, int] = {source: 0}
    order = [source]
    # iterative cursor walk, identical to the reference's token loop:
    # stack holds the backtrack path, top is the current vertex
    stack = [source]
    nxt_idx = {source: 0}
    while stack:
        v = stack[-1]
        ns = adj.get(v, [])
        i = nxt_idx[v]
        while i < len(ns) and ns[i] in rank:
            i += 1
        nxt_idx[v] = i + 1
        if i < len(ns):
            u = ns[i]
            rank[u] = len(order)
            order.append(u)
            stack.append(u)
            nxt_idx[u] = 0
        else:
            stack.pop()

    if output_format in ("edges", "successors"):
        rows = [(order[i], order[i + 1]) for i in range(len(order) - 1)]
        return spark.createDataFrame(rows or [], "src long, dst long")
    if output_format == "predecessors":
        rows = [(order[i + 1], order[i]) for i in range(len(order) - 1)]
        return spark.createDataFrame(rows or [], "src long, dst long")
    rows = [(v, rank.get(v, -1)) for v in all_ids]
    return spark.createDataFrame(rows, "id long, rank int")
