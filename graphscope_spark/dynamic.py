"""Mutable-graph facade — the reference's dynamic fragment +
NetworkX-flavored mutation API (``core/fragment/dynamic_fragment.h``,
1671 LoC of in-place mutable CSR; client surface
``python/graphscope/nx/classes/graph.py``: ``add_edge`` /
``remove_edge`` / ``add_node`` … and the engine ops MODIFY_EDGES /
MODIFY_VERTICES, ``core/grape_instance.cc`` dispatch).

Spark-idiomatic answer: DataFrames are immutable, so a "mutable
graph" is a DELTA LOG folded into snapshots — mutations buffer
driver-side (they are tiny relative to the graph), and
:meth:`snapshot` folds them into the distributed edge/vertex tables
with one union + anti-join pair per table.  This is the same shape as
the streaming edge-log pipeline (``streaming/edge_stream.py``) and
the standard big-data answer to point mutations (a merge-on-read
table format: base + delta, compacted on materialize).

Apps run on snapshots: ``dg.snapshot()`` is a plain
:class:`~graphscope_spark.graph.Graph`, so every operator and
``run_app`` works unchanged.  Insert-only mutation streams can
warm-start wcc/pagerank between snapshots (``init_labels`` /
``init_ranks``); after a removal the warm-start contract is void and
callers must cold-start (see ``operators/wcc.py``).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .graph import Graph


class DynamicGraph:
    """NetworkX-flavored mutable wrapper over immutable snapshots."""

    def __init__(
        self,
        spark: SparkSession,
        edges: DataFrame | None = None,
        vertices: DataFrame | None = None,
        directed: bool = True,
    ):
        self._spark = spark
        self._directed = directed
        self._base_e = edges
        self._base_v = vertices
        # buffered deltas (driver-side lists of tuples — mutations are
        # tiny next to the graph; bulk loads go through `edges`)
        self._add_e: list[tuple[int, int]] = []
        self._del_e: list[tuple[int, int]] = []
        self._add_v: list[int] = []
        self._del_v: list[int] = []
        self._snap: Graph | None = None

    # ------------------------------------------------------ mutations
    def _dirty(self) -> None:
        self._snap = None

    def add_edge(self, u: int, v: int) -> None:
        self.add_edges_from([(u, v)])

    def add_edges_from(self, pairs) -> None:
        self._add_e.extend((int(u), int(v)) for u, v in pairs)
        self._dirty()

    def remove_edge(self, u: int, v: int) -> None:
        self.remove_edges_from([(u, v)])

    def remove_edges_from(self, pairs) -> None:
        self._del_e.extend((int(u), int(v)) for u, v in pairs)
        self._dirty()

    def add_node(self, v: int) -> None:
        self.add_nodes_from([v])

    def add_nodes_from(self, vs) -> None:
        self._add_v.extend(int(v) for v in vs)
        self._dirty()

    def remove_node(self, v: int) -> None:
        self.remove_nodes_from([v])

    def remove_nodes_from(self, vs) -> None:
        """Removing a vertex removes its incident edges on snapshot
        (NetworkX semantics)."""
        self._del_v.extend(int(v) for v in vs)
        self._dirty()

    # ------------------------------------------------------- snapshot
    def snapshot(self) -> Graph:
        """Fold the delta log into an immutable :class:`Graph` (cached
        until the next mutation): base ∪ additions, minus removals —
        one union + one anti-join per table, all distributed."""
        if self._snap is not None:
            return self._snap
        e = self._base_e
        if self._add_e:
            adds = self._spark.createDataFrame(
                self._add_e, "src long, dst long"
            )
            e = adds if e is None else e.unionByName(
                adds, allowMissingColumns=True
            )
        if e is None:
            e = self._spark.createDataFrame([], "src long, dst long")
        e = e.dropDuplicates(["src", "dst"])
        if self._del_e:
            dels = self._spark.createDataFrame(
                self._del_e, "src long, dst long"
            )
            if not self._directed:
                dels = dels.unionByName(dels.select(
                    F.col("dst").alias("src"), F.col("src").alias("dst")
                ))
            e = e.join(dels, ["src", "dst"], "left_anti")
        v = self._base_v
        if self._add_v:
            addv = self._spark.createDataFrame(
                [(x,) for x in self._add_v], "id long"
            )
            v = addv if v is None else v.unionByName(
                addv, allowMissingColumns=True
            )
        endpoints = (
            e.select(F.col("src").alias("id"))
            .unionByName(e.select(F.col("dst").alias("id")))
        )
        v = endpoints if v is None else v.unionByName(
            endpoints, allowMissingColumns=True
        )
        v = v.dropDuplicates(["id"])
        if self._del_v:
            delv = self._spark.createDataFrame(
                [(x,) for x in self._del_v], "id long"
            )
            v = v.join(delv, "id", "left_anti")
            e = (
                e.join(delv.withColumnRenamed("id", "src"), "src",
                       "left_anti")
                .join(delv.withColumnRenamed("id", "dst"), "dst",
                      "left_anti")
                .select("src", "dst",
                        *[c for c in e.columns if c not in ("src", "dst")])
            )
        self._snap = Graph.from_edges(
            e, directed=self._directed, vertices=v
        )
        return self._snap

    # ------------------------------------------- NetworkX-ish queries
    def number_of_nodes(self) -> int:
        return self.snapshot().vertices.count()

    def number_of_edges(self) -> int:
        return self.snapshot().edges.count()

    def has_edge(self, u: int, v: int) -> bool:
        g = self.snapshot()
        e = g.edges if self._directed else g.symmetrized_edges()
        return not e.where(
            (F.col("src") == u) & (F.col("dst") == v)
        ).isEmpty()

    def compact(self) -> "DynamicGraph":
        """Fold deltas into a new base (the merge-on-read compaction):
        after many mutation batches, re-anchor on the snapshot so the
        anti-join chain doesn't grow unboundedly."""
        g = self.snapshot()
        fresh = DynamicGraph(
            self._spark, edges=g.edges.localCheckpoint(eager=True),
            vertices=g.vertices.localCheckpoint(eager=True),
            directed=self._directed,
        )
        return fresh
