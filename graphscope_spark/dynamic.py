"""Mutable-graph facade — the reference's dynamic fragment +
NetworkX-flavored mutation API (``core/fragment/dynamic_fragment.h``,
1671 LoC of in-place mutable CSR; client surface
``python/graphscope/nx/classes/graph.py``: ``add_edge`` /
``remove_edge`` / ``add_node`` … and the engine ops MODIFY_EDGES /
MODIFY_VERTICES, ``core/grape_instance.cc`` dispatch).

Spark-idiomatic answer: DataFrames are immutable, so a "mutable
graph" is an ORDERED DELTA LOG folded into snapshots — mutations
buffer driver-side (they are tiny relative to the graph; bulk loads
go through the constructor), and :meth:`snapshot` resolves the log
driver-side to order-insensitive net sets (last op per key wins,
node removals implicitly delete incident edges at their log
position, exactly the NetworkX replay), then folds them into the
distributed edge/vertex tables with one union + anti-join pair per
table.  This is the same shape as the streaming edge-log pipeline
(``streaming/edge_stream.py``) and the standard big-data answer to
point mutations (a merge-on-read table format: base + delta,
compacted on materialize).

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
        # ordered op log: ("ae"|"de", (u, v)) or ("an"|"dn", v) —
        # order matters (remove-then-re-add must resurrect the key),
        # so resolution happens at snapshot time, not insert time
        self._ops: list[tuple[str, tuple[int, int] | int]] = []
        self._snap: Graph | None = None

    # ------------------------------------------------------ mutations
    def _dirty(self) -> None:
        self._snap = None

    def _ekey(self, u: int, v: int) -> tuple[int, int]:
        """Canonical edge key: undirected graphs identify (u, v) with
        (v, u) — NetworkX semantics (``add_edge(5,7); add_edge(7,5)``
        is ONE edge)."""
        if self._directed or u <= v:
            return (u, v)
        return (v, u)

    def add_edge(self, u: int, v: int) -> None:
        self.add_edges_from([(u, v)])

    def add_edges_from(self, pairs) -> None:
        self._ops.extend(
            ("ae", self._ekey(int(u), int(v))) for u, v in pairs
        )
        self._dirty()

    def remove_edge(self, u: int, v: int) -> None:
        self.remove_edges_from([(u, v)])

    def remove_edges_from(self, pairs) -> None:
        self._ops.extend(
            ("de", self._ekey(int(u), int(v))) for u, v in pairs
        )
        self._dirty()

    def add_node(self, v: int) -> None:
        self.add_nodes_from([v])

    def add_nodes_from(self, vs) -> None:
        self._ops.extend(("an", int(v)) for v in vs)
        self._dirty()

    def remove_node(self, v: int) -> None:
        self.remove_nodes_from([v])

    def remove_nodes_from(self, vs) -> None:
        """Removing a vertex removes its incident edges at this point
        in the log (NetworkX semantics): edges added LATER re-exist."""
        self._ops.extend(("dn", int(v)) for v in vs)
        self._dirty()

    # ----------------------------------------------------- resolution
    def _resolve(self):
        """Replay the op log driver-side into order-insensitive net
        sets (last op per key wins; a node removal acts as an edge
        removal for every incident key seen so far).  O(|ops|·|edge
        keys touched|) worst case — mutations are tiny by contract.

        Returns (edge_adds, edge_dels, node_adds, node_ever_deleted):
        ``node_ever_deleted`` prunes BASE rows (vertex + incident
        edges) — a later ``add_node`` re-creates the vertex bare and a
        later ``add_edge`` re-creates that one edge, per NetworkX.
        """
        last_e: dict[tuple[int, int], str] = {}
        last_n: dict[int, str] = {}
        ever_del_n: set[int] = set()
        for kind, payload in self._ops:
            if kind == "ae":
                last_e[payload] = "add"
                # NetworkX add_edge creates missing endpoints — they
                # must survive a LATER removal of the other endpoint
                last_n[payload[0]] = "add"
                last_n[payload[1]] = "add"
            elif kind == "de":
                last_e[payload] = "del"
            elif kind == "an":
                last_n[payload] = "add"
            else:  # dn
                v = payload
                last_n[v] = "del"
                ever_del_n.add(v)
                for k in last_e:
                    if v in k:
                        last_e[k] = "del"
        edge_adds = [k for k, op in last_e.items() if op == "add"]
        edge_dels = [k for k, op in last_e.items() if op == "del"]
        node_adds = [v for v, op in last_n.items() if op == "add"]
        return edge_adds, edge_dels, node_adds, ever_del_n

    # ------------------------------------------------------- snapshot
    def snapshot(self) -> Graph:
        """Fold the delta log into an immutable :class:`Graph` (cached
        until the next mutation): base minus removals ∪ net additions
        — one union + anti-join pair per table, all distributed; only
        the (tiny) log resolution runs on the driver."""
        if self._snap is not None:
            return self._snap
        edge_adds, edge_dels, node_adds, ever_del_n = self._resolve()

        e = self._base_e
        if e is None:
            e = self._spark.createDataFrame([], "src long, dst long")
        if not self._directed:
            # canonical orientation so (5,7) and (7,5) are ONE edge
            # for dedup/count (extra columns ride along)
            e = (
                e.withColumn("_s", F.least("src", "dst"))
                .withColumn("_d", F.greatest("src", "dst"))
                .drop("src", "dst")
                .withColumnRenamed("_s", "src")
                .withColumnRenamed("_d", "dst")
            )
        # base pruning FIRST (node removals + net edge removals), then
        # net additions — resolution already encoded the log order
        if ever_del_n:
            delv = self._spark.createDataFrame(
                [(x,) for x in sorted(ever_del_n)], "id long"
            )
            e = (
                e.join(delv.withColumnRenamed("id", "src"), "src",
                       "left_anti")
                .join(delv.withColumnRenamed("id", "dst"), "dst",
                      "left_anti")
            )
        if edge_dels:
            dels = self._spark.createDataFrame(
                edge_dels, "src long, dst long"
            )
            e = e.join(dels, ["src", "dst"], "left_anti")
        if edge_adds:
            adds = self._spark.createDataFrame(
                edge_adds, "src long, dst long"
            )
            e = e.unionByName(adds, allowMissingColumns=True)
        e = e.dropDuplicates(["src", "dst"])

        v = self._base_v
        if v is not None and ever_del_n:
            delv = self._spark.createDataFrame(
                [(x,) for x in sorted(ever_del_n)], "id long"
            )
            v = v.join(delv, "id", "left_anti")
        if node_adds:
            addv = self._spark.createDataFrame(
                [(x,) for x in sorted(node_adds)], "id long"
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
