"""A Gremlin-flavored fluent traversal surface compiling to DataFrame
plans — the user-facing API of the reference's interactive engine
(GIE; ``interactive_engine/``, queries like
``g.V().hasLabel(..).out().out().count()``).  SURVEY §2.5 maps GIE's
dataflow operators 1:1 onto Spark relational primitives; this module
gives those mappings the traversal SYNTAX a GIE user actually writes,
so their call sites port almost verbatim.

Semantics follow Gremlin's bag (multiset) model: ``out()`` from a
traverser multiset keeps duplicates (two paths into the same vertex =
two traversers) — hence plain joins, with ``dedup()`` as the explicit
set collapse.  Every step is lazy; the plan stays declarative until a
terminal (``count / toDF / values``), so Catalyst sees the whole
pipeline (filter pushdown through the hops, join reordering).

Supported steps: ``V, E, has, hasId, out, in_, both, outE, inE,
bothE, otherV, limit, dedup, values, select, count, where_, path``
(enable path tracking with ``V(..., track_path=True)`` — each hop
then appends to an array column, Gremlin's ``path()`` history).
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .graph import Graph


class Traversal:
    """A lazy traverser multiset: a DataFrame with the current element
    in column ``id`` (vertices) or ``src/dst`` (edges), plus any
    retained vertex property columns."""

    def __init__(
        self, graph: Graph, df: DataFrame, kind: str, anchor: str = "src"
    ):
        self._g = graph
        self._df = df
        self._kind = kind  # "v" | "e"
        # For edge traversals: which endpoint column the current
        # traverser vertex sits on ("src" after outE/bothE, "dst"
        # after inE) — otherV() steps to the opposite endpoint.
        self._anchor = anchor

    # ---------------------------------------------------------- filters
    def has(self, column: str, value=None) -> "Traversal":
        """``has('prop', v)`` — property equality (or non-null when
        ``value`` is None); accepts a Column predicate too."""
        if isinstance(value, Column):
            pred = value
        elif value is None:
            pred = F.col(column).isNotNull()
        else:
            pred = F.col(column) == F.lit(value)
        return Traversal(
            self._g, self._df.where(pred), self._kind, self._anchor
        )

    def hasId(self, *ids) -> "Traversal":
        key = "id" if self._kind == "v" else self._anchor
        return Traversal(
            self._g,
            self._df.where(F.col(key).isin(*ids)),
            self._kind,
            self._anchor,
        )

    def where_(self, pred: Column) -> "Traversal":
        return Traversal(
            self._g, self._df.where(pred), self._kind, self._anchor
        )

    # ------------------------------------------------------------- hops
    def _hop(self, edges: DataFrame, from_col: str, to_col: str):
        assert self._kind == "v", "hop from a vertex traversal"
        carry = ["p"] if "p" in self._df.columns else []
        stepped = self._df.select(
            F.col("id").alias(from_col), *carry
        ).join(edges.select(from_col, to_col), from_col)
        cols = [F.col(to_col).alias("id")]
        if carry:
            cols.append(
                F.concat(F.col("p"), F.array(F.col(to_col))).alias("p")
            )
        return stepped.select(*cols)

    def out(self) -> "Traversal":
        return Traversal(
            self._g, self._hop(self._g.edges, "src", "dst"), "v"
        )

    def in_(self) -> "Traversal":
        return Traversal(
            self._g, self._hop(self._g.edges, "dst", "src"), "v"
        )

    def both(self) -> "Traversal":
        return Traversal(
            self._g,
            self._hop(self._g.symmetrized_edges(), "src", "dst"),
            "v",
        )

    def outE(self) -> "Traversal":
        assert self._kind == "v"
        e = self._df.select(F.col("id").alias("src")).join(
            self._g.edges, "src"
        )
        return Traversal(self._g, e, "e", anchor="src")

    def inE(self) -> "Traversal":
        assert self._kind == "v"
        e = self._df.select(F.col("id").alias("dst")).join(
            self._g.edges, "dst"
        )
        return Traversal(self._g, e, "e", anchor="dst")

    def bothE(self) -> "Traversal":
        assert self._kind == "v"
        e = self._df.select(F.col("id").alias("src")).join(
            self._g.symmetrized_edges(), "src"
        )
        return Traversal(self._g, e, "e", anchor="src")

    def otherV(self) -> "Traversal":
        """Step to the endpoint OPPOSITE the anchored one: after
        ``inE()`` the traverser sits on ``dst``, so otherV is the
        incoming edge's ``src``; after ``outE()``/``bothE()`` it's
        ``dst``."""
        assert self._kind == "e", "otherV steps off an edge traversal"
        other = "src" if self._anchor == "dst" else "dst"
        return Traversal(
            self._g, self._df.select(F.col(other).alias("id")), "v"
        )

    # ----------------------------------------------------------- shape
    def dedup(self) -> "Traversal":
        return Traversal(
            self._g, self._df.distinct(), self._kind, self._anchor
        )

    def limit(self, n: int) -> "Traversal":
        # deterministic: Gremlin's limit is arbitrary-order; ours
        # orders by element key so reruns agree
        key = "id" if self._kind == "v" else self._anchor
        return Traversal(
            self._g,
            self._df.orderBy(key).limit(n),
            self._kind,
            self._anchor,
        )

    def repeat(self, step: str, times: int) -> "Traversal":
        """Gremlin ``repeat(out()).times(k)``: apply ``step`` ("out",
        "in_", "both") ``times`` times — the plan stays one lazy
        chain of joins, so Catalyst optimizes the whole unrolled
        pipeline."""
        t = self
        for _ in range(times):
            t = getattr(t, step)()
        return t

    # -------------------------------------------------------- terminals
    def groupCount(self) -> DataFrame:
        """Gremlin ``groupCount()``: traverser multiplicity per
        element — ``(id, n)``."""
        key = "id" if self._kind == "v" else self._anchor
        return self._df.groupBy(key).agg(
            F.count(F.lit(1)).cast("long").alias("n")
        )

    def values(self, *columns: str) -> DataFrame:
        """Project vertex properties (joins the vertex table)."""
        assert self._kind == "v"
        return self._df.join(self._g.vertices, "id").select(
            "id", *columns
        )

    def select(self, *columns: str) -> DataFrame:
        return self._df.select(*columns)

    def count(self) -> int:
        return self._df.count()

    def toDF(self) -> DataFrame:
        return self._df

    def toList(self) -> list:
        key = "id" if self._kind == "v" else self._anchor
        return [r[0] for r in self._df.orderBy(key).collect()]

    def path(self) -> DataFrame:
        """Gremlin ``path()``: the full hop history of each traverser
        as an array column (requires ``V(..., track_path=True)``)."""
        assert "p" in self._df.columns, (
            "start the traversal with track_path=True to record paths"
        )
        return self._df.select(F.col("p").alias("path"))


class GraphTraversalSource:
    """``g = traversal(graph); g.V()...`` — the GIE entry object."""

    def __init__(self, graph: Graph):
        self._g = graph

    def V(self, *ids, track_path: bool = False) -> Traversal:
        df = self._g.vertices.select("id")
        if ids:
            df = df.where(F.col("id").isin(*ids))
        if track_path:
            df = df.withColumn("p", F.array(F.col("id")))
        return Traversal(self._g, df, "v")

    def E(self) -> Traversal:
        return Traversal(self._g, self._g.edges, "e")


def traversal(graph: Graph) -> GraphTraversalSource:
    return GraphTraversalSource(graph)
