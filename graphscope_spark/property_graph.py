"""Labeled property-graph container — the data model of the
reference's ``vineyard::ArrowFragment``: multiple vertex labels and
edge labels, each with a typed property table, from which analytical
apps consume a PROJECTED simple graph (one vertex label, one edge
label, ≤1 property each — reference
``core/fragment/arrow_projected_fragment.h:696-744`` and the client
surface ``python/graphscope/framework/graph.py:254-308``:
``graph.project(vertices={label: [prop]}, edges={label: [prop]})``).

Spark mapping: each label IS a DataFrame — a vertex label holds
``(id, props…)``, an edge label holds ``(src, dst, props…)`` plus the
endpoint labels it connects.  ``project`` selects one vertex and one
edge label, narrows to the requested property columns (column pruning
reaches the parquet scan — projecting 1 property of a 50-property
label never reads the other 49), and returns the simple
:class:`~graphscope_spark.graph.Graph` every operator runs on.
``to_graph`` is the ADD_LABELS-style union of all labels (schemas
merged with null-filling), matching ``Graph.add_labels``.

Nothing is materialized at build time: labels stay lazy scans until an
app runs on a projection, so a 100-label catalog costs nothing to
declare.
"""
from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

from .graph import Graph


@dataclass(frozen=True)
class EdgeLabel:
    """One edge label: relation name + endpoint vertex labels + the
    edge table ``(src, dst, props…)``."""

    src_label: str
    dst_label: str
    df: DataFrame


@dataclass
class PropertyGraph:
    """Multi-label property graph (reference ``vineyard::ArrowFragment``
    / ``framework/graph.py:254-308``).  Build with :meth:`add_vertices`
    / :meth:`add_edges` (the ``session.load_from(vertices={...},
    edges={...})`` analog), consume via :meth:`project`."""

    directed: bool = True
    num_partitions: int | None = None
    vertex_labels: dict[str, DataFrame] = field(default_factory=dict)
    edge_labels: dict[str, EdgeLabel] = field(default_factory=dict)

    # ----------------------------------------------------------- build
    def add_vertices(
        self, df: DataFrame, label: str, id_col: str = "id"
    ) -> "PropertyGraph":
        """Register a vertex label; first column convention is ``id``
        (renamed from ``id_col``).  Returns self for chaining."""
        if id_col != "id":
            df = df.withColumnRenamed(id_col, "id")
        self.vertex_labels[label] = df
        return self

    def add_edges(
        self,
        df: DataFrame,
        label: str,
        src_label: str,
        dst_label: str,
        src_col: str = "src",
        dst_col: str = "dst",
    ) -> "PropertyGraph":
        """Register an edge label connecting ``src_label`` →
        ``dst_label`` vertex labels."""
        if src_col != "src":
            df = df.withColumnRenamed(src_col, "src")
        if dst_col != "dst":
            df = df.withColumnRenamed(dst_col, "dst")
        self.edge_labels[label] = EdgeLabel(src_label, dst_label, df)
        return self

    # --------------------------------------------------------- consume
    def project(
        self,
        vlabel: str,
        elabel: str,
        vprop: str | None = None,
        eprop: str | None = None,
    ) -> Graph:
        """PROJECT_TO_SIMPLE (reference
        ``arrow_projected_fragment.h:696-744``): one vertex label, one
        edge label, at most one property each → simple :class:`Graph`.

        ``eprop`` is carried as the ``weight`` column (what the
        weighted apps consume); ``vprop`` rides on the vertex table.
        Columns outside the projection are pruned BEFORE any shuffle,
        so the projected plan never pays for unused properties."""
        if vlabel not in self.vertex_labels:
            raise KeyError(f"unknown vertex label {vlabel!r}")
        if elabel not in self.edge_labels:
            raise KeyError(f"unknown edge label {elabel!r}")
        el = self.edge_labels[elabel]
        if el.src_label != vlabel or el.dst_label != vlabel:
            raise ValueError(
                f"edge label {elabel!r} connects {el.src_label!r}→"
                f"{el.dst_label!r}; projection needs both endpoints on "
                f"{vlabel!r} (use to_graph() for the label union)"
            )
        v = self.vertex_labels[vlabel]
        v = v.select("id", *( [vprop] if vprop else [] ))
        e = el.df
        ecols = ["src", "dst"]
        if eprop:
            e = e.select(
                "src", "dst", F.col(eprop).cast("double").alias("weight")
            )
        else:
            e = e.select(*ecols)
        return Graph.from_edges(
            e, directed=self.directed, vertices=v,
            num_partitions=self.num_partitions,
        )

    def project_from_dicts(
        self,
        vertices: dict[str, list[str]],
        edges: dict[str, list[str]],
    ) -> Graph:
        """The reference client's exact projection signature
        (``python/graphscope/framework/graph.py:254-308``):
        ``graph.project(vertices={"person": ["age"]},
        edges={"knows": ["weight"]})`` — one label each, ≤1 property
        each (the ArrowProjectedFragment contract)."""
        (vl, vprops), = vertices.items()
        (el, eprops), = edges.items()
        if len(vprops or []) > 1 or len(eprops or []) > 1:
            raise ValueError(
                "projection takes at most ONE property per label "
                "(arrow_projected_fragment.h contract)"
            )
        return self.project(
            vl, el,
            vprop=(vprops[0] if vprops else None),
            eprop=(eprops[0] if eprops else None),
        )

    def bipartite(
        self, elabel: str, eprop: str | None = None
    ) -> Graph:
        """Project an edge label whose endpoints are two DIFFERENT
        vertex labels (e.g. user→item) into a simple graph over the
        union of both endpoint label id-spaces — the shape
        ``operators.lpa_u2i`` consumes.  Caller guarantees the two
        labels' id spaces are disjoint (as the reference's typed label
        ids are by construction)."""
        if elabel not in self.edge_labels:
            raise KeyError(f"unknown edge label {elabel!r}")
        el = self.edge_labels[elabel]
        ids = (
            self.vertex_labels[el.src_label].select("id")
            .unionByName(self.vertex_labels[el.dst_label].select("id"))
            .distinct()
        )
        e = el.df
        if eprop:
            e = e.select(
                "src", "dst", F.col(eprop).cast("double").alias("weight")
            )
        else:
            e = e.select("src", "dst")
        return Graph.from_edges(
            e, directed=self.directed, vertices=ids,
            num_partitions=self.num_partitions,
        )

    def to_graph(self) -> Graph:
        """ADD_LABELS-style union of every label (schemas merged with
        null-filling) → one simple graph; the whole-catalog view
        (reference ``grape_instance.cc:1453-1457``)."""
        v: DataFrame | None = None
        for df in self.vertex_labels.values():
            v = df if v is None else v.unionByName(
                df, allowMissingColumns=True
            )
        e: DataFrame | None = None
        for el in self.edge_labels.values():
            e = el.df if e is None else e.unionByName(
                el.df, allowMissingColumns=True
            )
        if e is None:
            raise ValueError("property graph has no edge labels")
        return Graph.from_edges(
            e, directed=self.directed, vertices=v,
            num_partitions=self.num_partitions,
        )

    def schema(self) -> dict:
        """REPORT-style label catalog: label → column:type list (the
        reference's ``graph.schema`` surface)."""
        return {
            "vertices": {
                lb: df.schema.simpleString()
                for lb, df in self.vertex_labels.items()
            },
            "edges": {
                lb: {
                    "src_label": el.src_label,
                    "dst_label": el.dst_label,
                    "schema": el.df.schema.simpleString(),
                }
                for lb, el in self.edge_labels.items()
            },
            "directed": self.directed,
        }
