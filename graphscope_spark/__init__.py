"""graphscope_spark — a PySpark-native link-graph analytics engine.

A from-scratch reimplementation of the *capabilities* of GraphScope's
analytical engine (GAE/GRAPE — see /root/reference, SURVEY.md) on the
Spark DataFrame stack:

- a property-graph data model expressed as plain DataFrames
  (``graphscope_spark.graph.Graph``), with a CSR-like src-bucketed
  adjacency DataFrame as the hot-loop representation;
- the flagship iterative apps — PageRank (NetworkX/LDBC semantics with
  dangling mass + L1 convergence), WCC (min-label propagation), CDLP
  (LDBC most-frequent / min-tie-break label propagation), triangle
  counting (degree-oriented two-join) — plus the second-tier app
  library (SSSP, BFS, LCC, k-core, k-shell, HITS, degree centrality,
  closeness, ...), each a pure function ``(graph, params) -> DataFrame``
  driven by a superstep loop of DataFrame jobs;
- an edge-mining pipeline over a source-code repository table
  ``(repo, path, commit, lang, content)`` using Arrow-vectorized pandas
  UDFs with per-row sha256(content) preserved;
- per-superstep checkpoint/resume with per-partition lineage and
  convergence metrics (``graphscope_spark.plans.checkpoint``);
- large-scale training-data ops: dedup (exact / MinHash-LSH / SimHash /
  n-gram Jaccard / embedding cosine), similarity search, text analysis,
  multimodal column plumbing (``graphscope_spark.functions``).

Everything is declarative DataFrame/SQL so Catalyst + AQE optimize the
physical plan; explicit salting utilities handle power-law hub-vertex
skew that AQE alone does not fix (``graphscope_spark.plans.skew``).
"""

__version__ = "0.1.0"

from graphscope_spark.graph import Graph  # noqa: F401
from graphscope_spark.property_graph import PropertyGraph  # noqa: F401


def __getattr__(name):
    """Top-level app access, ``graphscope.pagerank(g)``-style: any
    name in the :mod:`graphscope_spark.app` catalog resolves to its
    operator, so reference call sites port as
    ``graphscope_spark.pagerank(g)`` / ``.wcc(g)`` / ``.cdlp(g)``.
    Lazy (PEP 562) — importing the package never imports operator
    modules."""
    from graphscope_spark.app import _APPS, _resolve

    if name in _APPS:
        return _resolve(name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
