"""RUN_APP dispatch — the user-facing app API of the reference
(``core/grape_instance.cc`` ``rpc::RUN_APP`` + the python surface
``graphscope.pagerank(g, ...)``, ``python/graphscope/analytical/app/``):
one ``run_app(graph, name, **params)`` entry point and a flat module
namespace, so a GraphScope user's call sites port by changing the
import.

Every app is still a pure function ``(Graph, **params) -> DataFrame``;
this module only provides the string dispatch and the catalog
(``list_apps()``) that the reference's op-code layer exposes.
"""
from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

from .graph import Graph

#: name -> "module:function" (lazy import keeps `import
#: graphscope_spark.app` cheap and avoids module-level Spark deps)
_APPS: dict[str, str] = {
    # ranking
    "pagerank": "pagerank:pagerank",
    "ppr": "pagerank:personalized_pagerank",
    "articlerank": "pagerank:articlerank",
    "hits": "centrality:hits",
    "voterank": "misc:voterank",
    # traversal / paths
    "bfs": "traversal:bfs",
    "bfs_tree": "traversal:bfs_tree",
    "sssp": "traversal:sssp",
    "sssp_path": "traversal:sssp_path",
    "sssp_has_path": "traversal:sssp_has_path",
    "sssp_average_length": "traversal:sssp_average_length",
    "apsp_lengths": "traversal:apsp_lengths",
    "apsp_full": "traversal:apsp_full_lengths",
    "random_multi_bfs": "traversal:random_multi_bfs",
    "dfs": "dfs:dfs",
    "is_simple_path": "paths:is_simple_path",
    "all_simple_paths": "paths:all_simple_paths",
    "all_simple_edge_paths": "paths:all_simple_edge_paths",
    "sample_paths": "paths:sample_paths",
    # connectivity / structure
    "wcc": "wcc:wcc",
    "scc": "connectivity:scc",
    "bridges": "bcc:bridges",
    "cut_points": "bcc:articulation_points",
    "bcc": "bcc:biconnected_edge_labels",
    "msf": "msf:minimum_spanning_forest",
    # communities / clustering
    "cdlp": "cdlp:cdlp",
    "lpa_u2i": "lpa_u2i:lpa_u2i",
    "fluid": "fluid:fluid_community",
    "louvain": "louvain:louvain",
    "louvain_one_level": "louvain:louvain_one_level",
    "modularity": "louvain:modularity",
    "lcc": "clustering:lcc",
    "avg_clustering": "clustering:avg_clustering",
    "transitivity": "clustering:transitivity",
    "directed_clustering": "clustering:directed_clustering",
    "kcore": "clustering:kcore",
    "kshell": "clustering:kshell",
    "core_numbers": "clustering:core_numbers",
    "onion_layers": "clustering:onion_layers",
    "degeneracy_ordering": "clustering:degeneracy_ordering",
    "densest_subgraph": "clustering:densest_subgraph_approx",
    "coloring": "coloring:greedy_coloring",
    # centrality
    "degree_centrality": "centrality:degree_centrality",
    "eigenvector": "centrality:eigenvector_centrality",
    "katz": "centrality:katz_centrality",
    "closeness": "centrality:closeness_centrality",
    "harmonic": "centrality:harmonic_centrality",
    "betweenness": "betweenness:betweenness_centrality",
    "edge_betweenness": "betweenness:edge_betweenness_centrality",
    # subgraph counting
    "triangles": "triangles:triangles",
    "triangle_count": "triangles:global_triangle_count",
    "k_clique_count": "triangles:k_clique_count",
    "rectangle_count": "triangles:rectangle_count",
    # matching / covering
    "mis": "misc:maximal_independent_set",
    "maximal_matching": "misc:maximal_matching",
    "min_cover": "misc:min_vertex_cover_greedy",
    "min_dominating_set": "misc:min_dominating_set_greedy",
    "min_edge_cover": "misc:min_edge_cover",
    "k_center": "misc:k_center",
    # measurement / misc
    "diameter_approx": "misc:diameter_approx",
    "assortativity": "misc:degree_assortativity",
    "attribute_assortativity": "misc:attribute_assortativity",
    "numeric_assortativity": "misc:numeric_assortativity",
    "avg_degree_connectivity": "misc:average_degree_connectivity",
    "boundary": "misc:node_boundary",
    "edge_boundary": "misc:edge_boundary",
    # sampling / link prediction
    "random_walks": "walks:random_walks",
    "sample_neighbors": "walks:sample_neighbors",
    "negative_sampling": "walks:negative_sampling",
    "jaccard_coefficient": "linkpred:jaccard_coefficient",
    "preferential_attachment": "linkpred:preferential_attachment",
    "adamic_adar": "linkpred:adamic_adar",
}


def list_apps() -> list[str]:
    """Catalog of dispatchable app names (reference: the GAE app
    registry the coordinator exposes)."""
    return sorted(_APPS)


def _resolve(name: str) -> Callable:
    try:
        mod_name, fn_name = _APPS[name].split(":")
    except KeyError:
        raise KeyError(
            f"unknown app {name!r}; known: {', '.join(list_apps())}"
        ) from None
    import importlib

    mod = importlib.import_module(f"{__package__}.operators.{mod_name}")
    return getattr(mod, fn_name)


def run_app(graph: Graph, name: str, **params) -> DataFrame:
    """RUN_APP: dispatch ``name`` against ``graph`` with ``params``.

    >>> run_app(g, "pagerank", max_iter=10)
    """
    return _resolve(name)(graph, **params)
