"""Analytical app library — each app is a pure function
``(graph, params) -> result DataFrame`` with the superstep loop in the
driver (the Spark re-expression of the reference's PEval/IncEval
worker loop, SURVEY.md §3.1).
"""

from graphscope_spark.operators.pagerank import pagerank  # noqa: F401
from graphscope_spark.operators.wcc import wcc  # noqa: F401
from graphscope_spark.operators.cdlp import cdlp  # noqa: F401
from graphscope_spark.operators.triangles import triangles  # noqa: F401
