"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``graphscope_spark`` (the engine) and
``graphscope_spark.entry`` (the query/oracle registry); this module
is a thin adapter kept stable for the driver.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from graphscope_spark import entry as _entry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: PageRank (10 LDBC
    rounds, NetworkX dangling semantics) on the co-order part graph."""
    return _entry.q_pagerank(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _entry.queries()


def oracle_sql() -> dict[str, str]:
    return _entry.oracle_sql()
