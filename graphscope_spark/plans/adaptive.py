"""Per-loop AQE toggling for fixed-shape superstep plans.

AQE re-plans every query at runtime by materializing shuffle stages
and inspecting their statistics.  For a one-shot analytical query that
is pure win; for an iterate loop that runs the SAME small fixed-shape
plan 10-30 times, the per-round re-planning and extra stage
materialization dominate: measured at sf0.1/local[32], PageRank drops
7.8s → 5.2s and WCC 10.4s → 3.7s with AQE off, while CDLP (whose
per-round histogram shuffle genuinely benefits from runtime coalesce)
regresses 14.9s → 43s.  So the knob is per-operator, not global:
operators whose superstep shape is known and already skew-guarded
(salting, map-side combine, co-partitioned joins) turn AQE off for the
loop and restore the caller's setting afterwards.

The measured per-operator policy (A/B at sf0.01-sf0.1, both orders,
repeated):

- **AQE OFF** (1.3-3x faster): pagerank, wcc, sssp, multi_source_sssp,
  bfs, betweenness — frontier/fixed-shape supersteps whose shuffle
  size is stable or shrinking predictably.
- **AQE ON** (1.4-7x faster than off): cdlp (histogram shrinks as
  labels converge), closeness (growing state union + distinct),
  hits / eigenvector / katz (dense |V|-state join chains).

On the prebuilt-adjacency spark-submit path (``jobs/pagerank_job.py``,
10-60M edges) the gap widens to ~10x: post-combine shuffle bytes are
small, so AQE's coalescePartitions heuristic (sized for I/O, ~64MB per
partition) collapses the message shuffle to a handful of partitions
and near-serializes the CPU-bound aggregation + state join.  Fixed
``spark.sql.shuffle.partitions`` with AQE off restores one full wave
of tasks per superstep.

At cluster scale the same reasoning holds — where the superstep
shuffle is stable, `spark.sql.shuffle.partitions` sized once beats
per-round adaptive re-planning — but operators accept
``adaptive=True`` to re-enable AQE where the data is unknown/skewed
beyond what the explicit guards handle.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession

_KEY = "spark.sql.adaptive.enabled"


@contextmanager
def superstep_conf(spark: SparkSession, adaptive: bool):
    """Temporarily pin AQE for an iterate loop; always restores the
    previous session value on exit."""
    prev = spark.conf.get(_KEY, "true")
    spark.conf.set(_KEY, "true" if adaptive else "false")
    try:
        yield
    finally:
        spark.conf.set(_KEY, prev)
