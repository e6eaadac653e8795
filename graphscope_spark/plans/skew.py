"""Hub-vertex skew handling: explicit salting for power-law keys.

GAE sidesteps hub skew structurally (mirrored outer vertices + dense
per-vertex arrays, reference ``docs/analytical_engine/
programming_model_pie.md:24-28``); a DataFrame engine instead faces it
as shuffle skew on ``groupBy(dst)`` / ``join(on=key)`` with Zipf keys.
Three mitigations, layered:

1. Spark's hash aggregation already does map-side partial aggregation
   for algebraic aggs (sum/min/max/count) — the analog of GAE's message
   combining.  For those, salting buys little.
2. AQE skew-join splitting handles *join* skew at runtime.
3. For non-algebraic aggs (``collect_list`` — the adjacency build) and
   for guaranteed bounded reducer fan-in on extreme hubs, the explicit
   two-phase salted aggregation below.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, key: str, buckets: int, salt_col: str = "_salt") -> DataFrame:
    """Deterministic salt in [0, buckets): xxhash64 of the source
    partition id PLUS the row's other content — no ``rand()``.

    The partition id matters: content alone degenerates exactly in
    the hub case this module exists for — e.g. ``salted_sum(msgs,
    'id', F.lit(1))`` for a degree count makes every hub message the
    identical row, so a content-only hash puts ALL of them in ONE
    bucket and the claimed ~1/buckets reducer bound is void.  A hub's
    messages are produced across many upstream partitions, so the
    partition id spreads identical rows while staying deterministic
    for a fixed input partitioning (re-runs of the same pipeline see
    the same partitioning; the aggregate VALUE is salt-invariant
    regardless)."""
    others = [c for c in df.columns if c != key] or [key]
    return df.withColumn(
        salt_col,
        F.pmod(F.xxhash64(F.spark_partition_id(), *others), F.lit(buckets)),
    )


def salted_sum(
    df: DataFrame, key: str, value: Column | str, buckets: int = 16, out: str = "sum"
) -> DataFrame:
    """Two-phase sum: groupBy(key, salt) → groupBy(key).

    Bounds the rows any single reducer task sees for one hub key to
    ~1/buckets of that key's messages even when map-side combine is
    defeated (e.g. many small upstream partitions)."""
    value = F.col(value) if isinstance(value, str) else value
    partial = (
        with_salt(df.select(F.col(key), value.alias("_v")), key, buckets)
        .groupBy(key, "_salt")
        .agg(F.sum("_v").alias("_partial"))
    )
    return partial.groupBy(key).agg(F.sum("_partial").alias(out))


def salted_collect_list(
    df: DataFrame, key: str, value: str, buckets: int = 16, out: str = "values"
) -> DataFrame:
    """Two-phase collect_list (order not guaranteed, like the
    single-phase version): partial lists per (key, salt), then flatten.
    Used for the adjacency build when a hub vertex's neighbor list is
    too large for one reducer's agg buffer."""
    partial = (
        with_salt(df.select(key, value), key, buckets)
        .groupBy(key, "_salt")
        .agg(F.collect_list(value).alias("_part"))
    )
    return partial.groupBy(key).agg(
        F.flatten(F.collect_list("_part")).alias(out)
    )


def top_hub_keys(edges: DataFrame, key: str = "dst", threshold: int = 100_000) -> DataFrame:
    """Identify hub keys above a degree threshold — used to route only
    hub traffic through the salted path and keep the common case in
    plain single-shuffle aggregation."""
    return (
        edges.groupBy(key).agg(F.count(F.lit(1)).alias("deg"))
        .where(F.col("deg") >= threshold)
        .select(key)
    )
