"""Superstep capacity probe — the engine's demonstrated per-core
throughput on a HOT in-session path (adjacency built and cached in
memory, state co-partitioned, AQE off), as opposed to the
cold-start/parquet path that ``run_scaling.py`` measures.

Usage::

    spark-submit --master local[4] --py-files gs.zip \
        jobs/capacity_job.py --edges 10000000 --verts 500000 --rounds 6

Prints ONE JSON line with the median superstep seconds and
edges/sec/superstep.  Measured on this sandbox (local[4], 10M edges,
500k vertices, 12g heap): ~2.6 s/superstep ≈ 3.9M edge-updates/s;
the 60M-edge scaling runs reach 6.8M at local[4] (bigger graphs
amortize the fixed per-round cost better).  Per-core this engine
sustains ~1-1.7M edge-updates/s on this box — an order of magnitude
under hand-written native MPI engines, the expected cost of the
DataFrame/JVM execution layer, bought back with elastic scale-out,
SQL interop, and fault tolerance.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from graphscope_spark.graph import Graph  # noqa: E402
from graphscope_spark.session import get_spark  # noqa: E402
from jobs.pagerank_job import synthetic_edges  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=10_000_000)
    ap.add_argument("--verts", type=int, default=500_000)
    ap.add_argument("--rounds", type=int, default=6)
    args = ap.parse_args()

    spark = get_spark("capacity-job")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))

    edges = synthetic_edges(spark, args.edges, args.verts)
    g = Graph.from_edges(edges, directed=True, num_partitions=n_part)
    adj = g.adjacency("out", cache=True)
    n_edges = adj.agg(F.sum("degree")).collect()[0][0]
    deg = g.out_degrees().withColumnRenamed("out_degree", "deg")
    base_v = deg.withColumn("dangling", F.col("deg") == 0).repartition(
        n_part, "id"
    ).persist()
    n = base_v.count()

    alpha = 0.85
    state = base_v.select("id", F.lit(1.0 / n).alias("rank")).persist()
    prev_backing = state
    state.count()
    dangling_sum = 0.0
    secs = []
    for _ in range(args.rounds):
        t0 = time.time()
        base = (1.0 - alpha) / n + dangling_sum / n
        contribs = (
            adj.join(state.withColumnRenamed("id", "src"), "src")
            .select(
                F.explode("dst_list").alias("id"),
                (F.col("rank") / F.col("degree")).alias("c"),
            )
            .repartition(n_part, "id")
            .groupBy("id")
            .agg(F.sum("c").alias("msum"))
        )
        new_state = (
            base_v.join(contribs, "id", "left")
            .select(
                "id",
                (alpha * F.coalesce("msum", F.lit(0.0))
                 + F.lit(base)).alias("rank"),
                "dangling",
            )
            .persist()
        )
        row = new_state.agg(
            F.sum(F.when(F.col("dangling"), F.col("rank"))
                  .otherwise(0.0)).alias("d")
        ).collect()[0]
        dangling_sum = (row["d"] or 0.0) * alpha
        # unpersist the BACKING frame — `state` is a projection after
        # round 0 and its unpersist was a no-op (every round leaked a
        # persisted |V|-row table, distorting the probe's numbers)
        prev_backing.unpersist()
        state = new_state.select("id", "rank")
        prev_backing = new_state
        secs.append(time.time() - t0)

    warm = sorted(secs[1:] or secs)
    median = warm[len(warm) // 2]
    print(json.dumps({
        "job": "capacity",
        "edges": int(n_edges),
        "vertices": n,
        "rounds": args.rounds,
        "superstep_secs": [round(s, 3) for s in secs],
        "median_superstep_s": round(median, 3),
        "edges_per_sec_per_superstep": round(n_edges / median),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
