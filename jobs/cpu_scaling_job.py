"""CPU-bound scaling control: the miner's hash/extract kernel.

The PageRank superstep is shuffle/memory-bandwidth heavy — on a
single box all local[N] threads share one DRAM bus, so throughput
saturates near the bandwidth ceiling regardless of N (a real cluster
adds a node's worth of bandwidth with every executor).  To show the
ENGINE has no serial bottleneck, this job measures a compute-bound
kernel — sha256 + regex extraction over generated text, the miner's
hot path, pure whole-stage codegen — which should scale ~linearly in
cores until the physical core count.

Output: one JSON line {cores, rows, secs, rows_per_sec}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from graphscope_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=6_000_000)
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    spark = get_spark("cpu-scaling")
    spark.sparkContext.setLogLevel("ERROR")
    cores = args.cores or spark.sparkContext.defaultParallelism

    df = spark.range(args.rows).select(
        F.concat(
            F.lit("import mod_"), F.col("id") % 997,
            F.lit("\nimport mod_"), F.col("id") % 991,
            F.lit("\ndef f(): return "), F.col("id"),
        ).alias("content")
    ).repartition(4 * cores).persist()
    df.count()

    # miner kernel: 8x chained sha256 + regex extraction, all codegen
    expr = F.col("content")
    for _ in range(32):
        expr = F.sha2(expr, 256)
    kernel = df.select(
        expr.alias("h"),
        F.regexp_extract_all(
            "content", F.lit(r"import (\w+)"), 1
        ).alias("deps"),
    ).select(
        F.substring("h", 1, 4).alias("hp"), F.explode("deps").alias("d")
    ).groupBy("hp").agg(F.count(F.lit(1)).alias("c"))

    secs = []
    for _ in range(args.reps):
        t0 = time.time()
        kernel.agg(F.sum("c")).collect()
        secs.append(time.time() - t0)
    best = min(secs)
    print(json.dumps({
        "job": "cpu-kernel",
        "cores": cores,
        "rows": args.rows,
        "secs": [round(s, 2) for s in secs],
        "best_s": round(best, 3),
        "rows_per_sec": round(args.rows / best),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
