"""spark-submit hub-skew A/B job: measure the message-reduction
superstep (the PageRank ``groupBy(dst).sum`` shuffle) on a HIGH-ZIPF
synthetic graph with and without the explicit two-phase salted
aggregation (``plans/skew.salted_sum``).

Why this leg exists: the normal scaling bench (``run_scaling.py``)
uses a mildly skewed graph where Spark's hash aggregation alone is
fine; a web link graph has hubs taking 10-30%+ of all in-edges, and
there ONE reducer task owns the hot key after the shuffle — the
superstep's wall time becomes that straggler.  Salting splits the hot
key across ``buckets`` reducers and recombines ``buckets`` partial
rows per key.

Graph: ``dst = floor(n · u^k)`` with u uniform from a hash — k
controls skew.  k=8 puts ~(1/n)^(1/8) of ALL edges on vertex 0
(~15% at n=3M): a genuine hot key, deterministic, generated
distributed (no driver loops).

The unsalted path deliberately mirrors the shipped pagerank job's
repartition-then-combine reduction (``jobs/pagerank_job.py``): raw
messages shuffle on the key, combination happens post-shuffle — the
shape that wins on low-dedup uniform graphs but is maximally exposed
to key skew.

Output: ONE JSON line {edges, hot_share, unsalted_s, salted_s,
speedup, results_equal}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from graphscope_spark.plans.skew import salted_sum  # noqa: E402
from graphscope_spark.session import get_spark  # noqa: E402


def zipf_edges(spark, m: int, n: int, k: float, seed: int = 42):
    return spark.range(m).select(
        F.pmod(F.xxhash64(F.col("id") + seed), n).alias("src"),
        F.floor(
            n
            * F.pow(
                F.pmod(F.xxhash64(F.col("id") + seed + 1), 1 << 20)
                / float(1 << 20),
                k,
            )
        ).cast("long").alias("dst"),
    ).where(F.col("src") != F.col("dst"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=30_000_000)
    ap.add_argument("--verts", type=int, default=3_000_000)
    ap.add_argument("--zipf-k", type=float, default=8.0)
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()

    spark = get_spark("skew-job", shuffle_partitions=args.shuffle_partitions)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))

    # materialize the message stream once (rank/deg contribution per
    # edge) so both variants reduce the IDENTICAL cached input
    msgs = (
        zipf_edges(spark, args.edges, args.verts, args.zipf_k)
        .select(F.col("dst").alias("id"),
                (1.0 / (F.pmod(F.col("src"), 100) + 1)).alias("c"))
        .persist()
    )
    m = msgs.count()
    hot = (
        msgs.groupBy("id").agg(F.count(F.lit(1)).alias("d"))
        .orderBy(F.desc("d")).limit(1).collect()[0]
    )
    hot_share = hot["d"] / m

    def unsalted():
        # pagerank_job's reduction shape: raw-message shuffle on the
        # key, post-shuffle combine — one reducer owns the hot key
        return (
            msgs.repartition(n_part, "id")
            .groupBy("id").agg(F.sum("c").alias("msum"))
        )

    def salted():
        return salted_sum(msgs, "id", "c", buckets=args.buckets,
                          out="msum")

    def best(fn):
        times = []
        for _ in range(args.repeats):
            t0 = time.time()
            fn().agg(F.sum("msum"), F.count(F.lit(1))).collect()
            times.append(time.time() - t0)
        return min(times), times

    # interleave a warmup of each, then timed repeats
    unsalted().limit(1).collect()
    salted().limit(1).collect()
    u_best, u_all = best(unsalted)
    s_best, s_all = best(salted)

    ru = unsalted().agg(F.round(F.sum("msum"), 6)).collect()[0][0]
    rs = salted().agg(F.round(F.sum("msum"), 6)).collect()[0][0]

    print(json.dumps({
        "job": "skew-ab",
        "edges": int(m),
        "vertices": args.verts,
        "zipf_k": args.zipf_k,
        "hot_vertex_share": round(hot_share, 4),
        "shuffle_partitions": n_part,
        "buckets": args.buckets,
        "unsalted_s": round(u_best, 3),
        "unsalted_runs": [round(t, 3) for t in u_all],
        "salted_s": round(s_best, 3),
        "salted_runs": [round(t, 3) for t in s_all],
        "speedup": round(u_best / s_best, 3),
        "results_equal": bool(abs(ru - rs) < 1e-6),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
