"""spark-submit hub-skew A/B job: measure the IN-ADJACENCY build
(``groupBy(dst).collect_list`` — the non-algebraic aggregation where
hub skew actually bites) on a HIGH-ZIPF synthetic graph with and
without the two-phase salted aggregation
(``plans/skew.salted_collect_list``), plus the algebraic-sum message
reduction for contrast.

Why collect_list is the skew victim (``plans/skew.py`` rationale):
algebraic aggs (sum/min/count) map-side combine, so a hub key arrives
at its reducer already reduced to one row per map task and the
straggler effect is small — measured ≈1.0x here, reported honestly.
``collect_list`` has NO map-side combine: every one of a hub's edges
flows to ONE reducer task, which builds the full multi-million-element
list alone while its peers idle.  Salting bounds any reducer's fan-in
to ~1/buckets of the hot key.

Graph: ``dst = floor(n · u^k)``, u uniform from a hash — k controls
skew; k=12 puts ~(1/n)^(1/12) ≈ 29% of ALL edges on vertex 0 at
n=3M (a crawl-graph super-hub).  Deterministic, generated distributed.

Output: ONE JSON line with best-of-N times for each variant and
equality of the aggregated results.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from graphscope_spark.plans.skew import (  # noqa: E402
    salted_collect_list,
    salted_sum,
)
from graphscope_spark.session import get_spark  # noqa: E402
from graphscope_spark.sources.synthetic import (  # noqa: E402
    gen_powerlaw_edges_df,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=30_000_000)
    ap.add_argument("--verts", type=int, default=3_000_000)
    ap.add_argument("--zipf-k", type=float, default=12.0)
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()

    spark = get_spark("skew-job", shuffle_partitions=args.shuffle_partitions)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))

    edges = gen_powerlaw_edges_df(
        spark, args.edges, args.verts, k=args.zipf_k
    ).persist()
    m = edges.count()
    hot = (
        edges.groupBy("dst").agg(F.count(F.lit(1)).alias("d"))
        .orderBy(F.desc("d")).limit(1).collect()[0]
    )
    hot_share = hot["d"] / m

    # ---- collect_list (the adjacency build): skew victim -----------
    def adj_unsalted():
        return edges.groupBy(F.col("dst").alias("id")).agg(
            F.collect_list("src").alias("nbrs")
        )

    def adj_salted():
        return salted_collect_list(
            edges.select(F.col("dst").alias("id"), "src"),
            "id", "src", buckets=args.buckets, out="nbrs",
        )

    # ---- algebraic sum (message reduction): contrast ----------------
    msgs = edges.select(
        F.col("dst").alias("id"),
        (1.0 / (F.pmod(F.col("src"), 100) + 1)).alias("c"),
    )

    def sum_unsalted():
        # pagerank_job's repartition-first shape: raw messages shuffle,
        # combine post-shuffle — fastest on low-dedup uniform graphs,
        # maximally exposed to key skew (hot reducer owns the hub)
        return (
            msgs.repartition(n_part, "id")
            .groupBy("id").agg(F.sum("c").alias("msum"))
        )

    def sum_combine():
        # plain groupBy: Spark's map-side partial agg — each map task
        # pre-reduces the hub to ONE row, so the hot reducer sees
        # ≤n_map_tasks rows.  The third arm isolating how much of the
        # salted win is combine vs salt.
        return msgs.groupBy("id").agg(F.sum("c").alias("msum"))

    def sum_salted():
        return salted_sum(msgs, "id", "c", buckets=args.buckets,
                          out="msum")

    def fingerprint_adj(df):
        return df.agg(
            F.sum(F.size("nbrs")).alias("tot"),
            F.count(F.lit(1)).alias("keys"),
        ).collect()[0]

    def best(fn, action):
        times = []
        for _ in range(args.repeats):
            t0 = time.time()
            action(fn())
            times.append(time.time() - t0)
        return min(times), [round(t, 3) for t in times]

    adj_action = lambda df: df.agg(  # noqa: E731
        F.sum(F.size("nbrs")), F.count(F.lit(1))
    ).collect()
    sum_action = lambda df: df.agg(  # noqa: E731
        F.sum("msum"), F.count(F.lit(1))
    ).collect()

    # warm both paths once (codegen/broadcast warmup), then timed runs
    adj_action(adj_unsalted())
    adj_action(adj_salted())
    au_best, au_all = best(adj_unsalted, adj_action)
    as_best, as_all = best(adj_salted, adj_action)
    su_best, su_all = best(sum_unsalted, sum_action)
    sc_best, sc_all = best(sum_combine, sum_action)
    ss_best, ss_all = best(sum_salted, sum_action)

    fu, fs = fingerprint_adj(adj_unsalted()), fingerprint_adj(adj_salted())
    ru = sum_unsalted().agg(F.sum("msum")).collect()[0][0]
    rs = sum_salted().agg(F.sum("msum")).collect()[0][0]

    print(json.dumps({
        "job": "skew-ab",
        "edges": int(m),
        "vertices": args.verts,
        "zipf_k": args.zipf_k,
        "hot_vertex_share": round(hot_share, 4),
        "shuffle_partitions": n_part,
        "buckets": args.buckets,
        "collect_list": {
            "unsalted_s": round(au_best, 3), "unsalted_runs": au_all,
            "salted_s": round(as_best, 3), "salted_runs": as_all,
            "speedup": round(au_best / as_best, 3),
            "results_equal": bool(
                fu["tot"] == fs["tot"] and fu["keys"] == fs["keys"]
            ),
        },
        "algebraic_sum": {
            "unsalted_s": round(su_best, 3), "unsalted_runs": su_all,
            "map_combine_s": round(sc_best, 3), "map_combine_runs": sc_all,
            "salted_s": round(ss_best, 3), "salted_runs": ss_all,
            "speedup": round(su_best / ss_best, 3),
            "speedup_vs_combine": round(sc_best / ss_best, 3),
            # float sum order differs between the one- and two-phase
            # plans; equality is up to accumulation rounding
            "results_equal": bool(abs(ru - rs) <= 1e-6 * max(1.0, abs(ru))),
        },
    }))
    spark.stop()


if __name__ == "__main__":
    main()
