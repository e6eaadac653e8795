"""Resume-equivalence at the 12M-edge leg (VERDICT r4 item 6): the
checkpoint/resume protocol is pytest-proven at toy scale
(``tests/test_checkpoint.py``); this tool proves the ``_SUCCESS``-gated
protocol holds when superstep state is millions of rows across many
partitions — a REAL ``kill -9`` mid-run, then a fresh process resumes
from the latest committed superstep and must match the uninterrupted
run's ranks exactly.

Three phases, each its own driver process (orchestrated by
``tools/run_resume_bench.sh``)::

    python tools/resume_bench.py baseline <workdir>  # uninterrupted 10
    python tools/resume_bench.py crashme  <workdir>  # checkpointed; kill -9'd
    python tools/resume_bench.py resume   <workdir>  # resume + compare

The 12M-edge power-law graph is rebuilt identically in every process
(seeded generator).  Comparison is a distributed join: max |Δrank|
must be < 1e-12 and the row sets identical — no rounding-boundary
hash tricks on 1.2M floats.
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from graphscope_spark.graph import Graph  # noqa: E402
from graphscope_spark.operators.pagerank import pagerank  # noqa: E402
from graphscope_spark.plans.checkpoint import CheckpointManager  # noqa: E402
from graphscope_spark.session import get_spark  # noqa: E402
from graphscope_spark.sources.synthetic import gen_powerlaw_edges_df  # noqa: E402

M_EDGES, N_VERTS, ROUNDS = 12_000_000, 1_200_000, 10


def build(spark) -> Graph:
    g = Graph.from_edges(
        gen_powerlaw_edges_df(spark, M_EDGES, N_VERTS), directed=True
    )
    g.edges = g.edges.persist()
    g.edges.count()
    return g


def main():
    mode, workdir = sys.argv[1], sys.argv[2]
    spark = get_spark(f"resume-bench-{mode}")
    spark.sparkContext.setLogLevel("ERROR")
    g = build(spark)
    if mode == "baseline":
        t0 = time.time()
        pr = pagerank(g, alpha=0.85, max_iter=ROUNDS, tol=0.0)
        pr.write.mode("overwrite").parquet(f"{workdir}/baseline_ranks")
        print(json.dumps({"phase": "baseline",
                          "wall_sec": round(time.time() - t0, 2)}))
    elif mode == "crashme":
        ck = CheckpointManager(f"{workdir}/ck", "pr12m")
        # expected to be kill -9'd by the orchestrator mid-run; if it
        # survives to the end the experiment is void (say so)
        pagerank(g, alpha=0.85, max_iter=ROUNDS, tol=0.0,
                 checkpoint=ck).limit(1).collect()
        print(json.dumps({"phase": "crashme",
                          "warning": "ran to completion — not killed"}))
    elif mode == "resume":
        ck = CheckpointManager(f"{workdir}/ck", "pr12m")
        resumed_from = ck.latest_superstep()
        t0 = time.time()
        pr = pagerank(g, alpha=0.85, max_iter=ROUNDS, tol=0.0,
                      checkpoint=ck).persist()
        n = pr.count()
        wall = time.time() - t0
        base = spark.read.parquet(f"{workdir}/baseline_ranks")
        joined = base.select(
            "id", F.col("rank").alias("want")
        ).join(pr, "id", "full_outer")
        row = joined.agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum(F.when(F.col("rank").isNull()
                         | F.col("want").isNull(), 1)
                  .otherwise(0)).alias("missing"),
            F.max(F.abs(F.col("rank") - F.col("want"))).alias("max_diff"),
        ).collect()[0]
        ok = (row["missing"] == 0 and row["rows"] == n
              and row["max_diff"] < 1e-12)
        print(json.dumps({
            "phase": "resume",
            "resumed_from_superstep": resumed_from,
            "rows": row["rows"], "missing_rows": int(row["missing"]),
            "max_abs_rank_diff": float(row["max_diff"]),
            "wall_sec": round(wall, 2),
            "equivalent": bool(ok),
        }))
        if not ok:
            sys.exit(1)
    else:
        raise SystemExit(f"unknown mode {mode!r}")
    spark.stop()


if __name__ == "__main__":
    main()
