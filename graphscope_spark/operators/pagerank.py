"""PageRank — NetworkX-faithful semantics of the reference's
``pagerank_nx`` app (``analytical_engine/apps/pagerank/
pagerank_networkx.h``, 167 LoC; declared as GAE's PageRank definition
in ``docs/analytical_engine/builtin_algorithms.md:257-271``):

- init ``r(v) = 1/N``; per-vertex out-degree cached (ref ``:62-74``);
- ``dangling_sum = α·Σ_{outdeg=0} r(v)`` (ref ``:76-87, 137-161``);
- each round: ``base = (1-α)/N + dangling_sum/N``;
  ``r'(v) = α·Σ_{u→v} r(u)/outdeg(u) + base`` — pull from in-neighbors
  on digraphs, neighbors on undirected (ref ``:108-133``);
- stop when ``Σ_v |r'(v) − r(v)| < tol·N`` or round > max_iter
  (ref ``:135-149``); defaults ``alpha=0.85, max_iter=100, tol=1e-6``
  (``python/graphscope/analytical/app/pagerank.py:91-121``).

Spark shape per superstep (SURVEY.md §4.3): one co-partitioned join of
the cached CSR adjacency with the rank state, one shuffle aggregation
of exploded contributions by ``dst`` (map-side partial sum = GAE's
message combining), and ONE driver action that computes the L1 delta
and the next dangling sum together — three logical steps, a single
Spark job per superstep.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from graphscope_spark.graph import Graph
from graphscope_spark.plans.checkpoint import CheckpointManager, maybe_truncate_lineage


def pagerank(
    graph: Graph,
    alpha: float = 0.85,
    max_iter: int = 100,
    tol: float = 1e-06,
    checkpoint: CheckpointManager | None = None,
    lineage_truncate_every: int = 5,
    message_combine: str = "map",
    adaptive: bool = False,
    stats: dict | None = None,
    init_ranks: DataFrame | None = None,
) -> DataFrame:
    """Returns ``(id long, rank double)``.

    ``init_ranks`` warm-starts the iteration from a previous result
    ``(id, rank)`` — vertices missing from it start at ``1/N`` and the
    whole vector is renormalised to sum 1, so a slightly-changed graph
    (streaming micro-batch, incremental update) converges in a few
    rounds instead of from scratch.

    ``adaptive=False`` pins AQE off for the superstep loop (restored
    after): the per-round plan is fixed-shape, skew is handled by
    map-side combine + salting, and adaptive re-planning measured
    ~35% overhead per loop at sf0.1 (see ``plans.adaptive``).

    ``tol <= 0`` gives the fixed-round LDBC/Graphalytics variant
    (``grape::PageRankOpt`` with ``delta=0.85, max_round=10`` pinned in
    ``test/run_app.h:342-358``) — exactly ``max_iter`` rounds.

    ``message_combine`` picks the message-reduction strategy:

    - ``"map"`` (default): plain ``groupBy`` — Spark's map-side
      partial sum combines messages before the shuffle.  Wins when the
      per-task dedup factor is high (power-law hubs combine millions
      of messages into one entry).
    - ``"shuffle"``: explicit ``repartition(dst)`` before the
      aggregation, so combining happens only after the shuffle in
      small per-partition tables.  Wins when E/V is small: the partial
      agg's per-task hash table spans ~all vertices, blowing the cache
      for a <2x message reduction (measured 1.3-1.6x faster and
      better core-scaling on the 60M-edge synthetic graph).
    """
    from graphscope_spark.plans.adaptive import superstep_conf

    with superstep_conf(graph.vertices.sparkSession, adaptive):
        return _pagerank_loop(
            graph, alpha, max_iter, tol, checkpoint,
            lineage_truncate_every, message_combine, stats, init_ranks,
        )


def personalized_pagerank(
    graph: Graph,
    source: int,
    alpha: float = 0.85,
    max_iter: int = 100,
    tol: float = 1e-06,
) -> DataFrame:
    """Personalized PageRank from a single source (reference
    ``apps/flash/ranking/ppr.h``; NetworkX ``pagerank(personalization=
    {s: 1})`` semantics): teleport and dangling mass both return to the
    SOURCE instead of spreading uniformly::

        r'(v) = α·Σ_{u→v} r(u)/outdeg(u)
                + [v = s]·((1-α) + α·dangling_sum)

    Same superstep shape as global PageRank (cached adjacency join +
    one combined message shuffle); AQE pinned off for the loop."""
    from graphscope_spark.plans.adaptive import superstep_conf

    spark = graph.vertices.sparkSession
    with superstep_conf(spark, False):
        adj = graph.adjacency("out" if graph.directed else "both", cache=True)
        if graph.directed:
            deg = graph.out_degrees().withColumnRenamed("out_degree", "deg")
        else:
            deg = graph.degrees().withColumnRenamed("degree", "deg")
        base_v = deg.withColumn("dangling", F.col("deg") == 0)
        base_v = base_v.persist(StorageLevel.MEMORY_AND_DISK)
        n = base_v.count()
        if n == 0:
            return base_v.select("id", F.lit(0.0).alias("rank"))
        state = base_v.select(
            "id",
            F.when(F.col("id") == int(source), 1.0).otherwise(0.0).alias("rank"),
        ).persist(StorageLevel.MEMORY_AND_DISK)
        dangling_sum = (
            state.join(base_v.where("dangling").select("id"), "id",
                       "left_semi")
            .agg(F.sum("rank")).collect()[0][0] or 0.0
        ) * alpha
        for step in range(max_iter):
            contribs = (
                adj.join(state.withColumnRenamed("id", "src"), "src")
                .select(
                    F.explode("dst_list").alias("id"),
                    (F.col("rank") / F.col("degree")).alias("c"),
                )
                .groupBy("id")
                .agg(F.sum("c").alias("msum"))
            )
            src_mass = (1.0 - alpha) + dangling_sum
            new_state = (
                base_v.join(contribs, "id", "left")
                .select(
                    "id",
                    (alpha * F.coalesce("msum", F.lit(0.0))
                     + F.when(F.col("id") == int(source),
                              F.lit(src_mass)).otherwise(0.0)).alias("rank"),
                    "dangling",
                )
            )
            new_state = maybe_truncate_lineage(
                new_state.persist(StorageLevel.MEMORY_AND_DISK), step, 5
            )
            if tol > 0:
                row = (
                    new_state.withColumnRenamed("rank", "new_rank")
                    .join(state.withColumnRenamed("rank", "old_rank"), "id")
                    .agg(
                        F.sum(F.abs(F.col("new_rank") - F.col("old_rank"))
                              ).alias("l1"),
                        F.sum(F.when(F.col("dangling"), F.col("new_rank"))
                              .otherwise(0.0)).alias("dsum"),
                    ).collect()[0]
                )
                l1 = row["l1"] or 0.0
            else:
                row = new_state.agg(
                    F.sum(F.when(F.col("dangling"), F.col("rank"))
                          .otherwise(0.0)).alias("dsum")
                ).collect()[0]
                l1 = 0.0
            dangling_sum = (row["dsum"] or 0.0) * alpha
            state.unpersist()
            state = new_state.select("id", "rank")
            if tol > 0 and l1 < tol * n:
                break
        return state.select("id", "rank")


def articlerank(
    graph: Graph, damping: float = 0.85, max_iter: int = 10
) -> DataFrame:
    """ArticleRank (reference ``apps/flash/ranking/articlerank.h``):
    like PageRank but contributions divide by ``outdeg(u) + ⟨outdeg⟩``
    so low-degree citers are dampened.  Reference protocol exactly:
    init 0, fixed rounds of ``r'(v) = (1-d) + d·Σ_{u→v} r(u)/(deg(u)+avg)``
    (no dangling redistribution, no normalization).  Same cached
    adjacency + one message shuffle superstep; AQE pinned off."""
    from graphscope_spark.plans.adaptive import superstep_conf

    spark = graph.vertices.sparkSession
    with superstep_conf(spark, False):
        adj = graph.adjacency("out" if graph.directed else "both",
                              cache=True)
        if graph.directed:
            deg = graph.out_degrees().withColumnRenamed("out_degree", "deg")
        else:
            deg = graph.degrees().withColumnRenamed("degree", "deg")
        deg = deg.persist(StorageLevel.MEMORY_AND_DISK)
        row = deg.agg(F.sum("deg").alias("t"),
                      F.count(F.lit(1)).alias("n")).collect()[0]
        avg = (row["t"] or 0) / row["n"] if row["n"] else 1.0
        state = deg.select("id", F.lit(0.0).alias("rank"))
        state = state.persist(StorageLevel.MEMORY_AND_DISK)
        for step in range(max_iter):
            contribs = (
                adj.join(state.withColumnRenamed("id", "src"), "src")
                .select(
                    F.explode("dst_list").alias("id"),
                    (F.col("rank") / (F.col("degree") + F.lit(avg))).alias("c"),
                )
                .groupBy("id")
                .agg(F.sum("c").alias("msum"))
            )
            new_state = (
                deg.select("id")
                .join(contribs, "id", "left")
                .select(
                    "id",
                    (damping * F.coalesce("msum", F.lit(0.0))
                     + (1.0 - damping)).alias("rank"),
                )
            )
            new_state = maybe_truncate_lineage(
                new_state.persist(StorageLevel.MEMORY_AND_DISK), step, 5
            )
            new_state.count()
            state.unpersist()
            state = new_state
        return state.select("id", "rank")


def _pagerank_loop(
    graph: Graph,
    alpha: float,
    max_iter: int,
    tol: float,
    checkpoint: CheckpointManager | None,
    lineage_truncate_every: int,
    message_combine: str,
    stats: dict | None = None,
    init_ranks: DataFrame | None = None,
) -> DataFrame:
    direction = "in" if graph.directed else "both"
    # messages flow src→dst along this adjacency: for the pull-from-
    # in-neighbors digraph semantics we keep edges as-is and aggregate
    # on dst; degree divisor is the *out*-degree (or undirected degree).
    adj = graph.adjacency("out" if graph.directed else "both", cache=True)

    # static per-vertex base table: (id, out_degree, dangling)
    if graph.directed:
        deg = graph.out_degrees().withColumnRenamed("out_degree", "deg")
    else:
        deg = graph.degrees().withColumnRenamed("degree", "deg")
    base_v = deg.withColumn("dangling", F.col("deg") == 0)
    if graph.num_partitions:
        base_v = base_v.repartition(graph.num_partitions, "id")
    base_v = base_v.persist(StorageLevel.MEMORY_AND_DISK)
    n = base_v.count()
    if n == 0:
        return base_v.select("id", F.lit(0.0).alias("rank"))

    # ---- init / resume -------------------------------------------------
    start_step = 0
    if checkpoint is not None and (latest := checkpoint.latest_superstep()) is not None:
        state = checkpoint.load_state(graph.vertices.sparkSession, latest)
        state = state.persist(StorageLevel.MEMORY_AND_DISK)
        start_step = latest + 1
    elif init_ranks is not None:
        # warm start: carry over prior ranks, default new vertices to
        # 1/N, renormalize so the mass invariant (Σ rank = 1) holds
        seeded = base_v.select("id").join(
            init_ranks.select("id", F.col("rank").alias("r0")), "id", "left"
        ).select("id", F.coalesce("r0", F.lit(1.0 / n)).alias("rank"))
        total = seeded.agg(F.sum("rank")).first()[0] or 1.0
        state = seeded.select(
            "id", (F.col("rank") / F.lit(float(total))).alias("rank")
        )
        state = state.persist(StorageLevel.MEMORY_AND_DISK)
    else:
        state = base_v.select("id", F.lit(1.0 / n).alias("rank"))
        state = state.persist(StorageLevel.MEMORY_AND_DISK)

    # dangling_sum = α·Σ_{dangling} r(v) over the current state
    dangling_sum = (
        state.join(base_v.where("dangling").select("id"), "id", "left_semi")
        .agg(F.sum("rank"))
        .collect()[0][0]
        or 0.0
    ) * alpha

    for step in range(start_step, max_iter):
        t0 = time.time()
        per_vertex_base = (1.0 - alpha) / n + dangling_sum / n
        msgs = (
            adj.join(state.withColumnRenamed("id", "src"), "src")
            .select(
                F.explode("dst_list").alias("id"),
                (F.col("rank") / F.col("degree")).alias("c"),
            )
        )
        if message_combine == "shuffle":
            n_part = int(
                graph.vertices.sparkSession.conf.get(
                    "spark.sql.shuffle.partitions"
                )
            )
            msgs = msgs.repartition(n_part, "id")
        contribs = msgs.groupBy("id").agg(F.sum("c").alias("msum"))
        new_state = (
            base_v.join(contribs, "id", "left")
            .select(
                "id",
                (alpha * F.coalesce("msum", F.lit(0.0)) + F.lit(per_vertex_base)).alias(
                    "rank"
                ),
                "dangling",
            )
        )
        new_state = maybe_truncate_lineage(
            new_state.persist(StorageLevel.MEMORY_AND_DISK), step, lineage_truncate_every
        )
        if tol > 0:
            # single action: L1 delta + next dangling sum together
            row = (
                new_state.withColumnRenamed("rank", "new_rank")
                .join(state.withColumnRenamed("rank", "old_rank"), "id")
                .agg(
                    F.sum(F.abs(F.col("new_rank") - F.col("old_rank"))).alias("l1"),
                    F.sum(
                        F.when(F.col("dangling"), F.col("new_rank")).otherwise(0.0)
                    ).alias("dsum"),
                )
                .collect()[0]
            )
            l1, dangling_sum = row["l1"] or 0.0, (row["dsum"] or 0.0) * alpha
        else:
            # fixed-round mode never reads the L1 delta — the dangling
            # sum comes from new_state alone, skipping the |V|⋈|V| join
            row = new_state.agg(
                F.sum(
                    F.when(F.col("dangling"), F.col("rank")).otherwise(0.0)
                ).alias("dsum")
            ).collect()[0]
            l1, dangling_sum = 0.0, (row["dsum"] or 0.0) * alpha
        state.unpersist()
        state = new_state.select("id", "rank")
        if checkpoint is not None:
            checkpoint.save(
                step,
                state,
                {
                    "l1_delta": float(l1),
                    "dangling_sum": float(dangling_sum),
                    "wall_ms": (time.time() - t0) * 1000.0,
                },
            )
        if stats is not None:
            stats["rounds"] = step + 1
            stats["final_l1"] = float(l1)
        if tol > 0 and l1 < tol * n:
            break

    return state.select("id", "rank")
