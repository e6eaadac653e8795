"""Deterministic synchronous Louvain, phase 1 (community moves).

Re-expresses the move phase of the reference's distributed Louvain
(``apps/pregel/louvain/louvain.h:31-53`` — the Sotera synchronized
vertex-move formulation: each vertex sees its neighbors' communities
and the community totals, then moves to the neighbor community with
the best modularity gain).  The reference runs asynchronously with
randomized tie handling, which is why earlier rounds skipped it; this
variant pins every source of nondeterminism instead:

- **fixed synchronous rounds** (the reference's own test only checks
  the app runs; community quality is comparable),
- **min-community-id tie-break** on equal gain,
- **the reference's own anti-cycle rule** (``louvain.h:261-265``):
  a move to a HIGHER community id is only applied on even rounds, a
  move to a LOWER id only on odd rounds — so two adjacent vertices
  can never swap communities in the same round and symmetric
  oscillation dies,

which makes the result a pure function of the graph and exactly
SQL-oracle-able (unrolled rounds, identical float expressions).

Modularity gain of moving ``v`` to community ``c``, unweighted:
``e_vc - k_v * sigma_tot\\v(c) / 2m`` where ``e_vc`` = edges from
``v`` into ``c``, ``sigma_tot\\v`` excludes ``v``'s own degree, the
shared ``1/2m`` scale dropped.  Each round is three shuffles —
community degree totals, neighbor-community counts, per-vertex
argmax — all map-side combined; phase-2 graph compression would
reuse ``Graph.from_edges`` on the contracted community edges.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from ..graph import Graph
from ..plans.adaptive import superstep_conf


def louvain_one_level(graph: Graph, rounds: int = 4) -> DataFrame:
    """``(id, community)`` after ``rounds`` deterministic synchronous
    modularity-gain move rounds (phase 1 of Louvain)."""
    sym = (
        graph.symmetrized_edges()
        .select("src", "dst")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    two_m = sym.count()
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("k")
    )
    state = (
        graph.vertices.select("id", F.col("id").alias("comm"))
        .join(deg, "id", "left")
        .withColumn("k", F.coalesce("k", F.lit(0)).cast("long"))
        .localCheckpoint(eager=True)
    )
    spark = graph.vertices.sparkSession
    with superstep_conf(spark, False):
        for r in range(rounds):
            sig = state.groupBy("comm").agg(F.sum("k").alias("sig"))
            nbr_comm = state.select(
                F.col("id").alias("dst"), F.col("comm").alias("c")
            )
            cand = (
                sym.join(nbr_comm, "dst")
                .groupBy(F.col("src").alias("id"), "c")
                .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
            )
            # staying put is always a candidate, even when no neighbor
            # shares v's community (its e_vc is then 0)
            stay = state.select(
                "id", F.col("comm").alias("c"),
                F.lit(0).cast("long").alias("cnt"),
            )
            cand = (
                cand.unionByName(stay)
                .groupBy("id", "c")
                .agg(F.sum("cnt").alias("cnt"))
            )
            sc = (
                cand.join(sig.withColumnRenamed("comm", "c"), "c")
                .join(
                    state.select(
                        "id", F.col("comm").alias("cur"), "k"
                    ),
                    "id",
                )
                .withColumn(
                    "sig_ex",
                    F.col("sig")
                    - F.when(
                        F.col("c") == F.col("cur"), F.col("k")
                    ).otherwise(F.lit(0)),
                )
                .withColumn(
                    "score",
                    F.col("cnt")
                    - (F.col("k") * F.col("sig_ex"))
                    / F.lit(float(two_m)),
                )
            )
            best = sc.groupBy("id").agg(
                F.max(
                    F.struct(
                        F.col("score").alias("s"),
                        (-F.col("c")).alias("nc"),
                    )
                ).alias("m")
            )
            pick = best.select("id", (-F.col("m.nc")).alias("new_c"))
            # reference louvain.h:261-265: up-moves on even rounds,
            # down-moves on odd rounds
            if r % 2 == 0:
                allowed = F.col("new_c") > F.col("comm")
            else:
                allowed = F.col("new_c") < F.col("comm")
            state = (
                state.join(pick, "id")
                .select(
                    "id",
                    F.when(allowed, F.col("new_c"))
                    .otherwise(F.col("comm"))
                    .alias("comm"),
                    "k",
                )
                .localCheckpoint(eager=True)
            )
    sym.unpersist()
    return state.select("id", F.col("comm").alias("community"))
