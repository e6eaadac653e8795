"""Weakly-connected components — min-label propagation to fixpoint.

Reference semantics: ``apps/projected/wcc_projected.h`` (186 LoC):
init ``comp(v) = id(v)`` (ref ``:76-81``); propagate **min** component
id over out- AND in-edges until fixpoint, frontier-driven (ref
``:83-120, 140-181``); message combine is ``min``
(``SyncStateOnOuterVertex``, ref ``:107-113``).  Component-id
convention: the minimum vertex id in the component (ref python
``tests/unittest/test_app.py:195-200``) — partitioning-invariant.

Spark shape: the frontier-sparse iteration the reference gets from
``DenseVertexSet`` is an explicit ``frontier`` DataFrame — only
vertices whose component changed last round send messages
(SURVEY.md §4.1 "frontier-driven sparse iteration").  On top of plain
propagation (O(diameter) rounds) an optional pointer-jumping step
(``comp ← comp[comp]``, one extra |V|-sized self-join per round)
shortcuts long chains to O(log d) rounds — the standard trick from the
Hash-to-Min / two-phase CC literature, essential at 100 TB where the
giant component's diameter is what you pay per round.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from graphscope_spark.graph import Graph
from graphscope_spark.plans.checkpoint import CheckpointManager, maybe_truncate_lineage


def wcc(
    graph: Graph,
    max_iter: int = 200,
    pointer_jumping: bool = True,
    checkpoint: CheckpointManager | None = None,
    lineage_truncate_every: int = 5,
    adaptive: bool = False,
    init_labels: DataFrame | None = None,
) -> DataFrame:
    """Returns ``(id long, comp long)`` with ``comp`` = min vertex id
    in the weakly-connected component.

    ``init_labels`` warm-starts from a previous result ``(id, comp)``
    (incremental/streaming growth): every label is a vertex id inside
    the same component, so min-label propagation from old labels
    converges to the true new minimum — unchanged regions settle in
    one round.

    **Insert-only contract**: the warm start is correct only for
    grow-only graphs (edges/vertices added, never removed) — min
    propagation can lower a label but never raise one, so after a
    deletion a stale too-small label would persist forever.  Labels
    pointing at vertices absent from the current graph are dropped
    here (those vertices fall back to cold-start ``comp = id``); a
    deletion that leaves the labeled vertex present cannot be detected
    cheaply, so the caller must not feed compacted/delete-containing
    edge logs (see ``streaming.edge_stream.incremental_wcc``).

    ``adaptive=False`` pins AQE off for the loop (restored after): the
    superstep plan is fixed-shape and already min-combined map-side,
    and per-round adaptive re-planning measured ~3x slower at sf0.1
    (see ``plans.adaptive``)."""
    from graphscope_spark.plans.adaptive import superstep_conf

    with superstep_conf(graph.vertices.sparkSession, adaptive):
        return _wcc_loop(graph, max_iter, pointer_jumping, checkpoint,
                         lineage_truncate_every, init_labels)


def _wcc_loop(
    graph: Graph,
    max_iter: int,
    pointer_jumping: bool,
    checkpoint: CheckpointManager | None,
    lineage_truncate_every: int,
    init_labels: DataFrame | None = None,
) -> DataFrame:
    edges = graph.symmetrized_edges().select("src", "dst")
    if graph.num_partitions:
        edges = edges.repartition(graph.num_partitions, "src")
    edges = edges.persist(StorageLevel.MEMORY_AND_DISK)

    start_step = 0
    if checkpoint is not None and (latest := checkpoint.latest_superstep()) is not None:
        state = checkpoint.load_state(graph.vertices.sparkSession, latest)
        start_step = latest + 1
    elif init_labels is not None:
        # guard: only labels that name a vertex of the CURRENT graph
        # are trusted (a label pointing at a removed vertex would be a
        # permanently-stale minimum); others cold-start at comp = id.
        valid = init_labels.select("id", F.col("comp").alias("c0")).join(
            graph.vertices.select(F.col("id").alias("c0")), "c0", "left_semi"
        )
        state = graph.vertices.select("id").join(valid, "id", "left").select(
            "id", F.coalesce("c0", F.col("id")).alias("comp")
        )
    else:
        state = graph.vertices.select("id", F.col("id").alias("comp"))
    state = state.persist(StorageLevel.MEMORY_AND_DISK)
    frontier = state  # round 0 (or resume): everyone (re)announces

    for step in range(start_step, max_iter):
        t0 = time.time()
        # messages: frontier vertices push their comp to neighbors; min-combine
        cand = (
            edges.join(frontier.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("comp").alias("cand"))
        )
        new_state = (
            state.withColumnRenamed("comp", "old_comp")
            .join(cand, "id", "left")
            .select(
                "id",
                F.least(F.col("old_comp"), F.coalesce("cand", F.col("old_comp"))).alias(
                    "comp"
                ),
                "old_comp",
            )
        )
        if pointer_jumping:
            # comp ← comp[comp]: follow the label one hop through the
            # current state table (comp(v) ≤ v invariant keeps this in
            # the same component and monotone non-increasing).
            lut = new_state.select(
                F.col("id").alias("comp"), F.col("comp").alias("jump")
            )
            new_state = (
                new_state.join(lut, "comp", "left")
                .select(
                    "id",
                    F.coalesce("jump", F.col("comp")).alias("comp"),
                    "old_comp",
                )
            )
        new_state = maybe_truncate_lineage(
            new_state.persist(StorageLevel.MEMORY_AND_DISK),
            step,
            lineage_truncate_every,
        )
        changed = new_state.where(F.col("comp") != F.col("old_comp")).count()
        state.unpersist()
        if frontier is not state:
            frontier.unpersist()
        state = new_state.select("id", "comp")
        frontier = new_state.where(F.col("comp") != F.col("old_comp")).select(
            "id", "comp"
        ).persist(StorageLevel.MEMORY_AND_DISK)
        if checkpoint is not None:
            checkpoint.save(
                step,
                state,
                {"changed": float(changed), "wall_ms": (time.time() - t0) * 1000.0},
            )
        if changed == 0:
            break

    return state.select("id", "comp")
