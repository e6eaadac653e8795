"""Streaming ingestion for the link graph and the events table.

Patterns (all standard Structured Streaming, testable with
``trigger(availableNow=True)`` against file sources):

- ``read_edge_stream``: new edge files land in a directory → streaming
  DataFrame of (src, dst, event_time).  At production scale this is the
  Iceberg/Kafka ingest feeding incremental graph maintenance.
- ``incremental_degrees``: running out-degree per vertex maintained by
  the engine's streaming state store (complete-mode aggregation; at
  scale, checkpointed RocksDB state).  Degree is the first thing every
  app needs (PageRank divisors, triangle orientation) — keeping it
  fresh avoids a full O(E) recount per batch.
- ``windowed_event_stats``: watermarked tumbling-window counts/sums
  over the events table schema ``(event_id, ts, user_id, event_type,
  value, props)`` with late-data tolerance — append-mode output so
  each window finalizes exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EDGE_STREAM_SCHEMA = "src long, dst long, event_time timestamp"


def read_edge_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming read of edge parquet files landing in ``path``."""
    reader = (
        spark.readStream.schema(EDGE_STREAM_SCHEMA).format("parquet")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def incremental_degrees(edge_stream: DataFrame) -> DataFrame:
    """Running out-degree per src — streaming stateful aggregation.
    Write with ``outputMode("complete")`` (or update + upsert sink)."""
    return edge_stream.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("out_degree")
    )


def windowed_event_stats(
    events: DataFrame,
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Tumbling-window per-type stats with a watermark for late rows:
    ``(window, event_type, n, total_value)``.  Append-mode safe — a
    window only emits once the watermark passes its end."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("window"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("total_value"),
        )
    )


def streaming_dedup(
    docs: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup at ingest: keep the first arrival of each
    normalized-content sha256, drop later copies.

    Idiomatic Structured Streaming: ``withWatermark`` +
    ``dropDuplicatesWithinWatermark`` on the content hash, so the
    dedup state store is bounded by the watermark horizon instead of
    growing with the full corpus — at 100 TB/day ingest the unbounded
    variant (plain ``dropDuplicates``) would accrete state forever.
    Exactly the streaming face of :func:`...functions.dedup.
    exact_dedup_groups` (same sha256-of-normalized-text key, so batch
    backfill and streaming ingest agree on identity).
    """
    from ..functions.text import norm_text

    return (
        docs.withColumn(
            "content_sha", F.sha2(norm_text(F.col(text_col)), 256)
        )
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["content_sha"])
    )


def streaming_curation(
    docs: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming ingest curation: watermarked exact dedup
    (:func:`streaming_dedup`), then the stateless filter passes —
    the structural Gopher rules (one boolean predicate) and PII
    scrubbing — applied directly to the stream.  Every post-dedup op
    is a pure per-row projection, so the plan is identical in
    micro-batch and continuous mode and the ONLY state store is the
    dedup watermark horizon.  This is the ingest-time face of
    ``jobs/curate_job.py``'s batch stages 1 + 5 + 6; corpus-level
    stages (near-dup banding, LM scoring, packing) stay batch jobs
    over the landed data, where a global view exists.
    """
    from ..functions.quality import gopher_structural_ok
    from ..functions.text import pii_clean

    deduped = streaming_dedup(docs, ts_col, text_col, watermark)
    kept = deduped.where(gopher_structural_ok(text_col))
    # drop the dedup key: it hashes the PRE-scrub text (stale after
    # redaction) and would bloat every sink row with 64 hex chars
    return kept.withColumn(
        text_col, pii_clean(F.col(text_col))
    ).drop("content_sha")


def degree_threshold_alerts(
    edge_stream: DataFrame, threshold: int = 100
) -> DataFrame:
    """Custom STATEFUL operator via ``applyInPandasWithState``: emit
    ``(id, degree)`` exactly ONCE when a vertex's running out-degree
    first crosses ``threshold`` (a hub-formation alert feeding the
    salting machinery).

    This is edge-triggered, not level-triggered — a plain streaming
    aggregation can only maintain the level (current degree); the
    "fire once on crossing" semantics needs per-group state carrying
    a latched ``alerted`` flag across micro-batches, which is exactly
    the ``applyInPandasWithState`` contract (Arrow-batched per-group
    pandas, engine-managed state store, at scale RocksDB-backed and
    checkpointed).  State per key is two scalars — O(distinct hubs)
    total, not O(edges).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = "id long, degree long"
    state_schema = "degree long, alerted boolean"

    def fn(key, pdfs, state):
        if state.exists:
            deg, alerted = state.get
        else:
            deg, alerted = 0, False
        for pdf in pdfs:
            deg += len(pdf)
        fire = (not alerted) and deg >= threshold
        state.update((int(deg), bool(alerted or fire)))
        if fire:
            yield pd.DataFrame({"id": [key[0]], "degree": [int(deg)]})

    return edge_stream.groupBy(F.col("src")).applyInPandasWithState(
        fn, out_schema, state_schema, "append",
        GroupStateTimeout.NoTimeout,
    )


def run_to_sink(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    output_mode: str = "append",
) -> None:
    """Drain all available input to a parquet sink exactly once
    (``availableNow`` trigger) — the batch-refresh deployment shape,
    and what the tests drive."""
    (
        stream_df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def _incremental_graph_stream(
    edge_stream: DataFrame,
    work_dir: str,
    state_dir: str,
    compute,
    graph_directed: bool = True,
    symmetrize: bool = False,
):
    """Shared foreachBatch scaffold for the warm-started incremental
    graph analytics (PageRank / WCC / CDLP — previously maintained in
    triplicate): append the batch to the edge log, rebuild the graph
    over the distinct accumulated log, read the previous state as an
    EAGER copy (the swap below replaces those files, and a lazy
    reference would fail on later re-evaluation), run
    ``compute(graph, prev_state)``, then stage-and-swap the new state
    so a crash mid-write never corrupts ``{work_dir}/{state_dir}``.
    """
    from ..graph import Graph

    spark = edge_stream.sparkSession

    def on_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        batch.select("src", "dst").write.mode("append").parquet(
            f"{work_dir}/edges"
        )
        g = Graph.from_edges(
            spark.read.parquet(f"{work_dir}/edges").distinct(),
            directed=graph_directed,
        )
        if symmetrize:
            # .undirected() contract: some undirected consumers (cdlp)
            # expect pre-symmetrized edges, not just the flag
            g = Graph.from_edges(
                g.symmetrized_edges(), directed=False,
                vertices=g.vertices,
            )
        import os
        import shutil

        live = f"{work_dir}/{state_dir}"
        nxt = f"{live}_next"
        old = f"{live}_old"
        # cold start vs real failure must stay distinguishable: only
        # a genuinely absent state dir means "no previous state" —
        # a corrupt/unreadable one should fail the batch loudly, not
        # silently degrade every future batch to a cold start.  If a
        # crash landed between the two renames below, the fully
        # committed _next (written before any swap step) is adopted.
        src = next((p for p in (live, nxt) if os.path.exists(p)), None)
        prev = (
            spark.read.parquet(src).localCheckpoint(eager=True)
            if src is not None else None
        )
        state = compute(g, prev)
        state.write.mode("overwrite").parquet(nxt)
        # atomic-rename swap (same filesystem): live -> _old,
        # _next -> live, then drop _old.  Any crash point leaves
        # either live or a complete _next for the reader above;
        # os.rename never nests a directory inside an existing one
        # (the old rmtree+shutil.move pair could).
        shutil.rmtree(old, ignore_errors=True)
        if os.path.exists(live):
            os.rename(live, old)
        os.rename(nxt, live)
        shutil.rmtree(old, ignore_errors=True)

    return (
        edge_stream.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", f"{work_dir}/_stream_ckpt")
        .trigger(availableNow=True)
        .start()
    )


def incremental_pagerank(
    edge_stream: DataFrame,
    work_dir: str,
    alpha: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
    directed: bool = True,
):
    """Streaming-graph PageRank: as edge micro-batches land, recompute
    PageRank over the accumulated edge log, **warm-started from the
    previous result** — a slightly-grown graph re-converges in a few
    supersteps instead of from 1/N (the standard foreachBatch
    incremental-analytics pattern; true delta-PageRank needs
    engine-level mutable state Spark doesn't expose).

    Layout under ``work_dir``: ``edges/`` the append-only edge log,
    ``ranks/`` the latest (id, rank).  Returns the StreamingQuery;
    read ``{work_dir}/ranks`` after any trigger for current scores.
    """
    from ..operators.pagerank import pagerank

    def compute(g, prev):
        return pagerank(
            g, alpha=alpha, tol=tol, max_iter=max_iter, init_ranks=prev
        )

    return _incremental_graph_stream(
        edge_stream, work_dir, "ranks", compute,
        graph_directed=directed,
    )


def incremental_wcc(
    edge_stream: DataFrame, work_dir: str, directed: bool = True
):
    """Streaming-graph connected components: same foreachBatch shape
    as :func:`incremental_pagerank`, warm-started from the previous
    labeling — every old label is a vertex id inside its component,
    so min-label propagation over the grown graph converges to the
    new minima with unchanged regions settling in one round.

    **Insert-only contract** (see ``operators.wcc.wcc``): the edge log
    this stream appends to must be grow-only — no deletes, no
    compaction that drops edges — or the warm-start labels can be
    stale minima that min-propagation can never raise.  After any
    delete/compaction, remove the saved labeling so the next batch
    cold-starts."""
    from ..operators.wcc import wcc

    return _incremental_graph_stream(
        edge_stream, work_dir, "comps",
        lambda g, prev: wcc(g, init_labels=prev),
        graph_directed=directed,
    )


def incremental_cdlp(
    edge_stream: DataFrame, work_dir: str, directed: bool = True,
    refine_rounds: int = 3,
):
    """Streaming community labels: same foreachBatch shape as
    :func:`incremental_wcc`, but each batch runs only
    ``refine_rounds`` CDLP rounds warm-started from the previous
    labeling (new vertices seed with their own id).  Because CDLP
    recomputes every label from the neighbor mode each round, the
    warm start is just a seed — no insert-only contract (contrast
    ``incremental_wcc``); unchanged regions re-emit their settled
    mode while labels near inserted edges shift.  The result is the
    LDBC refinement of the previous labeling on the grown graph, not
    a from-scratch ``max_round`` run — exactly the incremental
    semantics a streaming pipeline wants (a from-scratch run stays
    one ``cdlp(g)`` call away).

    Maintains under ``work_dir``: ``edges/`` the accumulated edge log
    and ``labels/`` the current labeling.
    """
    from ..operators.cdlp import cdlp

    return _incremental_graph_stream(
        edge_stream, work_dir, "labels",
        lambda g, prev: cdlp(
            g, max_round=refine_rounds, init_labels=prev
        ),
        graph_directed=True,
        symmetrize=not directed,
    )


def triangle_total(spark: SparkSession, work_dir: str) -> int:
    """Current triangle count of an :func:`incremental_triangles`
    stream: the sum of the per-batch delta records."""
    row = (
        spark.read.option("basePath", f"{work_dir}/deltas")
        .parquet(f"{work_dir}/deltas/batch=*")
        .agg(F.sum("delta").alias("t"))
        .first()
    )
    return int(row["t"] or 0)


def triangle_delta(old: DataFrame | None, new: DataFrame) -> int:
    """Exact number of triangles CREATED by inserting the canonical
    (``src<dst``, deduplicated, disjoint-from-old) edge set ``new``
    into the graph ``old`` — work proportional to the batch, never a
    recount:

    - 1 new edge + 2 old: per new edge (u,v), common neighbors of u
      and v through OLD edges only;
    - 2 new edges + 1 old: wedges of two new edges sharing a vertex,
      closed by an old edge;
    - 3 new edges: triangles inside the batch itself.
    """
    new_sym = new.unionByName(
        new.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    t2 = t1 = 0
    if old is not None:
        old_sym = old.unionByName(
            old.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        ou = old_sym.select(F.col("src").alias("u"), F.col("dst").alias("w"))
        ov = old_sym.select(F.col("src").alias("v"), F.col("dst").alias("w"))
        t1 = (
            new.select(F.col("src").alias("u"), F.col("dst").alias("v"))
            .join(ou, "u").join(ov, ["v", "w"]).count()
        )
        wedges = (
            new_sym.select(F.col("src").alias("w"), F.col("dst").alias("u"))
            .join(
                new_sym.select(
                    F.col("src").alias("w"), F.col("dst").alias("v")
                ),
                "w",
            )
            .where(F.col("u") < F.col("v"))
        )
        t2 = wedges.join(
            old.select(F.col("src").alias("u"), F.col("dst").alias("v")),
            ["u", "v"],
        ).count()
    from ..graph import Graph
    from ..operators.triangles import global_triangle_count

    t3 = global_triangle_count(Graph.from_edges(new, directed=False))
    return int(t1 + t2 + t3)


def incremental_triangles(
    edge_stream: DataFrame, work_dir: str
):
    """Streaming triangle count via :func:`triangle_delta` — the
    classic edge-insertion algorithm: each micro-batch costs joins
    proportional to the batch against the accumulated adjacency,
    never a recount of the whole graph.

    Crash-safe under foreachBatch's at-least-once contract because
    every write is KEYED BY BATCH ID and overwrite-idempotent:
    ``edges/batch=<id>/`` holds each batch's canonical novel edges
    and ``deltas/batch=<id>/`` its one-row triangle delta — a replay
    of batch k rewrites the identical content (the anti-join excludes
    only OTHER batches' partitions, so re-appending is impossible and
    nothing is lost if the process dies between the two writes).  The
    running total is ``SUM(deltas)`` — read it with
    :func:`triangle_total`, there is no mutable counter to corrupt.
    """
    spark = edge_stream.sparkSession

    def on_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        new = (
            batch.select(
                F.least("src", "dst").alias("src"),
                F.greatest("src", "dst").alias("dst"),
            )
            .where(F.col("src") != F.col("dst"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        import os

        # prior log = every batch partition EXCEPT this one, so a
        # replayed batch recomputes against the same "before" state
        # it saw the first time (idempotent).  Only the genuinely-
        # missing-log case (first batch) may fall back to old=None:
        # a transient read/anti-join failure must fail the batch —
        # swallowing it would recount already-counted triangles AND
        # append duplicate rows to the log, corrupting every future
        # delta (foreachBatch retries the batch on failure).
        log_dir = f"{work_dir}/edges"
        has_log = os.path.exists(log_dir) and any(
            n.startswith("batch=") for n in os.listdir(log_dir)
        )
        if not has_log:
            old = None
        else:
            old = (
                spark.read.option(
                    "basePath", f"{work_dir}/edges"
                ).parquet(f"{work_dir}/edges/batch=*")
                .where(F.col("batch") != batch_id)
                .select("src", "dst")
                .localCheckpoint(eager=True)
            )
            if old.isEmpty():
                old = None
            else:
                new = new.join(
                    old, ["src", "dst"], "left_anti"
                ).localCheckpoint(eager=True)
        delta = 0 if new.isEmpty() else triangle_delta(old, new)
        new.write.mode("overwrite").parquet(
            f"{work_dir}/edges/batch={batch_id}"
        )
        spark.createDataFrame(
            [(int(delta), int(batch_id))], "delta long, batch_id long"
        ).write.mode("overwrite").parquet(
            f"{work_dir}/deltas/batch={batch_id}"
        )

    return (
        edge_stream.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", f"{work_dir}/_stream_ckpt")
        .trigger(availableNow=True)
        .start()
    )
