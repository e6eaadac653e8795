"""Structured Streaming surface.

The reference has NO streaming query operators (SURVEY.md §2.E:
GAIA/GAE are batch; Groot does realtime graph *writes*, not streaming
queries).  This package is therefore additive: the Spark-native way to
keep a link graph and its derived state fresh as new data lands —
incremental edge ingestion, watermarked windowed stats, and stateful
running degrees — so the 100 TB pipeline doesn't rebuild from scratch
per batch.
"""

from graphscope_spark.streaming.edge_stream import (  # noqa: F401
    degree_threshold_alerts,
    incremental_cdlp,
    incremental_degrees,
    incremental_pagerank,
    incremental_triangles,
    incremental_wcc,
    read_edge_stream,
    run_to_sink,
    streaming_dedup,
    triangle_delta,
    windowed_event_stats,
)
