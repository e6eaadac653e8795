"""spark-submit streaming ingest-curation demo.

The Structured-Streaming face of ``jobs/curate_job.py``: documents
land in batches in an input directory; the stream applies
``streaming/edge_stream.streaming_curation`` (watermarked exact
dedup → Gopher structural predicate → inline PII scrub) and appends
survivors to a parquet sink.  By default the query drains whatever
has landed and exits (availableNow — the backfill / demo mode);
``--continuous`` keeps it running until interrupted (the production
ingest mode, which therefore prints no summary line).

At 100 TB/day the same plan holds: dedup state is bounded by the
watermark horizon, every other op is a stateless per-row projection,
and the sink partitions by ingest date for downstream batch stages
(near-dup banding, LM scoring, packing) that need a global view.

Usage::

    spark-submit --master local[8] --py-files gs.zip \
        jobs/stream_curate_job.py --in /tmp/docs_in --out /tmp/docs_out
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
from graphscope_spark.streaming.edge_stream import (  # noqa: E402
    streaming_curation,
)

DOC_SCHEMA = "doc_id long, ts timestamp, text string"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--in", dest="src", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--master", default="local[8]")
    ap.add_argument("--watermark", default="10 minutes")
    ap.add_argument("--continuous", action="store_true",
                    help="run until interrupted instead of draining "
                         "the landed batches and exiting")
    ap.add_argument("--seed-demo", action="store_true",
                    help="write a small demo batch into --in first")
    args = ap.parse_args()

    spark = get_spark("stream-curate", master=args.master,
                      shuffle_partitions=8)
    t0 = time.time()
    if args.seed_demo:
        rows = [
            (1, "2024-01-01 00:00:01",
             "contact someone@example.com for the clean copy"),
            (2, "2024-01-01 00:00:02",
             "contact someone@example.com for the clean copy"),
            (3, "2024-01-01 00:00:03", "# # # # # # # # # # noise"),
            (4, "2024-01-01 00:00:04", "a perfectly ordinary sentence"),
        ]
        (spark.createDataFrame(rows, "doc_id long, ts_s string, text string")
         .selectExpr("doc_id", "cast(ts_s as timestamp) as ts", "text")
         .write.mode("append").parquet(args.src))

    stream = (spark.readStream.schema(DOC_SCHEMA)
              .format("parquet").load(args.src))
    curated = streaming_curation(stream, watermark=args.watermark)
    writer = (curated.writeStream.format("parquet")
              .option("path", args.out)
              .option("checkpointLocation", args.out + "_ck")
              .outputMode("append"))
    if args.continuous:
        writer.start().awaitTermination()
        return  # unreachable until interrupted; no summary line
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination()

    # explicit schema: a run where nothing survives leaves a sink
    # with only _spark_metadata, which schema inference rejects
    landed = spark.read.schema(curated.schema).parquet(args.out)
    print(json.dumps({
        "metric": "streaming_curation",
        "docs_out": landed.count(),
        "pii_free": landed.where(
            F.col("text").rlike("@")).count() == 0,
        "wall_s": round(time.time() - t0, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
