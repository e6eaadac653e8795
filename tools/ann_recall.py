"""Measured recall@k of the IVF-flat ANN path vs exact brute force
(VERDICT r4 item 7): ``ivf_topk`` proves oracle parity with its own
spec; this tool grades its QUALITY — recall@10 against ``cosine_topk``
ground truth over the sf embeddings table, swept over ``n_probe`` —
so the IVF speed/quality trade-off is a measured table in BASELINE.md,
not an assumption.  Usage::

    python tools/ann_recall.py [sf_dir] [n_queries]

Prints one JSON line: recall@10 and candidate-fraction per n_probe.
"""
from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from graphscope_spark.functions.similarity import (  # noqa: E402
    cosine_topk,
    ivf_topk,
)
from graphscope_spark.session import get_spark  # noqa: E402

K = 10
N_CENTROIDS = 8


def topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["vec_id"])
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    spark = get_spark("ann-recall")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").persist()
    n_corpus = emb.count()
    qv = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    truth = topk_sets(cosine_topk(emb, qv, k=K))
    result = {
        "sf_dir": sf_dir, "corpus": n_corpus, "queries": len(truth),
        "k": K, "n_centroids": N_CENTROIDS, "recall_at_10": {},
        "candidate_fraction": {},
    }
    for n_probe in (1, 2, 4, 8):
        approx = topk_sets(
            ivf_topk(emb, qv, k=K, n_centroids=N_CENTROIDS,
                     n_probe=n_probe)
        )
        hits = sum(
            len(truth[q] & approx.get(q, set())) for q in truth
        )
        result["recall_at_10"][str(n_probe)] = round(
            hits / (K * len(truth)), 4
        )
        # expected fraction of the corpus scored per query: probed
        # posting lists / all lists (uniform-ish with the h60 seeds)
        result["candidate_fraction"][str(n_probe)] = round(
            n_probe / N_CENTROIDS, 3
        )
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
