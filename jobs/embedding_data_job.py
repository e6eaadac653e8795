"""spark-submit end-to-end graph-embedding training-data pipeline.

The composed flow a GLE-style link-prediction / node-embedding
training run would execute over the mined dependency graph (GraphScope
``learning_engine`` sampling surface re-expressed as DataFrame ops,
cf. ``graphlearn/core/operator/sampler``):

1. mine          — repo dependency edges from the code table
2. walks         — deterministic node2vec-biased walks (p/q as
                   integer-replication argmin race)
3. skip-gram     — (center, context, pair_count) positives from the
                   walk corpus, window w
4. negatives     — k deterministic non-edge samples per vertex
5. features      — per-vertex structural features (degree, rank)
                   joined onto both pair tables

Usage::

    spark-submit --master local[8] --py-files gs.zip \
        jobs/embedding_data_job.py [--n-repos 300] [--out /tmp/emb]

Output: ONE JSON line with per-stage row counts and wall time; with
``--out``, writes ``positives/`` and ``negatives/`` parquet the way a
dataloader shards them (hash-partitioned by center / src).

Scale notes: every stage is the operator's documented 100 TB shape —
walks are one co-partitioned adjacency join per step, skip-gram is a
walk-keyed self-join with bounded 2·window fan-out, negatives are a
map-side modulo draw + anti-join, features one broadcastable degree
join.  Nothing collects more than scalar counts to the driver.
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
from graphscope_spark.graph import Graph  # noqa: E402
from graphscope_spark.sources.synthetic import gen_code_table  # noqa: E402
from graphscope_spark.sources.miner import mine_edges  # noqa: E402
from graphscope_spark.operators.pagerank import pagerank  # noqa: E402
from graphscope_spark.operators.walks import (  # noqa: E402
    negative_sampling,
    node2vec_walks,
    skipgram_pairs,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-repos", type=int, default=300)
    ap.add_argument("--walk-len", type=int, default=6)
    ap.add_argument("--seed-mod", type=int, default=2)
    ap.add_argument("--window", type=int, default=2)
    ap.add_argument("--neg-k", type=int, default=3)
    ap.add_argument("--out", default=None)
    ap.add_argument("--master", default="local[8]")
    args = ap.parse_args()

    spark = get_spark("embedding-data", master=args.master,
                      shuffle_partitions=16)
    t_all = time.time()
    stages: dict[str, int] = {}

    code = spark.createDataFrame(
        gen_code_table(n_repos=args.n_repos, files_per_repo=4)
    )
    _files, edges = mine_edges(code)
    g, _vmap = Graph.from_string_edges(
        edges, "src_repo", "dst_repo", num_partitions=16
    )
    gu = g.undirected()
    stages["mined_edges"] = gu.edges.count() // 2

    walks = node2vec_walks(
        gu, length=args.walk_len, seed_mod=args.seed_mod,
        p_inv=2, q_inv=3,
    ).persist()
    stages["walk_rows"] = walks.count()

    pos = skipgram_pairs(walks, window=args.window).persist()
    stages["positive_pairs"] = pos.count()

    # sample against the UNDIRECTED graph the walks ran on: positives
    # come from undirected traversals, so rejecting only directed
    # out-edges would let a reverse-edge pair appear as both a
    # positive and a negative
    neg = negative_sampling(
        gu, k=args.neg_k, dense_rank=False
    ).persist()
    stages["negative_pairs"] = neg.count()

    # per-vertex features: degree + 5-round pagerank, one broadcastable
    # dimension join onto each pair table
    feats = (
        gu.degrees()
        .join(pagerank(g, max_iter=5, tol=0.0), "id")
        .withColumnRenamed("id", "center")
    )
    pos_f = pos.join(feats, "center")
    neg_f = neg.join(
        feats.withColumnRenamed("center", "src"), "src"
    )
    stages["positives_with_features"] = pos_f.count()
    stages["negatives_with_features"] = neg_f.count()

    if args.out:
        pos_f.repartition(8, "center").write.mode("overwrite").parquet(
            f"{args.out}/positives"
        )
        neg_f.repartition(8, "src").write.mode("overwrite").parquet(
            f"{args.out}/negatives"
        )

    print(json.dumps({
        "job": "embedding_data",
        "stages": stages,
        "wall_s": round(time.time() - t_all, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
