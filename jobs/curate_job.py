"""spark-submit end-to-end training-data curation pipeline.

The composed flow a 100 TB pretraining-corpus run would execute, in
dependency order, each stage reading only what the previous one kept:

1. exact dedup        — sha256 groups, keep canonical doc per group
2. near-dup dedup     — MinHash/LSH groups, keep canonical doc
3. semantic dedup     — SemDeDup-style: IVF clusters over the doc
                        embeddings, drop intra-cluster cosine dups
                        (docs with no embedding pass through)
4. decontamination    — drop docs overlapping the benchmark set
5. quality filter     — Gopher-style length/punct + repetition gates
6. PII scrub          — redact emails/IPs/phones in the kept text
7. stratified sample  — deterministic per-language rebalance
8. sequence packing   — global token offsets + context-window bins

Usage::

    spark-submit --master local[8] --py-files gs.zip \
        jobs/curate_job.py --sf-dir /root/testdata/sf0.01 \
        [--out /tmp/curated]

Output: ONE JSON line with per-stage surviving-document counts and
wall time; with ``--out``, also writes the packed corpus as parquet
partitioned by ``bin_id`` (the layout a dataloader shards by).

Scale notes: stages 1-2 shuffle on content hashes (bounded by the
dedup candidate machinery in functions/dedup.py), stage 3 on IVF
cluster ids (per-cluster pair compare, max_cluster_size-guarded),
stage 4 broadcasts the benchmark shingle set, stages 5-6 are pure
projections/filters, stage 8 is the two-phase prefix scan.  Nothing
in the chain collects more than per-stage scalar counts to the
driver.
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
from graphscope_spark.functions.dedup import (  # noqa: E402
    exact_dedup_groups,
    minhash_dedup_groups,
)
from graphscope_spark.functions.curation import (  # noqa: E402
    decontaminate,
    pack_sequences,
    stratified_sample,
    stratum_counts,
)
from graphscope_spark.functions.text import (  # noqa: E402
    pii_scrub,
    repetition_stats,
    text_stats,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--out", default=None)
    ap.add_argument("--master", default="local[8]")
    ap.add_argument("--bench-sources", nargs="*", default=["src0", "src1"])
    args = ap.parse_args()

    spark = get_spark("curate", master=args.master, shuffle_partitions=8)
    t0 = time.time()
    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
    stages: dict[str, int] = {"input": docs.count()}

    # Each stage ends with a localCheckpoint: the surviving-doc table
    # is small, but chaining six dedup/semi-join stages into ONE
    # analyzed plan blows the driver up on plan size, not data (the
    # same lineage cliff the superstep loops hit) — truncate between
    # stages.
    def cut(df):
        return df.localCheckpoint(eager=True)

    # 1. exact dedup: keep each group's canonical (min-id) doc
    exact_keep = exact_dedup_groups(docs).select("doc_id")
    docs = cut(docs.join(exact_keep, "doc_id", "left_semi"))
    stages["exact_dedup"] = docs.count()

    # 2. near-dup dedup: drop non-representative group members
    groups = minhash_dedup_groups(docs, num_hashes=12, bands=4, n=3)
    keep = groups.where(F.col("doc_id") == F.col("group_id")).select(
        "doc_id"
    )
    docs = cut(docs.join(keep, "doc_id", "left_semi"))
    stages["near_dedup"] = docs.count()

    # 3. semantic dedup over the embedding table (SemDeDup): docs
    # whose embedding is an intra-cluster cosine duplicate of a
    # lower-id one are dropped; docs with no embedding pass through
    emb_path = f"{args.sf_dir}/embeddings.parquet"
    if os.path.exists(emb_path):
        from graphscope_spark.functions.similarity import semantic_dedup

        # cluster only the embeddings of SURVIVING docs — the stage
        # contract is "each stage reads what the previous one kept";
        # deduping the full table would also drop a doc whose only
        # near-duplicate was already removed upstream.
        # 0.4 is the demonstration threshold for the near-orthogonal
        # synthetic embeddings (same as the registered semantic_dedup
        # query); real-corpus SemDeDup runs ~0.95 on trained encoders
        emb = spark.read.parquet(emb_path).join(
            docs.select(F.col("doc_id").alias("vec_id")),
            "vec_id", "left_semi",
        )
        sem_drop = semantic_dedup(
            emb, threshold=0.4, n_centroids=8
        ).where(~F.col("keep")).select(F.col("vec_id").alias("doc_id"))
        docs = cut(docs.join(sem_drop, "doc_id", "left_anti"))
    stages["semantic_dedup"] = docs.count()

    # 4. decontamination vs the held-out benchmark sources
    bench = docs.where(F.col("source").isin(*args.bench_sources))
    train = docs.where(~F.col("source").isin(*args.bench_sources))
    decon = decontaminate(train, bench, n=3, min_ratio=0.2)
    clean = decon.where(~F.col("contaminated")).select("doc_id")
    docs = cut(train.join(clean, "doc_id", "left_semi"))
    stages["decontaminated"] = docs.count()

    # 5. quality gates: length/punct score + repetition signals +
    # the structural Gopher rules (Rae et al. 2021 A1.1).  Only the
    # structure rules gate here — the word-count/stop-word rules are
    # meaningless on the short stop-word-free synthetic corpus and
    # would empty the pipeline; a real English corpus would filter on
    # the combined `keep` column instead.
    from graphscope_spark.functions.quality import gopher_structural_ok

    ts = text_stats(docs).where(F.col("quality") >= 0.8).select("doc_id")
    rs = repetition_stats(docs).where(
        (F.col("distinct_ratio") >= 0.2) & (F.col("top_bigram_frac") <= 0.5)
    ).select("doc_id")
    docs = cut(
        docs.where(gopher_structural_ok())  # pure predicate, no join
        .join(ts, "doc_id", "left_semi")
        .join(rs, "doc_id", "left_semi")
    )
    stages["quality"] = docs.count()

    # 5b. CCNet-style LM gate: score every surviving doc with the
    # corpus-trained smoothed bigram model and drop the lowest decile
    # (CCNet buckets by KenLM perplexity and discards the tail).  The
    # cutoff is one approxQuantile driver scalar.
    from graphscope_spark.functions.quality import bigram_lm_logprob

    lm = bigram_lm_logprob(docs).persist()  # quantile + gate share it
    q = lm.approxQuantile("avg_logp", [0.1], 0.001)
    if q:  # empty survivor set -> nothing to gate
        docs = cut(
            docs.join(
                lm.where(F.col("avg_logp") >= q[0]).select("doc_id"),
                "doc_id", "left_semi",
            )
        )
    lm.unpersist()
    stages["lm_gate"] = docs.count()

    # 6. PII scrub: replace text with the redacted version
    scrubbed = pii_scrub(docs)
    stages["pii_redactions"] = int(
        scrubbed.agg(
            F.sum(F.col("n_email") + F.col("n_ip") + F.col("n_phone"))
        ).first()[0]
        or 0
    )
    docs = cut(
        docs.drop("text").join(
            scrubbed.select(
                "doc_id", F.col("text_clean").alias("text")
            ),
            "doc_id",
        )
    )

    # 7. deterministic language rebalance
    docs = stratified_sample(
        docs, "lang",
        {"en": 0.5, "de": 0.9, "es": 0.9, "fr": 0.9, "zh": 0.9},
    )
    stages["sampled"] = docs.count()
    balance = {
        r["stratum"]: r["n_docs"]
        for r in stratum_counts(docs, "lang").collect()
    }

    # 8. pack into context windows
    packed = pack_sequences(docs, window=512)
    stages["packed_bins"] = (
        packed.agg(F.countDistinct("bin_id")).first()[0]
    )
    if args.out:
        (packed.join(docs.select("doc_id", "text"), "doc_id")
         .repartition("bin_id")
         .write.mode("overwrite")
         .partitionBy("bin_id")
         .parquet(args.out))

    print(json.dumps({
        "metric": "curation_pipeline",
        "stages": stages,
        "balance": balance,
        "wall_s": round(time.time() - t0, 2),
        "sf_dir": args.sf_dir,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
