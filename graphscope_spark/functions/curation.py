"""Corpus-curation operators for a training-data pipeline:
benchmark decontamination and deterministic stratified sampling.

These are the two curation steps that sit between dedup
(:mod:`.dedup`) and the model: drop training documents that leak
evaluation-benchmark content, and rebalance the corpus across strata
(language, source, quality bucket) with a reproducible sample.

Scale notes
-----------
- **Decontamination** is a semi-join of the training shingle stream
  against the *distinct benchmark shingle set*.  Benchmark suites are
  tiny next to a 100 TB corpus (MMLU + friends ≈ a few hundred MB of
  shingles), so the benchmark side is broadcast — the training table
  is scanned once, no shuffle of the big side at all.  When the
  benchmark set is too large to broadcast, the same plan degrades
  gracefully to a shuffle semi-join on ``shingle``.
- **Stratified sampling** is a pure map-side filter: keep a row iff
  ``h60('samp:' || id) % DENOM < rate[stratum] * DENOM``.  No shuffle,
  no RNG state, byte-identical across engines and re-runs — the
  property a reproducible data pipeline actually needs (Spark's
  ``df.sampleBy`` is seeded per-partition and NOT stable under
  repartitioning).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import word_shingles
from .text import h60

#: denominator for the rate quantisation — rates are exact multiples
#: of 1/10000 so Spark and the SQL oracle compare identical integers.
SAMPLE_DENOM = 10_000


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    min_ratio: float = 0.2,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Per-training-document benchmark n-gram overlap.

    Returns ``(doc_id, matched, total, overlap_ratio, contaminated)``
    for every row of ``train``: ``matched`` = distinct word n-grams
    shared with *any* benchmark document, ``total`` = the document's
    distinct n-gram count, ``contaminated`` = ratio >= ``min_ratio``.
    Documents too short to form an n-gram have ``total = 0`` and are
    never flagged.

    Reference parity: this is the standard n-gram-overlap
    decontamination used by open-data pipelines; expressed here as a
    broadcast semi-join + two aggregations so the 100 TB training
    side is read exactly once and never shuffled.
    """
    bench_sh = (
        word_shingles(benchmark, n, id_col, text_col)
        .select("shingle")
        .distinct()
    )
    if broadcast_benchmark:
        bench_sh = F.broadcast(bench_sh)

    # a left join + conditional count computes `matched` and `total`
    # off a single pass over the training shingle stream (a semi-join
    # would need a second scan for the totals)
    train_sh = word_shingles(train, n, id_col, text_col).join(
        bench_sh.withColumn("hit", F.lit(1)), "shingle", "left"
    )
    counts = train_sh.groupBy(id_col).agg(
        F.count("*").alias("total"),
        F.count(F.when(F.col("hit").isNotNull(), 1)).alias("matched"),
    )
    # integer-scaled floor quantiser instead of round(x, 6): identical
    # IEEE ops in Spark and the DuckDB oracle, so exact-half ratios
    # like 1/128 = 0.0078125 can't split across rounding modes
    r6 = F.floor(
        F.col("matched") * 1000000.0 / F.col("total") + F.lit(0.5)
    ).cast("long")
    return (
        train.select(id_col)
        .join(counts, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("matched", F.lit(0)).alias("matched"),
            F.coalesce("total", F.lit(0)).alias("total"),
            F.coalesce(r6 / 1000000.0, F.lit(0.0)).alias("overlap_ratio"),
            F.coalesce(
                r6 >= F.lit(int(round(min_ratio * 1_000_000))),
                F.lit(False),
            ).alias("contaminated"),
        )
    )


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    id_col: str = "doc_id",
    salt: str = "samp",
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sample.

    A row survives iff ``h60(salt || ':' || id) % 10000 <
    round(rate * 10000)`` for its stratum — a pure map-side filter
    that is stable under repartitioning, re-runs, and engine changes
    (unlike ``DataFrame.sampleBy``, whose per-partition RNG reshuffles
    membership when the partitioning changes).  Strata absent from
    ``rates`` get ``default_rate``.
    """
    thresholds = {k: int(round(v * SAMPLE_DENOM)) for k, v in rates.items()}
    thr = F.lit(int(round(default_rate * SAMPLE_DENOM)))
    for k, t in sorted(thresholds.items()):
        thr = F.when(F.col(stratum_col) == k, F.lit(t)).otherwise(thr)
    bucket = h60(
        F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))
    ) % SAMPLE_DENOM
    return df.where(bucket < thr)


def stratum_counts(
    df: DataFrame, stratum_col: str, id_col: str = "doc_id"
) -> DataFrame:
    """Per-stratum row count — the balance report a sampling run
    prints before/after (``(stratum, n_docs)``)."""
    return df.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count("*").alias("n_docs")
    )
