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


def pack_sequences(
    df: DataFrame,
    window: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
) -> DataFrame:
    """GPT-style sequence packing: concatenate documents in ``id``
    order and chunk the token stream into fixed ``window``-token
    context slots.  Returns ``(doc_id, n_tokens, token_offset,
    bin_id)`` where ``token_offset`` is the document's start in the
    global stream and ``bin_id = token_offset div window`` (a document
    belongs to the slot where it starts).

    The global prefix-sum is the scale trap here: a bare
    ``Window.orderBy(id)`` with no partition key collapses the whole
    table into ONE task.  Instead this runs the classic two-phase
    scan: range-partition by id, per-partition running sums
    (``Window.partitionBy(pid)`` — distributed), then add each
    partition's start offset, computed from the tiny per-partition
    totals (one row per partition) broadcast back.  Total cost: one
    range shuffle + one broadcast join, any number of executors.
    """
    from ..functions.text import tokens

    n_tok = F.size(tokens(F.col(text_col))).cast("long")
    parts = df.select(F.col(id_col), n_tok.alias("n_tokens"))
    if num_partitions:
        parts = parts.repartitionByRange(num_partitions, id_col)
    else:
        parts = parts.repartitionByRange(id_col)
    # capture the physical partition id BEFORE any further exchange —
    # spark_partition_id() is evaluated at runtime, so it must be
    # materialized as data while the range partitioning is live
    parts = parts.withColumn("pid", F.spark_partition_id())

    from pyspark.sql import Window

    within = Window.partitionBy("pid").orderBy(id_col)
    parts = parts.withColumn(
        "local_off",
        F.sum("n_tokens").over(within) - F.col("n_tokens"),
    )
    # per-partition totals: |partitions| rows — broadcast-join scale
    totals = parts.groupBy("pid").agg(F.sum("n_tokens").alias("ptot"))
    pid_off = Window.orderBy("pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.withColumn(
        "poff", F.coalesce(F.sum("ptot").over(pid_off), F.lit(0))
    ).select("pid", "poff")
    out = parts.join(F.broadcast(offsets), "pid")
    off = (F.col("poff") + F.col("local_off")).alias("token_offset")
    return out.select(
        F.col(id_col),
        F.col("n_tokens"),
        off,
        F.expr(f"(poff + local_off) div {int(window)}").alias("bin_id"),
    )


def stratum_counts(
    df: DataFrame, stratum_col: str, id_col: str = "doc_id"
) -> DataFrame:
    """Per-stratum row count — the balance report a sampling run
    prints before/after (``(stratum, n_docs)``)."""
    return df.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count("*").alias("n_docs")
    )
