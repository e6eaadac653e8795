"""Similarity search over an embedding column (``array<float>``).

- ``cosine_topk``: brute-force cosine top-k of every query against the
  corpus — the exact baseline, a broadcast-join + per-row vector math
  in JVM expressions (``zip_with``/``aggregate``), no Python.
- ``cosine_topk_pandas``: the same math as an Arrow-batched pandas
  UDF using numpy matmul — the fast path when the corpus partition
  fits a BLAS call; identical results (used for cross-checking and
  for wide embedding columns).
- ``cosine_lsh_pairs``: random-hyperplane LSH bucketing (deterministic
  md5-seeded planes) — the 100 TB scale path: each vector hashes to
  ``bands`` sign-pattern buckets, candidates come from equality joins
  on buckets, and only candidates get exact cosine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _as_double(vec_col: str):
    return F.transform(F.col(vec_col), lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine: ``(query_id, vec_id, cos)``; excludes
    self-matches; rank ties broken by ascending neighbor id on the
    6-decimal-rounded similarity (engine-portable determinism)."""
    c = corpus.select(
        F.col(id_col), _as_double(vec_col).alias("v")
    ).withColumn("n", F.sqrt(_dot(F.col("v"), F.col("v"))))
    q = queries.select(
        F.col(query_id_col), _as_double(vec_col).alias("qv")
    ).withColumn("qn", F.sqrt(_dot(F.col("qv"), F.col("qv"))))
    scored = (
        c.join(F.broadcast(q), F.col(id_col) != F.col(query_id_col))
        .withColumn(
            "cos",
            F.round(
                _dot(F.col("v"), F.col("qv")) / (F.col("n") * F.col("qn")), 6
            ),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cos"), F.asc(id_col)
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select(query_id_col, id_col, "cos")
    )


def cosine_topk_pandas(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    max_queries: int = 100_000,
) -> DataFrame:
    """Arrow-batched numpy variant: queries are broadcast to every
    corpus partition; each Arrow batch does ONE matmul against the
    query matrix.  Same output contract as ``cosine_topk`` (top-k is
    taken globally afterwards; the UDF only scores).

    The query set is collected to the driver and broadcast — correct
    by contract (queries are the small side), with ``max_queries`` as
    the explicit guard: beyond it the broadcast matrix stops being
    "small" (100k × 1k floats ≈ 0.8 GB) and the caller should chunk
    the query set or flip to a bucketed join (``cosine_lsh_pairs``)."""
    import numpy as np
    import pandas as pd

    n_q = queries.count()
    if n_q > max_queries:
        raise ValueError(
            f"cosine_topk_pandas collects the query set to the driver: "
            f"{n_q} queries > max_queries={max_queries}; chunk the "
            f"queries or use the LSH/IVF path"
        )
    q_rows = queries.select(query_id_col, vec_col).collect()
    q_ids = [r[0] for r in q_rows]
    qm = np.array([r[1] for r in q_rows], dtype="float64")
    qn = np.linalg.norm(qm, axis=1)
    spark = corpus.sparkSession
    b_ids = spark.sparkContext.broadcast(q_ids)
    b_qm = spark.sparkContext.broadcast(qm)
    b_qn = spark.sparkContext.broadcast(qn)

    out_schema = f"{query_id_col} long, {id_col} long, cos double"

    def score(batches):
        ids, mat, norms = b_ids.value, b_qm.value, b_qn.value
        for pdf in batches:
            vm = np.array(list(pdf[vec_col]), dtype="float64")
            if len(vm) == 0:
                continue
            vn = np.linalg.norm(vm, axis=1)
            sims = (vm @ mat.T) / np.outer(vn, norms)
            for qi, qid in enumerate(ids):
                yield pd.DataFrame(
                    {
                        query_id_col: qid,
                        id_col: pdf[id_col].to_numpy(),
                        "cos": np.round(sims[:, qi], 6),
                    }
                )

    scored = corpus.select(id_col, vec_col).mapInPandas(score, out_schema)
    scored = scored.where(F.col(id_col) != F.col(query_id_col))
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos"), F.asc(id_col))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select(query_id_col, id_col, "cos")
    )


def plane_coefs(num_planes: int, dim: int) -> list[list[float]]:
    """±1 hyperplane coefficients, derived once on the driver from
    ``h60("p:d")`` parity — deterministic, engine-portable (any SQL
    engine can embed the same literal arrays), no stored plane
    matrix."""
    from graphscope_spark.functions.text import h60_py

    return [
        [1.0 if h60_py(f"{p}:{d}") & 1 else -1.0 for d in range(dim)]
        for p in range(num_planes)
    ]


def hyperplane_signs(
    df: DataFrame,
    num_planes: int = 12,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``(id, sig long)`` — sign pattern of the vector against
    ``num_planes`` deterministic pseudo-random hyperplanes
    (:func:`plane_coefs`); the per-row work is a JVM-side literal-array
    dot product inside whole-stage codegen."""
    coefs = plane_coefs(num_planes, dim)
    v = _as_double(vec_col)
    sig = F.lit(0).cast("long")
    for p in range(num_planes):
        proj = _dot(v, F.array(*[F.lit(c) for c in coefs[p]]))
        sig = sig + F.when(proj > 0, F.lit(1).cast("long") * (2 ** p)).otherwise(
            F.lit(0).cast("long")
        )
    return df.select(F.col(id_col), sig.alias("sig"))


def cosine_lsh_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    num_planes: int = 12,
    bands: int = 3,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN near-pairs via hyperplane LSH: bucket on band sign-chunks,
    exact cosine only on candidates.  Returns ``(id_a, id_b, cos)``
    with cosine ≥ threshold (recall < 1 by construction; the tradeoff
    knobs are num_planes/bands)."""
    sigs = hyperplane_signs(df, num_planes, dim, id_col, vec_col)
    width = num_planes // bands
    parts = []
    for b in range(bands):
        chunk = F.shiftright(F.col("sig"), b * width).bitwiseAND(
            (1 << width) - 1
        )
        parts.append(
            sigs.select(F.col(id_col), F.lit(b).alias("band"),
                        chunk.alias("bucket"))
        )
    buckets = parts[0]
    for p in parts[1:]:
        buckets = buckets.unionByName(p)
    cands = (
        buckets.alias("x")
        .join(buckets.alias("y"), ["band", "bucket"])
        .where(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .select(
            F.col(f"x.{id_col}").alias("id_a"),
            F.col(f"y.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    v = df.select(
        F.col(id_col), _as_double(vec_col).alias("v")
    ).withColumn("n", F.sqrt(_dot(F.col("v"), F.col("v"))))
    return (
        cands.join(v.select(F.col(id_col).alias("id_a"),
                            F.col("v").alias("va"),
                            F.col("n").alias("na")), "id_a")
        .join(v.select(F.col(id_col).alias("id_b"),
                       F.col("v").alias("vb"),
                       F.col("n").alias("nb")), "id_b")
        .withColumn(
            "cos",
            _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")),
        )
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 6).alias("cos"))
    )


def ivf_assign(
    corpus: DataFrame,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """IVF coarse quantizer: ``(centroids, assignment)``.

    Centroids are ``n_centroids`` corpus vectors picked by smallest
    ``h60("c:" || id)`` — a deterministic sample standing in for a
    k-means codebook (FAISS trains IVF on a sample; the sampled-seed
    coarse quantizer keeps every distance a fold over ORIGINAL float
    values, so a SQL oracle is bit-identical — no float-mean drift).
    Every corpus vector is assigned to its max-cosine centroid
    (6-dp rounded, ties to the smallest centroid index).

    Scale shape: centroids are broadcast (tiny), assignment is one
    map-side pass over the corpus — no shuffle; the posting lists are
    the corpus partitioned by ``cid``.
    """
    from graphscope_spark.functions.text import h60

    c = corpus.select(
        F.col(id_col), _as_double(vec_col).alias("v")
    ).withColumn("n", F.sqrt(_dot(F.col("v"), F.col("v"))))
    seeds = (
        c.withColumn(
            "hp", h60(F.concat(F.lit("c:"), F.col(id_col).cast("string")))
        )
        .orderBy("hp", id_col)
        .limit(n_centroids)
    )
    wc = Window.orderBy("hp", id_col)
    cent = seeds.select(
        (F.row_number().over(wc) - 1).alias("cid"),
        F.col("v").alias("cv"),
        F.col("n").alias("cn"),
    )
    scored = c.crossJoin(F.broadcast(cent)).withColumn(
        "ccos",
        F.round(_dot(F.col("v"), F.col("cv")) / (F.col("n") * F.col("cn")), 6),
    )
    wa = Window.partitionBy(id_col).orderBy(F.desc("ccos"), F.asc("cid"))
    assign = (
        scored.withColumn("rn", F.row_number().over(wa))
        .where(F.col("rn") == 1)
        .select(id_col, "cid", "v", "n")
    )
    return cent, assign


def semantic_dedup(
    corpus: DataFrame,
    threshold: float = 0.4,
    n_centroids: int = 8,
    max_cluster_size: int = 100_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding corpus with the IVF
    coarse quantizer, then WITHIN each cluster mark a vector as a
    duplicate when some lower-id cluster-mate has cosine ≥ threshold.
    Returns ``(vec_id, cid, keep)`` — ``keep = false`` rows are the
    semantic duplicates to drop.

    Scale shape (the whole point of the method): the quadratic
    pair-compare runs per-cluster, never corpus-wide — at 100 TB,
    ``n_centroids`` grows with the corpus (SemDeDup uses ~50k k-means
    clusters for LAION) so cluster sizes stay bounded; this
    implementation reuses :func:`ivf_assign`'s deterministic
    h60-seeded quantizer so a SQL oracle reproduces the exact same
    clusters and decisions.  ``max_cluster_size`` is the explicit
    skew guard: a cluster larger than it fails loudly instead of
    silently going quadratic (raise ``n_centroids`` or pre-shard).

    Determinism contract matches the rest of this module: 6-dp
    rounded cosines, keeper = smallest id (transitive chains keep
    exactly the per-cluster minima of each ≥-threshold pair graph's
    "dominated" relation — a vector is dropped iff ANY smaller-id
    mate clears the threshold, not only the group representative).
    """
    cent, assign = ivf_assign(corpus, n_centroids, id_col, vec_col)
    # persist: the guard scan, the pair compare (both sides), and the
    # final decision join all read the assignment (same convention as
    # the LSH bucket/shingle persists in functions/dedup.py).  The
    # cache is intentionally retained after return — the result is
    # lazy and re-executes against it; long-lived sessions doing many
    # dedup passes should spark.catalog.clearCache() between corpora
    # (Spark also evicts LRU under storage pressure).
    assign = assign.persist()
    too_big = (
        assign.groupBy("cid").count()
        .where(F.col("count") > max_cluster_size)
        .limit(1).collect()
    )
    if too_big:
        assign.unpersist()
        raise ValueError(
            f"semantic_dedup: cluster {too_big[0]['cid']} has "
            f"{too_big[0]['count']} > max_cluster_size="
            f"{max_cluster_size} vectors; raise n_centroids so the "
            f"per-cluster pair-compare stays bounded"
        )
    a = assign.select(
        F.col("cid"), F.col(id_col).alias("id_a"),
        F.col("v").alias("va"), F.col("n").alias("na"),
    )
    b = assign.select(
        F.col("cid"), F.col(id_col).alias("id_b"),
        F.col("v").alias("vb"), F.col("n").alias("nb"),
    )
    dropped = (
        a.join(b, "cid")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cos",
            F.round(
                _dot(F.col("va"), F.col("vb"))
                / (F.col("na") * F.col("nb")), 6,
            ),
        )
        .where(F.col("cos") >= threshold)
        .select(F.col("id_b").alias(id_col))
        .distinct()
        .withColumn("dup", F.lit(True))
    )
    return (
        assign.select(id_col, "cid")
        .join(dropped, id_col, "left")
        .select(
            id_col, "cid",
            F.coalesce(~F.col("dup"), F.lit(True)).alias("keep"),
        )
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF-flat approximate top-k: ``(query_id, vec_id, cos)``.

    The 100 TB scale path for similarity search alongside
    ``cosine_lsh_pairs``: each query probes its ``n_probe`` nearest
    centroids and exact-reranks ONLY the vectors assigned to those
    posting lists — candidate work is ~``n_probe/n_centroids`` of the
    corpus instead of all of it.  With ``n_probe == n_centroids`` the
    search is exhaustive and equals ``cosine_topk`` exactly (tested).
    Same determinism contract as ``cosine_topk``: 6-dp rounded cosine,
    ties by ascending neighbor id; recall < 1 by construction for
    ``n_probe < n_centroids``, and the oracle reproduces the identical
    probe set so the compare is exact.
    """
    cent, assign = ivf_assign(corpus, n_centroids, id_col, vec_col)
    q = queries.select(
        F.col(query_id_col), _as_double(vec_col).alias("qv")
    ).withColumn("qn", F.sqrt(_dot(F.col("qv"), F.col("qv"))))
    qscored = q.crossJoin(F.broadcast(cent)).withColumn(
        "ccos",
        F.round(
            _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6
        ),
    )
    wq = Window.partitionBy(query_id_col).orderBy(
        F.desc("ccos"), F.asc("cid")
    )
    probes = (
        qscored.withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= n_probe)
        .select(query_id_col, "cid", "qv", "qn")
    )
    cand = (
        probes.join(assign, "cid")
        .where(F.col(id_col) != F.col(query_id_col))
        .withColumn(
            "cos",
            F.round(
                _dot(F.col("v"), F.col("qv")) / (F.col("n") * F.col("qn")), 6
            ),
        )
    )
    wk = Window.partitionBy(query_id_col).orderBy(
        F.desc("cos"), F.asc(id_col)
    )
    return (
        cand.withColumn("rn", F.row_number().over(wk))
        .where(F.col("rn") <= k)
        .select(query_id_col, id_col, "cos")
    )
