"""Large-scale training-data pipeline operators.

Beyond the reference's graph apps (SURVEY.md §2), these are the
operations a 100 TB training-data pipeline needs, built Spark-first:

- ``text``      — token counting, quality scoring, language ID,
                  document fingerprinting (all JVM-side expressions);
- ``dedup``     — exact, MinHash+LSH, SimHash, n-gram Jaccard,
                  embedding-cosine near-dup;
- ``similarity``— brute-force cosine top-k + LSH-bucketed ANN;
- ``multimodal``— binary-column plumbing with Arrow-batched
                  ``mapInPandas`` feature extraction (decode stubbed,
                  everything around it real).

Design rule: every hot path is a Catalyst expression (whole-stage
codegen) or an Arrow-batched pandas UDF; nothing is per-row Python.
All hash functions are md5-derived 60-bit integers so independent
engines (the DuckDB oracle) can reproduce signatures bit-for-bit.
"""
