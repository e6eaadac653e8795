"""Large-scale training-data pipeline operators.

Beyond the reference's graph apps (SURVEY.md §2), these are the
operations a 100 TB training-data pipeline needs, built Spark-first:

- ``text``      — token counting, quality scoring, language ID,
                  document fingerprinting (all JVM-side expressions);
- ``quality``   — published rule/model filters: Gopher A1.1 rules,
                  C4 line/page cleaning, vocabulary top-k, CCNet
                  bigram-LM scoring, DSIR importance weights +
                  Gumbel-top-k resampling;
- ``dedup``     — exact, MinHash+LSH, SimHash, n-gram Jaccard,
                  embedding-cosine near-dup; duplicated-line and
                  duplicate-span removal;
- ``similarity``— brute-force cosine top-k + LSH-bucketed ANN,
                  IVF-flat posting lists, SemDeDup semantic dedup;
- ``multimodal``— binary-column plumbing with Arrow-batched
                  ``mapInPandas`` feature extraction (decode stubbed,
                  everything around it real).

Design rule: every hot path is a Catalyst expression (whole-stage
codegen) or an Arrow-batched pandas UDF; nothing is per-row Python.
All hash functions are md5-derived 60-bit integers so independent
engines (the DuckDB oracle) can reproduce signatures bit-for-bit.
"""
