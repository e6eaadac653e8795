"""Text analysis operators: tokens, quality, language ID, fingerprint.

All pure Catalyst expressions — no Python in the row path, so at
100 TB these run inside whole-stage codegen directly over the parquet
scan with column pruning (only ``text`` + id columns read).

Hash convention used across the repo: ``h60(s) = first 15 hex chars
of md5(s) as a BIGINT`` — 60 bits, always positive, and reproducible
in any engine with an md5 function (the DuckDB oracle mirrors it as
``('0x' || substr(md5(s), 1, 15))::BIGINT``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# language marker words for the n-gram/stopword language heuristic;
# fixed order = deterministic tie-break (first max wins)
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit"],
    "en": ["the", "a", "of", "to", "and", "in", "is", "for"],
    "es": ["el", "los", "las", "una", "es", "y", "que", "por"],
    "fr": ["le", "les", "des", "est", "et", "dans", "pour", "que"],
}


def h60(col: Column) -> Column:
    """md5-derived 60-bit positive hash (engine-portable)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def h60_py(s: str) -> int:
    """Driver-side twin of :func:`h60` — same value for the same
    string, used to pre-derive deterministic constants (e.g. LSH
    hyperplane coefficients) once in Python instead of per row."""
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def norm_text(col: Column) -> Column:
    """Lowercase, collapse whitespace, trim — the canonical form used
    by fingerprints and shingles."""
    return F.lower(F.regexp_replace(F.trim(col), r"\s+", " "))


def tokens(col: Column) -> Column:
    """Whitespace tokens of the normalized text (empty text → [])."""
    return F.when(F.length(F.trim(col)) == 0, F.array().cast("array<string>")).otherwise(
        F.split(norm_text(col), " ")
    )


def token_count(col: Column) -> Column:
    return F.size(tokens(col)).cast("long")


def mean_word_len(toks: Column) -> Column:
    """Mean token length over a token array (0.0 when empty) —
    shared by :func:`text_stats` and ``quality.gopher_rules``."""
    n = F.size(toks)
    return F.when(
        n > 0,
        F.aggregate(
            F.transform(toks, lambda t: F.length(t).cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / n,
    ).otherwise(0.0)


def bpe_ish_token_count(col: Column) -> Column:
    """Count of BPE-ish units: alnum runs + individual non-alnum,
    non-space chars (the usual pre-tokenizer upper bound)."""
    return F.size(
        F.regexp_extract_all(col, F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"), 0)
    ).cast("long")


def punct_count(col: Column) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(r"[^A-Za-z0-9\s]"), 0)).cast(
        "long"
    )


def stopword_count(col: Column, words: list[str]) -> Column:
    return F.size(F.filter(tokens(col), lambda t: t.isin(*words))).cast("long")


def text_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document stats: ``(id, n_tokens, n_bpe, n_punct,
    mean_word_len, punct_ratio, quality)`` — quality is a [0,1] score
    from length/punct heuristics (Gopher-style filters)."""
    c = F.col(text_col)
    toks = tokens(c)
    n_tok = F.size(toks).cast("long")
    char_len = F.length(c).cast("long")
    mean_wl = mean_word_len(toks)
    n_punct = punct_count(c)
    punct_ratio = F.when(char_len > 0, n_punct / char_len).otherwise(0.0)
    quality = (
        F.when((n_tok >= 5) & (n_tok <= 100_000), 0.5).otherwise(0.0)
        + F.when((mean_wl >= 2.0) & (mean_wl <= 12.0), 0.3).otherwise(0.0)
        + F.when(punct_ratio <= 0.2, 0.2).otherwise(0.0)
    )
    return df.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        bpe_ish_token_count(c).alias("n_bpe"),
        n_punct.alias("n_punct"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(quality, 2).alias("quality"),
    )


#: PII patterns chosen to parse identically under Java regex (Spark)
#: and RE2 (DuckDB): character classes + bounded repetition + \b only.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{7,15}\b", "<PHONE>"),
]


def pii_clean(col: Column) -> Column:
    """The redaction chain over :data:`PII_PATTERNS`, as one Column —
    shared by :func:`pii_scrub` (batch table) and
    ``streaming.edge_stream.streaming_curation`` so the two surfaces
    can never diverge on pattern order."""
    clean = col
    for _, pat, repl in PII_PATTERNS:
        clean = F.regexp_replace(clean, pat, repl)
    return clean


def pii_scrub(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Redact emails / IPv4s / international phone numbers:
    ``(id, text_clean, n_email, n_ip, n_phone)``.

    Pure per-row projection (zero shuffle).  Patterns are applied in
    the fixed :data:`PII_PATTERNS` order in every engine, so the
    output is reproducible and exactly SQL-oracle-able.  A production
    pipeline swaps in stricter patterns; the operator shape (scan →
    regexp_count + chained regexp_replace) is what matters at scale.
    """
    c = F.col(text_col)
    counts = [
        F.regexp_count(c, F.lit(pat)).cast("long").alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    return df.select(
        F.col(id_col), pii_clean(c).alias("text_clean"), *counts
    )


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition signals: ``(id, n_tokens, n_distinct,
    distinct_ratio, top_bigram_cnt, top_bigram_frac)``.

    Deliberately a **pure projection** — the max-multiplicity bigram
    is found per row by sorting the row's bigram array and scanning
    for the longest equal-run with ``F.aggregate`` (O(b log b) inside
    codegen), instead of the naive explode → groupBy(doc, bigram) →
    max, which shuffles the entire exploded n-gram stream.  At 100 TB
    that difference is the whole job: this version reads the text
    column once and never exchanges a row.

    Ratios use the integer floor-quantiser (×1e6) shared with
    :mod:`.curation` so the DuckDB oracle is bit-identical.
    """
    toks = tokens(F.col(text_col))
    n_tok = F.size(toks).cast("long")
    n_distinct = F.size(F.array_distinct(toks)).cast("long")
    bigrams = F.array_sort(
        F.when(
            F.size(toks) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - 1),
                lambda i: F.concat_ws(" ", F.slice(toks, i, 2)),
            ),
        ).otherwise(F.array().cast("array<string>"))
    )
    top_cnt = F.aggregate(
        bigrams,
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1).cast("long"))
            .alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(
                    F.lit(1).cast("long")
                ),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    q6 = lambda num, den: F.when(  # noqa: E731
        den > 0,
        F.floor(num * 1000000.0 / den + F.lit(0.5)).cast("long") / 1000000.0,
    ).otherwise(0.0)
    return df.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        n_distinct.alias("n_distinct"),
        q6(n_distinct, n_tok).alias("distinct_ratio"),
        top_cnt.alias("top_bigram_cnt"),
        q6(top_cnt, n_tok - 1).alias("top_bigram_frac"),
    )


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Marker-word language ID: ``(id, lang_pred)``; 'und' when no
    marker hits.  Ties break to the alphabetically-first language
    (fixed iteration order of LANG_MARKERS)."""
    c = F.col(text_col)
    toks = tokens(c)
    langs = sorted(LANG_MARKERS)

    def contains(words):
        # one-arg lambda factory: F.filter treats a two-arg lambda as
        # (element, index), so the word list must be a closure
        return lambda t: t.isin(*words)

    # argmax(hits) with alphabetically-first tie-break: greatest over
    # structs (n, priority, lang) where earlier languages get higher
    # priority — struct comparison is fieldwise left-to-right
    structs = [
        F.struct(
            F.size(
                F.filter(toks, contains(LANG_MARKERS[lang]))
            ).cast("long").alias("n"),
            F.lit(len(langs) - 1 - i).alias("pri"),
            F.lit(lang).alias("lang"),
        )
        for i, lang in enumerate(langs)
    ]
    best = F.greatest(*structs)
    pred = F.when(best["n"] > 0, best["lang"]).otherwise(F.lit("und"))
    return df.select(F.col(id_col), pred.alias("lang_pred"))


def fingerprint(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Content fingerprint ``(id, fp long)`` — h60 of the normalized
    text; the document-level analog of the miner's per-row sha256
    invariant."""
    return df.select(
        F.col(id_col), h60(norm_text(F.col(text_col))).alias("fp")
    )
