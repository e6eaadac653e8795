"""Curation operators: benchmark decontamination + stratified sample."""
import pytest
from pyspark.sql import functions as F

from graphscope_spark.functions.curation import (
    decontaminate,
    stratified_sample,
    stratum_counts,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # benchmark: two eval questions
        (0, "the quick brown fox jumps over the lazy dog", "bench"),
        (1, "colorless green ideas sleep furiously tonight", "bench"),
        # train: verbatim leak of doc 0
        (10, "the quick brown fox jumps over the lazy dog", "train"),
        # train: partial leak (shares a 3-gram window)
        (11, "the quick brown fox went home early today", "train"),
        # train: clean
        (12, "completely unrelated text about spark dataframes here", "train"),
        # train: too short for any 3-gram
        (13, "hi there", "train"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "split"])


def test_decontaminate_flags_leaks(docs):
    out = decontaminate(
        docs.where(F.col("split") == "train"),
        docs.where(F.col("split") == "bench"),
        n=3,
        min_ratio=0.2,
    )
    by_id = {r["doc_id"]: r for r in out.collect()}
    assert set(by_id) == {10, 11, 12, 13}
    # verbatim copy: every shingle matched
    assert by_id[10]["matched"] == by_id[10]["total"] > 0
    assert by_id[10]["contaminated"] and by_id[10]["overlap_ratio"] == 1.0
    # partial leak: some but not all shingles matched, above threshold
    assert 0 < by_id[11]["matched"] < by_id[11]["total"]
    assert by_id[11]["contaminated"]
    # clean and too-short docs are kept with zero / empty overlap
    assert by_id[12]["matched"] == 0 and not by_id[12]["contaminated"]
    assert by_id[13]["total"] == 0 and not by_id[13]["contaminated"]
    assert by_id[13]["overlap_ratio"] == 0.0


def test_decontaminate_broadcasts_benchmark(docs):
    out = decontaminate(
        docs.where(F.col("split") == "train"),
        docs.where(F.col("split") == "bench"),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" not in plan


def test_stratified_sample_deterministic_and_stable(spark):
    rows = [(i, "en" if i % 3 else "de") for i in range(600)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    rates = {"en": 0.25, "de": 0.9}
    a = sorted(r["doc_id"] for r in stratified_sample(df, "lang", rates).collect())
    # identical membership after an arbitrary repartition (sampleBy
    # would reshuffle here — this is the property under test)
    b = sorted(
        r["doc_id"]
        for r in stratified_sample(
            df.repartition(7, "lang"), "lang", rates
        ).collect()
    )
    assert a == b and len(a) > 0
    counts = {
        r["stratum"]: r["n_docs"]
        for r in stratum_counts(
            stratified_sample(df, "lang", rates), "lang"
        ).collect()
    }
    # 400 en @ .25 ≈ 100, 200 de @ .9 ≈ 180 — allow Bernoulli spread
    assert 60 <= counts["en"] <= 140
    assert 150 <= counts["de"] <= 200


def test_stratified_sample_default_rate_zero(spark):
    df = spark.createDataFrame(
        [(1, "en"), (2, "xx")], ["doc_id", "lang"]
    )
    out = stratified_sample(df, "lang", {"en": 1.0})
    assert [r["doc_id"] for r in out.collect()] == [1]


def test_repetition_stats_planted(spark):
    from graphscope_spark.functions.text import repetition_stats

    rows = [
        (1, "a b a b a b a b"),            # "a b" bigram dominates
        (2, "w x y z"),                    # all bigrams unique
        (3, "solo"),                       # no bigram
        (4, ""),                           # empty
    ]
    out = {
        r["doc_id"]: r
        for r in repetition_stats(
            spark.createDataFrame(rows, ["doc_id", "text"])
        ).collect()
    }
    # doc 1: 8 tokens, 2 distinct, 7 bigrams = {a b:4, b a:3}
    assert out[1]["n_tokens"] == 8 and out[1]["n_distinct"] == 2
    assert out[1]["top_bigram_cnt"] == 4
    assert out[1]["top_bigram_frac"] == pytest.approx(4 / 7, abs=1e-6)
    assert out[2]["top_bigram_cnt"] == 1
    assert out[3]["n_tokens"] == 1 and out[3]["top_bigram_cnt"] == 0
    assert out[3]["top_bigram_frac"] == 0.0
    assert out[4]["n_tokens"] == 0 and out[4]["distinct_ratio"] == 0.0


def test_repetition_stats_no_shuffle(spark):
    from graphscope_spark.functions.text import repetition_stats

    df = spark.createDataFrame([(1, "a b c a b")], ["doc_id", "text"])
    plan = (
        repetition_stats(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_pack_sequences_matches_serial_cumsum(spark):
    from graphscope_spark.functions.curation import pack_sequences

    rows = [(i, " ".join(["tok"] * (3 + i % 7))) for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in pack_sequences(df, window=16, num_partitions=8).collect()
    }
    off = 0
    for i in range(200):
        n = 3 + i % 7
        assert out[i]["n_tokens"] == n
        assert out[i]["token_offset"] == off, i
        assert out[i]["bin_id"] == off // 16
        off += n
    # identical result at a different parallelism (two-phase scan is
    # partition-count invariant)
    out3 = {
        r["doc_id"]: r["token_offset"]
        for r in pack_sequences(df, window=16, num_partitions=3).collect()
    }
    assert out3 == {k: v["token_offset"] for k, v in out.items()}


def test_pii_scrub_planted_cross_engine(spark):
    from graphscope_spark.functions.text import pii_scrub
    from graphscope_spark.entry import _pii_scrub_sql
    import duckdb

    rows = [
        (1, "contact me at alice.smith+work@example.co.uk please"),
        (2, "server at 10.0.255.3 and backup 192.168.1.17 are up"),
        (3, "call +4915123456789 or write bob@test.io from 8.8.8.8"),
        (4, "no pii here at all"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert got[1]["n_email"] == 1 and "<EMAIL>" in got[1]["text_clean"]
    assert "alice" not in got[1]["text_clean"]
    assert got[2]["n_ip"] == 2 and got[2]["text_clean"].count("<IP>") == 2
    assert got[3]["n_phone"] == 1 and got[3]["n_email"] == 1
    assert got[3]["n_ip"] == 1
    assert got[4]["text_clean"] == rows[3][1]
    # the DuckDB oracle agrees on planted PII (the parquet corpus has
    # none, so the registered compare alone wouldn't exercise this)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({i}, '{t}')" for i, t in rows
        )
        + ") AS t(doc_id, text)"
    )
    oracle = {r[0]: r for r in con.execute(_pii_scrub_sql()).fetchall()}
    for i in got:
        assert oracle[i][1] == got[i]["text_clean"], i
        assert oracle[i][2:] == (
            got[i]["n_email"], got[i]["n_ip"], got[i]["n_phone"]
        ), i
