"""Duplicate-span removal (functions/dedup.remove_duplicated_spans):
first-occurrence-wins window dedup, hand-checked on tiny corpora."""
from __future__ import annotations

from graphscope_spark.functions.dedup import remove_duplicated_spans


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r["doc_id"]: (r["text"], r["n_removed"])
        for r in remove_duplicated_spans(df, **kw).collect()
    }


def test_shared_prefix_removed_from_later_doc(spark):
    shared = "one two three four five six"
    rows = [(1, shared + " tail alpha"), (2, shared + " tail beta")]
    out = _run(spark, rows, n=5, min_docs=2)
    # doc 1 owns every duplicated window and keeps its text verbatim
    assert out[1] == (shared + " tail alpha", 0)
    # doc 2: windows 0-1 ("one..six") and 2 ("three..tail") all
    # duplicate -> positions 0..6 covered; only "beta" survives
    assert out[2] == ("beta", 7)


def test_no_cross_doc_duplicates_is_identity(spark):
    rows = [(1, "a b c d e f"), (2, "g h i j k l")]
    out = _run(spark, rows, n=5, min_docs=2)
    assert out[1] == ("a b c d e f", 0)
    assert out[2] == ("g h i j k l", 0)


def test_short_docs_pass_through(spark):
    rows = [(1, "same same same same"), (2, "same same same same")]
    out = _run(spark, rows, n=5, min_docs=2)  # 4 tokens < n=5
    assert out[1][1] == 0 and out[2][1] == 0


def test_within_doc_repeat_not_removed(spark):
    rows = [(1, "x y z w v x y z w v"), (2, "totally different words here now")]
    out = _run(spark, rows, n=5, min_docs=2)
    assert out[1][1] == 0  # the repeat is within ONE doc


def test_identical_docs_empty_the_later_one(spark):
    t = "the same full document text repeated verbatim"
    out = _run(spark, [(1, t), (2, t)], n=5, min_docs=2)
    assert out[1] == (t, 0)
    assert out[2] == ("", 7)


def test_empty_text_survives(spark):
    out = _run(spark, [(1, ""), (2, "some words")], n=5, min_docs=2)
    assert out[1] == ("", 0)
