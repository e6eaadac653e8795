"""Edge-mining pipeline: sha256 row invariant (BASELINE.json:input_hint
— per-row ``content`` sha256 equality vs the raw table), native vs
Arrow-UDF extraction parity, and mined-edge correctness vs a
pure-Python re-implementation of the per-language import regexes."""

import hashlib
import re

import pytest

from graphscope_spark.sources.miner import (
    IMPORT_PATTERNS,
    mine_edges,
    repo_dictionary,
)
from graphscope_spark.sources.synthetic import gen_code_table, repo_token


@pytest.fixture(scope="module")
def code_rows():
    return gen_code_table(n_repos=60, files_per_repo=3, seed=5)


@pytest.fixture(scope="module")
def code_df(spark, code_rows):
    return spark.createDataFrame(code_rows)


def test_sha256_invariant(spark, code_df, code_rows):
    files, _ = mine_edges(code_df)
    got = {
        (r["repo"], r["path"]): r["sha256"] for r in files.collect()
    }
    assert len(got) == len(code_rows)
    for row in code_rows:
        expect = hashlib.sha256(row["content"].encode()).hexdigest()
        assert got[(row["repo"], row["path"])] == expect


def test_native_vs_arrow_udf_parity(spark, code_df):
    f_native, e_native = mine_edges(code_df, use_arrow_udf=False)
    f_arrow, e_arrow = mine_edges(code_df, use_arrow_udf=True)
    n = {
        (r["repo"], r["path"]): sorted(r["dep_tokens"])
        for r in f_native.collect()
    }
    a = {
        (r["repo"], r["path"]): sorted(r["dep_tokens"])
        for r in f_arrow.collect()
    }
    assert n == a
    assert sorted(map(tuple, e_native.collect())) == sorted(
        map(tuple, e_arrow.collect())
    )


def test_mined_edges_match_python_oracle(spark, code_df, code_rows):
    _, edges = mine_edges(code_df)
    got = {(r["src_repo"], r["dst_repo"]) for r in edges.collect()}
    tokens_to_repo = {
        repo_token(row["repo"]): row["repo"] for row in code_rows
    }
    want = set()
    for row in code_rows:
        pat = IMPORT_PATTERNS[row["lang"]]
        for tok in re.findall(pat, row["content"]):
            dst = tokens_to_repo.get(tok)
            if dst and dst != row["repo"]:
                want.add((row["repo"], dst))
    assert got == want and len(want) > 0


def test_repo_dictionary_roundtrip(spark, code_df, code_rows):
    d = {r["token"]: r["repo"] for r in repo_dictionary(code_df).collect()}
    for row in code_rows:
        assert d[repo_token(row["repo"])] == row["repo"]


def test_from_string_edges_default_column_names(spark):
    """The defaults src_col='src'/dst_col='dst' — i.e. a string edge
    table whose columns are literally src/dst — must work (previously
    renaming vmap's id onto the existing column raised
    AMBIGUOUS_REFERENCE)."""
    from graphscope_spark.graph import Graph

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c")], "src string, dst string"
    )
    g, vmap = Graph.from_string_edges(edges)
    ids = {r["oid"]: r["id"] for r in vmap.collect()}
    assert set(ids) == {"a", "b", "c"}
    got = {(r["src"], r["dst"]) for r in g.edges.collect()}
    want = {(ids["a"], ids["b"]), (ids["b"], ids["c"]), (ids["a"], ids["c"])}
    assert got == want
    # extra columns ride through
    edges2 = spark.createDataFrame(
        [("a", "b", 2.0)], "src string, dst string, w double"
    )
    g2, vmap2 = Graph.from_string_edges(edges2)
    assert g2.edges.columns == ["src", "dst", "w"]
