"""Property-based fuzz of the Cypher expression compiler: random
arithmetic comparison trees are rendered both as a Cypher WHERE
string and as a Python predicate, and the filtered edge sets must
agree.  Parentheses are emitted around every node, so the
boolean-vs-arithmetic '(' backtracking path is exercised on each
example."""
from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from graphscope_spark.cypher import cypher
from graphscope_spark.graph import Graph

VERTS = [(i, (i * 3) % 7 - 2) for i in range(8)]  # num in [-2, 4]
EDGES = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7),
         (7, 0), (0, 4), (2, 6)]


@pytest.fixture(scope="module")
def fuzz_graph(spark):
    v = spark.createDataFrame(VERTS, "id long, num long")
    e = spark.createDataFrame(EDGES, "src long, dst long")
    return Graph.from_edges(e, directed=True, vertices=v,
                            num_partitions=2)


# leaves: vertex properties or small literals; (cypher text, py fn)
_leaf = st.sampled_from(
    [("a.num", lambda a, b: a), ("b.num", lambda a, b: b)]
    + [(str(k), lambda a, b, k=k: k) for k in range(0, 6)]
)
_arith_op = st.sampled_from(
    [("+", lambda x, y: x + y), ("-", lambda x, y: x - y),
     ("*", lambda x, y: x * y)]
)


def _node(children):
    return st.tuples(children, _arith_op, children).map(
        lambda t: (
            f"({t[0][0]} {t[1][0]} {t[2][0]})",
            lambda a, b, l=t[0][1], op=t[1][1], r=t[2][1]:
                op(l(a, b), r(a, b)),
        )
    )


_expr = st.recursive(_leaf, _node, max_leaves=4)
_cmp = st.sampled_from(
    [("=", lambda x, y: x == y), ("<>", lambda x, y: x != y),
     ("<", lambda x, y: x < y), (">", lambda x, y: x > y),
     ("<=", lambda x, y: x <= y), (">=", lambda x, y: x >= y)]
)


@settings(max_examples=10, deadline=None)
@given(_expr, _cmp, _expr)
def test_random_arithmetic_where_matches_python(fuzz_graph, lhs, cmp,
                                                rhs):
    num = dict(VERTS)
    q = (f"MATCH (a)-->(b) WHERE {lhs[0]} {cmp[0]} {rhs[0]} "
         "RETURN a, b")
    got = sorted((r["a"], r["b"])
                 for r in cypher(fuzz_graph, q).collect())
    want = sorted(
        (a, b) for a, b in EDGES
        if cmp[1](lhs[1](num[a], num[b]), rhs[1](num[a], num[b]))
    )
    assert got == want, q


def test_division_and_modulo_fixed_cases(fuzz_graph):
    num = dict(VERTS)
    q = "MATCH (a)-->(b) WHERE a.num % 2 = 0 RETURN a, b"
    got = sorted((r["a"], r["b"])
                 for r in cypher(fuzz_graph, q).collect())
    # Spark % keeps the dividend's sign, like Python's math.fmod —
    # compare via int(math.fmod(..)) semantics (num may be negative)
    import math

    want = sorted((a, b) for a, b in EDGES
                  if int(math.fmod(num[a], 2)) == 0)
    assert got == want
    # '/' is float division (documented divergence from Neo4j)
    q = "MATCH (a)-->(b) WHERE b.num / 2 > 1 RETURN a, b"
    got = sorted((r["a"], r["b"])
                 for r in cypher(fuzz_graph, q).collect())
    want = sorted((a, b) for a, b in EDGES if num[b] / 2 > 1)
    assert got == want
