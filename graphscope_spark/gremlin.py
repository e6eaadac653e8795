"""Gremlin string front-end (subset) — parses the traversal-string
queries a GraphScope interactive session executes
(``python/graphscope/interactive/query.py:103-143`` submits strings
like ``g.V().has('name', x).out().out().count()`` to GIE;
``interactive_engine/compiler`` lowers them to dataflow ops) and
compiles them onto the fluent :mod:`graphscope_spark.gie` surface —
i.e. to the SAME lazy DataFrame plan the equivalent fluent calls
build.  No ``eval``: a hand-rolled tokenizer splits the call chain
(paren-balanced, string-literal-aware) and arguments are parsed with
``ast.literal_eval`` only.

Supported steps (the shapes in the reference's interactive tests):
``V(ids…) E() has(prop[, value]) hasLabel(l) hasId(ids…)
out([label]) in([label]) both([label]) outE() inE() bothE() otherV()
bothV() dedup() limit(n) repeat(out()).times(k) values(prop…)
valueMap(prop…) as('a') select('a'[, 'b']) order()[.by('prop')]
coin(p) groupCount() count() path()``.  ``path()`` auto-enables path
tracking on the source step; ``coin`` is the deterministic h60
pseudo-coin, not ``rand()``.
"""
from __future__ import annotations

import ast

from .gie import GraphTraversalSource, Traversal, traversal
from .graph import Graph

#: step-name → fluent-method translation (Python keywords / clashes)
_RENAME = {"in": "in_", "where": "where_", "as": "as_",
           "select": "select_"}

#: steps that need no reflection-special handling and take literal args
_PLAIN = {
    "has", "hasId", "out", "in_", "both", "outE", "inE", "bothE",
    "otherV", "bothV", "dedup", "limit", "groupCount", "values",
    "valueMap", "count", "path", "toList", "as_", "select_", "coin",
    "shortestPath", "simplePath",
}


def _split_calls(query: str) -> list[tuple[str, str]]:
    """``"g.V(1).out().count()"`` → ``[("g", ""), ("V", "1"),
    ("out", ""), ("count", "")]`` — paren-balanced, quote-aware."""
    calls: list[tuple[str, str]] = []
    i, n = 0, len(query)
    while i < n:
        if query[i] == ".":
            i += 1
            continue
        j = i
        while j < n and (query[j].isalnum() or query[j] == "_"):
            j += 1
        name = query[i:j]
        if not name:
            raise ValueError(f"parse error at {query[i:i+20]!r}")
        if j >= n or query[j] != "(":  # bare identifier (the source g)
            calls.append((name, ""))
            i = j
            continue
        depth, k, quote = 0, j, None
        while k < n:
            ch = query[k]
            if quote:
                if ch == quote and query[k - 1] != "\\":
                    quote = None
            elif ch in "'\"":
                quote = ch
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    break
            k += 1
        if depth != 0:
            raise ValueError(f"unbalanced parens in {query!r}")
        calls.append((name, query[j + 1:k].strip()))
        i = k + 1
    return calls


def _args(argstr: str):
    """Literal argument tuple via ``ast.literal_eval`` — never eval."""
    if not argstr:
        return ()
    parsed = ast.literal_eval(f"({argstr},)")
    return parsed


def gremlin(graph: Graph, query: str):
    """Execute a Gremlin query STRING against a graph: compiles to the
    fluent :class:`~graphscope_spark.gie.Traversal` chain (same lazy
    DataFrame plan) and returns whatever the terminal step returns —
    an ``int`` for ``count()``, a DataFrame for ``values()`` /
    ``groupCount()`` / ``path()``, the ``Traversal`` itself when the
    string has no terminal."""
    calls = _split_calls(query.strip())
    if not calls or calls[0][0] != "g":
        raise ValueError("query must start with 'g.'")
    calls = calls[1:]
    if not calls or calls[0][0] not in ("V", "E"):
        raise ValueError("traversal must start with g.V(...) or g.E()")
    g: GraphTraversalSource = traversal(graph)
    wants_path = any(name in ("path", "simplePath") for name, _ in calls)
    src_name, src_args = calls[0]
    if src_name == "V":
        t: Traversal = g.V(*_args(src_args), track_path=wants_path)
    else:
        t = g.E(track_path=wants_path)
    out = t
    i = 1
    while i < len(calls):
        name, argstr = calls[i]
        name = _RENAME.get(name, name)
        if name == "hasLabel":
            out = out.has("label", *_args(argstr))
        elif name == "order":
            # order() / order().by('prop')
            prop = None
            if i + 1 < len(calls) and calls[i + 1][0] == "by":
                (prop,) = _args(calls[i + 1][1])
                i += 1
            out = out.order_by(prop)
        elif name == "repeat":
            inner = _split_calls(argstr)
            if len(inner) != 1 or inner[0][1]:
                raise ValueError(
                    f"repeat() supports a single bare step, got {argstr!r}"
                )
            step = _RENAME.get(inner[0][0], inner[0][0])
            emit = False
            if i + 1 < len(calls) and calls[i + 1][0] == "emit":
                if calls[i + 1][1]:
                    raise ValueError(
                        "emit() with a predicate argument is not "
                        f"supported, got emit({calls[i + 1][1]})"
                    )
                emit = True
                i += 1
            if i + 1 >= len(calls) or calls[i + 1][0] != "times":
                raise ValueError(
                    "repeat(...) must be followed by .times(k) "
                    "(optionally .emit().times(k))"
                )
            (k,) = _args(calls[i + 1][1])
            out = out.repeat(step, int(k), emit=emit)
            i += 2
            continue
        elif name in _PLAIN:
            out = getattr(out, name)(*_args(argstr))
        else:
            raise ValueError(f"unsupported step {name!r}")
        i += 1
    return out
