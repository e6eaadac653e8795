"""Deterministic synthetic inputs (FIXTURES.md §1-2).

Three generators, all seeded and deterministic:

- ``gen_edges``: LDBC-p2p-like directed graphs (random + preferential
  attachment so hub-vertex skew paths are exercised) — pure Python,
  for tests;
- ``gen_powerlaw_edges_df``: DISTRIBUTED power-law graph built from
  ``spark.range`` + hash expressions (no driver loops) — for the
  at-scale bench legs (``bench.py`` big leg, ``jobs/*_job.py``);
- ``gen_code_table``: the source-code repository table
  ``(repo, path, commit, lang, content)`` per BASELINE.json:input_hint,
  whose files embed cross-repo import statements drawn from a Zipf
  target distribution — the input the mining pipeline turns into the
  dependency edge table.
"""

from __future__ import annotations

import hashlib
import random

TINY_VERTICES = list(range(11))
# triangle 0-1-2, dangling 3 (no out-edges), diamond-ish component
# {4,5,6,7}, small component {8,9}, isolated vertex 10 (FIXTURES.md §2)
TINY_EDGES = [
    (0, 1), (1, 2), (2, 0), (2, 3),
    (4, 5), (5, 6), (4, 6), (5, 7), (6, 7),
    (9, 8),
]


def gen_edges(
    n: int = 300,
    m: int = 1800,
    seed: int = 42,
    pref_attach: float = 0.6,
) -> tuple[list[int], list[tuple[int, int]]]:
    """p2p-like directed graph: ``pref_attach`` fraction of edge
    destinations chosen preferentially by current in-degree (Zipf-ish
    hubs), the rest uniform.  No self-loops, distinct edges, sorted
    output for run-to-run stability."""
    rng = random.Random(seed)
    vertices = list(range(n))
    edges: set[tuple[int, int]] = set()
    targets: list[int] = []  # multiset for preferential choice
    while len(edges) < m:
        u = rng.randrange(n)
        if targets and rng.random() < pref_attach:
            v = targets[rng.randrange(len(targets))]
        else:
            v = rng.randrange(n)
        if u == v or (u, v) in edges:
            continue
        edges.add((u, v))
        targets.append(v)
    return vertices, sorted(edges)


def gen_powerlaw_edges_df(
    spark, m: int, n: int, k: float = 3.0, seed: int = 42
):
    """Deterministic power-law-ish directed graph, generated
    DISTRIBUTED (``spark.range`` + hash expressions — generation
    itself scales with the cluster, no driver loops): src uniform over
    [0, n); ``dst = floor(n · u^k)`` with u uniform from a hash, so
    in-degree concentrates on low ids (hub skew like a real link
    graph; larger ``k`` = hotter hubs — the top vertex takes
    ~``(1/n)^(1/k)`` of all edges).  Self-loops dropped.  Same
    construction as ``jobs/pagerank_job.py``'s scaling-bench input."""
    from pyspark.sql import functions as F

    e = spark.range(m).select(
        F.pmod(F.xxhash64(F.col("id") + seed), n).alias("src"),
        F.floor(
            n
            * F.pow(
                F.pmod(F.xxhash64(F.col("id") + seed + 1), 1 << 20)
                / float(1 << 20),
                k,
            )
        ).cast("long").alias("dst"),
    )
    return e.where(F.col("src") != F.col("dst"))


def gen_weighted_edges(
    n: int = 300, m: int = 1800, seed: int = 42
) -> tuple[list[int], list[tuple[int, int, float]]]:
    vs, es = gen_edges(n, m, seed)
    rng = random.Random(seed + 1)
    return vs, [(u, v, round(rng.uniform(1.0, 10.0), 3)) for u, v in es]


LANG_IMPORT_TEMPLATES = {
    "python": "import {dep}\n",
    "java": "import com.{dep}.core.Lib;\n",
    "go": 'import "github.com/{dep}/pkg"\n',
    "rust": "use {dep}::prelude::*;\n",
}
LANG_BODY = {
    "python": "def handler_{i}(x):\n    return x * {i}\n",
    "java": "public class C{i} {{ int f() {{ return {i}; }} }}\n",
    "go": "func F{i}() int {{ return {i} }}\n",
    "rust": "pub fn f{i}() -> i64 {{ {i} }}\n",
}


def gen_code_table(
    n_repos: int = 200,
    files_per_repo: int = 5,
    seed: int = 42,
    zipf_s: float = 1.2,
) -> list[dict]:
    """Rows ``(repo, path, commit, lang, content)``; each file imports
    1-4 other repos, targets drawn from a Zipf(s) distribution over
    repo rank so a few hub repos dominate in-degree (FIXTURES.md §1).
    Deterministic for a given seed."""
    rng = random.Random(seed)
    langs = list(LANG_IMPORT_TEMPLATES)
    repos = [f"org/proj{i:04d}" for i in range(n_repos)]
    # Zipf weights over repo index (repo 0 = biggest hub)
    weights = [1.0 / (i + 1) ** zipf_s for i in range(n_repos)]
    rows = []
    for ri, repo in enumerate(repos):
        for fi in range(files_per_repo):
            lang = langs[rng.randrange(len(langs))]
            ext = {"python": "py", "java": "java", "go": "go", "rust": "rs"}[lang]
            n_imports = rng.randint(1, 4)
            deps = set()
            while len(deps) < n_imports:
                d = rng.choices(range(n_repos), weights=weights, k=1)[0]
                if d != ri:
                    deps.add(d)
            content = "".join(
                LANG_IMPORT_TEMPLATES[lang].format(
                    dep=repos[d].replace("org/", "").replace("/", "_")
                )
                for d in sorted(deps)
            ) + LANG_BODY[lang].format(i=fi)
            commit = hashlib.sha1(f"{repo}/{fi}/{seed}".encode()).hexdigest()
            rows.append(
                {
                    "repo": repo,
                    "path": f"src/mod{fi}/file{fi}.{ext}",
                    "commit": commit,
                    "lang": lang,
                    "content": content,
                }
            )
    return rows


def repo_token(repo: str) -> str:
    """The token a repo appears as inside import statements."""
    return repo.replace("org/", "").replace("/", "_")
