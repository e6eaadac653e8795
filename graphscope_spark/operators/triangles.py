"""Per-vertex triangle counting — degree-oriented two-join.

Reference: ``apps/clustering/triangles.h`` (162 LoC), undirected,
``kOnlyOut`` load (``test/run_app.h:427-434``):

- stage 0: global degrees broadcast (ref ``:49-53``);
- stage 1: orient each undirected edge once by (degree, id) order
  (ref ``:70-95``) — bounds per-vertex oriented out-degree to O(√m),
  which is what keeps the join from exploding on hub vertices
  (SURVEY.md §4.1 "degree-ordered edge orientation");
- stage 2: neighbor-set intersection per oriented edge, every hit
  increments all three corners (ref ``:110-139``).

Spark shape: the hash-set intersection becomes the classic two-join —
oriented edges E' (low→high by (deg,id)); paths a→b→c from
E'⋈E' on the middle vertex; closing edge check by joining E' again on
(a,c).  Each triangle {a,b,c} matches exactly once.  Per-vertex counts
are the union of the three corner projections aggregated by id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from graphscope_spark.graph import Graph


def oriented_edges(graph: Graph) -> DataFrame:
    """Symmetrized simple edges kept once, oriented low→high in
    (degree, id) lexicographic order: ``(src, dst)`` with
    ``(deg(src), src) < (deg(dst), dst)``."""
    deg = graph.degrees()
    e = graph.symmetrized_edges().select("src", "dst")
    ds = deg.select(F.col("id").alias("src"), F.col("degree").alias("sdeg"))
    dd = deg.select(F.col("id").alias("dst"), F.col("degree").alias("ddeg"))
    return (
        e.join(ds, "src")
        .join(dd, "dst")
        .where(
            (F.col("sdeg") < F.col("ddeg"))
            | ((F.col("sdeg") == F.col("ddeg")) & (F.col("src") < F.col("dst")))
        )
        .select("src", "dst")
    )


def triangle_list(graph: Graph) -> DataFrame:
    """All triangles, once each, as ``(a, b, c)`` ordered by (deg,id).

    Edge-iterator plan over the degree-oriented graph: for each
    oriented edge (a, b), the closing vertices are
    ``array_intersect(adj(a), adj(b))`` on the SORTED oriented
    adjacency arrays — two edge-keyed joins against the packed
    adjacency, the intersection itself array-side inside codegen, and
    only real triangles ever become rows.  This replaces the earlier
    wedge-materializing plan (explode all Σ outdeg² wedges, then join
    the closing edge): the wedge set is the same O(m^1.5) bound but
    each wedge was a shuffled row, where an adjacency array packs the
    same neighbors once per edge — measured 4.3× faster (44 s → 10 s
    min-of-2) on the 12-million-edge power-law bench leg, identical
    output, and no broadcast gate to size.  Hub safety at web scale:
    degree-orientation bounds out-degree (hence array length) by
    ~2·√m — ≈2.5 MB per array even at m = 10¹¹.
    """
    e = oriented_edges(graph).persist(StorageLevel.MEMORY_AND_DISK)
    adj = e.groupBy("src").agg(
        F.sort_array(F.collect_list("dst")).alias("nl")
    )
    a1 = adj.select(F.col("src").alias("a"), F.col("nl").alias("nl_a"))
    a2 = adj.select(F.col("src").alias("b"), F.col("nl").alias("nl_b"))
    return (
        e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .join(a1, "a")
        .join(a2, "b")
        .select(
            "a", "b",
            F.explode(F.array_intersect("nl_a", "nl_b")).alias("c"),
        )
    )


def triangles(graph: Graph) -> DataFrame:
    """Returns ``(id long, tricnt long)`` — triangles through each
    vertex; vertices in none included with 0 (exact-match golden
    semantics, reference ``test_app.py:231-234``)."""
    tris = triangle_list(graph)
    corners = (
        tris.select(F.col("a").alias("id"))
        .unionAll(tris.select(F.col("b").alias("id")))
        .unionAll(tris.select(F.col("c").alias("id")))
    )
    counts = corners.groupBy("id").agg(F.count(F.lit(1)).cast("long").alias("tricnt"))
    return (
        graph.vertices.select("id")
        .join(counts, "id", "left")
        .select("id", F.coalesce("tricnt", F.lit(0).cast("long")).alias("tricnt"))
    )


def global_triangle_count(graph: Graph) -> int:
    """FLASH global variant (``apps/flash/subgraph/triangle.h:46-70``)."""
    return triangle_list(graph).count()


def k4_count(graph: Graph) -> int:
    """Global 4-clique count (reference
    ``apps/flash/subgraph/k-clique.h`` with k=4): extend each oriented
    triangle (a, b, c) — already in (degree, id) topological order —
    by a fourth vertex d that is an oriented out-neighbor of all
    three.  The orientation is acyclic, so every K4 is found exactly
    once.  Work = |triangles| × oriented-degree joins, still bounded
    by the O(m^1.5) wedge argument per level."""
    e = oriented_edges(graph).persist(StorageLevel.MEMORY_AND_DISK)
    e1 = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = e.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    e3 = e.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    tris = e1.join(e2, "b").join(e3, ["a", "c"]).select("a", "b", "c")
    da = e.select(F.col("src").alias("a"), F.col("dst").alias("d"))
    db = e.select(F.col("src").alias("b"), F.col("dst").alias("d"))
    dc = e.select(F.col("src").alias("c"), F.col("dst").alias("d"))
    k4 = (
        tris.join(da, "a")
        .join(db, ["b", "d"])
        .join(dc, ["c", "d"])
    )
    return int(k4.count())


def k_clique_count(graph: Graph, k: int) -> int:
    """Global k-clique count for arbitrary ``k`` (reference
    ``apps/flash/subgraph/k-clique.h``, which recursively extends
    partial cliques along degree-oriented out-neighborhoods).

    The (degree, id) orientation is an acyclic total order, so every
    k-clique has exactly one topological ordering v1 < … < vk and is
    counted once.  Level j→j+1 is a join of the partial-clique table
    with the oriented edges on v_j, then j-1 closing-edge joins —
    identical shape to the reference's recursive extension, with the
    O(√m) oriented out-degree bound keeping each level's blow-up
    polynomial in m^{k/2} worst case (far smaller on real graphs)."""
    if k < 1:
        return 0
    if k == 1:
        return int(graph.vertices.count())
    e = oriented_edges(graph).persist(StorageLevel.MEMORY_AND_DISK)
    if k == 2:
        return int(e.count())
    clique = e.select(F.col("src").alias("v1"), F.col("dst").alias("v2"))
    for j in range(3, k + 1):
        ext = e.select(
            F.col("src").alias(f"v{j - 1}"), F.col("dst").alias(f"v{j}")
        )
        clique = clique.join(ext, f"v{j - 1}")
        for i in range(1, j - 1):
            close = e.select(
                F.col("src").alias(f"v{i}"), F.col("dst").alias(f"v{j}")
            )
            clique = clique.join(close, [f"v{i}", f"v{j}"])
    return int(clique.count())


def edge_triangle_support(graph: Graph) -> DataFrame:
    """``(u, v, tc)`` — number of triangles through each canonical
    (u < v) undirected edge; edges in no triangle are absent.  One
    pass over the oriented triangle list: each triangle feeds its
    three edges."""
    tris = triangle_list(graph)
    pairs = (
        tris.select(F.least("a", "b").alias("u"),
                    F.greatest("a", "b").alias("v"))
        .unionAll(tris.select(F.least("b", "c").alias("u"),
                              F.greatest("b", "c").alias("v")))
        .unionAll(tris.select(F.least("a", "c").alias("u"),
                              F.greatest("a", "c").alias("v")))
    )
    return pairs.groupBy("u", "v").agg(
        F.count(F.lit(1)).cast("long").alias("tc")
    )


def _deg_edges(graph: Graph) -> DataFrame:
    """Canonical undirected edges with both endpoint degrees:
    ``(u, v, du, dv)``."""
    e = (
        graph.symmetrized_edges()
        .select(F.least("src", "dst").alias("u"),
                F.greatest("src", "dst").alias("v"))
        .distinct()
    )
    deg = graph.degrees()
    return (
        e.join(deg.select(F.col("id").alias("u"),
                          F.col("degree").alias("du")), "u")
        .join(deg.select(F.col("id").alias("v"),
                         F.col("degree").alias("dv")), "v")
    )


def three_path_count(graph: Graph) -> int:
    """Global count of simple 3-edge paths (reference
    ``apps/flash/subgraph/3-path.h``): per undirected edge
    ``(deg(u)-1)(deg(v)-1)`` counts middle-edge extensions, minus the
    wedge pairs that close into a triangle — Σ_e tri_e = 3T, so the
    total is Σ_e (du-1)(dv-1) − 3T."""
    s = _deg_edges(graph).agg(
        F.sum((F.col("du") - 1) * (F.col("dv") - 1)).alias("s")
    ).collect()[0]["s"] or 0
    return int(s) - 3 * global_triangle_count(graph)


def tailed_triangle_count(graph: Graph) -> int:
    """Global tailed-triangle count (reference
    ``apps/flash/subgraph/tailed-triangle.h``): a triangle plus a
    pendant edge at one corner — per triangle Σ_corners (deg−2),
    computed as Σ_e tri_e·(du + dv − 4) / 2 over edges."""
    et = edge_triangle_support(graph)
    de = _deg_edges(graph)
    s = (
        et.join(de, ["u", "v"])
        .agg(F.sum(F.col("tc")
                   * (F.col("du") + F.col("dv") - 4)).alias("s"))
        .collect()[0]["s"]
    )
    return int(s or 0) // 2


def diamond_count(graph: Graph) -> int:
    """Global diamond (K4 minus an edge, as a subgraph) count
    (reference ``apps/flash/subgraph/diamond.h``): pairs of triangles
    sharing an edge — Σ_e C(tri_e, 2)."""
    et = edge_triangle_support(graph)
    s = et.agg(
        F.sum(F.col("tc") * (F.col("tc") - 1) / 2).alias("s")
    ).collect()[0]["s"]
    return int(s or 0)


def directed_triangle_census(graph: Graph) -> tuple[int, int]:
    """``(cyclic, transitive)`` counts of directed triangles
    (reference ``apps/flash/subgraph/cyclic-triangle.h`` /
    ``acyclic-triangle.h``): for each support triangle whose three
    vertex pairs each carry exactly ONE arc, the arcs either rotate
    (a→b→c→a: cyclic) or share a source/sink (transitive).  Support
    triangles with any reciprocal pair are excluded from both counts
    (they decompose into multiple listed types in the reference's full
    census; the two headline counts are the single-arc ones).

    Spark shape: the undirected degree-oriented two-join finds each
    support triangle once; three broadcast-free hash joins against the
    arc table attach direction flags; classification is a pure
    expression.  Work stays O(m^1.5) + 3 arc lookups per triangle.
    """
    arcs = (
        graph.edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    und = arcs.unionAll(
        arcs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    # orient the support graph by (degree, id) and two-join
    sdeg = und.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("d")
    )
    o = (
        und.join(sdeg.select(F.col("id").alias("src"),
                             F.col("d").alias("ds")), "src")
        .join(sdeg.select(F.col("id").alias("dst"),
                          F.col("d").alias("dd")), "dst")
        .where((F.col("ds") < F.col("dd"))
               | ((F.col("ds") == F.col("dd"))
                  & (F.col("src") < F.col("dst"))))
        .select("src", "dst")
    )
    e1 = o.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = o.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    e3 = o.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    tris = e1.join(e2, "b").join(e3, ["a", "c"]).select("a", "b", "c")

    def flag(x, y, name):
        return (
            arcs.select(F.col("src").alias(x), F.col("dst").alias(y))
            .withColumn(name, F.lit(1))
        )

    t = (
        tris.join(flag("a", "b", "ab"), ["a", "b"], "left")
        .join(flag("b", "a", "ba"), ["a", "b"], "left")
        .join(flag("b", "c", "bc"), ["b", "c"], "left")
        .join(flag("c", "b", "cb"), ["b", "c"], "left")
        .join(flag("a", "c", "ac"), ["a", "c"], "left")
        .join(flag("c", "a", "ca"), ["a", "c"], "left")
        .select(*[F.coalesce(F.col(n), F.lit(0)).alias(n)
                  for n in ("ab", "ba", "bc", "cb", "ac", "ca")])
    )
    single = (
        (F.col("ab") + F.col("ba") == 1)
        & (F.col("bc") + F.col("cb") == 1)
        & (F.col("ac") + F.col("ca") == 1)
    )
    cyc = (
        ((F.col("ab") == 1) & (F.col("bc") == 1) & (F.col("ca") == 1))
        | ((F.col("ba") == 1) & (F.col("cb") == 1) & (F.col("ac") == 1))
    )
    row = t.where(single).agg(
        F.sum(F.when(cyc, 1).otherwise(0)).alias("cyc"),
        F.sum(F.when(~cyc, 1).otherwise(0)).alias("tr"),
    ).collect()[0]
    return int(row["cyc"] or 0), int(row["tr"] or 0)


def rectangle_count(graph: Graph) -> int:
    """Global 4-cycle (rectangle) count (reference
    ``apps/flash/subgraph/rectangle.h``) via the diagonal-wedge
    identity: for each unordered vertex pair (a, c) with W common
    neighbors, every 2-subset of those neighbors closes one 4-cycle
    whose diagonals are (a, c) — so Σ C(W, 2) over pairs counts each
    rectangle exactly twice (once per diagonal).

    Spark shape: one self-join of the symmetrized edges on the middle
    vertex (wedges a-b-c with a < c), one (a, c) count aggregation
    (map-side combined), one scalar sum — no 4-way join ever
    materializes.  Work is O(Σ deg²), the same wedge bound the
    triangle counter pays."""
    sym = graph.symmetrized_edges().select("src", "dst")
    wedges = (
        sym.alias("x")
        .join(sym.alias("y"), F.col("x.dst") == F.col("y.src"))
        .where(F.col("x.src") < F.col("y.dst"))
        .select(F.col("x.src").alias("a"), F.col("y.dst").alias("c"))
    )
    pair_counts = wedges.groupBy("a", "c").agg(
        F.count(F.lit(1)).alias("w")
    )
    # stay in integer arithmetic: Σ w(w-1) = 2·Σ C(w,2) = 4·#rect
    total = (
        pair_counts.agg(
            F.sum(F.col("w") * (F.col("w") - 1)).cast("long").alias("t")
        ).collect()[0]["t"]
        or 0
    )
    return int(total) // 4


def directed_triangle_variants(graph: Graph) -> tuple[int, int, int, int]:
    """``(acyclic, in_plus, out_plus, cycle_plus)`` global counts of
    FLASH's directed-triangle census variants (reference
    ``apps/flash/subgraph/{acyclic,in,out,cycle-plus}-triangle.h``),
    over the distinct directed edge set E with N⁺/N⁻ the out/in
    neighbor sets:

    - acyclic:    Σ over (u,v)∈E of \\|N⁺(u) ∩ N⁺(v)\\| — each
      transitive orientation counted from its top edge.
    - in_plus:    Σ over unordered reciprocal pairs {u,v} of
      \\|N⁺(u) ∩ N⁺(v)\\| (the reference's (deg, id)-priority pick of
      one ordered direction — the summand is symmetric, so the
      canonical u<v pick is identical).
    - out_plus:   Σ over unordered reciprocal pairs of
      \\|N⁻(u) ∩ N⁻(v)\\|.
    - cycle_plus: Σ over ORDERED reciprocal pairs (u,v) of
      \\|N⁻(u) ∩ N⁺(v)\\| (the reference's third pass has no priority
      filter, so both directions count).

    Each count is the standard two-hop pair join — wedge rows bounded
    by Σ_e d(u)·d(v) like the undirected triangle join; at scale the
    same degree-orientation trick applies but the reference's
    definitions are direction-anchored, so the straightforward join
    keeps parity obvious.
    """
    E = graph.edges.select("src", "dst").distinct().persist(
        StorageLevel.MEMORY_AND_DISK
    )
    E.count()

    def common(pairs: DataFrame, first_in: bool, second_out: bool) -> int:
        """# rows (u,v,x): (u,x) or (x,u) in E per first_in, and
        (v,x) or (x,v) per second_out."""
        e1 = (
            E.select(F.col("dst").alias("u"), F.col("src").alias("x"))
            if first_in
            else E.select(F.col("src").alias("u"), F.col("dst").alias("x"))
        )
        e2 = (
            E.select(F.col("src").alias("v"), F.col("dst").alias("x"))
            if second_out
            else E.select(F.col("dst").alias("v"), F.col("src").alias("x"))
        )
        return pairs.join(e1, "u").join(e2, ["v", "x"]).count()

    recip = E.select(F.col("src").alias("u"), F.col("dst").alias("v")).join(
        E.select(F.col("dst").alias("u"), F.col("src").alias("v")),
        ["u", "v"],
    ).persist(StorageLevel.MEMORY_AND_DISK)
    all_pairs = E.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    recip_u = recip.where(F.col("u") < F.col("v"))

    acyclic = common(all_pairs, first_in=False, second_out=True)
    in_plus = common(recip_u, first_in=False, second_out=True)
    out_plus = common(recip_u, first_in=True, second_out=False)
    cycle_plus = common(recip, first_in=True, second_out=True)
    recip.unpersist()
    E.unpersist()
    return acyclic, in_plus, out_plus, cycle_plus
