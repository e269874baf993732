"""Connected components over similarity-pair edges — dedup clustering.

A dedup pipeline doesn't end at pairs: near-duplicate PAIRS must become
CLUSTERS (transitive closure) so each group keeps one canonical document.
The reference has no analog (its dedup story stops at the all-pairs
statistics, ``src/training/statistics.py``); two DataFrame formulations:

- **min-label propagation** (``algorithm="label"``): label(v) ← min over
  neighborhood, iterated to fixpoint. One join + one aggregation per
  round, O(component diameter) rounds — cheapest for the shallow clusters
  near-dup graphs actually produce.
- **large-star / small-star** (``algorithm="star"``): the alternating
  path-doubling algorithm of Kiveris et al., "Connected Components in
  MapReduce and Beyond" (SoCC'14) — each round rewires edges toward
  component minima, converging in O(log² n) rounds even on adversarial
  chains (a path graph collapses exponentially fast instead of one hop
  per round).
- ``algorithm="auto"`` (default) runs min-label for ``switch_after``
  rounds and, if the fixpoint hasn't been reached (deep graph), restarts
  on the star variant — shallow graphs pay nothing, chains stay O(log).

Every round's output is ``localCheckpoint``-ed — without it the plan
doubles per round and Catalyst analysis dominates wall time by iteration
~10.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _checkpoint(df: DataFrame) -> DataFrame:
    return df.localCheckpoint()


def _star_rounds(
    edges: DataFrame, max_iter: int, stats: dict | None
) -> DataFrame:
    """Alternating large-star/small-star to fixpoint; returns the final
    (u, v) star edges (u > v, v = component minimum after convergence).

    ``edges`` must be canonical: u > v, distinct, no self-loops.
    Convergence is detected by an order-insensitive (count, xxhash sum)
    checksum of the canonical edge set staying fixed across a full
    large+small round — the paper's termination criterion.
    """
    e = _checkpoint(edges)

    def canon(df: DataFrame) -> DataFrame:
        return (
            df.select(
                F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
            )
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    def checksum(df: DataFrame) -> tuple[int, int]:
        row = df.agg(
            F.count(F.lit(1)).alias("c"),
            # decimal sum: exact and overflow-free under ANSI mode
            F.coalesce(
                F.sum(F.xxhash64("u", "v").cast("decimal(20,0)")), F.lit(0)
            ).alias("h"),
        ).collect()[0]
        return int(row["c"]), int(row["h"])

    prev = checksum(e)
    for rnd in range(max_iter):
        # large-star: for each node x, attach its LARGER neighbors to the
        # minimum of its closed neighborhood
        both = e.select("u", "v").unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = both.groupBy("u").agg(F.min("v").alias("__mn"))
        mins = mins.select(
            "u", F.least(F.col("__mn"), F.col("u")).alias("m")
        )
        large = canon(
            both.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        # small-star: for each node u, attach its smaller neighbors (and
        # itself) to its minimum smaller neighbor
        smins = large.groupBy("u").agg(F.min("v").alias("m"))
        small = canon(
            large.join(smins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(smins.select("u", F.col("m").alias("v")))
        )
        new_e = _checkpoint(small)
        cur = checksum(new_e)
        e = new_e
        if stats is not None:
            stats["rounds"] = stats.get("rounds", 0) + 1
        if cur == prev:
            return e
        prev = cur
    raise RuntimeError(
        f"star connected components did not converge in {max_iter} rounds"
    )


def _driver_union_find(
    pairs: DataFrame, a_col: str, b_col: str
) -> DataFrame:
    """Small-graph fast path: union-find on the collected edge list.

    Near-dup graphs are usually a few orders of magnitude smaller than the
    corpus (dedup pair rates are per-mille); below ``driver_edge_limit``
    the iterative distributed algorithms pay 4+ Spark jobs PER ROUND for a
    graph whose edge list is a few MB — union-find on the driver answers
    in one collect + one parallelize. Same class of bounded driver work as
    the minhash vocab matrix: size-GATED, never the only path.

    Union-by-min + path halving keeps every root the component minimum, so
    ``find(v)`` IS the canonical ``component_id`` — deterministic
    regardless of edge order.
    """
    pdf = pairs.select(
        F.col(a_col).alias("u"), F.col(b_col).alias("v")
    ).toPandas()
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        # path halving
        while parent.get(x, x) != root:
            parent[x], x = root, parent[x]
        return root

    for u, v in zip(pdf["u"], pdf["v"]):
        ru, rv = find(u), find(v)
        if ru == rv:
            continue
        lo, hi = (ru, rv) if ru < rv else (rv, ru)
        parent[hi] = lo

    ids = sorted(set(pdf["u"]) | set(pdf["v"]))
    import pandas as pd

    out = pd.DataFrame({"id": ids, "component_id": [find(i) for i in ids]})
    spark = pairs.sparkSession
    id_type = dict(pairs.dtypes)[a_col]
    if not len(out):
        schema = pairs.select(
            F.col(a_col).alias("id"), F.col(a_col).alias("component_id")
        ).schema
        return spark.createDataFrame([], schema)
    # match the distributed path's output dtypes exactly (pandas would
    # otherwise widen e.g. int32 ids to long)
    return spark.createDataFrame(out).select(
        F.col("id").cast(id_type), F.col("component_id").cast(id_type)
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    max_iter: int = 25,
    algorithm: str = "auto",
    switch_after: int = 5,
    stats: dict | None = None,
    driver_edge_limit: int = 1_000_000,
) -> DataFrame:
    """(id, component_id) for every vertex appearing in ``pairs``.

    ``component_id`` is the minimum vertex id of the component — stable,
    deterministic, and directly usable as the canonical-document key.

    ``algorithm``: ``"label"`` (min-label propagation, O(diameter)
    rounds), ``"star"`` (large-star/small-star path doubling, O(log²)
    rounds), or ``"auto"`` — a size-gated strategy: edge sets at or below
    ``driver_edge_limit`` (a few MB — near-dup graphs are per-mille of
    the corpus) solve via driver union-find in one collect instead of 4+
    jobs per distributed round; larger graphs run label propagation that
    hands off to the star variant after ``switch_after`` non-converged
    rounds, so shallow graphs keep the cheaper per-round cost while
    adversarial chains stay logarithmic. ``stats`` (optional dict)
    receives ``{"rounds": n, "algorithm": <used>}``.
    """
    if algorithm not in ("auto", "label", "star"):
        raise ValueError(f"unknown connected_components algorithm: {algorithm!r}")
    if algorithm == "auto" and driver_edge_limit > 0:
        pairs = pairs.persist()
        n_pairs = pairs.count()
        if n_pairs <= driver_edge_limit:
            try:
                if stats is not None:
                    stats["rounds"] = 0
                    stats["algorithm"] = "driver"
                return _driver_union_find(pairs, a_col, b_col)
            finally:
                pairs.unpersist()
        # big graph: fall through to the distributed paths (pairs stays
        # cached until the doubled edge set is materialized below)
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(
            pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
        )
        .distinct()
        .persist()
    )
    try:
        if algorithm == "auto" and driver_edge_limit > 0:
            # materialize the doubled edge cache, then drop the upstream
            # pair cache the size gate left behind
            edges.count()
            pairs.unpersist()
        verts = edges.select(F.col("src").alias("id")).distinct()
        if stats is not None:
            stats["rounds"] = 0
            stats["algorithm"] = algorithm

        if algorithm in ("auto", "label"):
            label_budget = switch_after if algorithm == "auto" else max_iter
            labels = _checkpoint(verts.withColumn("lbl", F.col("id")))
            for _ in range(label_budget):
                # neighbor labels flow along edges; keep own label in the
                # pool, TAGGED, so the round's aggregate carries both the
                # new min and the previous label — the convergence check
                # is then a filter over the checkpointed result instead of
                # a second shuffle join of old vs new label tables
                msgs = edges.join(
                    labels.select(F.col("id").alias("src"), "lbl"), "src"
                ).select(F.col("dst").alias("id"), "lbl", F.lit(0).alias("__own"))
                new_labels = _checkpoint(
                    labels.select("id", "lbl", F.lit(1).alias("__own"))
                    .unionByName(msgs)
                    .groupBy("id")
                    .agg(
                        F.min("lbl").alias("lbl"),
                        F.min(F.when(F.col("__own") == 1, F.col("lbl"))).alias(
                            "__old"
                        ),
                    )
                )
                changed = (
                    new_labels.filter(F.col("lbl") < F.col("__old"))
                    .limit(1)
                    .count()
                )
                labels = new_labels.select("id", "lbl")
                if stats is not None:
                    stats["rounds"] += 1
                if changed == 0:
                    if stats is not None:
                        stats["algorithm"] = "label"
                    return labels.select("id", F.col("lbl").alias("component_id"))
            if algorithm == "label":
                raise RuntimeError(
                    f"connected_components did not converge in {max_iter} "
                    "label-propagation rounds; use algorithm='star' (or "
                    "'auto') for deep graphs"
                )

        # star path: restart from the raw edge set — correctness does not
        # depend on the label rounds above, they were only a cheap first try
        if stats is not None:
            stats["algorithm"] = "star"
        canonical = (
            edges.filter(F.col("src") > F.col("dst"))
            .select(F.col("src").alias("u"), F.col("dst").alias("v"))
        )
        stars = _star_rounds(canonical, max_iter, stats)
        # converged state is a union of stars centered at component minima:
        # every non-minimum vertex has edges only to its component min
        labels = verts.join(
            stars.select(F.col("u").alias("id"), F.col("v").alias("lbl")),
            "id",
            "left",
        ).groupBy("id").agg(
            F.min(F.coalesce(F.col("lbl"), F.col("id"))).alias("component_id")
        )
        return labels.select("id", "component_id")
    finally:
        edges.unpersist()


def dedup_clusters(
    pairs: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
) -> DataFrame:
    """Near-dup pair table → (doc_id, cluster_id, cluster_size).

    cluster_id = min doc id of the transitive-closure group (the canonical
    survivor under keep-smallest-id policy); docs not in any pair are not
    emitted (they are their own trivial cluster by definition).
    """
    cc = connected_components(pairs, a_col, b_col)
    sizes = cc.groupBy("component_id").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size")
    )
    return cc.join(sizes, "component_id").select(
        F.col("id").alias("doc_id"),
        F.col("component_id").alias("cluster_id"),
        "cluster_size",
    )


def _canonical_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """One (a < b) row per undirected edge — both directions, duplicates
    and self-loops collapse."""
    return (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") < F.col("b"))
        .distinct()
    )


def _degrees(e: DataFrame) -> DataFrame:
    return (
        e.select(F.explode(F.array("a", "b")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )


def _triangle_counts_canonical(
    e: DataFrame, deg: DataFrame, broadcast_edges: int
) -> DataFrame:
    """Degree-ordered compact-forward enumeration over a canonical edge
    set with its degree table (see :func:`triangle_counts`)."""
    from .cache import persist_tracked

    er = e.join(
        deg.select(F.col("node").alias("a"), F.col("degree").alias("da")),
        "a",
    ).join(
        deg.select(F.col("node").alias("b"), F.col("degree").alias("db")),
        "b",
    )
    lower_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    eo = persist_tracked(
        er.select(
            F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("v"),
            F.when(lower_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
        )
    )
    w1 = eo.select("u", F.col("v").alias("v1"), F.col("dv").alias("d1"))
    w2 = eo.select("u", F.col("v").alias("v2"), F.col("dv").alias("d2"))
    wedges = w1.join(w2, "u").where(
        (F.col("d1") < F.col("d2"))
        | ((F.col("d1") == F.col("d2")) & (F.col("v1") < F.col("v2")))
    )
    closing = eo.select(F.col("u").alias("v1"), F.col("v").alias("v2"))
    # size-gated broadcast of the closure side: the wedge table is the
    # Σ out-deg² blow-up — when the EDGE set fits a broadcast (it's the
    # small one by construction), wedges stream through a broadcast-hash
    # probe and never shuffle; above the gate fall back to a shuffled
    # equi-join (both sides keyed on the closing edge)
    if eo.count() <= broadcast_edges:
        closing = F.broadcast(closing)
    tri = wedges.join(closing, ["v1", "v2"]).select("u", "v1", "v2")
    corners = tri.select(
        F.explode(F.array(F.col("u"), F.col("v1"), F.col("v2"))).alias("node")
    )
    return corners.groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )


def triangle_counts(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    broadcast_edges: int = 2_000_000,
) -> DataFrame:
    """Per-vertex triangle counts over an undirected simple graph.

    ``edges`` may contain either or both directions and self-loops; the
    canonical pass dedups to one (a < b) row per edge. Enumeration is
    the DEGREE-ORDERED compact-forward scheme (Latapy TCS'08; Cohen,
    "Graph Twiddling in a MapReduce World", CiSE'09): orient every edge
    from its lower-(degree, id)-ranked endpoint to the higher, build
    wedges at the LOW-rank apex, close them against the oriented edge
    set. Every triangle materializes exactly once (the rank order is a
    tournament), and the wedge fan-out is Σ out-deg² with out-degrees
    bounded by O(√m) — hub vertices fan out on their cheap side instead
    of exploding as Σ deg² middles. All hash equi-joins; the oriented
    edge table is persisted (it feeds both wedge sides and the closure).
    """
    from .cache import persist_tracked

    e = persist_tracked(_canonical_edges(edges, src, dst))
    return _triangle_counts_canonical(e, _degrees(e), broadcast_edges)


def clustering_coeffs(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    broadcast_edges: int = 2_000_000,
) -> DataFrame:
    """Per-vertex local clustering coefficient over an undirected simple
    graph: coeff = 2·triangles / (deg·(deg-1)) — how close the vertex's
    neighborhood is to a clique. Shares ONE persisted canonical edge set
    and ONE degree table with the triangle enumeration (no second edge
    build); numerator (2T) and denominator stay exact integers (the hash
    vehicle), the coefficient is the one closing division. Degree-1
    vertices report 0.
    """
    from .cache import persist_tracked

    e = persist_tracked(_canonical_edges(edges, src, dst))
    deg = persist_tracked(_degrees(e))
    tri = _triangle_counts_canonical(e, deg, broadcast_edges)
    den = F.col("degree") * (F.col("degree") - 1)
    return deg.join(tri, "node", "left").select(
        "node",
        "degree",
        F.coalesce(F.col("n_triangles"), F.lit(0)).cast("long").alias(
            "n_triangles"
        ),
        F.when(
            den > 0,
            (2 * F.coalesce(F.col("n_triangles"), F.lit(0))).cast("double")
            / den.cast("double"),
        ).otherwise(F.lit(0.0)).alias("clustering_coeff"),
    )


def association_rules(
    baskets: DataFrame,
    basket: str = "basket_id",
    item: str = "item",
    min_pair_support: int = 2,
) -> DataFrame:
    """Pairwise association rules over baskets — support / confidence /
    lift for every co-occurring ordered item pair (a → b), the
    market-basket read behind "users who bought X also bought Y".

    Counts stay exact integers end-to-end (the hash vehicle):
    ``n_baskets``, per-item support, pair support; confidence =
    pair/ante and lift = pair·N/(ante·cons) close with one division
    each. Pair generation is the same-basket self-join with an ordering
    predicate — fan-out Σ basket_size², the standard bound; dedup to
    DISTINCT items per basket first so multiplicity can't inflate
    support. Item supports attach via two vertex-keyed joins, never
    basket-sized.
    """
    from .cache import persist_tracked

    b = persist_tracked(
        baskets.select(
            F.col(basket).alias("__b"), F.col(item).alias("__i")
        ).distinct()
    )
    n_baskets = b.select("__b").distinct().count()
    items = b.groupBy(F.col("__i").alias("it")).agg(
        F.count(F.lit(1)).cast("long").alias("item_n")
    )
    l, r = b.alias("l"), b.alias("r")
    pairs = (
        l.join(r, "__b")
        .where(F.col("l.__i") != F.col("r.__i"))
        .groupBy(
            F.col("l.__i").alias("ante"), F.col("r.__i").alias("cons")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("pair_n"))
        .where(F.col("pair_n") >= F.lit(min_pair_support))
    )
    out = (
        pairs.join(items.select(F.col("it").alias("ante"),
                                F.col("item_n").alias("ante_n")), "ante")
        .join(items.select(F.col("it").alias("cons"),
                           F.col("item_n").alias("cons_n")), "cons")
    )
    return out.select(
        "ante", "cons", "pair_n", "ante_n", "cons_n",
        F.lit(int(n_baskets)).cast("long").alias("n_baskets"),
        (F.col("pair_n").cast("double") / F.col("ante_n").cast("double"))
        .alias("confidence"),
        (
            (F.col("pair_n") * F.lit(int(n_baskets))).cast("double")
            / (F.col("ante_n") * F.col("cons_n")).cast("double")
        ).alias("lift"),
    )


def tree_paths(
    nodes: DataFrame,
    id_col: str = "id",
    parent_col: str = "parent",
    max_iter: int = 30,
) -> DataFrame:
    """(id, root_id, depth) for every node of a forest given parent
    pointers (roots carry NULL parents) — thread / reply-chain
    reconstruction for conversation trees, resolved by POINTER DOUBLING:
    each round every unresolved node jumps to its current ancestor's
    ancestor, so the followed distance doubles and a depth-D forest
    resolves in ⌈log₂ D⌉ rounds (never D sequential self-joins). A
    parent id that matches no node is treated as a root.

    Each round is one hash equi-join of the state table with itself plus
    a localCheckpoint (same O(1)-lineage discipline as
    :func:`connected_components`); the per-round driver work is a single
    unresolved-count. depth is exact integer edges-to-root.
    """
    state = nodes.select(
        F.col(id_col).alias("id"),
        F.col(parent_col).alias("cur"),
        F.when(F.col(parent_col).isNull(), F.lit(0))
        .otherwise(F.lit(1)).cast("long").alias("d"),
        F.when(F.col(parent_col).isNull(), F.col(id_col)).alias("root_id"),
    )
    state = _checkpoint(state)
    for _ in range(max_iter):
        if state.where(F.col("root_id").isNull()).count() == 0:
            return state.select(
                "id", "root_id", F.col("d").cast("long").alias("depth")
            )
        look = state.select(
            F.col("id").alias("__lid"),
            F.col("cur").alias("__lcur"),
            F.col("d").alias("__ld"),
            F.col("root_id").alias("__lroot"),
        )
        j = state.join(look, state["cur"] == look["__lid"], "left")
        resolved = F.col("root_id").isNotNull()
        hit = F.col("__lid").isNotNull()
        state = _checkpoint(
            j.select(
                "id",
                F.when(resolved, F.lit(None))
                .when(~hit, F.lit(None))          # cur is an implicit root
                .when(F.col("__lroot").isNotNull(), F.lit(None))
                .otherwise(F.col("__lcur")).alias("cur"),
                F.when(resolved, F.col("d"))
                .when(~hit, F.col("d"))
                .otherwise(F.col("d") + F.col("__ld")).cast("long").alias("d"),
                F.when(resolved, F.col("root_id"))
                .when(~hit, F.col("cur"))          # dangling parent = root
                .when(F.col("__lroot").isNotNull(), F.col("__lroot"))
                .alias("root_id"),
            )
        )
    raise RuntimeError(f"tree_paths did not converge in {max_iter} rounds")


def bfs_hops(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 4,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
) -> DataFrame:
    """Minimum-hop BFS distance from a seed set over an undirected
    graph — the "how far from curated/flagged content" feature, and the
    frontier-expansion primitive behind influence radii and taint
    propagation.

    Level-synchronous frontier BFS as join rounds: each hop is ONE
    src-keyed equi-join of the current frontier against the edge table
    plus an anti-join against the settled set, so a node is assigned
    the FIRST (minimum) hop that reaches it and is never re-expanded —
    total work is Σ|frontier|·deg, the textbook distributed BFS bound.
    Every round localCheckpoints (the same O(1)-lineage discipline as
    :func:`tree_paths`); an empty frontier short-circuits. Unreached
    nodes are absent from the output (semantically ∞).

    The oracle replay is a recursive CTE in UNION (dedup) mode with
    ``min(hop)`` — identical semantics, proven at the driver gate.
    """
    e = (
        edges.select(F.col(src).alias("__s"), F.col(dst).alias("__d"))
        .unionByName(
            edges.select(
                F.col(dst).alias("__s"), F.col(src).alias("__d")
            )
        )
        .distinct()
    )
    e = _checkpoint(e)
    dist = _checkpoint(
        seeds.select(F.col(node).alias("node"))
        .distinct()
        .withColumn("hop", F.lit(0).cast("long"))
    )
    frontier = dist.select("node")
    for h in range(1, int(max_hops) + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["__s"])
            .select(F.col("__d").alias("node"))
            .distinct()
            .join(dist.select("node"), "node", "left_anti")
            .withColumn("hop", F.lit(h).cast("long"))
        )
        nxt = _checkpoint(nxt)
        if nxt.isEmpty():
            break
        dist = _checkpoint(dist.unionByName(nxt))
        frontier = nxt.select("node")
    return dist


def neighbor_agg(
    edges: DataFrame,
    features: DataFrame,
    node_col: str = "node",
    feat_col: str = "q",
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """One round of GNN-style neighborhood aggregation (the GraphSAGE /
    message-passing mean aggregator, Hamilton NeurIPS'17): for every
    node, the degree, exact integer sum and mean of its neighbors'
    feature — the table you train graph-aware models on, and the
    smoothing prior behind "you are the average of your neighbors".

    ONE symmetrized edge pass: features equi-join onto the message
    source, one map-side-combinable groupBy on the destination, then a
    join back to the node's own feature. nbr_sum_q is the BIGINT hash
    vehicle; nbr_mean the single closing division. Isolated nodes keep
    their own feature with degree 0.
    """
    e = edges.select(
        F.col(src).alias("__s"), F.col(dst).alias("__d")
    ).unionByName(
        edges.select(F.col(dst).alias("__s"), F.col(src).alias("__d"))
    ).distinct()
    f = features.select(
        F.col(node_col).alias("node"), F.col(feat_col).cast("long").alias("__q")
    )
    msgs = e.join(f.withColumnRenamed("node", "__s"), "__s").groupBy(
        F.col("__d").alias("node")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("degree"),
        F.sum("__q").cast("long").alias("nbr_sum_q"),
    )
    out = f.join(msgs, "node", "left").na.fill(
        {"degree": 0, "nbr_sum_q": 0}
    )
    return out.select(
        "node",
        F.col("__q").alias("self_q"),
        "degree",
        "nbr_sum_q",
        F.when(
            F.col("degree") > 0,
            F.col("nbr_sum_q").cast("double") / F.col("degree").cast("double"),
        ).alias("nbr_mean"),
    )


def kcore_peel(
    edges: DataFrame,
    k: int,
    rounds: int = 12,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-round k-core peeling (Seidman, Social Networks 1983; the
    Matula–Beck degeneracy peel bounded to ``rounds`` synchronous
    sweeps): repeatedly delete every node whose degree dropped below
    ``k``. The surviving subgraph is the k-core — the standard
    spam/bot-ring and "engaged-cohort" screen over interaction graphs,
    and the densification filter before expensive graph features.

    One row per node of the (symmetrized, deduplicated) input graph:
    ``removed_round`` = the sweep that deleted it (1-based), or 0 for
    survivors; ``deg`` = the node's ALIVE degree at the start of its
    removal sweep (survivors: degree in the final graph). A node whose
    last alive neighbor was peeled has alive-degree 0 and is doomed in
    the next sweep like any other sub-k node — on a converged run every
    survivor has deg >= k, the true k-core.

    Semantics are FIXED-ROUND on purpose: both this and the SQL oracle
    run exactly ``rounds`` sweeps, so results are engine-identical even
    on graphs that have not converged — convergence is a property you
    assert (an empty sweep short-circuits; every later sweep is a
    no-op, so early exit ≡ full unroll).

    Scale: each sweep is one map-combinable degree count + two anti
    equi-joins, all keyed on node ids; ``localCheckpoint`` caps lineage
    at O(1) per sweep. Synchronous peeling needs O(peel depth) rounds —
    the power-law graphs this targets have small depth; raise
    ``rounds`` for adversarial chains.
    """
    e0 = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    e = _checkpoint(
        e0.unionByName(
            e0.select(F.col("d").alias("s"), F.col("s").alias("d"))
        ).distinct()
    )
    alive = _checkpoint(e.select(F.col("s").alias("node")).distinct())
    removed: DataFrame | None = None
    for r in range(1, int(rounds) + 1):
        deg = e.groupBy(F.col("s").alias("node")).agg(
            F.count(F.lit(1)).cast("long").alias("deg")
        )
        # left join onto the ALIVE set: a node whose last neighbor was
        # peeled has zero alive edges, never shows in the degree table,
        # and still must be doomed (deg 0 < k)
        doomed = _checkpoint(
            alive.join(deg, "node", "left")
            .select(
                "node",
                F.coalesce(F.col("deg"), F.lit(0)).cast("long").alias("deg"),
            )
            .where(F.col("deg") < int(k))
        )
        if not doomed.take(1):
            break
        batch = doomed.select(
            "node", F.lit(r).cast("long").alias("removed_round"), "deg"
        )
        removed = batch if removed is None else _checkpoint(
            removed.unionByName(batch)
        )
        dn = doomed.select("node")
        alive = _checkpoint(alive.join(dn, "node", "left_anti"))
        e = _checkpoint(
            e.join(dn.withColumnRenamed("node", "s"), "s", "left_anti")
            .join(dn.withColumnRenamed("node", "d"), "d", "left_anti")
            .select("s", "d")
        )
    fin = e.groupBy(F.col("s").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    survivors = alive.join(fin, "node", "left").select(
        "node",
        F.lit(0).cast("long").alias("removed_round"),
        F.coalesce(F.col("deg"), F.lit(0)).cast("long").alias("deg"),
    )
    if removed is None:
        return survivors
    return survivors.unionByName(removed)


def pagerank_fixed(
    edges: DataFrame,
    rounds: int = 6,
    damping_num: int = 17,
    damping_den: int = 20,
    scale: int = 1_000_000,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-round PageRank (Brin & Page, WWW 1998) over the symmetrized
    edge set, computed entirely in quantized BIGINT arithmetic so the
    result is bit-identical cross-engine — the centrality score behind
    "which documents/users anchor this graph", and the classic seed
    ranker for crawl/curation priority.

    Semantics (the unnormalized power iteration, total mass ~= n_nodes):

        rank_q[0]  = scale                       (rank 1.0 per node)
        contrib    = rank_q div outdeg           (per out-edge, floor)
        rank_q[i]  = base_q + (damping_num * SUM contrib) div damping_den

    with ``base_q = ((damping_den - damping_num) * scale) div damping_den``
    — every step is integer multiply / integer ``div`` (truncation
    semantics verified identical in Spark and DuckDB), so an unrolled
    SQL replay reproduces rank_q exactly; the float ``rank`` column is a
    single closing division. Floor-div leaks <1 quantum of mass per edge
    per round — deterministic, and irrelevant at scale=1e6.

    Fixed-round ON PURPOSE (the ``kcore_peel`` contract): both engines
    run exactly ``rounds`` synchronous updates; convergence is a property
    you assert, not a termination condition that could diverge between
    engines.

    Scale: one map-combinable groupBy(dst) + two hash equi-joins per
    round, all keyed on node ids — the standard Pregel-as-joins shape;
    ``localCheckpoint`` caps lineage at O(1) per round. int64 budget:
    damping_num * n_nodes * scale must stay below 2^63 (9.2e18) — at
    scale=1e6 that allows ~5e11 nodes.
    """
    e0 = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    e = _checkpoint(
        e0.unionByName(
            e0.select(F.col("d").alias("s"), F.col("s").alias("d"))
        ).distinct()
    )
    od = _checkpoint(
        e.groupBy(F.col("s").alias("node")).agg(
            F.count(F.lit(1)).cast("long").alias("outdeg")
        )
    )
    base_q = ((int(damping_den) - int(damping_num)) * int(scale)) // int(
        damping_den
    )
    ranks = od.select("node", F.lit(int(scale)).cast("long").alias("rank_q"))
    for _ in range(int(rounds)):
        contribs = (
            e.join(ranks.withColumnRenamed("node", "s"), "s")
            .join(od.withColumnRenamed("node", "s"), "s")
            .select(
                F.col("d").alias("node"),
                F.expr("rank_q div outdeg").cast("long").alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").cast("long").alias("__in_q"))
        )
        ranks = _checkpoint(
            od.join(contribs, "node", "left").select(
                "node",
                (
                    F.lit(base_q)
                    + F.expr(
                        f"({int(damping_num)} * coalesce(__in_q, CAST(0 AS BIGINT)))"
                        f" div {int(damping_den)}"
                    )
                ).cast("long").alias("rank_q"),
            )
        )
    return ranks.join(od, "node").select(
        "node",
        "outdeg",
        "rank_q",
        (F.col("rank_q").cast("double") / F.lit(float(scale))).alias("rank"),
    )


def link_prediction_scores(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    min_cn: int = 2,
    ra_scale: int = 1_000_000_000_000,
) -> DataFrame:
    """Neighborhood link-prediction scores for NON-edges: for every
    vertex pair (u < v) that shares >= ``min_cn`` common neighbors but
    has no edge, the three classic structural scores

        cn       common-neighbor count                (Newman 2001)
        jaccard  cn / (deg_u + deg_v − cn)            (Liben-Nowell
                                                       & Kleinberg 2003)
        ra       Σ_z 1/deg(z)  over common neighbors  (Zhou, Lü & Zhang
                                                       2009, resource
                                                       allocation)

    Logarithm-free by design (Adamic–Adar's 1/ln deg is deliberately
    replaced by RA, its stronger log-free sibling, per Zhou et al.) so
    every score has an exact integer vehicle: ``cn`` is a count,
    Jaccard a ratio of BIGINTs, and RA is fixed-point —
    ``ra_q = Σ (ra_scale div deg_z)``, exact integer division per
    term, order-independent under any partial aggregation (floats
    would make Σ 1/deg accumulation-order dependent). The float
    ``ra = ra_q / ra_scale`` and Jaccard are single closing divisions.

    Scale: wedge enumeration through the shared neighbor z costs
    Σ_z deg(z)² rows — the triangle-counting budget
    (:func:`triangle_counts`); the weight-thresholding that sparsifies
    the graph upstream (min_w in the co-purchase builder) is the knob
    that bounds it, and a hot-vertex cap (drop z with deg above a
    percentile) is the standard escape hatch at 100×. Everything is
    hash equi-joins + one groupBy(pair); the degree table is |V| rows,
    joined (not collected).
    """
    e = _canonical_edges(edges, src, dst)
    deg = _degrees(e)
    sym = e.select(F.col("a").alias("z"), F.col("b").alias("p")).unionAll(
        e.select(F.col("b").alias("z"), F.col("a").alias("p"))
    )
    degz = deg.select(
        F.col("node").alias("z"), F.col("degree").alias("__deg_z")
    )
    s1 = sym.select("z", F.col("p").alias("u"))
    s2 = sym.select("z", F.col("p").alias("v"))
    wedges = (
        s1.join(s2, "z")
        .where(F.col("u") < F.col("v"))
        .join(degz, "z")
    )
    cand = wedges.groupBy("u", "v").agg(
        F.count(F.lit(1)).cast("long").alias("cn"),
        F.sum(F.expr(f"CAST({int(ra_scale)} AS BIGINT) div __deg_z"))
        .cast("long")
        .alias("ra_q"),
    )
    non_edges = cand.join(
        e.select(F.col("a").alias("u"), F.col("b").alias("v")),
        ["u", "v"],
        "left_anti",
    )
    du = deg.select(F.col("node").alias("u"), F.col("degree").alias("deg_u"))
    dv = deg.select(F.col("node").alias("v"), F.col("degree").alias("deg_v"))
    out = (
        non_edges.where(F.col("cn") >= int(min_cn))
        .join(du, "u")
        .join(dv, "v")
    )
    jac_den = F.col("deg_u") + F.col("deg_v") - F.col("cn")
    return out.select(
        "u", "v", "cn", "deg_u", "deg_v", "ra_q",
        (F.col("cn").cast("double") / jac_den.cast("double")).alias("jaccard"),
        (F.col("ra_q").cast("double") / F.lit(float(ra_scale))).alias("ra"),
    )
