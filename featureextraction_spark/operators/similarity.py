"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: exact brute-force top-k — broadcast the (small) query
  side, JVM-side dot products via zip_with/aggregate, rank window. The
  correctness baseline.
- ``ann_lsh_topk``: random-hyperplane LSH — hash vectors to sign-bit
  bucket keys, equi-join queries to corpus on bucket, exact cosine among
  candidates only. The scale path: shuffle is on bucket keys, never a
  cartesian.
- ``embedding_near_dup_pairs``: all corpus pairs with cosine ≥ threshold
  via LSH buckets + verification (the embedding leg of the dedup suite).

Cosine is computed in double precision with an explicit, order-stable
formula (sequential zip_with fold) so DuckDB / numpy oracles agree to
~1e-12.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_similarity_col(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Exact top-k neighbors per query (broadcast nested-loop).

    Ranking is on (rounded cosine desc, neighbor id asc) — fully
    deterministic under ties and reproducible in any oracle.
    Self-matches (same id) are excluded.
    """
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine", F.round(cosine_similarity_col(F.col("__qv"), F.col("__cv")), round_digits)
        )
        .drop("__qv", "__cv")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("long").alias("rank"))
    )


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic hyperplane directions (shared with oracles)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_bucket_col(
    vec: Column, planes: list[list[float]], quantized: bool = False
) -> Column:
    """Sign-bit bucket key: bit p set iff vec · plane_p > 0.

    ``quantized=True`` takes the sign of the 1e-6-quantized dot instead
    of the raw double — the raw sign is a hard 0-boundary where a 1-ulp
    cross-engine summation difference could flip a bit; quantizing first
    puts the comparison on the same exact integer grid every other
    oracled float in the repo uses (use it whenever the buckets must be
    replayed by another engine)."""
    key = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        arr = F.array(*[F.lit(float(v)) for v in plane])
        d = _dot(vec, arr)
        if quantized:
            d = F.floor(d * F.lit(1e6) + F.lit(0.5)).cast("long")
        bit = F.when(d > 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(
            F.lit(0).cast("long")
        )
        key = key + bit
    return key


def ann_lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 4,
    dim: int | None = None,
    seed: int = 42,
    round_digits: int = 6,
    quantized: bool = False,
) -> DataFrame:
    """Approximate top-k: union of ``n_tables`` independent LSH tables.

    Each table buckets on ``n_planes`` sign bits; query/corpus rows join on
    (table, bucket) — pure equi-join, shuffle bounded by bucket sizes.
    Exact cosine + ranking over the candidate union. Recall < 1 by design;
    measured against ``cosine_topk`` in tests. ``quantized`` passes
    through to :func:`lsh_bucket_col` (engine-replayable buckets).
    """
    from pyspark.sql import Window

    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])

    def keyed(df: DataFrame, alias: str) -> DataFrame:
        out = []
        for t in range(n_tables):
            planes = random_hyperplanes(dim, n_planes, seed + 1000 * t)
            out.append(
                df.select(
                    F.col(id_col).alias(alias),
                    F.lit(t).alias("table"),
                    lsh_bucket_col(
                        F.col(vec_col), planes, quantized=quantized
                    ).alias("bucket"),
                )
            )
        u = out[0]
        for o in out[1:]:
            u = u.unionByName(o)
        return u

    qk = keyed(queries, "query_id")
    ck = keyed(corpus, "neighbor_id")
    # candidate id pairs only — the bucket join and the distinct shuffle
    # narrow rows; each side's vector joins back exactly once
    cand = (
        qk.join(ck, ["table", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    qv = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
    cv = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    scored = (
        cand.join(qv, "query_id")
        .join(cv, "neighbor_id")
        .withColumn(
            "cosine",
            F.round(cosine_similarity_col(F.col("__qv"), F.col("__cv")), round_digits),
        )
        .drop("__qv", "__cv")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("long").alias("rank"))
    )


def embedding_near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
    n_tables: int = 6,
    dim: int | None = None,
    seed: int = 7,
    round_digits: int = 6,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a_id < b_id, cosine ≥ t)
    via multi-table LSH candidates + exact verification."""
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    out = None
    for t in range(n_tables):
        planes = random_hyperplanes(dim, n_planes, seed + 1000 * t)
        keyed = corpus.select(
            F.col(id_col), lsh_bucket_col(F.col(vec_col), planes).alias("bucket")
        )
        a = keyed.select(F.col(id_col).alias("a_id"), "bucket")
        b = keyed.select(F.col(id_col).alias("b_id"), "bucket")
        cand = a.join(b, "bucket").filter(F.col("a_id") < F.col("b_id")).select(
            "a_id", "b_id"
        )
        out = cand if out is None else out.unionByName(cand)
    # dedup candidates on the NARROW (a_id, b_id) pairs, then attach each
    # side's vector once — never shuffle full vectors through the distinct
    va = corpus.select(F.col(id_col).alias("a_id"), F.col(vec_col).alias("__a"))
    vb = corpus.select(F.col(id_col).alias("b_id"), F.col(vec_col).alias("__b"))
    return (
        out.distinct()
        .join(va, "a_id")
        .join(vb, "b_id")
        .withColumn(
            "cosine",
            F.round(cosine_similarity_col(F.col("__a"), F.col("__b")), round_digits),
        )
        .filter(F.col("cosine") >= threshold)
        .select("a_id", "b_id", "cosine")
    )


def embedding_pairs(
    corpus: DataFrame,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    strategy: str = "auto",
    exact_max_rows: int = 200_000,
    n_rows: int | None = None,
    block_size: int = 1024,
    n_planes: int = 12,
    n_tables: int = 8,
    seed: int = 7,
    round_digits: int = 6,
) -> DataFrame:
    """Near-duplicate embedding pairs (a_id < b_id, cosine ≥ threshold)
    with an automatic physical strategy, mirroring ``ngram_jaccard``'s
    vocabulary gate:

    - ``exact``: the blocked-GEMM all-pairs engine
      (``blockpair.blocked_cosine_pairs``) — O(n²/block²) block pairs.
      Exact for any threshold, the right engine while the corpus is small
      enough that the quadratic block-pair count is cheap.
    - ``lsh``: multi-table hyperplane-LSH candidate generation + exact
      cosine verification (``embedding_near_dup_pairs``) — shuffle is on
      bucket keys, sub-quadratic. Candidate recall < 1 in theory; with
      near-dup-grade thresholds (tight clusters) and enough tables the
      miss probability per true pair is (1−(1−θ/π)^planes)^tables ≈ 0.
    - ``auto``: ``exact`` while the corpus has ≤ ``exact_max_rows`` rows
      (pass ``n_rows`` to skip the count when the caller already knows),
      else ``lsh`` — so the same call site stays correct at sf0.01 and
      survives a 100× corpus without a quadratic blow-up.
    """
    if strategy == "auto":
        n = n_rows if n_rows is not None else corpus.count()
        strategy = "exact" if n <= exact_max_rows else "lsh"
    if strategy == "exact":
        from featureextraction_spark.operators.blockpair import blocked_cosine_pairs

        return blocked_cosine_pairs(
            corpus,
            id_col=id_col,
            vec_col=vec_col,
            threshold=threshold,
            block_size=block_size,
            round_digits=round_digits,
        )
    if strategy != "lsh":
        raise ValueError(f"unknown embedding_pairs strategy: {strategy!r}")
    return embedding_near_dup_pairs(
        corpus,
        threshold=threshold,
        id_col=id_col,
        vec_col=vec_col,
        n_planes=n_planes,
        n_tables=n_tables,
        seed=seed,
        round_digits=round_digits,
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the coarse-quantizer scale path
# ---------------------------------------------------------------------------


def ivf_fit(
    corpus: DataFrame,
    n_lists: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 20,
    init_mode: str = "k-means||",
) -> tuple[list[list[float]], DataFrame]:
    """Train the IVF coarse quantizer and assign every corpus vector to its
    nearest centroid list.

    Spherical k-means via the built-in ``pyspark.ml`` KMeans over
    L2-NORMALIZED vectors (argmin euclidean over unit vectors == argmax
    cosine), seeded for determinism. Returns (centroids as plain lists,
    corpus with a ``list_id`` column). At 10^9+ vectors, fit on a sample
    (`corpus.sample`) — assignment is the only full pass, and it is one
    narrow projection + a model transform (no shuffle).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    normed = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        array_to_vector(
            F.transform(
                vec_col, lambda x: x.cast("double") / _norm(F.col(vec_col))
            )
        ).alias("__nv"),
    )
    # the fit iterates over its input: persist through the fit so each
    # iteration (and the final assignment pass) reads cached blocks, not
    # the parquet scan + normalization again
    normed = normed.persist()
    # init_mode="random" skips kmeans||'s ~5 extra init passes — right
    # when centroid QUALITY doesn't matter (e.g. full-probe IVF, which is
    # exact for ANY centroids); keep the default for real ANN indexes
    km = KMeans(k=n_lists, seed=seed, maxIter=max_iter, featuresCol="__nv",
                predictionCol="list_id", initMode=init_mode)
    try:
        model = km.fit(normed)
        assigned = model.transform(normed).select(id_col, vec_col, "list_id")
        # materialize the (narrow) assignment before dropping the cache the
        # plan depends on
        assigned = assigned.localCheckpoint()
    finally:
        normed.unpersist()
    centroids = [c.tolist() for c in model.clusterCenters()]
    return centroids, assigned


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    round_digits: int = 6,
    assigned: DataFrame | None = None,
    centroids: list[list[float]] | None = None,
    max_iter: int = 20,
    init_mode: str = "k-means||",
) -> DataFrame:
    """Approximate top-k via IVF: probe the ``n_probe`` nearest centroid
    lists per query, exact cosine + rank over those lists' members only.

    The probe→list join is a plain equi-join on ``list_id`` — shuffle is
    bounded by list sizes × n_probe, never a cartesian. Recall grows with
    n_probe (n_probe == n_lists ≡ exact brute force); measured against
    ``cosine_topk`` in the tests. Pass a prebuilt (``centroids``,
    ``assigned``) pair to reuse one index across query batches.
    """
    from pyspark.sql import Window

    if assigned is None or centroids is None:
        centroids, assigned = ivf_fit(
            corpus, n_lists, id_col, vec_col, seed=seed, max_iter=max_iter,
            init_mode=init_mode,
        )

    # per-query centroid scores JVM-side: cosine(query, centroid_i) for the
    # (tiny, literal) centroid matrix; take the n_probe best list ids
    scores = F.array(
        *[
            F.struct(
                cosine_similarity_col(
                    F.col(vec_col), F.array(*[F.lit(float(v)) for v in c])
                ).alias("s"),
                F.lit(i).alias("list_id"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    probed = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        F.slice(F.reverse(F.array_sort(scores)), 1, n_probe).alias("__top"),
    ).select(
        "query_id",
        "__qv",
        F.explode(F.transform("__top", lambda t: t["list_id"])).alias("list_id"),
    )
    cand = probed.join(
        assigned.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("__cv"),
            "list_id",
        ),
        "list_id",
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    scored = cand.withColumn(
        "cosine",
        F.round(cosine_similarity_col(F.col("__qv"), F.col("__cv")), round_digits),
    ).select("query_id", "neighbor_id", "cosine")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("long").alias("rank"))
    )


# ---------------------------------------------------------------------------
# SemDeDup — semantic dedup within coarse clusters
# ---------------------------------------------------------------------------


def _semdedup_gemm_max_lower(
    emb: DataFrame,
    cluster_col: str,
    id_col: str,
    vec_col: str,
    round_digits: int,
    block_size: int = 1024,
) -> DataFrame:
    """(id → max rounded cosine to any lower-id same-cluster peer) via one
    numpy GEMM per in-cluster block pair, mirroring
    ``blockpair.blocked_cosine_pairs``: per-cluster id-sorted blocks,
    ``ab <= bb`` join keyed on the cluster, matrix multiply per task. Same
    Σc² pair count as the expression path, ~matrix-kernel constant factor
    instead of a per-pair expression tree.
    """
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import Window

    id_type = dict(emb.dtypes)[id_col]
    w = Window.partitionBy("__c").orderBy(id_col)
    blocks = (
        emb.select(
            F.col(cluster_col).alias("__c"), F.col(id_col), F.col(vec_col)
        )
        .withColumn("__blk", ((F.row_number().over(w) - 1) / block_size).cast("int"))
        .groupBy("__c", "__blk")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(F.col(id_col).alias("i"), F.col(vec_col).alias("v"))
                )
            ).alias("rows")
        )
    )
    a = blocks.select(
        "__c", F.col("__blk").alias("ab"), F.col("rows").alias("arows")
    )
    b = blocks.select(
        "__c", F.col("__blk").alias("bb"), F.col("rows").alias("brows")
    )
    pairs = a.join(b, "__c").filter(F.col("ab") <= F.col("bb"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                aids = np.asarray([r["i"] for r in row.arows])
                av = np.array([r["v"] for r in row.arows], dtype=np.float64)
                bids = np.asarray([r["i"] for r in row.brows])
                bv = np.array([r["v"] for r in row.brows], dtype=np.float64)
                an = av / np.linalg.norm(av, axis=1, keepdims=True)
                bn = bv / np.linalg.norm(bv, axis=1, keepdims=True)
                cos = np.round(an @ bn.T, round_digits)
                lower = aids[:, None] < bids[None, :]
                best = np.where(lower, cos, -np.inf).max(axis=0)
                ok = best > -np.inf
                if ok.any():
                    yield pd.DataFrame(
                        {"__b_id": bids[ok], "__cos": best[ok]}
                    )

    per = pairs.mapInPandas(
        kernel, schema=f"__b_id {id_type}, __cos double"
    ).groupBy("__b_id").agg(F.max("__cos").alias("max_cos_lower"))
    return per


def semdedup(
    emb: DataFrame,
    cluster_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.35,
    round_digits: int = 6,
    strategy: str = "auto",
    gemm_min_rows: int = 1000,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al.,
    arXiv:2303.09540): restrict pairwise cosine comparison to COARSE
    CLUSTERS, then within each cluster keep one representative per
    near-duplicate neighborhood.

    The keep rule is deterministic and engine-replayable: a vector is a
    DUPLICATE iff some lower-id vector in the same cluster has
    round(cosine, round_digits) >= threshold — so the lowest id of every
    duplicate neighborhood survives, with no RNG and no iteration order.

    Returns one row per input vector: (id, cluster, max_cos_lower, keep)
    where max_cos_lower is the rounded max cosine to any lower-id
    same-cluster peer (NULL for each cluster's lowest id).

    Scale design: the self-join is keyed on the cluster column — pair
    count is Σ c_i², bounded by the coarse clustering granularity exactly
    as in the paper (k-means lists via ``ivf_fit`` work as the cluster
    assignment at scale; any categorical column works for a pre-bucketed
    corpus). One shuffle on the cluster key, one agg on id.

    ``strategy``: ``"expr"`` evaluates dot products as JVM
    ``zip_with``/``aggregate`` folds — bit-identical to DuckDB's
    ``list_dot_product`` sequential fold (the driver-oracle contract);
    ``"gemm"`` runs one numpy matrix multiply per in-cluster block pair
    (Arrow batches, ~50× per-pair constant) — same rounded values except
    where a pairwise-summed dot differs from the sequential fold at the
    round boundary; ``"auto"`` (default) uses expr below
    ``gemm_min_rows`` corpus rows (small/oracled runs) and gemm above
    (the 100-TB regime, where the matrix kernel constant dominates).
    """
    if strategy not in ("auto", "expr", "gemm"):
        raise ValueError(f"unknown semdedup strategy: {strategy!r}")
    if strategy == "auto":
        strategy = "gemm" if emb.count() >= gemm_min_rows else "expr"
    if strategy == "gemm":
        per = _semdedup_gemm_max_lower(
            emb, cluster_col, id_col, vec_col, round_digits
        ).withColumnRenamed("__b_id", "__out_id")
        return (
            emb.select(F.col(id_col), F.col(cluster_col))
            .join(per, F.col(id_col) == F.col("__out_id"), "left")
            .select(
                id_col,
                cluster_col,
                "max_cos_lower",
                F.coalesce(
                    F.col("max_cos_lower") < F.lit(float(threshold)), F.lit(True)
                )
                .cast("long")
                .alias("keep"),
            )
        )
    a = emb.select(
        F.col(cluster_col).alias("__c"),
        F.col(id_col).alias("__a_id"),
        F.col(vec_col).alias("__va"),
    )
    b = emb.select(
        F.col(cluster_col).alias("__c"),
        F.col(id_col).alias("__b_id"),
        F.col(vec_col).alias("__vb"),
    )
    per = (
        a.join(b, "__c")
        .filter(F.col("__a_id") < F.col("__b_id"))
        .select(
            F.col("__b_id"),
            F.round(
                cosine_similarity_col(F.col("__va"), F.col("__vb")), round_digits
            ).alias("__cos"),
        )
        .groupBy("__b_id")
        .agg(F.max("__cos").alias("max_cos_lower"))
    )
    return (
        emb.select(F.col(id_col), F.col(cluster_col))
        .join(per, F.col(id_col) == F.col("__b_id"), "left")
        .select(
            id_col,
            cluster_col,
            "max_cos_lower",
            # 0/1 long, not boolean — keeps the driver's cross-engine value
            # hash on column types every other green query already uses
            F.coalesce(
                F.col("max_cos_lower") < F.lit(float(threshold)), F.lit(True)
            )
            .cast("long")
            .alias("keep"),
        )
    )


# ---------------------------------------------------------------------------
# Product quantization — the PQ half of the billion-scale IVF-PQ recipe
# (Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
# Search", TPAMI 2011)
# ---------------------------------------------------------------------------


def pq_sample_codebooks(
    corpus: DataFrame,
    m: int = 4,
    ks: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Deterministic data-derived PQ codebooks: subspace ``j``'s codebook
    is the ``j``-th subvector of the ``ks`` smallest-id corpus vectors.

    Quantization quality is poor next to ``pq_fit`` (k-means), but every
    step is plain SQL over the corpus itself — the fully-replayable
    codebook path the DuckDB correctness gate drives. The collect is
    ``ks`` rows (codebooks are O(m·ks·d/m) = O(ks·d) floats — driver-tiny
    at any corpus scale, like FAISS codebooks).
    """
    rows = (
        corpus.orderBy(id_col)
        .limit(ks)
        .select(F.col(vec_col).cast("array<double>"))
        .collect()
    )
    d = len(rows[0][0])
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    return [
        [[float(x) for x in r[0][j * dsub : (j + 1) * dsub]] for r in rows]
        for j in range(m)
    ]


def pq_fit(
    corpus: DataFrame,
    m: int = 4,
    ks: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_n: int = 4096,
    seed: int = 42,
    iters: int = 12,
) -> list[list[list[float]]]:
    """k-means PQ codebooks, FAISS-style: train per-subspace Lloyd's on a
    BOUNDED deterministic sample (content-addressed md5 rank, so the
    sample — and therefore the codebook — is independent of partitioning
    and cluster size). The full corpus is never collected; at 10^9+
    vectors codebook training on a ~10^6 sample is the standard practice,
    and encoding (the only full pass) stays distributed.
    """
    import numpy as np

    sample_rows = (
        corpus.select(
            F.col(vec_col).cast("array<double>").alias("__v"),
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", F.col(id_col), F.lit(seed))), 1, 15
                ),
                16,
                10,
            )
            .cast("long")
            .alias("__r"),
        )
        .orderBy("__r", "__v")
        .limit(sample_n)
        .collect()
    )
    X = np.asarray([r["__v"] for r in sample_rows], dtype=np.float64)
    d = X.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    rng = np.random.default_rng(seed)
    codebooks = []
    for j in range(m):
        sub = X[:, j * dsub : (j + 1) * dsub]
        # k-means++-ish deterministic init: distinct sample rows
        init_idx = rng.choice(len(sub), size=min(ks, len(sub)), replace=False)
        cent = sub[np.sort(init_idx)].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(len(cent)):
                members = sub[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        codebooks.append([[float(x) for x in row] for row in cent])
    return codebooks


def _pq_sub_d2(vec: Column, j: int, dsub: int, centroid: list[float]) -> Column:
    """Squared L2 between subvector j of ``vec`` and a literal centroid,
    decomposed as dot(a,a) − 2·dot(a,b) + dot(b,b) — three sequential
    folds, the exact formula the DuckDB oracle replays bit-for-bit."""
    a = F.slice(vec, j * dsub + 1, dsub)
    b = F.array(*[F.lit(float(x)) for x in centroid])
    bb = float(_py_dot(centroid, centroid))
    return _dot(a, a) - F.lit(2.0) * _dot(a, b) + F.lit(bb)


def _py_dot(a: list[float], b: list[float]) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def pq_encode(
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Encode every vector as ``m`` codebook indices (argmin subspace L2,
    ties to the smallest code). Pure JVM expressions over literal
    codebooks — the encode pass is the only full-corpus pass and it is
    map-only (no shuffle, no Python)."""
    m = len(codebooks)
    ks = len(codebooks[0])
    dsub = len(codebooks[0][0])
    v = F.col(vec_col).cast("array<double>")
    codes = []
    for j in range(m):
        cands = F.array(
            *[
                F.struct(
                    _pq_sub_d2(v, j, dsub, codebooks[j][c]).alias("d2"),
                    F.lit(c).alias("c"),
                )
                for c in range(ks)
            ]
        )
        codes.append(F.array_min(cands)["c"])
    return corpus.select(
        F.col(id_col), F.array(*codes).alias("codes"), *[F.col(c) for c in keep]
    )


def pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    codebooks: list[list[list[float]]] | None = None,
    k: int = 10,
    m: int = 4,
    ks: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    encoded: DataFrame | None = None,
    strategy: str = "auto",
    flat_max_rows: int = 200_000,
    n_rows: int | None = None,
    n_lists: int = 32,
    n_probe: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k by inner product: corpus vectors
    are PQ codes, queries stay exact; score(q, x) ≈ Σ_j dot(q_j,
    C_j[code_j(x)]), evaluated as a per-query lookup table indexed by the
    neighbor's codes — the classic PQ scan — with an automatic physical
    strategy mirroring ``embedding_pairs``'s corpus-size gate:

    - ``flat``: scan every code (linear per query) — exact ADC, the right
      engine while the corpus is small enough that queries × corpus is
      cheap.
    - ``ivfpq``: delegate to ``ivfpq_topk`` with the same codebooks —
      coarse-probe ``n_probe`` of ``n_lists`` inverted lists, so the scan
      cost per query drops to (n·n_probe/n_lists)·m LUT adds and the
      candidate join is an equi-join on ``list_id``. Approximate (the
      standard ANN contract); row-identical to ``flat`` at
      ``n_probe == n_lists`` (pytest: test_ivfpq_full_probe_equals_pq_scan,
      test_pq_topk_auto_gate_ivfpq_full_probe).
    - ``auto``: ``flat`` while the corpus has ≤ ``flat_max_rows`` rows
      (pass ``n_rows`` to skip the count when the caller already knows),
      else ``ivfpq`` — the same call site stays exact at sf0.01 and
      survives a 100× corpus without a quadratic queries×corpus blow-up.
      Callers that pass a precomputed ``encoded`` table stay on ``flat``
      (the IVF path re-encodes with list assignments).

    Scale design (flat): the corpus side carries only ``m`` small-int
    codes per vector (d·4 bytes → m bytes — the whole point of PQ); the
    LUT is m·ks dot products per QUERY, built JVM-side from literal
    codebooks; the scan is a broadcast-able join of the (small) query set
    against codes with a fixed-order 4-term add per pair — no Python, no
    full-width vector shuffle.
    """
    from pyspark.sql import Window

    if strategy == "auto":
        if encoded is not None:
            strategy = "flat"
        else:
            n = n_rows if n_rows is not None else corpus.count()
            strategy = "flat" if n <= flat_max_rows else "ivfpq"
    if strategy == "ivfpq":
        return ivfpq_topk(
            queries,
            corpus,
            k=k,
            n_lists=n_lists,
            n_probe=n_probe,
            m=m,
            ks=ks,
            codebooks=codebooks,
            id_col=id_col,
            vec_col=vec_col,
            seed=seed,
            round_digits=round_digits,
        )
    if strategy != "flat":
        raise ValueError(f"unknown pq_topk strategy: {strategy!r}")
    if codebooks is None:
        codebooks = pq_sample_codebooks(
            corpus, m=m, ks=ks, id_col=id_col, vec_col=vec_col
        )
    m = len(codebooks)
    ks = len(codebooks[0])
    dsub = len(codebooks[0][0])
    if encoded is None:
        encoded = pq_encode(corpus, codebooks, id_col=id_col, vec_col=vec_col)

    qv = F.col(vec_col).cast("array<double>")
    luts = [
        F.array(
            *[
                _dot(
                    F.slice(qv, j * dsub + 1, dsub),
                    F.array(*[F.lit(float(x)) for x in codebooks[j][c]]),
                )
                for c in range(ks)
            ]
        ).alias(f"__lut{j}")
        for j in range(m)
    ]
    q = queries.select(F.col(id_col).alias("query_id"), *luts)
    cand = q.crossJoin(
        encoded.select(F.col(id_col).alias("neighbor_id"), "codes")
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    adc = F.col("__lut0")[F.col("codes")[0]]
    for j in range(1, m):
        adc = adc + F.col(f"__lut{j}")[F.col("codes")[j]]
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(adc, round_digits).alias("adc"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "adc", F.col("rank").cast("long").alias("rank")
        )
    )


def ivfpq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_lists: int = 8,
    n_probe: int = 2,
    m: int = 4,
    ks: int = 8,
    codebooks: list[list[list[float]]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    round_digits: int = 6,
    centroids: list[list[float]] | None = None,
    assigned: DataFrame | None = None,
    init_mode: str = "k-means||",
    max_iter: int = 20,
) -> DataFrame:
    """IVF-PQ — the billion-scale composition: probe the ``n_probe``
    nearest coarse lists per query (IVF), then ADC-score ONLY those
    lists' PQ codes (per-query LUT over literal codebooks).

    The scan cost per query drops from n·m LUT adds to
    (n·n_probe/n_lists)·m, and the corpus side of the join carries only
    (list_id, m codes) — no full-width vectors cross the wire. The
    candidate join is an equi-join on ``list_id`` (never a cartesian).
    ``n_probe == n_lists`` scans every list and is row-identical to
    ``pq_topk`` with the same codebooks (tested); recall at lower
    n_probe is measured against the exact scan in the tests.
    """
    from pyspark.sql import Window

    if assigned is None or centroids is None:
        centroids, assigned = ivf_fit(
            corpus, n_lists, id_col, vec_col, seed=seed,
            max_iter=max_iter, init_mode=init_mode,
        )
    if codebooks is None:
        codebooks = pq_sample_codebooks(
            corpus, m=m, ks=ks, id_col=id_col, vec_col=vec_col
        )
    m = len(codebooks)
    ks = len(codebooks[0])
    dsub = len(codebooks[0][0])
    encoded = pq_encode(
        assigned, codebooks, id_col=id_col, vec_col=vec_col, keep=("list_id",)
    )

    qv = F.col(vec_col).cast("array<double>")
    luts = [
        F.array(
            *[
                _dot(
                    F.slice(qv, j * dsub + 1, dsub),
                    F.array(*[F.lit(float(x)) for x in codebooks[j][c]]),
                )
                for c in range(ks)
            ]
        ).alias(f"__lut{j}")
        for j in range(m)
    ]
    probe_scores = F.array(
        *[
            F.struct(
                cosine_similarity_col(
                    F.col(vec_col), F.array(*[F.lit(float(v)) for v in c])
                ).alias("s"),
                F.lit(i).alias("list_id"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    probed = queries.select(
        F.col(id_col).alias("query_id"),
        *luts,
        F.slice(F.reverse(F.array_sort(probe_scores)), 1, n_probe).alias("__top"),
    ).select(
        "query_id",
        *[f"__lut{j}" for j in range(m)],
        F.explode(F.transform("__top", lambda t: t["list_id"])).alias("list_id"),
    )
    cand = probed.join(
        encoded.select(
            F.col(id_col).alias("neighbor_id"), "codes", "list_id"
        ),
        "list_id",
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    adc = F.col("__lut0")[F.col("codes")[0]]
    for j in range(1, m):
        adc = adc + F.col(f"__lut{j}")[F.col("codes")[j]]
    scored = cand.select(
        "query_id", "neighbor_id", F.round(adc, round_digits).alias("adc")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "adc", F.col("rank").cast("long").alias("rank")
        )
    )


def dot_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Exact top-k neighbors per query by RAW inner product (maximum
    inner-product search, MIPS) — the scale-sensitive sibling of
    :func:`cosine_topk` (recommender scores, un-normalized rerankers).
    Same broadcast shape and deterministic (score desc, id asc) tie
    order; self-matches excluded."""
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "dot", F.round(_dot(F.col("__qv"), F.col("__cv")), round_digits)
        )
        .drop("__qv", "__cv")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dot").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )


def knn_classify(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """k-nearest-neighbor majority-vote classification over an
    embedding column — the standard embedding-quality probe (Cover &
    Hart 1967): if cosine neighborhoods predict labels, the space
    clusters by class. Self-matches are excluded by
    :func:`cosine_topk`, so querying the corpus with itself is exact
    leave-one-out evaluation.

    Determinism end-to-end: neighbor sets rank on (rounded cosine desc,
    id asc) — the :func:`cosine_topk` contract — and the vote breaks
    ties on (votes desc, label asc), so `pred` is a pure function of
    the data on every engine. `votes` is the BIGINT hash vehicle; no
    float leaves the ranking.

    Scale: rides whatever neighbor engine produced the top-k — swap
    :func:`cosine_topk` for :func:`ivf_topk` / :func:`ivfpq_topk` above
    broadcastable corpora (identical downstream vote); the vote itself
    is one groupBy(query, label) + a k-row-per-query window.
    """
    from pyspark.sql import Window

    nn = cosine_topk(queries, corpus, k=k, id_col=id_col, vec_col=vec_col)
    nn = nn.join(
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(label_col).alias("__nb_label"),
        ),
        "neighbor_id",
    )
    votes = nn.groupBy("query_id", "__nb_label").agg(
        F.count(F.lit(1)).cast("long").alias("votes")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("votes").desc(), F.col("__nb_label").asc()
    )
    pred = (
        votes.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("query_id", F.col("__nb_label").alias("pred"), "votes")
    )
    truth = queries.select(
        F.col(id_col).alias("query_id"), F.col(label_col).alias("label")
    )
    return pred.join(truth, "query_id").select(
        "query_id", "label", "pred", "votes",
        (F.col("pred") == F.col("label")).cast("long").alias("hit"),
    )


def pair_distance_profile(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_mod: int = 5,
    n_bins_half: int = 10,
    seed: int = 7,
) -> DataFrame:
    """Pairwise-cosine distribution profile of an embedding corpus —
    the geometry health-check run before tuning any dedup/ANN threshold
    (a hub-dominated or collapsed space shows up here first: mass piled
    near 1.0 means near-duplicate saturation, mass at 0 means healthy
    spread).

    All pairs of a DETERMINISTIC hash sample (ids with
    ``hash60(id:seed) % sample_mod == 0`` — content-addressed, no RNG,
    grows O(N/sample_mod)), binned on the integer-quantized cosine:
    ``bin = (quantize_q6(cos) + 1e6) div 1e5`` — clamp-free because
    cosine is already in [−1, 1]; 2·n_bins_half buckets of width 0.1
    plus bin 2·n_bins_half for cos ≈ 1.0 exactly. Counts and the total
    are exact BIGINTs; each bin's share is one closing division.

    Scale: the sample (s = N/sample_mod rows) broadcasts; the s²/2 pair
    stream never materializes — it flows straight into a ≤ 21-row
    map-side-combinable aggregate. Size sample_mod so s stays in the
    10-50k range (10⁸–10⁹ cheap dot products across the cluster); for
    corpus-scale all-pairs work use the LSH/IVF engines instead — this
    operator is a PROFILE, not a join.
    """
    from ..operators.rolling import quantize_q6
    from ..operators.sampling import _seed_hash

    s = emb.filter(
        F.pmod(_seed_hash(id_col, seed), F.lit(sample_mod)) == 0
    ).select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
    b = s.select(
        F.col("__id").alias("__id2"), F.col("__v").alias("__v2")
    )
    pairs = s.crossJoin(F.broadcast(b)).where(F.col("__id") < F.col("__id2"))
    width_q = 1_000_000 // n_bins_half
    binned = pairs.select(
        quantize_q6(
            cosine_similarity_col(F.col("__v"), F.col("__v2"))
        ).alias("__q")
    ).select(
        F.expr(f"CAST((__q + 1000000) div {width_q} AS BIGINT)").alias("bin")
    )
    hist = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs")
    )
    tot = hist.agg(F.sum("n_pairs").cast("long").alias("total_pairs"))
    return hist.crossJoin(F.broadcast(tot)).select(
        "bin",
        ((F.col("bin") * width_q) - 1_000_000).cast("long").alias("lo_q6"),
        "n_pairs",
        "total_pairs",
        (F.col("n_pairs").cast("double") / F.col("total_pairs").cast("double"))
        .alias("share"),
    )


def hard_negative_mining(
    anchors: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    round_digits: int = 6,
) -> DataFrame:
    """Hardest-negative mining for contrastive training (Schroff FaceNet
    CVPR'15 semi-hard sampling, done exactly): for each anchor, the most
    cosine-similar corpus row with a DIFFERENT label (the hard negative)
    and the most similar with the SAME label (the positive), plus the
    margin between them. Margin ≤ 0 flags anchors whose nearest neighbor
    crosses the class boundary — exactly the pairs a contrastive loss
    learns most from, and exactly what a curation pass exports.

    Determinism: both ranks order on (rounded cosine desc, id asc) — the
    :func:`cosine_topk` contract; the margin is a difference of two
    already-rounded values (exact multiples of 10^-round_digits), so no
    fresh float boundary is introduced. Self-matches excluded.

    Scale: the anchor batch broadcasts and the corpus STREAMS past it
    (the :func:`cosine_topk` shape — corpus-side scan, no corpus
    shuffle); mine in anchor batches of ~10k. Above broadcastable
    anchor batches, run the same downstream ranks over
    :func:`ivf_topk` candidates — the rank/join logic is
    engine-agnostic. The two ranks share ONE window exchange keyed on
    the anchor id.
    """
    from pyspark.sql import Window

    a = anchors.select(
        F.col(id_col).alias("anchor_id"),
        F.col(vec_col).alias("__av"),
        F.col(label_col).alias("anchor_label"),
    )
    c = corpus.select(
        F.col(id_col).alias("other_id"),
        F.col(vec_col).alias("__cv"),
        F.col(label_col).alias("__olabel"),
    )
    scored = (
        c.join(F.broadcast(a), F.col("anchor_id") != F.col("other_id"))
        .withColumn(
            "cosine",
            F.round(
                cosine_similarity_col(F.col("__av"), F.col("__cv")),
                round_digits,
            ),
        )
        .withColumn("__same", F.col("__olabel") == F.col("anchor_label"))
    )
    w = Window.partitionBy("anchor_id", "__same").orderBy(
        F.col("cosine").desc(), F.col("other_id").asc()
    )
    best = scored.withColumn("__rn", F.row_number().over(w)).where(
        F.col("__rn") == 1
    )
    pos = best.where(F.col("__same")).select(
        "anchor_id",
        "anchor_label",
        F.col("other_id").alias("pos_id"),
        F.col("cosine").alias("pos_cos"),
    )
    neg = best.where(~F.col("__same")).select(
        "anchor_id",
        F.col("other_id").alias("neg_id"),
        F.col("cosine").alias("neg_cos"),
    )
    return pos.join(neg, "anchor_id").select(
        "anchor_id", "anchor_label", "pos_id", "pos_cos", "neg_id", "neg_cos",
        (F.col("pos_cos") - F.col("neg_cos")).alias("margin"),
        (F.col("pos_cos") <= F.col("neg_cos")).cast("long").alias("is_violation"),
    )
