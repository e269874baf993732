"""Integer-exact covariance of an embedding column + driver-side PCA.

The covariance matrix of a ``d``-dim embedding column is the canonical
map-side-combinable statistic: every moment it needs (n, per-dimension
sums, pairwise product sums) is an associative integer aggregate once the
components are quantized to 1e-6 micro-units
(``CAST(floor(x * 1e6 + 0.5) AS BIGINT)`` — identical IEEE ops on both
engines, so the sums are a portable hash vehicle; the float covariance is
ONE subtraction + two divisions on those integers, nudge-rounded by the
caller).

Two physical strategies, auto-gated on corpus size like
``similarity.embedding_pairs``:

- ``expr``  — posexplode components → equi-self-join on the row id with
  ``j >= i`` → one groupBy((i, j)).  d(d+1)/2 pair rows per input row,
  pure Catalyst expressions; the literal shape the DuckDB oracle replays.
- ``gemm``  — per-Arrow-batch int64 Gram matrix ``Xᵀ X`` via numpy
  matmul inside ``mapInPandas``, emitting d(d+1)/2 PARTIAL rows per
  batch, then one tiny groupBy.  Shuffle volume is O(n_batches · d²)
  instead of O(n · d²) — the 100-TB plan: the reduction happens map-side
  in a BLAS kernel, and the final shuffle is bounded by the batch count,
  not the corpus.  Integer adds are exact and order-free, so the two
  strategies are bit-identical (asserted by test).

Overflow budget: |x| ≤ X ⇒ |xq| ≤ X·1e6 and Σ xq_i·xq_j ≤ n·X²·1e12;
int64 holds to n·X² ≤ 9.2e6.  For unit-norm-ish embeddings (X ≈ 1) that
is ~9M rows per final sum — beyond that, pre-aggregate per shard and
promote the final reduce to ``decimal(38,0)`` (the gemm path already
keeps per-batch partials small).  The driver gate runs well inside it.

``pca_components`` eigendecomposes the d×d covariance on the driver
(d ≤ a few thousand — the matrix is tiny regardless of corpus size) and
fixes the eigenvector sign so projections are deterministic; covered by
pytest against numpy on the collected corpus (eigen order/sign make it a
poor cross-engine SQL hash vehicle — the covariance itself is the
driver-gated contract).

No reference counterpart; standard embedding-curation machinery (the
reference's closest analog is the all-pairs similarity evaluation,
``src/training/statistics.py:22-60``, which also reduces the corpus to a
dense-linear-algebra statistic).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Q = 1_000_000


def _quantized_components(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, i, xq) long table: component index + 1e-6-quantized value."""
    return emb.select(
        F.col(id_col).alias("__id"),
        F.posexplode(vec_col).alias("i", "__x"),
    ).select(
        "__id",
        F.col("i").cast("int").alias("i"),
        F.floor(F.col("__x").cast("double") * F.lit(1e6) + F.lit(0.5))
        .cast("long")
        .alias("xq"),
    )


def _cov_moments_expr(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(i, j, n, sum_i, sum_j, s_ij) via explode + self-join, j >= i."""
    comp = _quantized_components(emb, id_col, vec_col)
    a = comp.select("__id", F.col("i"), F.col("xq").alias("xi"))
    b = comp.select("__id", F.col("i").alias("j"), F.col("xq").alias("xj"))
    pairs = a.join(b, "__id").filter(F.col("j") >= F.col("i"))
    sums = comp.groupBy("i").agg(
        F.count(F.lit(1)).alias("n"), F.sum("xq").alias("s")
    )
    moments = pairs.groupBy("i", "j").agg(
        F.sum(F.col("xi") * F.col("xj")).alias("s_ij")
    )
    si = sums.select("i", "n", F.col("s").alias("sum_i"))
    sj = sums.select(F.col("i").alias("j"), F.col("s").alias("sum_j"))
    return (
        moments.join(F.broadcast(si), "i")
        .join(F.broadcast(sj), "j")
        .select("i", "j", "n", "sum_i", "sum_j", "s_ij")
    )


def _cov_moments_gemm(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Same moments via per-batch int64 Gram partials (map-side combine)."""
    from collections.abc import Iterator

    import pandas as pd

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.array(list(pdf["__v"]), dtype=np.float64)
            xq = np.floor(x * 1e6 + 0.5).astype(np.int64)
            gram = xq.T @ xq  # exact: int64 matmul
            s = xq.sum(axis=0)
            d = xq.shape[1]
            iu, ju = np.triu_indices(d)
            yield pd.DataFrame(
                {
                    "i": iu.astype(np.int32),
                    "j": ju.astype(np.int32),
                    "pn": np.full(len(iu), xq.shape[0], dtype=np.int64),
                    "psum_i": s[iu],
                    "psum_j": s[ju],
                    "ps_ij": gram[iu, ju],
                }
            )

    partials = emb.select(F.col(vec_col).alias("__v")).mapInPandas(
        kernel, schema="i int, j int, pn long, psum_i long, psum_j long, ps_ij long"
    )
    return partials.groupBy("i", "j").agg(
        F.sum("pn").alias("n"),
        F.sum("psum_i").alias("sum_i"),
        F.sum("psum_j").alias("sum_j"),
        F.sum("ps_ij").alias("s_ij"),
    )


def embedding_covariance(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    strategy: str = "auto",
    gemm_min_rows: int = 2000,
    n_rows: int | None = None,
) -> DataFrame:
    """Upper-triangle covariance moments + the sample covariance itself.

    Returns (i, j, n, sum_i, sum_j, s_ij, cov) with ``i <= j``; ``cov``
    is ``(s_ij - sum_i·sum_j/n) / (n-1) / 1e12`` — identical float ops
    on identical integers on any engine; callers nudge-round it.
    """
    if strategy not in ("auto", "expr", "gemm"):
        raise ValueError(f"unknown strategy {strategy!r}")
    if strategy == "auto":
        n = n_rows if n_rows is not None else emb.count()
        strategy = "gemm" if n >= gemm_min_rows else "expr"
    moments = (
        _cov_moments_gemm(emb, id_col, vec_col)
        if strategy == "gemm"
        else _cov_moments_expr(emb, id_col, vec_col)
    )
    # sums multiply as DOUBLES: DuckDB promotes BIGINT sums to HUGEINT,
    # Spark stays in long (wrap-around at 2^63) — double×double is the
    # one product both engines compute identically, and the casts are
    # exact while |sum| < 2^53 (comfortably true at gate scales).
    nd = F.col("n").cast("double")
    cov = (
        (
            F.col("s_ij").cast("double")
            - F.col("sum_i").cast("double") * F.col("sum_j").cast("double") / nd
        )
        / (nd - F.lit(1.0))
        / F.lit(1e12)
    )
    return moments.select(
        "i", "j", "n", "sum_i", "sum_j", "s_ij", cov.alias("cov")
    )


def pca_components(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    strategy: str = "auto",
) -> tuple[np.ndarray, np.ndarray]:
    """Top-k principal axes from the distributed covariance.

    The d×d covariance is collected (d² values — independent of corpus
    size) and eigendecomposed on the driver; eigenvector sign is fixed so
    the largest-|component| entry is positive.  Returns
    (eigenvalues desc [k], components [k, d]).
    """
    rows = embedding_covariance(
        emb, id_col=id_col, vec_col=vec_col, strategy=strategy
    ).collect()
    d = max(r.j for r in rows) + 1
    c = np.zeros((d, d))
    for r in rows:
        c[r.i, r.j] = r.cov
        c[r.j, r.i] = r.cov
    vals, vecs = np.linalg.eigh(c)
    order = np.argsort(vals)[::-1][:k]
    vals, vecs = vals[order], vecs[:, order].T
    for row in vecs:  # deterministic sign
        if row[np.argmax(np.abs(row))] < 0:
            row *= -1
    return vals, vecs


def pca_project(
    emb: DataFrame,
    components: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Project each embedding onto the given axes — JVM-side fold per
    axis (zip_with + aggregate), zero Python in the per-row path."""
    out = emb.select(id_col, vec_col)
    for ki, axis in enumerate(components):
        lit = F.array(*[F.lit(float(a)) for a in axis])
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), lit, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        out = out.withColumn(f"pc{ki}", dot)
    return out.drop(vec_col)


def label_centroids(
    emb: DataFrame,
    vec_col: str = "embedding",
    label: str = "label",
) -> DataFrame:
    """Per-class centroid of an embedding column, fully relational:
    one row per (label, dim) with n, the exact 1e-6-quantized component
    sum, and the mean as ONE integer÷integer division (caller
    nudge-rounds). The nearest-centroid / prototype side of the
    similarity stack (SemDeDup's cluster step reads the same shape).

    Components quantize through CAST(float → double) FIRST — float32
    bits widen identically on both engines, then the same IEEE
    multiply/floor. One posexplode (d rows per vector) + one
    map-combinable groupBy onto |labels|·d rows; no vector ever
    collects to the driver.
    """
    t = emb.select(
        F.col(label),
        F.posexplode(F.col(vec_col)).alias("dim", "__x"),
    ).withColumn(
        "__cq",
        F.floor(F.col("__x").cast("double") * F.lit(1e6) + F.lit(0.5)).cast("long"),
    )
    out = t.groupBy(label, "dim").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__cq").cast("long").alias("sum_cq"),
    )
    return out.select(
        label,
        F.col("dim").cast("long").alias("dim"),
        "n",
        "sum_cq",
        (
            F.col("sum_cq").cast("double")
            / (F.lit(1e6) * F.col("n").cast("double"))
        ).alias("centroid"),
    )
