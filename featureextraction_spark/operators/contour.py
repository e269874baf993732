"""Relational (expression-only) contour + OLS operators (SURVEY.md W3, A10).

The same clamped-cumsum characteristic contour and first-degree OLS fit the
UDF kernels compute (``functions/series_kernels.py``), expressed as pure
DataFrame windows/aggregates — whole-stage-codegen'd, zero Python. Used when
the per-entity series lives as rows (one row per turn) rather than inside an
Arrow batch.

Reference: ``contour.py:74-92`` (walk), ``contour.py:95-110`` (OLS;
mse_resid = SSR/(n-2) statsmodels parity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_characteristic_contour(
    df: DataFrame,
    value: str,
    key: str = "conv_id",
    order: tuple[str, ...] = ("turn_idx",),
    out: str = "contour",
    pos_out: str = "contour_x",
) -> DataFrame:
    """Add the normalized contour column + its 0-based x position.

    contour_raw[i] = value[0] + Σ sign(value[j] - value[j-1]), j <= i;
    normalized by subtracting min(0, min(contour_raw)) per key.
    Rows with NULL ``value`` must be filtered beforehand (gap elimination
    W2 — reference ``contour.py:81-83``).
    """
    w = Window.partitionBy(key).orderBy(*order)
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    whole = Window.partitionBy(key)

    step = F.signum(F.col(value) - F.lag(value).over(w))
    d = df.withColumn("__step", F.coalesce(step, F.lit(0.0)))
    d = d.withColumn(
        "__raw", F.sum("__step").over(cum) + F.first(value).over(cum)
    ).drop("__step")
    d = d.withColumn(pos_out, (F.row_number().over(w) - 1).cast("double"))
    return d.withColumn(
        out, F.col("__raw") - F.least(F.lit(0.0), F.min("__raw").over(whole))
    ).drop("__raw")


def ols_aggregate(
    df: DataFrame,
    y: str,
    x: str,
    key: str = "conv_id",
    slope_out: str = "slant",
    mse_out: str = "slant_mse",
    ndigits: int | None = None,
) -> DataFrame:
    """Per-key OLS slope + residual MSE from exact raw sums.

    mse_resid = (Syy - Sxy²/Sxx) / (n - 2)  — statsmodels ddof parity.
    NULL when n <= 2 (or Sxx = 0).

    Computed from raw sums (Σx, Σy, Σxy, Σxx, Σyy) instead of Spark's
    ``regr_*`` aggregates: for integer-valued series every Σ is an exact
    integer in float64, making the result independent of partition /
    accumulation order and bit-identical to ``series_kernels.ols_fit``
    and the DuckDB oracle, which evaluate the same expression shape
    (n·Σxy − Σx·Σy) / (n·Σxx − (Σx)²). ``regr_*`` streaming-float
    accumulation is order-nondeterministic at the last ulp, which flips
    values that land on rounding boundaries run-to-run.
    """
    yc, xc = F.col(y), F.col(x)
    agg = df.groupBy(key).agg(
        F.count(F.when(yc.isNotNull() & xc.isNotNull(), 1))
        .cast("double")
        .alias("__n"),
        F.sum(xc).alias("__sx"),
        F.sum(yc).alias("__sy"),
        F.sum(xc * yc).alias("__sxy"),
        F.sum(xc * xc).alias("__sxx"),
        F.sum(yc * yc).alias("__syy"),
    )
    n = F.col("__n")
    sxx_n = n * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    sxy_n = n * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    syy_n = n * F.col("__syy") - F.col("__sy") * F.col("__sy")
    mse = F.when(
        (n > 2) & (sxx_n != 0),
        (syy_n - sxy_n * sxy_n / sxx_n) / (n * (n - 2)),
    )
    slope = F.when(sxx_n != 0, sxy_n / sxx_n)
    if ndigits is not None:
        slope, mse = F.round(slope, ndigits), F.round(mse, ndigits)
    return agg.select(
        key,
        slope.alias(slope_out),
        mse.alias(mse_out),
        F.col("__n").cast("long").alias("n_points"),
    )
