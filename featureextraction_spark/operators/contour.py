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
    """Per-key OLS slope + residual MSE via Spark's regr_* aggregates.

    mse_resid = (Syy - Sxy²/Sxx) / (n - 2)  — statsmodels ddof parity.
    NULL when n <= 2 (or Sxx = 0).
    """
    yc, xc = F.col(y), F.col(x)
    agg = df.groupBy(key).agg(
        F.regr_slope(yc, xc).alias("__slope"),
        F.regr_sxx(yc, xc).alias("__sxx"),
        F.regr_sxy(yc, xc).alias("__sxy"),
        F.regr_syy(yc, xc).alias("__syy"),
        F.regr_count(yc, xc).alias("__n"),
    )
    mse = F.when(
        (F.col("__n") > 2) & (F.col("__sxx") != 0),
        (F.col("__syy") - F.col("__sxy") * F.col("__sxy") / F.col("__sxx"))
        / (F.col("__n") - 2),
    )
    slope = F.col("__slope")
    if ndigits is not None:
        slope, mse = F.round(slope, ndigits), F.round(mse, ndigits)
    return agg.select(
        key,
        slope.alias(slope_out),
        mse.alias(mse_out),
        F.col("__n").cast("long").alias("n_points"),
    )
