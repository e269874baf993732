"""Integer-exact CUSUM changepoint scores per conversation.

Classic sequential analysis (Page 1954, public knowledge): for a series
x_1..x_n the CUSUM statistic S_i = Σ_{j≤i}(x_j − x̄) peaks at a mean
shift. The float pitfall is x̄; scaling by n removes it —

    T_i = n·P_i − i·Σx       (P_i = prefix sum)  ⇒  T_i = n·S_i

is INTEGER in the quantized inputs, monotone with |S_i|, and therefore a
bit-portable hash vehicle (the same trick as ``pmi_pairs``' lift and the
OLS integer sums). The score is max_i |T_i| over interior prefixes
(i < n), with the EARLIEST argmax on ties.

Per-entity windows: one ``HashPartitioning(key)`` exchange, running
prefix sums (O(n) incremental frames), one same-key groupBy — the
north-rule shape. int64 budget: |T_i| ≤ n²·max|x_q|; with 1e-3
quantization and |value| ≤ 10⁶ that allows n ≈ 90k turns per entity —
asserted in the docstring, not silently wrapped (Spark would overflow
identically to DuckDB anyway, but budgets belong in the contract).

No reference counterpart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.time import epoch_us


def cusum_scores(
    df: DataFrame,
    value: str = "value",
    by: str = "user_id",
    ts: str = "ts",
    tie: str = "event_id",
) -> DataFrame:
    """One row per entity: n, sum_q (1e-3 quantized), ``cusum_max`` =
    max interior |n·P_i − i·Σx| (0 when n < 2), ``cusum_argmax`` =
    earliest maximizing prefix length i (NULL when n < 2)."""
    q = F.floor(F.col(value) * F.lit(1e3) + F.lit(0.5)).cast("long")
    t = df.withColumn("__us", epoch_us(df, ts)).withColumn("__q", q)
    w = Window.partitionBy(by).orderBy("__us", tie)
    w_run = w.rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy(by)
    t = (
        t.withColumn("__i", F.row_number().over(w).cast("long"))
        .withColumn("__p", F.sum("__q").over(w_run))
        .withColumn("__n", F.count(F.lit(1)).over(w_all))
        .withColumn("__s", F.sum("__q").over(w_all))
    )
    interior = t.filter(F.col("__i") < F.col("__n")).withColumn(
        "__t_abs",
        F.abs(F.col("__n") * F.col("__p") - F.col("__i") * F.col("__s")),
    )
    # argmax via max-then-filter (SQL-plain on every engine; min_by over a
    # composite key is not) — both aggregates key on `by`, so the window
    # pass's partitioning is reused, not reshuffled
    peaks = interior.groupBy(by).agg(
        F.max("__t_abs").cast("long").alias("cusum_max")
    )
    scored = (
        interior.join(peaks, by)
        .filter(F.col("__t_abs") == F.col("cusum_max"))
        .groupBy(by, "cusum_max")
        .agg(F.min("__i").cast("long").alias("cusum_argmax"))
    )
    base = t.groupBy(by).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__q").cast("long").alias("sum_q"),
    )
    return (
        base.join(scored, by, "left")
        .select(
            by,
            "n",
            "sum_q",
            F.coalesce(F.col("cusum_max"), F.lit(0)).cast("long").alias("cusum_max"),
            "cusum_argmax",
        )
    )
