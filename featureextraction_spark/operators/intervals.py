"""Range (interval-containment) join via time-bucket equi-keys.

Spark has no native range-join optimization: a raw ``a.us BETWEEN
b.start AND b.end`` theta join plans as BroadcastNestedLoop (or worse, a
cartesian) — O(|probes|·|intervals|) compares. The standard scalable
rewrite (public practice, cf. Databricks' range-join binning hint) makes
it an EQUI join: explode every interval into the fixed-width time
buckets it covers, key probes by their single bucket, hash-join on
(entity, bucket), then apply the exact containment as a residual filter.
Compares drop from |P|·|I| to Σ (per-bucket matches); each matching pair
appears in exactly ONE bucket (the probe's), so no dedup pass is needed.

Pick ``bucket_us`` near the typical interval span: the explode fan-out
is ``span/bucket + 1`` per interval (log it, don't hide it — a silent
10⁴-bucket interval would be a quadratic smuggled back in; the operator
CAPS fan-out and raises instead).

All arithmetic is integer µs — hash-exact. No reference counterpart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bucketed_range_join(
    probes: DataFrame,
    intervals: DataFrame,
    by: str,
    probe_us: str = "us",
    start_us: str = "start_us",
    end_us: str = "end_us",
    bucket_us: int = 1_800_000_000,
    max_buckets_per_interval: int = 4096,
    inclusive: bool = True,
) -> DataFrame:
    """Join each probe row to every interval (same ``by``) containing its
    timestamp: ``start_us <= us <= end_us`` (strict upper bound when
    ``inclusive=False``). Returns probes' columns + intervals' columns.

    Raises if any interval would explode into more than
    ``max_buckets_per_interval`` buckets — resize ``bucket_us`` instead
    of silently scanning; the check is one tiny aggregate.
    """
    # integer `div` throughout — epoch µs sit near double's exact-integer
    # edge; float floor(us / bucket) could misassign a boundary bucket and
    # silently DROP a matching pair (bucketing must be self-consistent)
    bu = int(bucket_us)
    lo_b = F.expr(f"CAST(`{start_us}` div {bu} AS BIGINT)")
    hi_b = F.expr(f"CAST(`{end_us}` div {bu} AS BIGINT)")
    worst = intervals.agg(F.max(hi_b - lo_b + 1).alias("m")).collect()[0]["m"]
    if worst is not None and worst > max_buckets_per_interval:
        raise ValueError(
            f"an interval spans {worst} buckets (> {max_buckets_per_interval}); "
            f"raise bucket_us (now {bucket_us}) or split the interval"
        )
    iv = intervals.withColumn("__b", F.explode(F.sequence(lo_b, hi_b)))
    pr = probes.withColumn("__b", F.expr(f"CAST(`{probe_us}` div {bu} AS BIGINT)"))
    upper = (
        F.col(probe_us) <= F.col(end_us)
        if inclusive
        else F.col(probe_us) < F.col(end_us)
    )
    out = pr.join(iv, [by, "__b"]).filter(
        (F.col(probe_us) >= F.col(start_us)) & upper
    )
    return out.drop("__b")


def max_concurrency(
    intervals: DataFrame,
    by: str,
    start_us: str = "start_us",
    end_us: str = "end_us",
    id_col: str = "iv_id",
) -> DataFrame:
    """Peak interval overlap per key — the classic sweep-line: explode
    each interval into a +1 delta at its start and a -1 delta at its
    (inclusive) end, order the deltas, running-sum them; the maximum of
    the running count IS the peak concurrency. The capacity-planning /
    "how many users were active at once" readout over session intervals.

    One row per key: ``n_intervals``, ``max_concurrent`` and ``peak_us``
    (the EARLIEST timestamp at which the peak is reached). All exact
    BIGINT — timestamps in integer µs, counts in ±1 sums.

    Tie semantics: at equal timestamps, starts are processed before ends
    (touching intervals count as overlapping — inclusive ends), and
    ``id_col`` closes the total order so the running curve is
    deterministic. The overall max is tie-order-invariant anyway (starts
    only raise the curve, ends only lower it), but ``peak_us`` needs the
    full determinism.

    Scale: ONE HashPartitioning(by) exchange serves the sweep window,
    the per-key max and the final collapse; parallelism = keys, each
    key's sweep is linear in its 2·n deltas. For a single GLOBAL sweep
    (one key), swap the keyed window for the two-phase range-partitioned
    cumsum (``packing.with_global_cumsum`` with signed deltas) — never a
    single-partition window.
    """
    iv = intervals.select(
        F.col(by), F.col(start_us), F.col(end_us), F.col(id_col)
    )
    deltas = iv.select(
        F.col(by),
        F.col(start_us).alias("__t"),
        F.lit(1).cast("long").alias("__delta"),
        F.lit(0).alias("__tie"),
        F.col(id_col),
    ).unionByName(
        iv.select(
            F.col(by),
            F.col(end_us).alias("__t"),
            F.lit(-1).cast("long").alias("__delta"),
            F.lit(1).alias("__tie"),
            F.col(id_col),
        )
    )
    w = (
        Window.partitionBy(by)
        .orderBy("__t", "__tie", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = deltas.withColumn("__run", F.sum("__delta").over(w))
    wk = Window.partitionBy(by)
    out = (
        run.withColumn("__mx", F.max("__run").over(wk))
        .where(F.col("__run") == F.col("__mx"))
        .groupBy(by)
        .agg(
            F.min("__t").cast("long").alias("peak_us"),
            F.first("__mx").cast("long").alias("max_concurrent"),
        )
    )
    n = iv.groupBy(by).agg(F.count(F.lit(1)).cast("long").alias("n_intervals"))
    return n.join(out, by).select(
        by, "n_intervals", "max_concurrent", "peak_us"
    )
