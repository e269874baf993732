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

from pyspark.sql import DataFrame
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
