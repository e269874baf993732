"""Corpus profiling: fixed-width integer-bin histograms.

The first thing a curation pipeline renders over a new 100-TB corpus is
the length/score distribution per slice (language, source) — it drives
the filter thresholds everything downstream uses. This computes a
fixed-width histogram over an INTEGER column with pure integer bin
arithmetic (``bin = x div bin_width``), so bin membership is exact and
engine-portable — no float edges, no half-open-interval ambiguity, no
approximate-percentile nondeterminism.

One row per (group, bin): count, exact integer bin bounds, and the
bin's share of its group as ONE integer/integer division (nudge-rounded
by the caller — the shared hash vehicle).

Plan: a map-side-combinable groupBy onto ~|groups|x|bins| rows, then a
whole-partition window over that bounded result for the group totals —
the turns themselves are shuffled once, as aggregation partials.
Negative inputs would need floor (not trunc) division; lengths/counts
are non-negative, asserted in the doccontract.

No reference counterpart (the reference profiles nothing); standard
data-quality profiling re-expressed relationally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def length_histogram(
    df: DataFrame,
    col: str = "n_chars",
    group: str = "lang",
    bin_width: int = 200,
) -> DataFrame:
    """Fixed-width histogram of integer ``col`` per ``group``."""
    binned = df.select(
        F.col(group),
        F.expr(f"`{col}` div {bin_width}L").alias("bin"),
    )
    counts = binned.groupBy(group, "bin").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    wg = Window.partitionBy(group)
    return counts.select(
        group,
        "bin",
        (F.col("bin") * bin_width).cast("long").alias("bin_lo"),
        ((F.col("bin") + 1) * bin_width - 1).cast("long").alias("bin_hi"),
        "n",
        (F.col("n").cast("double") / F.sum("n").over(wg)).alias("share"),
    )


def robust_outliers(
    df: DataFrame,
    value: str = "value",
    group: str = "event_type",
    id_col: str = "event_id",
    k: float = 3.0,
) -> DataFrame:
    """Median/MAD outlier flags per group — the robust z-score screen a
    curation pipeline runs over any numeric quality signal (value
    distributions are heavy-tailed at corpus scale; mean/stdev screens
    chase their own outliers, median/MAD does not).

    Engine-portable by integer vehicles: the value is quantized to
    micro-units ``vq = floor(v·1e6 + 0.5)``; the group median is carried
    DOUBLED (``med_x2 = floor(2·median(vq))`` — exactly integer for the
    interpolated even-count case, and both Spark ``percentile(0.5)`` and
    DuckDB ``median`` linearly interpolate, so 2· it is bit-stable);
    each row's deviation ``dev_x2 = |2·vq − med_x2|`` is integer; the MAD
    is carried QUADRUPLED (``mad_x4 = floor(2·median(dev_x2))``).  The
    outlier test is pure integer arithmetic:

        is_outlier ⇔ 10000 · 2 · dev_x2 > round(k·1.4826·10000) · mad_x4

    (1.4826 ≈ the normal-consistency constant σ ≈ 1.4826·MAD).  The only
    float column is the robust z itself — ONE division of integers,
    nudge-rounded by the caller; NULL when the MAD is 0.

    Plan: two exact-percentile aggregations onto |groups| rows (each a
    single shuffle of quantized longs), broadcast back — the fact table
    is never shuffled.  Exact percentile sorts per group inside the agg
    buffer; for 100-TB fact tables with few groups that buffer is the
    bottleneck and the standard escape is approx_percentile with an
    accuracy bound, kept OFF here because the driver gate demands
    bit-stable medians.

    No reference counterpart; the reference's closest screen is the
    thresholded confusion split (``src/training/statistics.py:62-100``).
    """
    vq = F.floor(F.col(value) * F.lit(1e6) + F.lit(0.5)).cast("long")
    t = df.withColumn("__vq", vq)
    med = t.groupBy(group).agg(
        F.floor(F.lit(2.0) * F.expr("percentile(__vq, 0.5)"))
        .cast("long")
        .alias("med_x2")
    )
    dev = t.join(F.broadcast(med), group).withColumn(
        "dev_x2", F.abs(F.lit(2) * F.col("__vq") - F.col("med_x2"))
    )
    mad = dev.groupBy(group).agg(
        F.floor(F.lit(2.0) * F.expr("percentile(dev_x2, 0.5)"))
        .cast("long")
        .alias("mad_x4")
    )
    kq = int(round(k * 1.4826 * 10000))
    out = dev.join(F.broadcast(mad), group)
    rz = F.when(
        F.col("mad_x4") > 0,
        (F.lit(20000.0) * F.col("dev_x2")) / (F.lit(14826.0) * F.col("mad_x4")),
    )
    return out.select(
        F.col(id_col),
        F.col(group),
        F.col("__vq").alias("vq"),
        "med_x2",
        "mad_x4",
        "dev_x2",
        (F.lit(20000) * F.col("dev_x2") > F.lit(kq) * F.col("mad_x4")).alias(
            "is_outlier"
        ),
        rz.alias("robust_z"),
    )


def skew_topk(df: DataFrame, key: str, top_n: int = 20) -> DataFrame:
    """Heavy-hitter profile of a join/aggregation key: the ``top_n``
    hottest keys with exact counts, the key universe size, and each
    key's integer share in ppm — the report you read BEFORE choosing a
    salting factor / AQE skew threshold for a 100-TB shuffle on ``key``.

    share_ppm = floor(cnt·10⁶ / total) — one BIGINT division, exact on
    both engines. Tie-break is (count desc, key asc), so the cut at
    ``top_n`` is deterministic.

    Scale: one map-side-combinable groupBy onto |keys| rows; the top-n
    is a TakeOrderedAndProject (per-partition heads, merged) and the
    two scalars ride in via a 1-row broadcast — the raw table is
    shuffled once, as aggregation partials.
    """
    counts = df.groupBy(F.col(key).cast("string").alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    scalars = counts.agg(
        F.sum("cnt").cast("long").alias("total_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
    )
    top = counts.orderBy(F.col("cnt").desc(), F.col("key").asc()).limit(top_n)
    return top.join(F.broadcast(scalars)).select(
        "key",
        "cnt",
        "total_rows",
        "n_keys",
        F.floor(F.col("cnt") * F.lit(1_000_000) / F.col("total_rows"))
        .cast("long")
        .alias("share_ppm"),
    )


def skew_histogram(df: DataFrame, key: str) -> DataFrame:
    """Log₂ histogram of per-key group sizes: one row per occupied
    bucket ``b = length(bin(cnt))`` (i.e. ⌊log₂ cnt⌋ + 1 — ``bin()``
    renders without leading zeros identically on both engines), with the
    number of keys and total rows in the bucket.

    The one-page answer to "how skewed is this key, everywhere" — a
    straggler shows up as an occupied high bucket with tiny key count.
    Two map-side-combinable groupBys (|keys| rows, then ≤ 63 rows).
    """
    counts = df.groupBy(F.col(key).cast("string").alias("__k")).agg(
        F.count(F.lit(1)).cast("long").alias("__cnt")
    )
    return (
        counts.withColumn("bucket", F.length(F.bin(F.col("__cnt"))).cast("long"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.sum("__cnt").cast("long").alias("rows_in_bucket"),
        )
    )


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Single-pass per-column data-quality profile in long format:
    (column, n_rows, n_null, n_distinct, min/max for orderable integer
    and string columns as strings — callers pre-quantize floats so no
    engine-specific float formatting enters the output).

    One aggregate row computes every metric (multiple exact
    count-distincts plan as a single scan + Expand ×k — the standard
    multi-distinct shape, k = column count, not data-sized), then a
    ``stack`` unpivots to long form. No per-column rescans.
    """
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).cast("long").alias(f"__n_{c}"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long").alias(f"__null_{c}"),
            F.count_distinct(F.col(c)).cast("long").alias(f"__dist_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    one = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', __n_{c}, __null_{c}, __dist_{c}, __min_{c}, __max_{c}"
        for c in cols
    )
    return one.selectExpr(
        f"stack({len(cols)}, {stack}) AS "
        "(col_name, n_rows, n_null, n_distinct, min_s, max_s)"
    )


def expectation_checks(
    df: DataFrame,
    completeness: list[str] = (),
    unique: list[str] = (),
    member_of: dict[str, list[str]] | None = None,
    ranges: dict[str, tuple[float, float]] | None = None,
    min_rows: int | None = None,
) -> DataFrame:
    """Deequ-style data-quality gate: evaluate every declared
    expectation over ONE aggregate pass and emit one row per rule —
    (rule, metric_num, metric_den, passed). Metrics stay exact integer
    rationals (satisfied count / total), so the gate is engine- and
    run-deterministic; ``passed`` asserts num == den (full compliance)
    except ``min_rows`` which asserts num >= den.

    Uniqueness counts rows whose key value occurs exactly once, via
    count_distinct vs count per the single-scan Expand shape of
    :func:`profile_columns` — at web scale the one Expand fans the scan
    ×k, never data² — while set/range rules are plain conditional sums.
    """
    member_of = member_of or {}
    ranges = ranges or {}
    aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    names: list[tuple[str, str, str]] = []
    for c in completeness:
        aggs.append(
            F.sum(F.when(F.col(c).isNotNull(), 1).otherwise(0))
            .cast("long").alias(f"__comp_{c}")
        )
        names.append((f"complete({c})", f"__comp_{c}", "__n"))
    for c in unique:
        # distinct == total  ⟺  no key occurs twice (exact, single scan)
        aggs.append(F.count_distinct(F.col(c)).cast("long").alias(f"__uni_{c}"))
        names.append((f"unique({c})", f"__uni_{c}", "__n"))
    for c, allowed in member_of.items():
        aggs.append(
            F.sum(F.when(F.col(c).isin(list(allowed)), 1).otherwise(0))
            .cast("long").alias(f"__set_{c}")
        )
        names.append((f"in_set({c})", f"__set_{c}", "__n"))
    for c, (lo, hi) in ranges.items():
        aggs.append(
            F.sum(
                F.when(
                    (F.col(c) >= F.lit(lo)) & (F.col(c) <= F.lit(hi)), 1
                ).otherwise(0)
            ).cast("long").alias(f"__rng_{c}")
        )
        names.append((f"in_range({c})", f"__rng_{c}", "__n"))
    one = df.agg(*aggs)
    if min_rows is not None:
        one = one.withColumn("__minrows", F.lit(int(min_rows)).cast("long"))
        names.append(("min_rows", "__n", "__minrows"))
    stack = ", ".join(f"'{r}', {num}, {den}" for r, num, den in names)
    long = one.selectExpr(
        f"stack({len(names)}, {stack}) AS (rule, metric_num, metric_den)"
    )
    passed = F.when(
        F.col("rule") == "min_rows",
        (F.col("metric_num") >= F.col("metric_den")).cast("long"),
    ).otherwise((F.col("metric_num") == F.col("metric_den")).cast("long"))
    return long.withColumn("passed", passed)


def table_fingerprint(df: DataFrame, cols: list[str]) -> DataFrame:
    """Order-insensitive content fingerprint of a table projection —
    the one-row checksum you store per snapshot/partition to detect
    silent divergence between pipeline runs (the cheap companion to
    :func:`..scd.table_diff`: fingerprints differ → run the diff).

    Row hash = the repo-wide md5-60-bit contract over a NULL-sentineled
    '|' join of the columns; the table hash folds row hashes with a
    commutative SUM (decimal-exact, then reduced mod 2^61-1 so the
    result is a portable BIGINT). One map-side-combinable aggregate —
    at 100 TB this is a pure scan with a 1-row result; per-partition
    fingerprints (groupBy a partition column instead) merge by modular
    addition.
    """
    canon = F.concat_ws(
        "|", *[F.coalesce(F.col(c).cast("string"), F.lit("␀")) for c in cols]
    )
    h = F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast("long")
    m = (1 << 61) - 1
    return df.select(h.alias("__h")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.pmod(F.sum(F.col("__h").cast("decimal(38,0)")), F.lit(m))
        .cast("long")
        .alias("fingerprint"),
    )


def out_of_order_profile(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    arrival: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """Out-of-order arrival profile — the measurement that SIZES a
    streaming watermark: per key, replay events in ARRIVAL order
    (``arrival`` is the ingestion sequence) and measure each event's
    lateness against the running event-time maximum seen before it.
    Output is a log₂ histogram of lateness microseconds (bucket =
    length(bin(lateness)), the repo's portable ⌊log₂⌋+1 contract) with
    bucket 0 holding the in-order events — read it as "a watermark of
    2^b µs would admit everything at or below bucket b".

    One key exchange + one in-partition sort (the same shuffle shape as
    sessionize), then a ≤64-row map-combinable histogram; max/lateness
    stay exact BIGINT µs.
    """
    from ..functions.time import epoch_us

    us = epoch_us(df, ts)
    order = [F.col(c) for c in arrival]  # must be a per-key total order
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    late = (
        df.select(F.col(key), *order, us.alias("__us"))
        .withColumn("__prev_max", F.max("__us").over(w))
        .select(
            F.when(
                F.col("__prev_max") > F.col("__us"),
                F.col("__prev_max") - F.col("__us"),
            ).otherwise(F.lit(0)).cast("long").alias("__late_us")
        )
    )
    bucket = F.when(
        F.col("__late_us") > 0, F.length(F.bin(F.col("__late_us")))
    ).otherwise(F.lit(0)).cast("long")
    return (
        late.select(bucket.alias("bucket"), "__late_us")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.max("__late_us").cast("long").alias("max_late_us"),
        )
    )


# Benford first-digit law, P(d) = log10(1 + 1/d), pre-rounded to parts
# per million so the deviation vehicle is pure BIGINT arithmetic (no
# libm on either engine at the hash gate).
BENFORD_PPM: dict[int, int] = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
    6: 66947, 7: 57992, 8: 51153, 9: 45757,
}


def benford_profile(
    df: DataFrame, value: str, by: str, quant: float = 100.0
) -> DataFrame:
    """First-significant-digit distribution per group vs Benford's law —
    the cheap synthetic-data / fabricated-metrics detector: natural
    multiplicative quantities follow ``P(d) = log10(1+1/d)``; uniform or
    hand-typed ones don't.

    The digit is the first character of the quantized positive integer's
    decimal string — string-based significand extraction, so no log10 in
    the plan and the digit is bit-identical on any engine. Every group
    emits all nine digit rows (zero-filled): the output is a fixed
    9·|groups| grid. ``dev_ppm_n = |n_d·10^6 − n·ppm_d|`` is the exact
    integer L1-deviation vehicle (n× the ppm deviation); ``ratio`` is
    the single closing division.

    Scale: one map-side-combinable (group, digit) count, then a
    group-partitioned window over the ≤9-row groups and a broadcast
    cross join against the 9-row digit dimension. Zeros/negatives are
    excluded (Benford is defined on positive magnitudes).
    """
    q = F.floor(F.col(value).cast("double") * F.lit(quant) + F.lit(0.5)).cast(
        "long"
    )
    d = df.select(F.col(by).alias("grp"), q.alias("__q")).where(
        F.col("__q") > 0
    )
    counts = d.select(
        "grp",
        F.substring(F.col("__q").cast("string"), 1, 1)
        .cast("long")
        .alias("digit"),
    ).groupBy("grp", "digit").agg(F.count(F.lit(1)).cast("long").alias("n_d"))
    spark = df.sparkSession
    digits = spark.createDataFrame(
        [(k, v) for k, v in sorted(BENFORD_PPM.items())], "digit long, ppm long"
    )
    grid = counts.select("grp").distinct().crossJoin(F.broadcast(digits))
    full = grid.join(counts, ["grp", "digit"], "left").na.fill({"n_d": 0})
    w = Window.partitionBy("grp")
    full = full.withColumn("n", F.sum("n_d").over(w).cast("long"))
    return full.select(
        "grp",
        "digit",
        "n_d",
        "n",
        "ppm",
        F.abs(F.col("n_d") * F.lit(1_000_000) - F.col("n") * F.col("ppm"))
        .cast("long")
        .alias("dev_ppm_n"),
        (F.col("n_d").cast("double") / F.col("n").cast("double")).alias(
            "ratio"
        ),
    )


def dispersion_index(
    df: DataFrame, value: str, by: str, quant: float = 10.0
) -> DataFrame:
    """Variance-to-mean ratio (index of dispersion) per group — the
    burstiness / overdispersion screen: ≈1 for Poisson-like counts,
    ≫1 for clumped arrivals, <1 for regular ones. Decides between
    Poisson and negative-binomial assumptions before modeling.

    Population form cleared of denominators so both vehicles are exact
    BIGINTs under any partial aggregation:

        disp_num = n·Σq² − (Σq)²      disp_den = n·Σq
        dispersion = disp_num / (disp_den · quant)   (ONE closing div;
        the quant factor converts back to value units)

    The default 0.1-unit quantization keeps n·Σq² inside int64 for
    ~1e6-row groups of values ≤ ~1e4 (squared moments need the coarse
    grid — same budget note as ``autocorrelation``). One
    map-side-combinable aggregate; output is |groups| rows.
    """
    q = F.floor(F.col(value).cast("double") * F.lit(quant) + F.lit(0.5)).cast(
        "long"
    )
    g = df.select(F.col(by).alias("grp"), q.alias("__q")).groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__q").cast("long").alias("sum_q"),
        F.sum(F.col("__q") * F.col("__q")).cast("long").alias("sum_q2"),
    )
    num = F.col("n") * F.col("sum_q2") - F.col("sum_q") * F.col("sum_q")
    den = F.col("n") * F.col("sum_q")
    return g.select(
        "grp",
        "n",
        "sum_q",
        "sum_q2",
        num.cast("long").alias("disp_num"),
        den.cast("long").alias("disp_den"),
        F.when(
            den != 0,
            num.cast("double") / (den.cast("double") * F.lit(float(quant))),
        ).alias("dispersion"),
    )


def referential_audit(
    relations: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Referential-integrity audit over a set of FK relations — one row
    per relation: child row count, NULL-key rows, orphan rows (child
    keys absent from the parent) and distinct orphan keys. The
    join-health gate you run before trusting any star-schema pipeline:
    a training set silently loses rows at every inner join whose FK has
    orphans, and this quantifies that loss up front.

    ``relations`` is (name, child_df, child_key, parent_df,
    parent_key). Scale: the child collapses to DISTINCT keys
    (map-combinable count per key) BEFORE the anti join, so the join is
    |distinct keys| vs |parent keys|, never row-level; each relation is
    independent and unions into one tiny audit table.
    """
    if not relations:
        raise ValueError(
            "referential_audit needs at least one (name, child, child_key, "
            "parent, parent_key) relation"
        )
    outs = []
    for name, child, ckey, parent, pkey in relations:
        keyed = (
            child.select(F.col(ckey).alias("__k"))
            .groupBy("__k")
            .agg(F.count(F.lit(1)).cast("long").alias("__rows"))
        )
        nn = keyed.where(F.col("__k").isNotNull())
        orph = nn.join(
            parent.select(F.col(pkey).alias("__k")).distinct(), "__k", "left_anti"
        )
        tot = keyed.agg(
            F.sum("__rows").cast("long").alias("child_rows"),
            F.sum(F.when(F.col("__k").isNull(), F.col("__rows")).otherwise(F.lit(0)))
            .cast("long")
            .alias("null_key_rows"),
        )
        ocnt = orph.agg(
            F.coalesce(F.sum("__rows"), F.lit(0)).cast("long").alias("orphan_rows"),
            F.count(F.lit(1)).cast("long").alias("orphan_keys"),
        )
        outs.append(
            tot.crossJoin(ocnt).select(
                F.lit(name).alias("relation"),
                "child_rows",
                "null_key_rows",
                "orphan_rows",
                "orphan_keys",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def corr_matrix(
    df: DataFrame, cols: list[tuple[str, float]]
) -> DataFrame:
    """Pairwise Pearson correlation over K numeric columns in ONE scan —
    the collinearity screen before feature selection: every sum the
    K·(K−1)/2 pair statistics need (n, Σx, Σx², Σxy) accumulates in a
    single map-side-combinable aggregate, then the tiny 1-row fold
    explodes into one row per pair. Never K² passes over the data.

    ``cols`` is (column, quant): each column lands on its own integer
    grid (floor(x·quant + 0.5)), so Σ's are exact BIGINTs. Emitted per
    pair: the five integer sums, the n-cleared BIGINT vehicles
    cov_num = n·Σxy − Σx·Σy and var_num per side, the sign of the
    correlation, and r² = cov_num² / (varx_num·vary_num) as a FIXED
    double expression over the exact integers (r itself needs sqrt —
    libm-dependent, deliberately excluded; sign + r² carry the same
    information). int64 budget: n·Σxy ≤ 9.2e18 — quantize the widest
    column coarsest first.
    """
    qc = {
        c: F.floor(F.col(c).cast("double") * F.lit(float(s)) + F.lit(0.5)).cast(
            "long"
        )
        for c, s in cols
    }
    names = [c for c, _ in cols]
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for c in names:
        aggs.append(F.sum(qc[c]).cast("long").alias(f"s_{c}"))
        aggs.append(F.sum(qc[c] * qc[c]).cast("long").alias(f"ss_{c}"))
    pairs = [(a, b) for i, a in enumerate(names) for b in names[i + 1 :]]
    for a, b in pairs:
        aggs.append(F.sum(qc[a] * qc[b]).cast("long").alias(f"sp_{a}_{b}"))
    g = df.agg(*aggs)
    n = F.col("n")
    rows = []
    for a, b in pairs:
        cov = (n * F.col(f"sp_{a}_{b}") - F.col(f"s_{a}") * F.col(f"s_{b}")).cast(
            "long"
        )
        vx = (n * F.col(f"ss_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}")).cast(
            "long"
        )
        vy = (n * F.col(f"ss_{b}") - F.col(f"s_{b}") * F.col(f"s_{b}")).cast(
            "long"
        )
        rows.append(
            F.struct(
                F.lit(a).alias("col_x"),
                F.lit(b).alias("col_y"),
                n.alias("n"),
                F.col(f"s_{a}").alias("sum_x"),
                F.col(f"s_{b}").alias("sum_y"),
                F.col(f"sp_{a}_{b}").alias("sum_xy"),
                cov.alias("cov_num"),
                vx.alias("varx_num"),
                vy.alias("vary_num"),
                F.signum(cov.cast("double")).cast("long").alias("r_sign"),
                F.when(
                    (vx > 0) & (vy > 0),
                    cov.cast("double")
                    * cov.cast("double")
                    / (vx.cast("double") * vy.cast("double")),
                ).alias("r2"),
            )
        )
    return g.select(F.explode(F.array(*rows)).alias("p")).select("p.*")


def join_explosion_audit(
    left: DataFrame,
    right: DataFrame,
    key: str,
    top_n: int = 20,
) -> DataFrame:
    """Predict a join's output size BEFORE running it — the 100-TB
    guardrail against the accidental many-to-many explosion (the classic
    production incident: a "unique" key that isn't, and an innocent join
    that emits 10^12 rows and takes the cluster down).

    Per join key: left multiplicity ``nl``, right multiplicity ``nr``,
    predicted pair count ``pairs = nl·nr``; plus, stamped on every row,
    the join-wide totals — ``total_pairs = Σ nl·nr`` (the exact inner
    join output cardinality), matched key count, and the max single-key
    multiplicity product. Returns the ``top_n`` most explosive keys
    (pairs desc, key asc — deterministic), each with its integer share
    vehicle ``pairs / total_pairs`` left to the caller as two exact
    BIGINTs.

    Scale: the row tables collapse to per-key COUNT tables first (two
    map-side-combinable groupBys, output |keys| rows each), so the audit
    never materializes a single joined row; the count-table equi-join
    shuffles |keys|, not |rows|. The totals ride a 1-row broadcast join;
    the global top-k is the skew-proof two-phase salted plan (per-salt
    top-k over |keys|/n_salts-row windows, then a final rank over the
    ≤ n_salts·top_n survivors — never a single-partition sort of the
    full key table). Exact while Σ nl·nr < 2^63 — beyond that the join
    was never going to run anyway.
    """
    nl = left.groupBy(F.col(key).alias("k")).agg(
        F.count(F.lit(1)).cast("long").alias("nl")
    )
    nr = right.groupBy(F.col(key).alias("k")).agg(
        F.count(F.lit(1)).cast("long").alias("nr")
    )
    per_key = nl.join(nr, "k").select(
        "k", "nl", "nr", (F.col("nl") * F.col("nr")).cast("long").alias("pairs")
    )
    totals = per_key.agg(
        F.sum("pairs").cast("long").alias("total_pairs"),
        F.count(F.lit(1)).cast("long").alias("matched_keys"),
        F.max("pairs").cast("long").alias("max_pairs"),
    )
    from .sampling import _seed_hash

    n_salts = 16
    order = [F.col("pairs").desc(), F.col("k").asc()]
    w1 = Window.partitionBy("__salt").orderBy(*order)
    survivors = (
        per_key.withColumn("__salt", F.pmod(_seed_hash("k", 0), F.lit(n_salts)))
        .withColumn("__r1", F.row_number().over(w1))
        .where(F.col("__r1") <= top_n)
        .drop("__salt", "__r1")
    )
    # final rank over <= n_salts*top_n rows — bounded, single partition OK
    w = Window.orderBy(*order)
    top = (
        survivors.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= top_n)
    )
    return top.crossJoin(F.broadcast(totals)).select(
        F.col("k").alias(key), "rank", "nl", "nr", "pairs",
        "total_pairs", "matched_keys", "max_pairs",
    )


def weighted_median(
    df: DataFrame,
    group: str,
    value: str,
    weight: str,
) -> DataFrame:
    """Exact weighted median per group: the smallest ``value`` v with
    2·Σ_{x≤v} w(x) ≥ Σ w — for weight = size this answers "what item
    size covers half the mass?", the curation cut that plain median
    (row-weighted) gets wrong when sizes are skewed.

    Pure integers end to end: per-(group, value) weight collapse, one
    group-keyed cumulative window (the total rides the same window
    full-range — no second scan), integer doubling comparison, rank-1
    pick with value tiebreak. Scale: one groupBy + one window on the
    same key — the window input is the collapsed (group, value) table,
    |distinct values| rows, not |rows|.
    """
    cells = df.groupBy(F.col(group), F.col(value).cast("long").alias("__v")).agg(
        F.sum(F.col(weight).cast("long")).cast("long").alias("__w")
    )
    w_cum = (
        Window.partitionBy(group)
        .orderBy(F.col("__v").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(group).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = cells.select(
        group,
        "__v",
        F.sum("__w").over(w_cum).cast("long").alias("__cum"),
        F.sum("__w").over(w_all).cast("long").alias("w_total"),
    ).where(F.lit(2) * F.col("__cum") >= F.col("w_total"))
    pick = Window.partitionBy(group).orderBy(F.col("__v").asc())
    return (
        c.withColumn("__rn", F.row_number().over(pick))
        .where(F.col("__rn") == 1)
        .select(
            group,
            F.col("__v").alias("w_median"),
            F.col("__cum").alias("cum_at_median"),
            "w_total",
        )
    )


def encoding_advisor(
    df: DataFrame,
    key: str,
    order: tuple[str, ...],
    cols: list[str],
) -> DataFrame:
    """Columnar-encoding decision stats: for each column, the inputs a
    writer needs to choose between PLAIN, DICTIONARY and RLE encodings
    when the table is laid out sorted by ``(key, *order)`` — n_rows,
    nulls, exact distinct count, byte mass, and ``n_runs`` = the number
    of RLE runs the sorted layout would produce (runs counted within
    each ``key`` group: group boundaries always start a run, matching
    per-file layout where a key never spans files). n_runs/n_rows ≈ 1
    means RLE buys nothing; n_distinct·avg_len ≪ bytes means dictionary
    wins — the same stats parquet writers sample per page, surfaced as a
    queryable audit (public practice: Abadi et al. SIGMOD'06,
    "Integrating compression and execution in column-oriented systems").

    All-integer output, bit-replayable. Scale: ONE (key)-hash exchange
    serves every column's lag window (shared sort), the distinct counts
    ride the standard multi-distinct Expand — nothing else shuffles.
    """
    w = Window.partitionBy(key).orderBy(*[F.col(c) for c in order])
    lagged = df.select(
        *[F.col(c) for c in dict.fromkeys([key, *order, *cols])],
        *[F.lag(F.col(c)).over(w).alias(f"__lag_{c}") for c in cols],
        F.row_number().over(w).alias("__rn"),
    )
    aggs = []
    for c in cols:
        is_run_start = F.when(
            (F.col("__rn") == 1)
            | ~(
                F.col(c).eqNullSafe(F.col(f"__lag_{c}"))
            ),
            1,
        ).otherwise(0)
        dt = dict(df.dtypes)[c]
        byte_mass = (
            F.sum(F.when(F.col(c).isNotNull(), F.length(F.col(c).cast("string"))))
            if dt == "string"
            else F.sum(F.when(F.col(c).isNotNull(), F.lit(8)))
        )
        aggs += [
            F.count(F.lit(1)).cast("long").alias(f"__n_{c}"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"__null_{c}"),
            F.count_distinct(F.col(c)).cast("long").alias(f"__dist_{c}"),
            F.sum(is_run_start).cast("long").alias(f"__runs_{c}"),
            F.coalesce(byte_mass, F.lit(0)).cast("long").alias(f"__bytes_{c}"),
        ]
    one = lagged.agg(*aggs)
    stack = ", ".join(
        f"'{c}', __n_{c}, __null_{c}, __dist_{c}, __runs_{c}, __bytes_{c}"
        for c in cols
    )
    return one.selectExpr(
        f"stack({len(cols)}, {stack}) AS "
        "(col_name, n_rows, n_null, n_distinct, n_runs, data_bytes)"
    )


def tail_index(
    df: DataFrame,
    value: str,
    id_col: str,
    p_lo: float = 0.90,
    p_hi: float = 0.99,
) -> DataFrame:
    """Quantile-ratio tail-index estimate for a heavy-tailed positive
    metric (conversation sizes, degree distributions): under a Pareto
    tail P(X > x) ~ x^(-alpha),

        alpha ≈ ln((1−p_lo)/(1−p_hi)) / ln(x_{p_hi} / x_{p_lo})

    from just TWO exact order statistics (the qq-plot slope through two
    points — Kratz & Resnick '96 lineage; Hill's estimator needs an
    order-dependent sum over the top-k, which is not bit-replayable, so
    the two-point form is the cross-engine-exact variant). alpha ≤ 2
    means infinite variance — the "will one conversation eat a task"
    dial that motivates the salted operator variants.

    Order statistics are type-1 (the ⌈p·n⌉-th smallest, ties broken by
    id) via the two-phase global rank — no single-partition sort. Output
    is one row: n, both indices and values (exact BIGINTs) and alpha
    (two ln's; callers nudge-round for hash gates).
    """
    from .blockpair import with_global_rank

    keyed = df.select(
        F.col(id_col),
        F.col(value).cast("long").alias("__v"),
        F.format_string(
            "%019d-%019d", F.col(value).cast("long"), F.col(id_col).cast("long")
        ).alias("__sk"),
    )
    ranked = with_global_rank(keyed, "__sk")
    n1 = ranked.agg(F.count(F.lit(1)).cast("long").alias("n"))
    j = ranked.crossJoin(F.broadcast(n1))
    idx_lo = F.ceil(F.lit(float(p_lo)) * F.col("n").cast("double")).cast("long")
    idx_hi = F.ceil(F.lit(float(p_hi)) * F.col("n").cast("double")).cast("long")
    picked = j.where(
        (F.col("__rk") + 1 == idx_lo) | (F.col("__rk") + 1 == idx_hi)
    )
    agg = picked.groupBy("n").agg(
        F.max(F.when(F.col("__rk") + 1 == idx_lo, F.col("__v")))
        .cast("long")
        .alias("x_lo"),
        F.max(F.when(F.col("__rk") + 1 == idx_hi, F.col("__v")))
        .cast("long")
        .alias("x_hi"),
        F.max(F.when(F.col("__rk") + 1 == idx_lo, F.col("__rk") + 1))
        .cast("long")
        .alias("idx_lo"),
        F.max(F.when(F.col("__rk") + 1 == idx_hi, F.col("__rk") + 1))
        .cast("long")
        .alias("idx_hi"),
    )
    num = F.log(
        F.lit((1.0 - p_lo)) / F.lit((1.0 - p_hi))
    )
    alpha = F.when(
        F.col("x_hi") > F.col("x_lo"),
        num
        / F.log(F.col("x_hi").cast("double") / F.col("x_lo").cast("double")),
    )
    return agg.select("n", "idx_lo", "idx_hi", "x_lo", "x_hi", alpha.alias("alpha"))


def gini_concentration(
    df: DataFrame,
    value: str,
    id_col: str,
) -> DataFrame:
    """Gini coefficient of how unevenly mass (bytes, tokens, rows)
    concentrates across units — the one-number "does 1% of the corpus
    carry 90% of the bytes" dial that decides whether size-stratified
    sampling or mega-doc splitting is worth it (companion of
    :func:`tail_index`, which fits the tail law; this integrates the
    whole curve).

    Sorted-formula form over values ascending with 1-based rank i:

        G = Σ_i (2i − n − 1)·x_(i)  /  (n · Σx)

    Numerator and denominator are EXACT BIGINTs — coefficients of tied
    values sum to the same total under any tie order, so the (value,
    id) total order makes the result deterministic AND the closing
    single division bit-exact cross-engine (no float columns, no
    nudge). int64 headroom: |num| ≤ n·Σx, so safe while
    n·Σx < 2^63 — n ≈ 3·10⁷ units at 10⁴ bytes each; past that,
    cast the per-row term to double before the sum (off the hash
    path) or Gini the per-bucket histogram instead.

    Scale: the global rank is :func:`..packing.with_global_cumsum`'s
    range-partitioned two-phase pass (no single-partition window);
    caller releases the registered persist after the consuming action.
    Output: ONE row — ``n``, ``sum_v``, ``gini_num`` (BIGINTs),
    ``gini`` (double).
    """
    from featureextraction_spark.operators.packing import with_global_cumsum

    base = df.select(
        F.col(value).cast("long").alias("v"), F.col(id_col).alias("id")
    )
    ranked = with_global_cumsum(
        base.select("v", "id", F.lit(1).cast("long").alias("__one")),
        ["v", "id"],
        "__one",
        out_col="__rk0",
    )
    n_t = base.agg(F.count(F.lit(1)).cast("long").alias("__n"))
    agg = (
        ranked.crossJoin(F.broadcast(n_t))
        .select(
            F.col("__n"),
            ((2 * (F.col("__rk0") + 1) - F.col("__n") - 1) * F.col("v"))
            .cast("long")
            .alias("__term"),
            "v",
        )
        .groupBy("__n")
        .agg(
            F.sum("v").cast("long").alias("sum_v"),
            F.sum("__term").cast("long").alias("gini_num"),
        )
    )
    return agg.select(
        F.col("__n").alias("n"),
        "sum_v",
        "gini_num",
        F.when(
            (F.col("__n") > 0) & (F.col("sum_v") > 0),
            F.col("gini_num").cast("double")
            / (F.col("__n") * F.col("sum_v")).cast("double"),
        ).alias("gini"),
    )


def diversity_indices(df: DataFrame, part: str, cat: str) -> DataFrame:
    """Per-partition categorical diversity: Gini–Simpson, Shannon
    entropy and Pielou evenness of each partition's category mix — the
    dataset-card "how monocultural is each source" row (Simpson 1949;
    Pielou 1966). Complements :func:`..drift.js_divergence` (distance
    to the corpus mix) with each slice's OWN spread.

        simpson = 1 − Σ_c n_c(n_c−1) / (N(N−1))   (unbiased form)
        shannon = ln N − (Σ_c n_c·ln n_c) / N
        evenness = shannon / ln k                  (NULL when k = 1)

    ``simpson`` is a single division of exact BIGINT products —
    bit-exact cross-engine; ``sum_nc2 = Σn_c²`` ships as the BIGINT
    vehicle. The shannon ln-sum has ≤|cats| terms per partition and
    rides the shared nudge.

    Scale: ONE map-side-combinable groupBy(part, cat), then an
    aggregate OF the bounded cell table. No window, no second scan.
    """
    cells = df.groupBy(
        F.col(part).alias("part"), F.col(cat).alias("__c")
    ).agg(F.count(F.lit(1)).cast("long").alias("__nc"))
    per = cells.groupBy("part").agg(
        F.sum("__nc").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(F.col("__nc") * F.col("__nc")).cast("long").alias("sum_nc2"),
        F.sum(
            F.col("__nc").cast("double") * F.log(F.col("__nc").cast("double"))
        ).alias("__snln"),
    )
    shannon = F.log(F.col("n").cast("double")) - F.col("__snln") / F.col(
        "n"
    ).cast("double")
    return per.select(
        "part",
        "n",
        "k",
        "sum_nc2",
        F.when(
            F.col("n") > 1,
            F.lit(1.0)
            - (F.col("sum_nc2") - F.col("n")).cast("double")
            / (F.col("n") * (F.col("n") - 1)).cast("double"),
        ).alias("simpson"),
        shannon.alias("shannon"),
        F.when(F.col("k") > 1, shannon / F.log(F.col("k").cast("double"))).alias(
            "evenness"
        ),
    )


def theil_index(df: DataFrame, value: str) -> DataFrame:
    """Theil T index of mass inequality across units — the
    entropy-based companion of :func:`gini_concentration` (Theil 1967):
    0 for perfect equality, ln n when one unit owns everything, and —
    unlike Gini — exactly decomposable into between/within-group terms,
    which is why mix audits prefer it.

        T = Σ_i (x_i/S)·ln(x_i / (S/n))  =  (Σ x·ln x)/S − ln(S/n)

    over units with x > 0 (zero-mass units contribute 0 in the limit
    and are excluded, per the definition; ``n_zero`` reports them).
    ``n``/``sum_v`` ship as exact BIGINTs; ``sum_xlnx`` is a per-unit
    ln sum whose addition order rides the shared nudge.

    Scale: ONE map-side-combinable aggregate over the rows — no sort
    (Gini needs the global rank; Theil doesn't). Output: ONE row —
    ``n``, ``n_zero``, ``sum_v`` (BIGINTs), raw doubles ``sum_xlnx``,
    ``theil`` (caller nudge-rounds).
    """
    v = F.col(value).cast("long")
    xd = v.cast("double")
    agg = df.agg(
        F.sum((v > 0).cast("long")).cast("long").alias("n"),
        F.sum((v <= 0).cast("long")).cast("long").alias("n_zero"),
        F.sum(F.when(v > 0, v).otherwise(F.lit(0))).cast("long").alias(
            "sum_v"
        ),
        F.sum(F.when(v > 0, xd * F.log(xd)).otherwise(F.lit(0.0))).alias(
            "sum_xlnx"
        ),
    )
    return agg.select(
        "n",
        "n_zero",
        "sum_v",
        "sum_xlnx",
        F.when(
            (F.col("n") > 0) & (F.col("sum_v") > 0),
            F.col("sum_xlnx") / F.col("sum_v").cast("double")
            - F.log(
                F.col("sum_v").cast("double") / F.col("n").cast("double")
            ),
        ).alias("theil"),
    )
