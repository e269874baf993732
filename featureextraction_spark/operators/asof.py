"""As-of / backward merge join (SURVEY.md J6 — the graft's core operator).

For probe rows ``(conv_id, ts_q)`` find the latest data row with
``ts <= ts_q`` (inclusive backward; ties on ts broken by the highest
``turn_idx``), per conversation. Backward-only by construction ⇒ zero
temporal leakage.

The reference has no as-of join; its closest analogs are the memoized
"latest derived state" (``src/preparation/models.py:21-24``) and the
``contours[-1] + sign(...)`` carry-forward
(``src/preparation/features/contour.py:87``).

Three physical strategies, one logical semantics (all tested equal):

- ``asof_join``           — union + last-ignorenulls window. One shuffle on
                            the entity key; sorted within partitions ⇒
                            physically a sorted merge. Default.
- ``asof_join_salted``    — the above partitioned by (key, time-bucket) plus
                            a cross-bucket carry table: no task ever holds a
                            whole mega-conversation. The north-rule skew path.
- ``asof_join_broadcast`` — small data side: broadcast + theta join +
                            ``max_by``. No shuffle of the probe side at all.

The data row's matched values travel inside ONE struct so that a data row
whose value column is genuinely NULL is still "the match" (last-ignorenulls
per-column would wrongly skip it to an older row).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_MATCHED_TS = "__m_ts"
_MATCHED_TIE = "__m_tie"


def _state_struct(on: str, tie: str, value_cols: Sequence[str]):
    return F.struct(
        F.col(on).alias(_MATCHED_TS),
        F.col(tie).alias(_MATCHED_TIE),
        *[F.col(c).alias(c) for c in value_cols],
    )


def _unpack(result: DataFrame, probe_cols: Sequence[str], value_cols: Sequence[str],
            prefix: str, matched_cols: bool) -> DataFrame:
    sel = [F.col(c) for c in probe_cols]
    if matched_cols:
        sel.append(F.col("__state")[_MATCHED_TS].alias(f"{prefix}matched_ts"))
        sel.append(F.col("__state")[_MATCHED_TIE].alias(f"{prefix}matched_turn_idx"))
    sel += [F.col("__state")[c].alias(f"{prefix}{c}") for c in value_cols]
    return result.select(*sel)


def asof_join(
    probes: DataFrame,
    data: DataFrame,
    on: str = "ts",
    by: str = "conv_id",
    tie: str = "turn_idx",
    value_cols: Sequence[str] | None = None,
    prefix: str = "",
    allow_exact_matches: bool = True,
    matched_cols: bool = True,
) -> DataFrame:
    """Backward as-of join: one probe row out per probe row in.

    Probes with no data row at-or-before their ts get NULLs.
    ``probes`` must share the ``by``/``on`` column names with ``data`` and
    must not already contain ``prefix``-ed output names.
    """
    value_cols = list(value_cols) if value_cols is not None else [
        c for c in data.columns if c not in (by, on, tie)
    ]
    # tag: data rows order BEFORE probes at equal ts when exact matches are
    # allowed (probe sees them), AFTER when not.
    data_tag, probe_tag = (0, 1) if allow_exact_matches else (1, 0)
    d = data.select(
        F.col(by),
        F.col(on),
        F.col(tie).cast("long").alias("__tie"),
        _state_struct(on, tie, value_cols).alias("__state"),
        F.lit(data_tag).alias("__tag"),
    )
    p = probes.withColumn("__tag", F.lit(probe_tag))
    u = d.unionByName(p, allowMissingColumns=True)

    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("__tag").asc(), F.col("__tie").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.withColumn("__state", F.last("__state", ignorenulls=True).over(w))
    out_rows = filled.filter(F.col("__tag") == probe_tag)
    return _unpack(out_rows, probes.columns, value_cols, prefix, matched_cols)


def asof_join_salted(
    probes: DataFrame,
    data: DataFrame,
    on: str = "ts",
    by: str = "conv_id",
    tie: str = "turn_idx",
    value_cols: Sequence[str] | None = None,
    prefix: str = "",
    allow_exact_matches: bool = True,
    matched_cols: bool = True,
    bucket_seconds: int = 86400,
    broadcast_carry: bool = True,
) -> DataFrame:
    """Skew-safe as-of join: salt both sides by contiguous time bucket.

    Phase 1 — in-bucket sorted-merge: the ``asof_join`` union/window pattern
    partitioned by (key, bucket); a mega-conversation spanning B buckets
    parallelizes B-ways.
    Phase 2 — cross-bucket carry: per-(key, bucket) final data state
    (``max_by`` over (ts, tie)), forward-filled across the bucket domain
    (union of data and probe buckets — tiny table), joined back to probes
    whose in-bucket match was NULL.
    """
    value_cols = list(value_cols) if value_cols is not None else [
        c for c in data.columns if c not in (by, on, tie)
    ]

    def bucket(df_):
        from featureextraction_spark.functions.time import epoch_seconds

        return F.floor(epoch_seconds(df_, on) / F.lit(float(bucket_seconds))).cast("long")

    data_tag, probe_tag = (0, 1) if allow_exact_matches else (1, 0)
    d = data.select(
        F.col(by),
        F.col(on),
        F.col(tie).cast("long").alias("__tie"),
        _state_struct(on, tie, value_cols).alias("__state"),
        F.lit(data_tag).alias("__tag"),
        bucket(data).alias("__bucket"),
    )
    p = probes.withColumn("__tag", F.lit(probe_tag)).withColumn("__bucket", bucket(probes))
    u = d.unionByName(p, allowMissingColumns=True)

    w = (
        Window.partitionBy(by, "__bucket")
        .orderBy(F.col(on).asc(), F.col("__tag").asc(), F.col("__tie").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    in_bucket = u.withColumn("__state", F.last("__state", ignorenulls=True).over(w)).filter(
        F.col("__tag") == probe_tag
    )

    # Phase 2: carry table over the union of bucket domains.
    data_states = d.groupBy(by, "__bucket").agg(
        F.max_by("__state", F.struct(F.col(on), F.col("__tie"))).alias("__bstate")
    )
    domain = (
        data_states.select(by, "__bucket")
        .unionByName(p.select(by, "__bucket"))
        .distinct()
        .join(data_states, [by, "__bucket"], "left")
    )
    wcarry = (
        Window.partitionBy(by)
        .orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = domain.withColumn(
        "__carry", F.last("__bstate", ignorenulls=True).over(wcarry)
    ).select(by, "__bucket", "__carry")
    if broadcast_carry:
        carry = F.broadcast(carry)

    merged = in_bucket.join(carry, [by, "__bucket"], "left").withColumn(
        "__state", F.coalesce(F.col("__state"), F.col("__carry"))
    )
    return _unpack(merged, probes.columns, value_cols, prefix, matched_cols)


def asof_join_broadcast(
    probes: DataFrame,
    data: DataFrame,
    on: str = "ts",
    by: str = "conv_id",
    tie: str = "turn_idx",
    value_cols: Sequence[str] | None = None,
    prefix: str = "",
    allow_exact_matches: bool = True,
    matched_cols: bool = True,
) -> DataFrame:
    """Small-data-side as-of: broadcast + range predicate + ``max_by``.

    Left join keeps no-match probes (NULL state). Probe identity preserved
    via a transient unique id, so duplicate probe rows survive.
    """
    value_cols = list(value_cols) if value_cols is not None else [
        c for c in data.columns if c not in (by, on, tie)
    ]
    pid = probes.withColumn("__pid", F.monotonically_increasing_id())
    d = data.select(
        F.col(by).alias("__d_by"),
        F.col(on).alias("__d_on"),
        F.col(tie).cast("long").alias("__d_tie"),
        _state_struct(on, tie, value_cols).alias("__state"),
    )
    cmp_ = F.col("__d_on") <= F.col(on) if allow_exact_matches else F.col("__d_on") < F.col(on)
    joined = pid.join(
        F.broadcast(d), (F.col(by) == F.col("__d_by")) & cmp_, "left"
    )
    best = joined.groupBy("__pid", *[F.col(c) for c in probes.columns]).agg(
        F.max_by("__state", F.struct(F.col("__d_on"), F.col("__d_tie"))).alias("__state")
    )
    return _unpack(best, probes.columns, value_cols, prefix, matched_cols)


def apply_staleness(
    out: DataFrame,
    on: str = "ts",
    prefix: str = "",
    value_cols: Sequence[str] = (),
    tolerance_us: int = 0,
) -> DataFrame:
    """Staleness bound (feature-store TTL) on an as-of join's output.

    Feast/Tecton-style point-in-time semantics: a match older than
    ``tolerance_us`` microseconds before the probe is EXPIRED — its value
    columns (and matched-ts/turn bookkeeping) become NULL, exactly as if
    no data row existed, plus a ``{prefix}fresh`` 0/1 flag (0 covers both
    "expired" and "never matched"). A pure projection over any of the
    three as-of strategies' output — the tolerance adds zero shuffles.

    The comparison is on epoch µs (NTZ-safe) and INCLUSIVE at the bound:
    a match exactly ``tolerance_us`` old is still fresh, mirroring the
    inclusive backward match at distance 0.
    """
    from ..functions.time import epoch_us

    m_ts = f"{prefix}matched_ts"
    age = epoch_us(out, on) - epoch_us(out, m_ts)
    fresh = F.col(m_ts).isNotNull() & (age <= F.lit(int(tolerance_us)))
    sel = []
    nullable = {m_ts, f"{prefix}matched_turn_idx"} | {
        f"{prefix}{c}" for c in value_cols
    }
    for c in out.columns:
        if c in nullable:
            sel.append(F.when(fresh, F.col(c)).alias(c))
        else:
            sel.append(F.col(c))
    sel.append(fresh.cast("long").alias(f"{prefix}fresh"))
    return out.select(*sel)


def asof_join_forward(
    probes: DataFrame,
    data: DataFrame,
    on: str = "ts",
    by: str = "conv_id",
    tie: str = "turn_idx",
    value_cols: Sequence[str] | None = None,
    prefix: str = "",
    allow_exact_matches: bool = True,
) -> DataFrame:
    """FORWARD as-of join: nearest data row with ``ts >= probe ts``
    (inclusive; ties on ts broken by the LOWEST tie — the mirror of the
    backward join's highest-tie rule).

    Implemented by time reversal: negate the µs order AND the tie on both
    sides and delegate to the backward sorted-merge — one code path, one
    set of physical strategies, provably mirrored semantics. Output
    bookkeeping columns are ``{prefix}matched_us`` / ``{prefix}matched_tie``
    (µs longs, de-negated).

    Needed wherever the label or the next observation is the target
    ("time TO next event" serving reads, forward-fill duals); the
    backward join alone cannot express it without re-sorting.
    """
    from ..functions.time import epoch_us

    value_cols = list(value_cols) if value_cols is not None else [
        c for c in data.columns if c not in (by, on, tie)
    ]
    p = probes.withColumn("__neg_us", -epoch_us(probes, on))
    d = data.select(
        F.col(by),
        (-epoch_us(data, on)).alias("__neg_us"),
        (-F.col(tie).cast("long")).alias("__neg_tie"),
        *[F.col(c) for c in value_cols],
    )
    out = asof_join(
        p,
        d,
        on="__neg_us",
        by=by,
        tie="__neg_tie",
        value_cols=value_cols,
        prefix=prefix,
        allow_exact_matches=allow_exact_matches,
        matched_cols=True,
    )
    sel = [F.col(c) for c in probes.columns]
    sel.append((-F.col(f"{prefix}matched_ts")).cast("long").alias(f"{prefix}matched_us"))
    sel.append(
        (-F.col(f"{prefix}matched_turn_idx")).cast("long").alias(f"{prefix}matched_tie")
    )
    sel += [F.col(f"{prefix}{c}") for c in value_cols]
    return out.select(*sel)
