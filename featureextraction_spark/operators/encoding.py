"""Leakage-free (point-in-time) cumulative target encoding.

Classic feature-engineering encoder: each row's category (role, tool,
event type) is replaced by the mean of a numeric target over all
STRICTLY EARLIER rows of the same category — the value a model could
have known at that row's timestamp. Zero temporal leakage by
construction (the frame is ``ROWS BETWEEN UNBOUNDED PRECEDING AND 1
PRECEDING`` under a total (ts, tie) order); the first occurrence of a
category encodes to NULL (no prior evidence), which callers blend with
a global prior if desired.

Why not one global window per category: category cardinality is small
(roles/tools), so ``Window.partitionBy(category)`` puts the WHOLE
100-TB history of a category through one task — the single-reducer
anti-pattern. The scalable formulation here is the same two-phase shape
as ``packing.with_global_cumsum``, specialised per category and with
time buckets instead of range partitions:

1. bucket each row: ``b = epoch_us div bucket_us``;
2. per ``(category, bucket)``: exact integer count/sum partials — one
   map-side-combinable aggregation, output ~|categories|x|buckets| rows;
3. EXCLUSIVE prefix over buckets within category — a window over the
   tiny partial table only;
4. broadcast the offsets back onto the facts;
5. within ``(category, bucket)`` — bounded partitions — an exclusive
   ROWS window ordered by ``(ts, tie)`` adds the in-bucket prior;
6. prior = bucket offset + in-bucket prior.

The facts are shuffled ONCE (hash on (category, bucket)); every other
exchange moves the bounded partial table. Mega-categories degrade only
the per-(category, bucket) sort, and ``bucket_sec`` is the knob that
bounds it.

Exactness: the target is quantized to integer micro-units
(``rolling.quantize_q6``) so both engines sum the same integers; the
encoded mean is ONE integer/integer division, nudge-rounded by the
caller (the shared hash vehicle).

No reference counterpart; standard supervised-feature practice (e.g.
the CatBoost "ordered target statistics" formulation, Prokhorenkova et
al., NeurIPS'18 — public knowledge) re-expressed relationally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.time import epoch_us
from .rolling import quantize_q6

US = 1_000_000


def _with_prior_cols(out: DataFrame) -> DataFrame:
    return out.withColumn(
        "te_mean",
        F.when(
            F.col("prior_n") > 0,
            F.col("prior_sum_q") / (F.lit(float(US)) * F.col("prior_n")),
        ),
    )


def cumulative_target_encode(
    df: DataFrame,
    category: str = "role",
    ts: str = "ts",
    tie: tuple = ("turn_idx",),
    value: str = "value",
    bucket_sec: int = 86_400,
) -> DataFrame:
    """Append ``prior_n`` / ``prior_sum_q`` / ``te_mean`` per row: count,
    exact quantized sum, and mean of ``value`` over all strictly-earlier
    rows of the same ``category`` under the total order ``(ts, *tie)``.

    Assumes non-negative epochs (bucket id via integer ``div``) and a
    total order — ``(ts, *tie)`` must be unique within a category.
    """
    bucket_us = bucket_sec * US
    t = (
        df.withColumn("__us", epoch_us(df, ts))
        .withColumn("__vq", quantize_q6(F.col(value)))
        .withColumn("__b", F.expr(f"__us div {bucket_us}L"))
    )

    partials = t.groupBy(category, "__b").agg(
        F.count(F.lit(1)).alias("__cnt_b"),
        F.sum("__vq").alias("__sum_b"),
    )
    wprev = (
        Window.partitionBy(category)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = partials.select(
        category,
        "__b",
        F.coalesce(F.sum("__cnt_b").over(wprev), F.lit(0)).alias("__off_n"),
        F.coalesce(F.sum("__sum_b").over(wprev), F.lit(0)).alias("__off_sum"),
    )

    wloc = (
        Window.partitionBy(category, "__b")
        .orderBy("__us", *tie)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = (
        t.join(F.broadcast(offsets), [category, "__b"], "left")
        .withColumn(
            "prior_n",
            (F.col("__off_n") + F.count(F.lit(1)).over(wloc)).cast("long"),
        )
        .withColumn(
            "prior_sum_q",
            (
                F.col("__off_sum")
                + F.coalesce(F.sum("__vq").over(wloc), F.lit(0))
            ).cast("long"),
        )
    )
    return _with_prior_cols(out).drop(
        "__us", "__vq", "__b", "__off_n", "__off_sum"
    )


def cumulative_target_encode_simple(
    df: DataFrame,
    category: str = "role",
    ts: str = "ts",
    tie: tuple = ("turn_idx",),
    value: str = "value",
) -> DataFrame:
    """Single-window twin of :func:`cumulative_target_encode` — the
    direct ``Window.partitionBy(category)`` formulation. Semantically
    identical (tests assert row equality); kept as the readable spec and
    the small-category fast path."""
    t = df.withColumn("__us", epoch_us(df, ts)).withColumn(
        "__vq", quantize_q6(F.col(value))
    )
    w = (
        Window.partitionBy(category)
        .orderBy("__us", *tie)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = t.withColumn(
        "prior_n", F.count(F.lit(1)).over(w).cast("long")
    ).withColumn(
        "prior_sum_q", F.coalesce(F.sum("__vq").over(w), F.lit(0)).cast("long")
    )
    return _with_prior_cols(out).drop("__us", "__vq")


def hashed_features(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
    seed: int = 17,
) -> DataFrame:
    """The hashing trick (Weinberger et al., ICML'09): tokens → fixed
    ``n_buckets``-dim signed-count vector, the unbounded-vocabulary
    vectorizer a 100-TB corpus needs (no vocabulary fit, no dictionary
    broadcast, new tokens never resize anything).

    Token → 60-bit md5 (the cross-engine ``_seed_hash`` primitive);
    bucket = ``h % n_buckets``; sign from the NEXT hash bit
    (``h div n_buckets % 2``) so sign and bucket are independent bits of
    the same digest.  Output one row per (doc, non-empty bucket):
    ``val = Σ sign`` plus the unsigned token count — all exact integers,
    fully engine-portable.

    Plan: explode tokens → one groupBy((doc, bucket)) — map-side
    combinable, output bounded by ``rows × n_buckets``.  Zero Python,
    zero fitted state.

    Tokenization is the repo-standard portable whitespace class
    ``[^ \\t\\n\\r\\f\\x0B]+`` on the lowercased text (Java ``\\s`` ≠
    RE2 ``\\s``).
    """
    from .sampling import _seed_hash

    toks = df.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col(text)), F.lit("[^ \\t\\n\\r\\f\\x0B]+"), 0
            )
        ).alias("tok"),
    )
    h = _seed_hash("tok", seed)
    # sign = bit log2(n_buckets) of h, extracted with pure long modulo
    # (h % 2n < n) — no float division anywhere (h/64 as double would
    # round above 2^53), and DuckDB replays % on non-negative longs
    # identically
    per = toks.select(
        F.col(id_col),
        (h % n_buckets).cast("long").alias("bucket"),
        F.when(h % (2 * n_buckets) < n_buckets, F.lit(1))
        .otherwise(F.lit(-1))
        .cast("long")
        .alias("sign"),
    )
    return per.groupBy(id_col, "bucket").agg(
        F.sum("sign").alias("val"),
        F.count(F.lit(1)).alias("n_tokens"),
    )


def standard_scale(
    df: DataFrame,
    value: str = "value",
    id_col: str = "event_id",
    group_id: str = "user_id",
    train_frac: float = 0.8,
    seed: int = 42,
) -> DataFrame:
    """Leakage-free z-scaling: fit mean/std on the TRAIN split only
    (split assigned per GROUP — all rows of a conversation share a
    split, the group-leakage guard — via the deterministic md5 hash),
    then transform every row with the train statistics.

    Integer-exact fit: the value is quantized to MILLI-units (1e-3 —
    coarser than the repo-standard 1e-6 deliberately: the SQUARED moment
    must also fit int64, and z is scale-invariant so the z column is
    unchanged); the train aggregate keeps (n, Σvq, Σvq²) — associative
    integer moments.  The transform is
    ``z = (vq − Σvq/n) / sqrt((Σvq² − (Σvq)²/n)/(n−1))`` with the sums
    multiplied as doubles (the shared exact product while |Σ| < 2^53)
    and IEEE-correctly-rounded sqrt — every op identical on both engines
    given identical integers.  Overflow budget: |v| ≤ V ⇒ Σvq² ≤
    n·V²·1e6; int64 holds to n·V² ≤ 9.2e12 (n = 3e7 at V ≈ 560); past
    that, promote the second moment to decimal(38,0) — one cast, still
    exact (kept int64 here because the cross-engine gate compares raw
    column values and HUGEINT/decimal unify poorly).

    Plan: one ≤1-row aggregate (broadcast as a literal-free cross join
    of a 1-row DF — Spark turns it into a BroadcastNestedLoopJoin), the
    fact table never shuffles.
    """
    from .sampling import _seed_hash

    u = _seed_hash(group_id, seed).cast("double") / F.lit(float(1 << 60))
    vq3 = F.floor(F.col(value) * F.lit(1e3) + F.lit(0.5)).cast("long")
    t = df.withColumn("__vq", vq3).withColumn(
        "split", F.when(u < train_frac, F.lit("train")).otherwise(F.lit("held"))
    )
    fit = t.filter(F.col("split") == "train").agg(
        F.count(F.lit(1)).alias("n_train"),
        F.sum("__vq").alias("sum_q"),
        F.sum(F.col("__vq") * F.col("__vq")).alias("sum_sq_q"),
    )
    j = t.join(F.broadcast(fit))
    nd = F.col("n_train").cast("double")
    mu = F.col("sum_q").cast("double") / nd
    var = (
        F.col("sum_sq_q").cast("double")
        - F.col("sum_q").cast("double") * F.col("sum_q").cast("double") / nd
    ) / (nd - F.lit(1.0))
    return j.select(
        F.col(id_col),
        F.col(group_id),
        "split",
        F.col("__vq").alias("vq"),
        "n_train",
        "sum_q",
        "sum_sq_q",
        ((F.col("__vq").cast("double") - mu) / F.sqrt(var)).alias("z"),
    )


def woe_encode(
    df: DataFrame, category: str, label: F.Column, smoothing: float = 0.5
) -> DataFrame:
    """Weight-of-evidence table for a categorical feature against a
    binary label, with the information-value (IV) contribution per
    category — the classic credit-scoring / feature-screening encoder
    (Siddiqi, "Credit Risk Scorecards", 2006; public knowledge).

    Per category c:  WOE_c = ln( (pos_c + s)·neg_tot / ((neg_c + s)·pos_tot) )
                     iv_c  = (pos_c/pos_tot − neg_c/neg_tot) · WOE_c
    with additive smoothing ``s`` keeping empty cells finite.

    Exactness: counts are exact integers; with s = 0.5 the log argument
    is the exact rational (2·pos_c+1)·neg_tot / ((2·neg_c+1)·pos_tot)
    whose BIGINT numerator/denominator (``woe_num``/``woe_den``) are
    emitted as the bit-stable vehicles; ``woe``/``iv`` take one ln()
    each (1-ulp class, callers nudge-round for hash gates).

    Scale: one map-combinable (category) aggregate — |categories| rows —
    plus a broadcast 1-row totals join. Nothing else touches the facts.
    """
    if smoothing != 0.5:
        raise ValueError("the exact-rational vehicle requires smoothing=0.5")
    counts = df.groupBy(F.col(category).alias("category")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(label.cast("long")).cast("long").alias("pos"),
    )
    counts = counts.withColumn("neg", (F.col("n") - F.col("pos")).cast("long"))
    totals = counts.agg(
        F.sum("pos").cast("long").alias("pos_tot"),
        F.sum("neg").cast("long").alias("neg_tot"),
    )
    j = counts.crossJoin(F.broadcast(totals))
    woe_num = (F.lit(2) * F.col("pos") + 1) * F.col("neg_tot")
    woe_den = (F.lit(2) * F.col("neg") + 1) * F.col("pos_tot")
    woe = F.log(woe_num.cast("double") / woe_den.cast("double"))
    rate_gap = (
        F.col("pos").cast("double") / F.col("pos_tot").cast("double")
        - F.col("neg").cast("double") / F.col("neg_tot").cast("double")
    )
    return j.select(
        "category",
        "n",
        "pos",
        "neg",
        woe_num.cast("long").alias("woe_num"),
        woe_den.cast("long").alias("woe_den"),
        woe.alias("woe"),
        (rate_gap * woe).alias("iv"),
    )


def quantile_normalize(
    df: DataFrame,
    value: str,
    id_col: str,
    slice_col: str,
) -> DataFrame:
    """Map every slice's value distribution onto the POOLED corpus
    distribution — classic quantile normalization (the microarray /
    batch-effect standard, Bolstad et al. 2003): row with within-slice
    midpoint quantile u = (2r−1)/(2·n_s) is assigned the pooled type-1
    order statistic at index ⌈u·N⌉. Kills per-slice scale and shape
    differences while preserving within-slice order — the cross-source
    length/score harmonizer before mixing corpora.

    ENTIRELY integer arithmetic — rank r and pooled index

        j = ⌈(2r−1)·N / (2·n_s)⌉ = (（2r−1)·N + 2·n_s − 1) div (2·n_s)

    are exact BIGINTs (safe while 2rN < 2^63, i.e. N to ~2·10⁹ rows),
    and the output value is the pooled element at rank j — no floats
    anywhere, so every column is a bit-exact hash vehicle.

    Scale: the within-slice rank is one slice-keyed window (mega-slice
    note: swap in the per-slice two-phase cumsum if a single slice
    outgrows a task); the pooled rank rides
    :func:`..packing.with_global_cumsum`'s range-partitioned two-phase
    pass (caller releases the registered persist after the consuming
    action); the closing equi-join on j=rank shuffles the N-row pooled
    table once. Ties order by (value, id) so both ranks are total and
    deterministic.
    """
    from .packing import with_global_cumsum

    base = df.select(
        F.col(slice_col).alias("slice"),
        F.col(id_col).alias("id"),
        F.col(value).cast("long").alias("v"),
    )
    ws = Window.partitionBy("slice").orderBy("v", "id")
    ranked = base.select(
        "slice",
        "id",
        "v",
        F.row_number().over(ws).cast("long").alias("r"),
        F.count(F.lit(1))
        .over(Window.partitionBy("slice"))
        .cast("long")
        .alias("n_slice"),
    )
    pooled = with_global_cumsum(
        base.select("v", "id", F.lit(1).cast("long").alias("__one")),
        ["v", "id"],
        "__one",
        out_col="__rk0",
    ).select(
        (F.col("__rk0") + 1).cast("long").alias("__rk"),
        F.col("v").alias("qnorm"),
    )
    n_tot = base.agg(F.count(F.lit(1)).cast("long").alias("__n"))
    withj = ranked.crossJoin(F.broadcast(n_tot)).select(
        "slice",
        "id",
        "v",
        "r",
        "n_slice",
        # BIGINT ceiling division — `div`, never `/` (which widens to
        # double and loses exactness past 2^53)
        F.expr(
            "((2*r - 1) * __n + 2*n_slice - 1) div (2*n_slice)"
        )
        .cast("long")
        .alias("j"),
    )
    return withj.join(pooled, withj["j"] == pooled["__rk"]).drop("__rk")


def loo_target_encode(
    df: DataFrame,
    cat: str,
    y: str,
    id_col: str,
) -> DataFrame:
    """Leave-one-out target encoding (the Kaggle/CatBoost-family
    standard beside :func:`cumulative_target_encode`'s ordered form):
    each row's category is encoded by the mean target of all OTHER rows
    in the category —

        loo = (S_cat − y_row) / (n_cat − 1)

    so a row never sees its own label (the in-category leakage the
    naive mean encoder has). Singleton categories have no peers →
    ``loo`` NULL and ``encoded`` falls back to the GLOBAL leave-one-out
    prior (N−1 peers), so the output never leaks and never nulls.

    ALL-INTEGER vehicles: per-category S/n and the global S/N are exact
    BIGINT sums of an integer 0/1 target; every encode is a single
    division of BIGINTs — bit-exact cross-engine, no nudge.

    Scale: ONE map-side-combinable groupBy(cat) producing a
    |categories|-row table joined back BROADCAST; the global prior is a
    1-row crossJoin. No window, no second scan of the fact table.
    """
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(cat).alias("cat"),
        F.col(y).cast("long").alias("y"),
    )
    per = base.groupBy("cat").agg(
        F.count(F.lit(1)).cast("long").alias("n_cat"),
        F.sum("y").cast("long").alias("sum_y"),
    )
    tot = base.agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum("y").cast("long").alias("__s"),
    )
    out = base.join(F.broadcast(per), "cat").crossJoin(F.broadcast(tot))
    loo = F.when(
        F.col("n_cat") > 1,
        (F.col("sum_y") - F.col("y")).cast("double")
        / (F.col("n_cat") - 1).cast("double"),
    )
    prior = (F.col("__s") - F.col("y")).cast("double") / (
        F.col("__n") - 1
    ).cast("double")
    return out.select(
        "id",
        "cat",
        "y",
        "n_cat",
        "sum_y",
        loo.alias("loo"),
        F.coalesce(loo, prior).alias("encoded"),
    )
