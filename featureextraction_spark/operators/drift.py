"""Distribution-drift screening between corpus slices (chi-square bins).

The monitoring half of a training-data pipeline: given two slices of a
corpus (e.g. yesterday's crawl vs today's, or split A vs B of the same
snapshot), bin a numeric feature into fixed-width integer bins and score
per-bin divergence with the chi-square statistic

    chi2_bin = (nA − eA)²/eA + (nB − eB)²/eB,
    eA = (nA + nB) · NA / (NA + NB),   eB = (nA + nB) · NB / (NA + NB)

chosen over PSI/KL because it is RATIONAL in the integer counts — no
log/libm dependence, so the value is bit-portable across engines (the
same reason ``pmi_pairs`` ships lift and ``conv_summary`` ships Gini).

Splitting is the repo's content-addressed 60-bit md5 contract
(``hash_split``): deterministic, seed-keyed, engine-portable, no RNG.

Scale design: the entire operator is ONE map-side-combinable groupBy on
the bin id (bins are `div`-integer, computed in the scan projection) —
output is |bins| rows regardless of input size; totals are a whole-frame
window over that bins-sized aggregate (one bounded single-partition
exchange of |bins| rows, never a second input scan). This is the
cheapest shape a 100-TB scan can take.

No reference counterpart; standard data-validation practice (e.g. TFDV's
drift comparators — public knowledge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sampling import _seed_hash


def histogram_drift(
    df: DataFrame,
    value: str,
    id_col: str,
    bin_width: int = 50,
    seed: int = 42,
    split_mod: int = 2,
) -> DataFrame:
    """Chi-square drift screen between the two md5-hash halves of ``df``.

    Returns one row per occupied bin: ``bin`` (long, floor(value/width)),
    ``n_a`` / ``n_b`` (exact longs), and ``chi2`` (double — rational in
    the counts; caller nudge-rounds). A bin empty on one side still
    contributes (the expected count is positive whenever the bin is
    occupied at all).
    """
    halves = df.select(
        (F.floor(F.col(value).cast("double") / F.lit(float(bin_width))))
        .cast("long")
        .alias("bin"),
        (F.pmod(_seed_hash(id_col, seed), F.lit(split_mod)) == 0)
        .cast("int")
        .alias("__is_a"),
    )
    bins = halves.groupBy("bin").agg(
        F.sum("__is_a").cast("long").alias("n_a"),
        F.sum(F.lit(1) - F.col("__is_a")).cast("long").alias("n_b"),
    )
    # totals as a whole-frame window over the |bins|-row aggregate: ONE
    # bounded single-partition exchange of a bins-sized frame (the
    # unigram-LM/DSIR precedent), never a second scan of the input
    w_all = Window.partitionBy()
    j = bins.withColumn("__na", F.sum("n_a").over(w_all).cast("double")).withColumn(
        "__nb", F.sum("n_b").over(w_all).cast("double")
    )
    tot = F.col("n_a").cast("double") + F.col("n_b").cast("double")
    e_a = tot * F.col("__na") / (F.col("__na") + F.col("__nb"))
    e_b = tot * F.col("__nb") / (F.col("__na") + F.col("__nb"))
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    # a side with zero GLOBAL mass has e=0 for every bin — its terms are
    # defined as 0 (degenerate one-sided input), not NaN
    chi2 = F.when(e_a > 0, (na - e_a) * (na - e_a) / e_a).otherwise(
        F.lit(0.0)
    ) + F.when(e_b > 0, (nb - e_b) * (nb - e_b) / e_b).otherwise(F.lit(0.0))
    return j.select("bin", "n_a", "n_b", chi2.alias("chi2"))


def ks_test(
    df: DataFrame,
    value: str,
    group: str,
    group_a,
    group_b,
    quant: float = 100.0,
) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov statistic between the value
    distributions of two groups — the distribution-drift test that sees
    SHAPE changes chi-squared binning smears away (train-vs-serve skew,
    cohort shift).

    D = max_v |F_a(v) − F_b(v)| over the merged quantized support,
    kept rational: with inclusive cumulative counts c_a, c_b and totals
    n_a, n_b,

        d_num = max |c_a·n_b − c_b·n_a|        d_den = n_a·n_b

    are exact BIGINTs (the hash vehicles); ``d`` is ONE closing
    division. ``at_vq`` reports the smallest support point attaining
    the max — where the CDFs diverge most.

    Scale: the log collapses to its distinct-support table first (ONE
    map-side-combinable groupBy, |support| ≤ value-domain/quant rows);
    the two inclusive cumsums ride the two-phase range-partitioned pass
    (:func:`..packing.with_global_cumsum` — no single-partition
    window); totals and the final max are 1-row aggregates broadcast
    in-plan.
    """
    from .packing import with_global_cumsum

    vq = F.floor(F.col(value).cast("double") * F.lit(quant) + F.lit(0.5)).cast(
        "long"
    )
    g = F.col(group)
    base = df.select(vq.alias("vq"), g.alias("__g")).where(
        g.isin([group_a, group_b])
    )
    per = base.groupBy("vq").agg(
        F.sum(F.when(F.col("__g") == group_a, 1).otherwise(0))
        .cast("long")
        .alias("cnt_a"),
        F.sum(F.when(F.col("__g") == group_b, 1).otherwise(0))
        .cast("long")
        .alias("cnt_b"),
    )
    cum = with_global_cumsum(per, ["vq"], "cnt_a", out_col="__ba")
    cum = with_global_cumsum(cum, ["vq"], "cnt_b", out_col="__bb")
    totals = per.groupBy().agg(
        F.sum("cnt_a").cast("long").alias("n_a"),
        F.sum("cnt_b").cast("long").alias("n_b"),
    )
    dev = cum.crossJoin(F.broadcast(totals)).select(
        "vq",
        "n_a",
        "n_b",
        F.abs(
            (F.col("__ba") + F.col("cnt_a")) * F.col("n_b")
            - (F.col("__bb") + F.col("cnt_b")) * F.col("n_a")
        )
        .cast("long")
        .alias("__dev"),
    )
    best = dev.groupBy("n_a", "n_b").agg(
        F.max("__dev").cast("long").alias("d_num"),
        F.min_by("vq", F.struct(F.negate(F.col("__dev")), F.col("vq")))
        .cast("long")
        .alias("at_vq"),
    )
    return best.select(
        "n_a",
        "n_b",
        "at_vq",
        "d_num",
        (F.col("n_a") * F.col("n_b")).cast("long").alias("d_den"),
        F.when(
            F.col("n_a") * F.col("n_b") > 0,
            F.col("d_num").cast("double")
            / (F.col("n_a") * F.col("n_b")).cast("double"),
        ).alias("d"),
    )


def tv_distance(df: DataFrame, part: str, cat: str) -> DataFrame:
    """Total-variation distance between each partition's categorical
    mix and the full-corpus mix — "did the split / day / shard drift
    from the corpus?". TV is THE log-free divergence: unlike KL/PSI it
    needs no libm and no smoothing for empty cells, and

        TV(p) = ½ Σ_c |n_pc/N_p − N_c/N|

    clears to the exact integer form

        tv_num(p) = Σ_c |n_pc·N − N_c·N_p|,   tv_den(p) = 2·N_p·N

    — every cell term a BIGINT (exact while N·max(N_c) < 2^63, i.e.
    corpora to ~3e9 rows; beyond, pre-divide counts by a power of two),
    order-independent under any partial aggregation, so tv_num/tv_den
    are portable hash vehicles and the float TV is ONE closing
    division. Categories absent from a partition contribute |0 − N_c·N_p|
    — the full (partition × category) grid is materialized from the two
    marginal DIM tables, never from the row table.

    Scale: one groupBy(part, cat) over the rows; everything after runs
    on the cell table (|parts|·|cats| rows). The corpus total joins in
    as a broadcast 1-row frame — no collect, no second scan.
    """
    cells = df.groupBy(
        F.col(part).alias("__p"), F.col(cat).alias("__c")
    ).agg(F.count(F.lit(1)).cast("long").alias("__npc"))
    sp = cells.groupBy("__p").agg(F.sum("__npc").cast("long").alias("__np"))
    ct = cells.groupBy("__c").agg(F.sum("__npc").cast("long").alias("__nc"))
    tot = cells.agg(F.sum("__npc").cast("long").alias("__n"))
    grid = sp.crossJoin(ct).join(cells, ["__p", "__c"], "left").select(
        "__p", "__np", "__nc",
        F.coalesce(F.col("__npc"), F.lit(0)).cast("long").alias("__npc"),
    )
    j = grid.crossJoin(F.broadcast(tot))
    out = j.groupBy("__p").agg(
        F.max("__np").cast("long").alias("n_rows"),
        F.sum(
            F.abs(F.col("__npc") * F.col("__n") - F.col("__nc") * F.col("__np"))
        )
        .cast("long")
        .alias("tv_num"),
        (F.lit(2) * F.max("__np") * F.max("__n")).cast("long").alias("tv_den"),
    )
    return out.select(
        F.col("__p").alias(part), "n_rows", "tv_num", "tv_den",
        (F.col("tv_num").cast("double") / F.col("tv_den").cast("double"))
        .alias("tv"),
    )


def psi_bins(
    df: DataFrame,
    value: str,
    id_col: str,
    bin_width: int = 50,
    seed: int = 42,
    split_mod: int = 2,
) -> DataFrame:
    """Population Stability Index per bin between the two md5-hash
    halves of ``df`` — the industry-standard drift score
    (psi = Σ (p_a − p_b)·ln(p_a/p_b); credit-scoring monitoring
    practice, e.g. Siddiqi 2006) alongside :func:`histogram_drift`'s
    rational chi-square screen.

    Empty-on-one-side bins would make the ln blow up, so shares are
    Laplace-smoothed with the DETERMINISTIC rule p = (n + 0.5) /
    (N + 0.5·K) where K is the occupied-bin count — every input to the
    float expression is an exact BIGINT, the closing tree is fixed
    (two divisions, one ln, one multiply), so the value is
    bit-portable like :func:`ks_test`'s ``d``.

    Output: one row per occupied bin — ``bin``, exact ``n_a``/``n_b``
    BIGINT vehicles, and ``psi_term`` (double, raw; caller
    nudge-rounds). Total PSI = Σ psi_term, left to the caller so the
    gate stays per-bin exact.

    Scale: identical shape to :func:`histogram_drift` — ONE map-side-
    combinable groupBy on the bin id; totals + bin count join back as a
    broadcast 1-row frame over the |bins|-row table (no partitionless
    window, no second input scan).
    """
    from .sampling import _seed_hash

    halves = df.select(
        (F.floor(F.col(value).cast("double") / F.lit(float(bin_width))))
        .cast("long")
        .alias("bin"),
        (F.pmod(_seed_hash(id_col, seed), F.lit(split_mod)) == 0)
        .cast("int")
        .alias("__is_a"),
    )
    bins = halves.groupBy("bin").agg(
        F.sum("__is_a").cast("long").alias("n_a"),
        F.sum(F.lit(1) - F.col("__is_a")).cast("long").alias("n_b"),
    )
    tot = bins.agg(
        F.sum("n_a").cast("long").alias("__na"),
        F.sum("n_b").cast("long").alias("__nb"),
        F.count(F.lit(1)).cast("long").alias("__k"),
    )
    j = bins.crossJoin(F.broadcast(tot))
    # smoothed shares: numerators 2n+1, denominators 2N+K (the 0.5s
    # cleared to keep every operand an exact integer)
    p_a = (2 * F.col("n_a") + 1).cast("double") / (
        2 * F.col("__na") + F.col("__k")
    ).cast("double")
    p_b = (2 * F.col("n_b") + 1).cast("double") / (
        2 * F.col("__nb") + F.col("__k")
    ).cast("double")
    return j.select(
        "bin",
        "n_a",
        "n_b",
        ((p_a - p_b) * F.log(p_a / p_b)).alias("psi_term"),
    )


def js_divergence(df: DataFrame, part: str, cat: str) -> DataFrame:
    """Jensen-Shannon divergence between each partition's categorical
    mix and the full-corpus mix — the SYMMETRIC, always-finite
    companion of :func:`tv_distance` (Lin 1991): bounded by ln 2, no
    smoothing knob, and unlike PSI it never blows up on empty cells
    (a category absent from a partition contributes only through the
    corpus half, whose mixture share stays positive).

    With p_c = n_pc/N_p the partition share and q_c = N_c/N the corpus
    share, m_c = (p_c + q_c)/2:

        JS(p) = ½ Σ_c p_c·ln(p_c/m_c) + ½ Σ_c q_c·ln(q_c/m_c)

    Every share is a single division of exact BIGINT counts; each term
    is a fixed float tree over them; the only cross-engine freedom is
    the ≤|cats|-term addition order per partition (the shared nudge
    absorbs it — the mi/psi precedent).

    Output: one row per partition — ``part``, ``n_rows`` (BIGINT), and
    raw doubles ``js``, ``js_p`` / ``js_q`` (the two KL halves; caller
    nudge-rounds).

    Scale: identical shape to :func:`tv_distance` — ONE
    map-side-combinable groupBy(part, cat) over the rows, then the
    (|parts|·|cats|)-row grid built from the two marginal DIM tables;
    the corpus totals join as a broadcast 1-row frame. No second input
    scan, no partitionless window.
    """
    cells = df.groupBy(
        F.col(part).alias("__p"), F.col(cat).alias("__c")
    ).agg(F.count(F.lit(1)).cast("long").alias("__npc"))
    sp = cells.groupBy("__p").agg(F.sum("__npc").cast("long").alias("__np"))
    ct = cells.groupBy("__c").agg(F.sum("__npc").cast("long").alias("__nc"))
    tot = cells.agg(F.sum("__npc").cast("long").alias("__n"))
    grid = sp.crossJoin(ct).join(cells, ["__p", "__c"], "left").select(
        "__p", "__np", "__nc",
        F.coalesce(F.col("__npc"), F.lit(0)).cast("long").alias("__npc"),
    )
    j = grid.crossJoin(F.broadcast(tot))
    p_c = F.col("__npc").cast("double") / F.col("__np").cast("double")
    q_c = F.col("__nc").cast("double") / F.col("__n").cast("double")
    m_c = (p_c + q_c) / F.lit(2.0)
    term_p = F.when(F.col("__npc") > 0, p_c * F.log(p_c / m_c)).otherwise(
        F.lit(0.0)
    )
    term_q = q_c * F.log(q_c / m_c)  # q_c > 0 for every corpus category
    out = j.groupBy("__p").agg(
        F.max("__np").cast("long").alias("n_rows"),
        (F.sum(term_p) / F.lit(2.0)).alias("js_p"),
        (F.sum(term_q) / F.lit(2.0)).alias("js_q"),
    )
    return out.select(
        F.col("__p").alias(part),
        "n_rows",
        (F.col("js_p") + F.col("js_q")).alias("js"),
        "js_p",
        "js_q",
    )
