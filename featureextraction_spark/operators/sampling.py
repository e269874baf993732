"""Per-label sampling joins (SURVEY.md J5).

The reference assembles triplet batches by picking, per anchor, two rows
with the same label and one with a different label
(``src/training/network.py:22-28``, ``TNetwork_features.py:55-61``) —
driver-side ``random.choice`` loops. Relationally:

* ``stratified_sample`` — per-label Bernoulli sampling (``df.sampleBy``);
* ``triplet_sample`` — anchor/positive via a same-label self-join with a
  deterministic pseudo-random rank, negative via a different-label join
  (the ``l1 != l2`` anti-condition) — fully distributed, no driver loop.

Determinism: "randomness" is the portable 60-bit md5 hash of
``"<id>:<seed>"`` (the same cross-engine contract as
``dedup.portable_hash60``), so the same seed always yields the same
triplets — reproducible training batches, testable without statistical
assertions, and replayable in DuckDB for the driver's external oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stratified_sample(
    df: DataFrame, label: str, fractions: dict, seed: int = 42
) -> DataFrame:
    """Per-label Bernoulli sample — thin, explicit wrapper over sampleBy."""
    return df.sampleBy(label, fractions=fractions, seed=seed)


def _seed_hash(id_col: str, seed: int) -> F.Column:
    """60-bit md5 of "<id>:<seed>" — int(md5[:15], 16), reproducible in
    DuckDB as ``('0x' || substr(md5(id::VARCHAR || ':<seed>'), 1, 15))::BIGINT``."""
    s = F.concat_ws(":", F.col(id_col).cast("string"), F.lit(str(seed)))
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def hash_split(
    df: DataFrame,
    id_col: str,
    boundaries: tuple[tuple[str, float], ...] = (
        ("train", 0.8),
        ("valid", 0.9),
        ("test", 1.0),
    ),
    seed: int = 42,
) -> DataFrame:
    """Deterministic, content-addressed train/valid/test assignment.

    Each row lands in the first split whose cumulative boundary exceeds
    ``u = hash60(id:seed) / 2^60`` — a pure function of the id, so the
    split is stable across runs, machines, and engines (no sampleBy RNG
    state), new rows never move existing rows between splits, and DuckDB
    replays it exactly (same md5 → same double → same comparison). The
    standard trick for leak-free split stability in training-data
    pipelines; reference analog is the static split LISTS it ships
    (S8, ``data/*.txt``) — this derives them instead of storing them.

    Scale: one narrow projection, no shuffle at all.
    """
    u = (_seed_hash(id_col, seed).cast("double") / F.lit(float(1 << 60))).alias("u")
    expr = F.lit(boundaries[-1][0])
    for name, hi in reversed(boundaries[:-1]):
        expr = F.when(F.col("u") < hi, F.lit(name)).otherwise(expr)
    return df.withColumn("u", u).withColumn("split", expr)


def _ranked(df: DataFrame, id_col: str, label: str, seed: int, name: str) -> DataFrame:
    w = Window.partitionBy(label).orderBy(_seed_hash(id_col, seed))
    return df.select(
        F.col(id_col).alias(f"{name}_id"),
        F.col(label).alias(f"{name}_label"),
        F.row_number().over(w).alias(f"{name}_rank"),
    )


def triplet_sample(
    df: DataFrame,
    id_col: str = "vec_id",
    label: str = "label",
    per_anchor: int = 1,
    seed: int = 42,
) -> DataFrame:
    """(anchor, positive, negative) triplets — ``min(per_anchor, n−1)``
    triplets per anchor, where n is the anchor's label group size.

    positives: the ``per_anchor`` next same-label rows in a seeded
    pseudo-random ring ordering (ring offsets 1..per_anchor, capped at
    n−1 so an offset never wraps onto the anchor itself); negative: a
    pseudo-randomly ranked row of the nearest other label rank-wise.
    Labels with a single row yield no triplet (no positive exists — the
    reference's sampler would loop forever there; we drop instead,
    documented).
    """
    a = _ranked(df, id_col, label, seed, "anchor")
    p = _ranked(df, id_col, label, seed, "pos")
    sizes = df.groupBy(label).agg(F.count(F.lit(1)).alias("__n")).select(
        F.col(label).alias("anchor_label"), "__n"
    )
    pairs = (
        a.join(F.broadcast(sizes), "anchor_label")
        .filter(F.col("__n") >= 2)
        .withColumn(
            "__o",
            F.explode(
                F.expr(f"sequence(1, int(least({int(per_anchor)}, __n - 1)))")
            ),
        )
        .join(
            p.withColumnRenamed("pos_label", "anchor_label"),
            on=[
                "anchor_label",
            ],
        )
        .filter(
            F.col("pos_rank")
            == F.pmod(F.col("anchor_rank") - 1 + F.col("__o"), F.col("__n")) + 1
        )
        .drop("__o")
    )
    # negative: deterministic different-label pick — hash-join the anchor to
    # the label ring of the "next" label (anti-condition l1 != l2). The ring
    # is built join-relationally (next = min greater label, wrap to global
    # min) — no partitionless window, even on this tiny dim table.
    labels = df.select(label).distinct()
    nxt = (
        labels.alias("a")
        .join(labels.alias("b"), F.col(f"b.{label}") > F.col(f"a.{label}"), "left")
        .groupBy(F.col(f"a.{label}").alias("anchor_label"))
        .agg(F.min(F.col(f"b.{label}")).alias("__next_label"))
    )
    first = labels.agg(F.min(label).alias("__first_label"))
    ring = nxt.crossJoin(F.broadcast(first)).select(
        "anchor_label",
        F.coalesce("__next_label", "__first_label").alias("neg_label"),
    )
    n = _ranked(df, id_col, label, seed + 1, "neg")
    neg_first = n.filter(F.col("neg_rank") == 1).select("neg_label", "neg_id")
    out = (
        pairs.join(F.broadcast(ring), "anchor_label")
        .join(F.broadcast(neg_first), "neg_label")
        .filter(F.col("neg_label") != F.col("anchor_label"))
        .select("anchor_id", "anchor_label", "pos_id", "neg_id", "neg_label")
    )
    return out


def group_kfold(
    df: DataFrame, group_id: str, k: int = 5, seed: int = 23
) -> DataFrame:
    """Group k-fold assignment: every row of a group (conversation)
    lands in the same fold — ``fold = hash60(group:seed) % k``.

    The grouped variant is the one that matters for transcripts: turn
    rows of one conversation are maximally correlated, so row-level
    folds leak (the model sees fold-1 turns of a conversation it is
    validated on in fold 2).  Content-addressed like ``hash_split``:
    stable across runs/engines/appends, no RNG state, nothing fitted.

    Scale: a narrow projection — zero shuffle; fold balance follows the
    binomial concentration of the hash (asserted by test), no
    greedy/sequential balancing pass that would serialize at 100 TB.
    """
    fold = (_seed_hash(group_id, seed) % k).cast("long")
    return df.withColumn("fold", fold)


def fold_stats(df: DataFrame, group_id: str, fold: str = "fold") -> DataFrame:
    """Per-fold balance sheet: groups, rows, tool rows — one map-side
    combinable aggregation onto k rows (distinct groups via the exact
    count-distinct shuffle, bounded by |groups|)."""
    return df.groupBy(fold).agg(
        F.countDistinct(group_id).alias("n_groups"),
        F.count(F.lit(1)).alias("n_rows"),
        F.count("tool").alias("tool_rows"),
    )


def temporal_split(
    df: DataFrame,
    ts_us: str,
    train_frac: float = 0.8,
    embargo_us: int = 0,
) -> DataFrame:
    """Leakage-safe TEMPORAL holdout with a purge gap (the time-series
    dual of ``hash_split``): train = strictly before the global
    ``train_frac`` time quantile, test = at/after cutoff + ``embargo_us``,
    and the embargo band between them is PURGED — rows a horizon-h label
    could leak across are in neither side (de Prado's purged split,
    public knowledge).

    The cutoff is the exact interpolated quantile of epoch µs (the
    ``group_quantiles`` expression shape, replayed verbatim) FLOORED to
    an integer, so every membership comparison is BIGINT vs BIGINT — no
    float boundary in the gate. Adding rows later only moves the cutoff
    forward; it never reshuffles past train rows into test.

    Scale: the global rank uses ``blockpair.with_global_rank`` (one
    ``repartitionByRange`` over an 8-byte projection + per-partition
    offsets), NOT a single-group window — a global-ORDER-BY WindowExec
    would funnel the whole table through one task at 100×. The two
    probe rows (positions k, k+1) come back via one broadcast join of a
    1-row probe; the cutoff then broadcast-joins onto a pure projection
    of the input.
    """
    from .blockpair import with_global_rank

    ranked = with_global_rank(
        df.select(F.col(ts_us).cast("double").alias("__v")), "__v", out_col="__rk"
    )
    probe = (
        ranked.agg(F.count(F.lit(1)).alias("__n"))
        .withColumn(
            "__pos",
            (F.col("__n") - F.lit(1)).cast("double") * F.lit(float(train_frac)),
        )
        .withColumn("__k", F.floor("__pos").cast("long"))
        .withColumn("__frac", F.col("__pos") - F.col("__k").cast("double"))
        .withColumn(
            "__khi", F.least(F.col("__k") + F.lit(1), F.col("__n") - F.lit(1))
        )
    )
    picked = ranked.join(
        F.broadcast(probe),
        (F.col("__rk") == F.col("__k")) | (F.col("__rk") == F.col("__khi")),
    )
    cutoff = picked.groupBy("__k", "__khi", "__frac").agg(
        F.max(F.when(F.col("__rk") == F.col("__k"), F.col("__v"))).alias("__lo"),
        F.max(F.when(F.col("__rk") == F.col("__khi"), F.col("__v"))).alias("__hi"),
    ).select(
        F.floor(
            F.round(
                F.col("__lo") + (F.col("__hi") - F.col("__lo")) * F.col("__frac"),
                6,
            )
        )
        .cast("long")
        .alias("__cut")
    )
    j = df.join(F.broadcast(cutoff))
    split = (
        F.when(F.col(ts_us) < F.col("__cut"), F.lit("train"))
        .when(F.col(ts_us) >= F.col("__cut") + F.lit(int(embargo_us)), F.lit("test"))
        .otherwise(F.lit("purged"))
    )
    return j.withColumn("split", split).withColumn(
        "cutoff_us", F.col("__cut").cast("long")
    ).drop("__cut")


def _pair_hash(a: F.Column, b: F.Column, seed: int) -> F.Column:
    """60-bit md5 of "<a>|<b>:<seed>" — the pairwise variant of
    ``_seed_hash``, replayable in DuckDB with the same md5/substr/hex
    construction."""
    s = F.concat_ws(
        ":",
        F.concat_ws("|", a.cast("string"), b.cast("string")),
        F.lit(str(seed)),
    )
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def negative_sample(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    doc_id: str,
    k: int = 2,
    n_buckets: int = 16,
    seed: int = 7,
) -> DataFrame:
    """``k`` deterministic pseudo-random negatives per query for
    retrieval / contrastive training: (query_id, doc_id, neg_rank).

    Construction: corpus docs land in ``n_buckets`` hash buckets
    (``hash60(doc:seed) mod B``); each query probes the single bucket
    ``hash60(query:seed+1) mod B`` and takes the ``k`` docs with the
    smallest PAIR hash ``hash60(query|doc:seed+2)`` — a fresh
    pseudo-random draw per query, so two queries probing the same bucket
    still get different negatives. Queries in an empty bucket (only
    possible when corpus < buckets) yield no rows, documented.

    Scale design: the probe is an EQUI-join on the bucket id — per-query
    cost is corpus/B rows, tuned by ``n_buckets``, never the full corpus
    (the classic in-batch/bucketed negative approximation of uniform
    sampling; exact uniform would be a cross join). The per-query top-k
    window partitions on query_id — granular keys, no skew. Everything
    is md5/integer expressions, bit-replayable cross-engine.
    """
    docs = corpus.select(
        F.col(doc_id).alias("__doc"),
        F.pmod(_seed_hash(doc_id, seed), F.lit(n_buckets)).alias("__b"),
    )
    qs = queries.select(
        F.col(query_id).alias("__q"),
        F.pmod(_seed_hash(query_id, seed + 1), F.lit(n_buckets)).alias("__b"),
    )
    pairs = qs.join(docs, "__b").withColumn(
        "__ph", _pair_hash(F.col("__q"), F.col("__doc"), seed + 2)
    )
    w = Window.partitionBy("__q").orderBy("__ph", "__doc")
    return (
        pairs.withColumn("neg_rank", F.row_number().over(w).cast("long"))
        .where(F.col("neg_rank") <= k)
        .select(
            F.col("__q").alias(query_id),
            F.col("__doc").alias(doc_id),
            "neg_rank",
        )
    )


def systematic_sample(
    df: DataFrame,
    order_col: str,
    every_k: int,
    offset: int = 0,
) -> DataFrame:
    """Every ``k``-th row in ``order_col`` order (rows whose global rank
    ≡ offset mod k) — the ordered thinning used for eval slices and
    debug extracts when a hash sample must not break ordering locality.

    ``order_col`` values must be unique (ids). The global rank is
    :func:`..blockpair.with_global_rank`'s two-phase range-partitioned
    rank — no single-partition window — and the mod filter is one
    integer expression, so the pass is a range shuffle + a map.
    """
    from .blockpair import with_global_rank

    if every_k < 1:
        raise ValueError("every_k must be >= 1")
    ranked = with_global_rank(df, order_col, "__rk")
    return ranked.where(
        F.pmod(F.col("__rk"), F.lit(every_k)) == F.lit(offset % every_k)
    ).drop("__rk")


def _isqrt(x: F.Column) -> F.Column:
    """Exact integer sqrt of a non-negative BIGINT column: floor(sqrt)
    via IEEE double sqrt, then a ±1 integer correction — sqrt is
    correctly rounded on every engine, but floor of it can land one off
    near perfect squares once x exceeds ~2^44; the integer comparisons
    pin the true value regardless of which side the float landed on."""
    m = F.floor(F.sqrt(x.cast("double"))).cast("long")
    return (
        F.when((m + 1) * (m + 1) <= x, m + 1)
        .when(m * m > x, m - 1)
        .otherwise(m)
    )


def neyman_allocation(
    df: DataFrame,
    stratum: str,
    value: str,
    total_budget: int = 1000,
    var_scale: int = 10_000,
) -> DataFrame:
    """Neyman-optimal sample allocation across strata (Neyman 1934):
    labeling/eval budget per stratum ∝ N_h · S_h — big, high-variance
    strata get more budget, uniform strata less. The standard design
    step for building an eval set over a heterogeneous corpus
    (per-source labeling budgets, stratified quality audits).

    Everything that crosses the hash gate is integer-exact:

    - per-stratum moment sums n, Σx, Σx² (one map-combinable pass over
      an integer ``value`` column);
    - ``var_q = (n·Σx² − (Σx)²)·var_scale div (n·(n−1))`` — the sample
      variance in 1/var_scale units, integer floor division (0 for
      single-row strata: no within-stratum signal);
    - ``sigma_q = isqrt(var_q)`` — EXACT integer sqrt (float sqrt with
      a ±1 integer correction, portable at any magnitude);
    - ``alloc_num = n·sigma_q`` and the budget split ``n_target =
      total_budget·alloc_num div Σ alloc_num`` — pure BIGINT
      arithmetic; the float ``share`` is one closing division.

    Requires n·Σx² < 2^63 (~10^9 rows/stratum at 32-bit values; above,
    pre-scale ``value`` — the allocation is scale-invariant).

    Scale: one groupBy onto |strata| rows; the Σ alloc_num total joins
    back as a 1-row broadcast. Row order never matters.
    """
    v = F.col(value).cast("long")
    g = df.groupBy(F.col(stratum)).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(v).cast("long").alias("sum_x"),
        F.sum(v * v).cast("long").alias("sum_x2"),
    )
    # floor(raw·scale / den) WITHOUT the raw·scale product ever
    # materializing (it overflows int64 on big strata): split into
    # (raw div den)·scale + ((raw mod den)·scale) div den — exact.
    g = g.withColumn(
        "var_q",
        F.expr(
            f"""CASE WHEN n_rows > 1 THEN
                  (n_rows * sum_x2 - sum_x * sum_x)
                      div (n_rows * (n_rows - 1)) * {var_scale}L
                  + ((n_rows * sum_x2 - sum_x * sum_x)
                      % (n_rows * (n_rows - 1))) * {var_scale}L
                      div (n_rows * (n_rows - 1))
                ELSE 0L END"""
        ).cast("long"),
    )
    g = g.withColumn("sigma_q", _isqrt(F.col("var_q")).cast("long"))
    g = g.withColumn(
        "alloc_num", (F.col("n_rows") * F.col("sigma_q")).cast("long")
    )
    tot = g.agg(F.sum("alloc_num").cast("long").alias("total_alloc"))
    out = g.crossJoin(F.broadcast(tot))
    return out.select(
        stratum, "n_rows", "var_q", "sigma_q", "alloc_num", "total_alloc",
        F.expr(
            f"CASE WHEN total_alloc > 0 THEN "
            f"CAST({total_budget}L * alloc_num div total_alloc AS BIGINT) "
            f"ELSE 0L END"
        ).alias("n_target"),
        F.when(
            F.col("total_alloc") > 0,
            F.col("alloc_num").cast("double")
            / F.col("total_alloc").cast("double"),
        ).alias("share"),
    )


def neyman_sample(
    df: DataFrame,
    stratum: str,
    value: str,
    id_col: str,
    total_budget: int = 1000,
    var_scale: int = 10_000,
    seed: int = 77,
) -> DataFrame:
    """APPLY step for :func:`neyman_allocation`: actually draw the
    variance-proportional stratified sample. Rows rank within their
    stratum by the content-addressed 60-bit hash (id tiebreak — fully
    deterministic, engine-replayable, append-stable) and the first
    ``n_target`` of each stratum are kept.

    Scale: the allocation table (|strata| rows) broadcasts back onto
    the rows; the per-stratum rank is ONE keyed window whose rank≤n
    filter Spark plans as a map-side WindowGroupLimit — each task ships
    at most n_target rows per stratum into the exchange.
    """
    alloc = neyman_allocation(
        df, stratum, value, total_budget=total_budget, var_scale=var_scale
    ).select(stratum, "n_target")
    w = Window.partitionBy(stratum).orderBy(
        _seed_hash(id_col, seed).asc(), F.col(id_col).asc()
    )
    ranked = df.select(
        F.col(id_col), F.col(stratum), F.col(value).cast("long").alias(value)
    ).withColumn("draw_rank", F.row_number().over(w).cast("long"))
    return (
        ranked.join(F.broadcast(alloc), stratum)
        .where(F.col("draw_rank") <= F.col("n_target"))
        .select(id_col, stratum, value, "draw_rank", "n_target")
    )


def priority_sample(
    df: DataFrame,
    id_col: str,
    weight: str,
    k: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Priority sampling (Duffield, Lund & Thorup, JACM'07): a k-row
    weighted sample that estimates the sum of ANY weighted subset.

    Each row gets priority ``q = w / u`` with ``u = (hash60(id:seed) +
    0.5) / 2^60``; the sample is the k highest priorities and ``tau`` is
    the (k+1)-th. The estimator ``est_weight = max(w, tau)`` makes
    ``Σ_{sample ∩ S} est_weight`` unbiased for ``Σ_S w`` for every subset
    S — the one-pass sketch for "how many tokens does slice X hold" over
    a 100-TB corpus without rescanning it. With ≤ k rows the sample is
    the whole table (tau = 0, est = w exactly).

    Exactness contract: u and q use only IEEE core ops (int→double cast,
    add, divide — no libm), so priorities, ranks, tau and the estimates
    are bit-identical on any engine; "randomness" is the repo's portable
    md5-60-bit hash, replayable in DuckDB. Ties (astronomically unlikely)
    break on id, keeping the rank total.

    Scale: one narrow projection computes q; Catalyst collapses the
    partitionless ``row_number ≤ k+1`` into ONE
    ``TakeOrderedAndProject(limit=k+1)`` — per-task partial top-(k+1),
    only k+1 rows ever leave the map side. tau is then read off the
    bounded k+1-row table itself (no second corpus pass), so the whole
    sample is a single scan.
    """
    u = (_seed_hash(id_col, seed).cast("double") + F.lit(0.5)) / F.lit(
        float(1 << 60)
    )
    q = df.select(
        F.col(id_col),
        F.col(weight).cast("long").alias("weight"),
        (F.col(weight).cast("double") / u).alias("priority"),
    )
    w = Window.orderBy(F.col("priority").desc(), F.col(id_col).asc())
    ranked = q.withColumn("rn", F.row_number().over(w).cast("long")).where(
        F.col("rn") <= k + 1
    )
    # the (k+1)-th priority, broadcast across the ≤ k+1 surviving rows by
    # an unordered whole-partition window — bounded by construction
    tau = F.coalesce(
        F.max(F.when(F.col("rn") == k + 1, F.col("priority"))).over(
            Window.partitionBy()
        ),
        F.lit(0.0),
    )
    return (
        ranked.withColumn("tau", tau)
        .where(F.col("rn") <= k)
        .select(
            id_col,
            "weight",
            "priority",
            "rn",
            "tau",
            F.greatest(F.col("weight").cast("double"), F.col("tau")).alias(
                "est_weight"
            ),
        )
    )


def balance_weights(df: DataFrame, label: str, beta: float = 0.999) -> DataFrame:
    """Class-balanced loss weights by EFFECTIVE NUMBER of samples (Cui
    et al. CVPR'19): weight ∝ (1−β)/(1−β^n) per class — the re-weighting
    standard between plain 1/n (over-corrects rare classes) and uniform
    (ignores imbalance). β is the overlap knob: →0 recovers uniform,
    →1 recovers inverse frequency.

    Output: one row per class — ``label``, ``n`` (exact BIGINT), raw
    doubles ``eff_n = (1−β^n)/(1−β)``, ``weight = 1/eff_n`` and
    ``weight_norm`` scaled so weights sum to the class count (the
    paper's normalization; caller nudge-rounds). ``pow(β, n)`` is the
    one libm call; the ≤|classes|-term normalizing sum rides the shared
    nudge.

    Scale: ONE map-side-combinable groupBy(label); the normalizer is a
    1-row aggregate of the bounded class table joined back via
    broadcast.
    """
    per = df.groupBy(F.col(label).alias("label")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    eff = (
        (F.lit(1.0) - F.pow(F.lit(float(beta)), F.col("n").cast("double")))
        / F.lit(1.0 - float(beta))
    )
    per = per.select("label", "n", eff.alias("eff_n"))
    per = per.withColumn("weight", F.lit(1.0) / F.col("eff_n"))
    tot = per.agg(
        F.sum("weight").alias("__wsum"),
        F.count(F.lit(1)).cast("long").alias("__k"),
    )
    out = per.crossJoin(F.broadcast(tot))
    return out.select(
        "label",
        "n",
        "eff_n",
        "weight",
        (
            F.col("weight") * F.col("__k").cast("double") / F.col("__wsum")
        ).alias("weight_norm"),
    )
