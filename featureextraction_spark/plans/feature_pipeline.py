"""Point-in-time feature pipeline (FIXTURES.md §3, SURVEY.md §7 step 6).

Produces one wide feature row per probe ``(conv_id, ts)``, computed over the
leakage-free prefix ``ts' <= ts`` of that conversation:

- relational half (pure DataFrame windows, ONE sort per conversation):
  session_id (W6), turn_count, prev_role (W11), last_tool (W12),
  role_transitions (A7) — computed per turn, read at the probe's matched
  turn;
- numeric half (Arrow-vectorized ``applyInPandas`` cogroup): the reference's
  five feature families transposed onto per-conversation series
  (``functions/series_kernels.py``) — zones, median width, lc/uc contour,
  slantness.

Scale design: the only shuffle key is ``conv_id`` (both cogroup sides);
``text`` is pruned to two small numeric columns (n_chars, n_tokens) before
the Arrow exchange, so a mega-conversation ships kilobytes per turn, not
its transcript. Probes are deduplicated on (conv_id, ts) — the vector is a
pure function of that pair.

Probe-density cost bound: each probe evaluates its full prefix, so a
conversation of n turns with p probes costs O(p·n) kernel work (plus the
O(min(n,64)²) zones grid per probe) — quadratic in n only when probing
EVERY turn. The shipped pipeline defaults to a few probes per conversation
(``run_pipeline --probes-per-conv``, last-N turns), which keeps the work
linear. Dense probing is bounded in practice by the numpy kernels'
throughput — ``bench.py`` reports a ``feature_vectors_dense_sec``
datapoint (probe = every turn) alongside the sparse default so regressions
in the dense regime are visible. If your workload probes every turn at
mega-conversation lengths, precompute prefix-cumulative state instead
(the zones/contour families are cumsum-expressible; the extremes/slopes
families are not — they would need a sliding-window reformulation).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from featureextraction_spark.functions import series_kernels as K
from featureextraction_spark.operators.backfill import forward_fill
from featureextraction_spark.operators.sessionize import sessionize
from featureextraction_spark.operators.transitions import running_transitions

# ASCII-whitespace tokenization, identical semantics in Spark regex (engine)
# and Python re (oracle): tokens = maximal runs of non-whitespace.
TOKEN_REGEX = "[^ \\t\\n\\r\\f\\u000B]+"

NUMERIC_FEATURES = [
    "upper_zone", "middle_zone", "lower_zone",
    "median_width",
    "lc_slant", "lc_slant_mse", "lc_local_max_freq", "lc_local_min_freq",
    "lc_max_slopes_left_avg", "lc_max_slopes_right_avg",
    "lc_min_slopes_left_avg", "lc_min_slopes_right_avg",
    "uc_slant", "uc_slant_mse", "uc_local_max_freq", "uc_local_min_freq",
    "uc_max_slopes_left_avg", "uc_max_slopes_right_avg",
    "uc_min_slopes_left_avg", "uc_min_slopes_right_avg",
    "slantness_max_angle", "slantness_avg_angle", "slantness_stdev_angle",
]


def token_count_col(text_col: str):
    """Whitespace token count = number of maximal non-whitespace runs;
    empty/blank text → 0 (a 'gap' for the uc series, reference analog:
    column with no black pixels, W2)."""
    return F.regexp_count(F.col(text_col), F.lit(TOKEN_REGEX)).cast("double")


def turn_state(
    transcripts: DataFrame, gap_seconds: int = 1800
) -> DataFrame:
    """Per-turn relational state — all five window features share the single
    (conv_id / ts, turn_idx) sort, so Catalyst plans one exchange + one sort."""
    d = transcripts.select(
        "conv_id",
        "turn_idx",
        "role",
        "tool",
        "ts",
        F.length("text").cast("double").alias("n_chars"),
        token_count_col("text").alias("n_tokens"),
    )
    d = sessionize(d, key="conv_id", ts="ts", tie="turn_idx", gap_seconds=gap_seconds)
    w = Window.partitionBy("conv_id").orderBy("ts", "turn_idx")
    d = d.withColumn("prev_role", F.lag("role").over(w))
    d = d.withColumn("turn_count", F.row_number().over(w).cast("long"))
    d = forward_fill(d, ["tool"], key="conv_id", order=("ts", "turn_idx"), prefix="last_")
    d = running_transitions(d, "role", key="conv_id", order=("ts", "turn_idx"))
    return d


def _feature_schema(probe_ts_type: T.DataType) -> T.StructType:
    fields = [
        T.StructField("conv_id", T.StringType()),
        T.StructField("ts", probe_ts_type),
        T.StructField("session_id", T.LongType()),
        T.StructField("turn_count", T.LongType()),
    ]
    fields += [T.StructField(c, T.DoubleType()) for c in NUMERIC_FEATURES]
    fields += [
        T.StructField("prev_role", T.StringType()),
        T.StructField("last_tool", T.StringType()),
        T.StructField("role_transitions", T.LongType()),
    ]
    return T.StructType(fields)


def compute_probe_features(
    state_pdf: pd.DataFrame,
    probes_pdf: pd.DataFrame,
    extremes_window: int = K.EXTREMES_WINDOW,
    slope_distance: int = K.SLOPE_DISTANCE,
) -> pd.DataFrame:
    """Numeric+state features for one conversation's probes (pandas batch).

    Shared by the Spark cogroup UDF and the pandas oracle pipeline — the
    distributed machinery around it (grouping, pruning, ordering, Arrow) is
    what the Spark-vs-oracle tests actually exercise.
    """
    cols = (
        ["conv_id", "ts", "session_id", "turn_count"]
        + NUMERIC_FEATURES
        + ["prev_role", "last_tool", "role_transitions"]
    )
    if len(probes_pdf) == 0:
        return pd.DataFrame(columns=cols)
    out_rows = []
    st = state_pdf.sort_values(["ts", "turn_idx"], kind="mergesort")
    ts_arr = st["ts"].to_numpy(dtype="datetime64[ns]")
    n_chars = st["n_chars"].to_numpy(dtype=np.float64)
    n_tokens = st["n_tokens"].to_numpy(dtype=np.float64)
    sess = st["session_id"].to_numpy()
    prev_role = st["prev_role"].to_numpy(dtype=object)
    last_tool = st["last_tool"].to_numpy(dtype=object)
    transitions = st["role_transitions"].to_numpy()

    nan_feats = [math.nan] * len(NUMERIC_FEATURES)
    for probe in probes_pdf.itertuples(index=False):
        conv_id, probe_ts = probe.conv_id, probe.ts
        k = int(np.searchsorted(ts_arr, np.datetime64(probe_ts, "ns"), side="right"))
        if k == 0:
            out_rows.append([conv_id, probe_ts, None, 0, *nan_feats, None, None, None])
            continue
        s = n_chars[:k]
        lc_raw = s[s > 0]
        uc_pref = n_tokens[:k]
        uc_raw = uc_pref[uc_pref > 0]

        z1, z2, z3 = K.zones(s)
        mw = K.median_width(s)
        lc = K.contour_features(lc_raw, extremes_window, slope_distance)
        uc = K.contour_features(uc_raw, extremes_window, slope_distance)
        sl_max, sl_avg, sl_std = K.slantness(K.characteristic_contour(lc_raw))

        out_rows.append(
            [
                conv_id, probe_ts,
                int(sess[k - 1]), k,
                z1, z2, z3, mw,
                lc["slant"], lc["slant_mse"], lc["local_max_freq"], lc["local_min_freq"],
                lc["max_slopes_left_avg"], lc["max_slopes_right_avg"],
                lc["min_slopes_left_avg"], lc["min_slopes_right_avg"],
                uc["slant"], uc["slant_mse"], uc["local_max_freq"], uc["local_min_freq"],
                uc["max_slopes_left_avg"], uc["max_slopes_right_avg"],
                uc["min_slopes_left_avg"], uc["min_slopes_right_avg"],
                sl_max, sl_avg, sl_std,
                prev_role[k - 1], last_tool[k - 1], int(transitions[k - 1]),
            ]
        )
    out = pd.DataFrame(out_rows, columns=cols)
    out["session_id"] = out["session_id"].astype("Int64")
    out["turn_count"] = out["turn_count"].astype("Int64")
    out["role_transitions"] = out["role_transitions"].astype("Int64")
    return out


def point_in_time_features(
    transcripts: DataFrame,
    probes: DataFrame,
    gap_seconds: int = 1800,
    extremes_window: int = K.EXTREMES_WINDOW,
    slope_distance: int = K.SLOPE_DISTANCE,
    num_buckets: int = 256,
    state: DataFrame | None = None,
) -> DataFrame:
    """Full point-in-time vector at each distinct probe (conv_id, ts).

    ``state``: a precomputed ``turn_state`` output (e.g. a checkpointed
    stage) — skips recomputing the window chain.

    ``next_role`` (lead) is deliberately ABSENT: it reads ts' > ts and is a
    training-label column, excluded from point-in-time vectors
    (FIXTURES.md §3).

    Physical shape: state rows and probe rows are unioned with a tag and
    grouped by ``pmod(hash(conv_id), num_buckets)`` — ONE Arrow batch and
    ONE pandas kernel call per bucket of ~conversations/num_buckets convs,
    instead of one per conversation. Per-group Arrow/pandas overhead
    (~ms) dominates wall time when conversations are small; bucketing
    amortizes it while hash-balancing skew. The per-conversation math is
    unchanged (``compute_probe_features``, shared with the oracle).
    """
    if state is None:
        state = turn_state(transcripts, gap_seconds)
    state = state.select(
        "conv_id", "turn_idx", "ts", "n_chars", "n_tokens",
        "session_id", "prev_role", "last_tool", "role_transitions",
    )
    probes_d = probes.select("conv_id", "ts").distinct()
    schema = _feature_schema(probes_d.schema["ts"].dataType)

    u = state.withColumn("__tag", F.lit(0)).unionByName(
        probes_d.withColumn("__tag", F.lit(1)), allowMissingColumns=True
    )

    state_cols = [
        "conv_id", "turn_idx", "ts", "n_chars", "n_tokens",
        "session_id", "prev_role", "last_tool", "role_transitions",
    ]

    def bucket_kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _conv, g in pdf.groupby("conv_id", sort=False):
            probes_pdf = g.loc[g["__tag"] == 1, ["conv_id", "ts"]]
            if not len(probes_pdf):
                continue
            state_pdf = g.loc[g["__tag"] == 0, state_cols]
            outs.append(
                compute_probe_features(
                    state_pdf, probes_pdf, extremes_window, slope_distance
                )
            )
        if not outs:
            return pd.DataFrame(columns=[f.name for f in schema.fields])
        return pd.concat(outs, ignore_index=True)

    # EXPLICIT repartition, not a bare groupBy exchange: AQE sizes shuffle
    # partitions by BYTES and would coalesce this small-but-CPU-heavy stage
    # to 1-2 tasks (the kernel is ~1 ms/probe of numpy, not bytes). A fixed
    # repartition count is exempt from AQE coalescing, keeping every core's
    # Python worker busy.
    bucket = F.pmod(F.hash("conv_id"), F.lit(num_buckets))
    return (
        u.withColumn("__bucket", bucket)
        .repartition(num_buckets, "__bucket")
        .groupBy("__bucket")
        .applyInPandas(bucket_kernel, schema=schema)
    )
