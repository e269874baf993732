"""Pandas/numpy oracle implementations of the core windowed operators.

Deliberately naive and single-node — per-group Python loops are FINE here;
this code exists only to define semantics the distributed engine must
reproduce. Formula citations point at the reference idioms each operator
transposes (SURVEY.md §2).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _sorted(df: pd.DataFrame, key="conv_id", order=("ts", "turn_idx")) -> pd.DataFrame:
    return df.sort_values([key, *order], kind="mergesort").reset_index(drop=True)


def sessionize(
    df: pd.DataFrame, key="conv_id", ts="ts", tie="turn_idx", gap_seconds=1800
) -> pd.DataFrame:
    """1-based session ids: new session when gap > threshold (W6)."""
    out = _sorted(df, key, (ts, tie)).copy()
    gaps = out.groupby(key, sort=False)[ts].diff().dt.total_seconds()
    new = gaps.isna() | (gaps > gap_seconds)
    out["session_id"] = new.groupby(out[key], sort=False).cumsum().astype("int64")
    return out


def forward_fill(df: pd.DataFrame, cols, key="conv_id", order=("ts", "turn_idx"), prefix="last_"):
    out = _sorted(df, key, order).copy()
    for c in cols:
        out[f"{prefix}{c}"] = out.groupby(key, sort=False)[c].ffill()
    return out


def lag_lead(df: pd.DataFrame, cols, key="conv_id", order=("turn_idx",)):
    out = _sorted(df, key, order).copy()
    g = out.groupby(key, sort=False)
    for c in cols:
        out[f"prev_{c}"] = g[c].shift(1)
        out[f"next_{c}"] = g[c].shift(-1)
    return out


def running_transitions(df: pd.DataFrame, col, key="conv_id", order=("turn_idx",)):
    """Running count of value changes (utils.py:64-76 idiom, A7)."""
    out = _sorted(df, key, order).copy()
    prev = out.groupby(key, sort=False)[col].shift(1)
    chg = prev.notna() & ~((out[col] == prev) | (out[col].isna() & prev.isna()))
    out[f"{col}_transitions"] = chg.groupby(out[key], sort=False).cumsum().astype("int64")
    return out


def asof_join(
    probes: pd.DataFrame,
    data: pd.DataFrame,
    on="ts",
    by="conv_id",
    tie="turn_idx",
    value_cols=None,
    allow_exact_matches=True,
) -> pd.DataFrame:
    """Backward as-of with (ts, tie) ordering — matches `pandas.merge_asof`
    semantics except ties on ts resolve to the HIGHEST tie value, which
    merge_asof also does (last row wins within equal ts after sort)."""
    value_cols = value_cols or [c for c in data.columns if c not in (by, on, tie)]
    # merge_asof requires a GLOBAL sort on the `on` key; ties within
    # (by, on) ordered by tie ascending so the last (max-tie) row wins.
    d = data.sort_values([on, tie], kind="mergesort")
    p = probes.reset_index(drop=True).copy()
    p["__orig"] = np.arange(len(p))
    p = p.sort_values([on], kind="mergesort")
    merged = pd.merge_asof(
        p,
        d[[by, on, tie, *value_cols]].rename(columns={on: "matched_ts", tie: "matched_turn_idx"}),
        left_on=on,
        right_on="matched_ts",
        by=by,
        direction="backward",
        allow_exact_matches=allow_exact_matches,
    )
    return merged.sort_values("__orig").drop(columns="__orig").reset_index(drop=True)


def run_lengths(df: pd.DataFrame, col, key="conv_id", order=("turn_idx",)) -> pd.DataFrame:
    """Gaps-and-islands RLE (medianwidth.py:18-41 idiom, W6)."""
    out = _sorted(df, key, order)
    rows = []
    for k, g in out.groupby(key, sort=False):
        vals = g[col].to_numpy(dtype=object)
        run_id, run_len, run_val, start = 0, 0, None, None
        pos = g[order[0]].to_numpy()
        prev_set = False
        for i, v in enumerate(vals):
            same = prev_set and ((v == run_val) or (pd.isna(v) and pd.isna(run_val)))
            if same:
                run_len += 1
            else:
                if prev_set:
                    rows.append((k, run_id, run_val, run_len, start, pos[i - 1]))
                run_id += 1
                run_len = 1
                run_val = v
                start = pos[i]
                prev_set = True
        if prev_set:
            rows.append((k, run_id, run_val, run_len, start, pos[-1]))
    return pd.DataFrame(
        rows, columns=[key, "run_id", "run_value", "run_length", "run_start", "run_end"]
    )
