"""Deterministic synthetic transcript fixtures (FIXTURES.md §1–§4).

Generates the graft's primary input table
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)`` plus as-of probe points and a split-membership dimension —
seeded, no external data. Mirrors what the reference's IAM loader produced
(entity-keyed ordered sequences, reference ``src/preparation/iamloader.py:10-66``)
transposed onto conversation transcripts.

Generation is pure numpy/pandas on the driver (fixtures are small); the
engine under test only ever sees the resulting Spark DataFrames / parquet.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

ROLES = np.array(["user", "assistant", "system", "tool"])
TOOLS = np.array(["search", "python", "browser", "calculator", "retrieval"])
# CSV-hostile / unicode fragments exercised by the text byte-equality contract
_TEXT_FRAGMENTS = [
    "",
    "hello world",
    "line1\nline2",
    "comma, separated, values",
    'quote " inside',
    "unicode: héllo wörld — 你好 🚀",
    "tab\tseparated",
    "trailing space ",
    "a" * 200,
    "short",
]

SESSION_GAP_SECONDS = 1800  # 30 min — idle gap that starts a new session


def make_transcripts(
    n_conversations: int = 50,
    mean_turns: int = 20,
    seed: int = 42,
    n_mega: int = 2,
    mega_factor: int = 100,
    start: str = "2024-01-01",
) -> pd.DataFrame:
    """Deterministic transcript table with Zipf-skewed conversation sizes.

    - >=2 mega-conversations (``mega_factor`` x median turns) to exercise
      salting / skew handling.
    - per-conversation ts monotone non-decreasing with duplicate timestamps
      (tie-break by turn_idx) and idle gaps > SESSION_GAP_SECONDS.
    - ``tool`` NULL on most rows with non-null runs (forward-fill fodder).
    - ``text`` includes empty strings, unicode, embedded newlines/commas.
    """
    rng = np.random.default_rng(seed)
    sizes = np.minimum(rng.zipf(1.5, n_conversations), mean_turns * 5)
    sizes = np.maximum(sizes * (mean_turns // 4 + 1), 2)
    median = int(np.median(sizes))
    for i in range(min(n_mega, n_conversations)):
        sizes[i] = max(sizes[i], median * mega_factor)

    base = pd.Timestamp(start).value // 1000  # microseconds since epoch

    frames = []
    for c in range(n_conversations):
        n = int(sizes[c])
        conv_id = f"conv_{c:05d}"
        turn_idx = np.arange(n, dtype=np.int32)

        # inter-turn deltas in seconds: mostly short, ~7% zero (ties),
        # ~5% idle gaps beyond the session threshold
        delta = rng.exponential(60.0, n)
        delta[rng.random(n) < 0.07] = 0.0
        gap_mask = rng.random(n) < 0.05
        delta[gap_mask] += SESSION_GAP_SECONDS + rng.exponential(3600.0, int(gap_mask.sum()))
        delta[0] = rng.uniform(0, 86400 * 5)  # conversation start offset
        ts_us = base + np.cumsum(np.round(delta * 1e6)).astype(np.int64)

        role = ROLES[rng.integers(0, len(ROLES), n)]
        # repeats: with p=0.2 copy previous role (exercises transition counts)
        rep = rng.random(n) < 0.2
        for i in range(1, n):
            if rep[i]:
                role[i] = role[i - 1]

        # tool: null by default; non-null runs of length 1-4
        tool = np.full(n, None, dtype=object)
        i = 0
        while i < n:
            if rng.random() < 0.15:
                run = int(rng.integers(1, 5))
                tool[i : i + run] = rng.choice(TOOLS)
                i += run
            else:
                i += 1

        frag_idx = rng.integers(0, len(_TEXT_FRAGMENTS), n)
        salt_word = rng.integers(0, 10000, n)
        text = np.array(
            [f"{_TEXT_FRAGMENTS[f]} t{w}" if f else "" for f, w in zip(frag_idx, salt_word)],
            dtype=object,
        )

        frames.append(
            pd.DataFrame(
                {
                    "conv_id": conv_id,
                    "turn_idx": turn_idx,
                    "role": role,
                    "text": text,
                    "tool": tool,
                    "ts": pd.to_datetime(ts_us, unit="us"),
                }
            )
        )
    out = pd.concat(frames, ignore_index=True)
    # global shuffle so nothing downstream can rely on input order
    return out.sample(frac=1.0, random_state=seed).reset_index(drop=True)


def make_query_points(transcripts: pd.DataFrame, per_conv: int = 5, seed: int = 43) -> pd.DataFrame:
    """As-of probe points (FIXTURES.md §2).

    Includes probes before the first turn (expect nulls), exactly on a
    turn's ts (inclusive backward match), between turns, and after the last
    turn.
    """
    rng = np.random.default_rng(seed)
    rows = []
    for conv_id, g in transcripts.groupby("conv_id", sort=True):
        ts = g.sort_values("turn_idx")["ts"].to_numpy()
        lo, hi = ts[0], ts[-1]
        span = max(int((hi - lo) / np.timedelta64(1, "s")), 1)
        rows.append((conv_id, lo - np.timedelta64(3600, "s")))  # before first
        rows.append((conv_id, ts[int(rng.integers(0, len(ts)))]))  # exact hit
        rows.append((conv_id, hi + np.timedelta64(3600, "s")))  # after last
        for _ in range(max(per_conv - 3, 0)):  # between turns
            off = int(rng.integers(0, span + 1))
            rows.append((conv_id, lo + np.timedelta64(off, "s")))
    return pd.DataFrame(rows, columns=["conv_id", "ts"])


def make_splits(transcripts: pd.DataFrame, seed: int = 44) -> pd.DataFrame:
    """Split-membership dimension (FIXTURES.md §4).

    Reference analog: the four newline-delimited line-id lists mapped to a
    ``type`` label (``src/preparation/categoriser.py:20-46``). Deliberately
    leaves ~20%% of conv_ids out of the dimension (expect 'unknown').
    """
    rng = np.random.default_rng(seed)
    convs = sorted(transcripts["conv_id"].unique())
    types = ["train", "test", "validation_1", "validation_2"]
    rows = [(c, types[int(rng.integers(0, 4))]) for c in convs if rng.random() > 0.2]
    return pd.DataFrame(rows, columns=["conv_id", "type"])


def to_spark(spark, pdf: pd.DataFrame):
    """pandas → Spark with the canonical transcript schema when applicable."""
    if list(pdf.columns) == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]:
        schema = (
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts timestamp"
        )
        return spark.createDataFrame(pdf, schema=schema)
    return spark.createDataFrame(pdf)
