"""Multi-dimensional data-layout keys: Z-order (Morton) interleaving.

At 100 TB the cheapest query is the one whose files you never open:
sorting/bucketing a table by a Z-order key clusters rows that are close
in BOTH dimensions (e.g. user bucket × day) into the same files, so
min/max footer stats prune two-dimensional range predicates — the
layout trick behind Delta/Iceberg `OPTIMIZE ZORDER BY`. This module
computes the key itself as pure integer bit arithmetic (shifts/and/or),
portable bit-for-bit to any engine; writing sorted-by-key is plain
``df.repartitionByRange(zkey).sortWithinPartitions(zkey)``.

Z-ordering is public knowledge (Morton '66; the curve is the canonical
example in every spatial-index text). No reference counterpart.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_key(x: Column, y: Column, bits: int = 21) -> Column:
    """Interleave the low ``bits`` bits of two non-negative BIGINTs:
    bit i of ``x`` lands at position 2i, bit i of ``y`` at 2i+1 — the
    2-D Morton code (≤ 2·bits ≤ 62 bits, no int64 overflow).

    A sum of per-bit shift expressions: entirely whole-stage-codegen
    integer ops, zero Python, and the SAME shift/mask arithmetic
    replays in any SQL engine.
    """
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31] for a 62-bit key")
    parts = []
    for i in range(bits):
        parts.append(
            (F.shiftright(x.cast("long"), i).bitwiseAND(F.lit(1)))
            * F.lit(1 << (2 * i))
        )
        parts.append(
            (F.shiftright(y.cast("long"), i).bitwiseAND(F.lit(1)))
            * F.lit(1 << (2 * i + 1))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out + p
    return out.cast("long")


def zorder_keys(
    df: DataFrame,
    x: str,
    y: str,
    x_width: int = 1,
    y_width: int = 1,
    bits: int = 21,
    out: str = "zkey",
) -> DataFrame:
    """Append the Z-order key of (``x`` // x_width, ``y`` // y_width).

    Bucket widths coarsen continuous/high-cardinality columns before
    interleaving (the usual practice — file-level clustering only needs
    bucket resolution). Inputs must be non-negative after bucketing.
    """
    bx = F.expr(f"CAST({x} div {int(x_width)} AS BIGINT)")
    by = F.expr(f"CAST({y} div {int(y_width)} AS BIGINT)")
    return df.withColumn(out, morton_key(bx, by, bits=bits))


def zorder_layout(
    df: DataFrame, key: str = "zkey", n_files: int | None = None
) -> DataFrame:
    """Range-partition + sort by the Z key — the write-side layout pass
    (each output partition becomes one run of Morton-adjacent files).
    """
    parts = [F.col(key)]
    d = (
        df.repartitionByRange(n_files, *parts)
        if n_files
        else df.repartitionByRange(*parts)
    )
    return d.sortWithinPartitions(key)
