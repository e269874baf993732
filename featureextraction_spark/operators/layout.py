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


def zonemap_stats(
    df: DataFrame, zone: Column, value: str, out_zone: str = "zone"
) -> DataFrame:
    """Per-zone footer stats (n_rows, min, max of ``value``) for a given
    zone assignment — the relational model of parquet row-group / file
    min-max metadata ("zone maps", Moerkotte ADMS'98; every columnar
    store ships them).
    """
    return df.groupBy(zone.cast("long").alias(out_zone)).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min(value).alias("vmin"),
        F.max(value).alias("vmax"),
    )


def zonemap_prune_audit(
    df: DataFrame,
    layouts: dict[str, Column],
    value: str,
    predicates: list[tuple[str, object, object]],
) -> DataFrame:
    """Quantify min/max data skipping under alternative physical layouts.

    ``layouts`` maps a layout name to its zone-id expression (e.g. the
    natural insertion order ``key div 512`` vs rank-in-sort-order div
    512 after a Z-order or date sort). For each (layout, predicate
    ``value BETWEEN lo AND hi``) the audit reports how many zones and
    rows a min/max-pruning scan must touch vs the rows that actually
    match — THE decision table for "is re-clustering this 100-TB table
    worth it": scanned/matching ≈ 1 means the layout already serves the
    predicate, scanned ≈ total means every file gets opened.

    All outputs are exact integer counts (comparisons only — no floats),
    so the audit itself is bit-replayable cross-engine.

    Scale: one (zone) agg per layout — map-side combinable, zone table
    ≤ n_rows/zone_size rows — then a broadcast join against the ≤
    |predicates| literal rows; the row-match pass is one scan with a
    partial agg per predicate. Nothing shuffles the fact table.
    """
    spark = df.sparkSession
    preds = spark.createDataFrame(
        [(p[0], p[1], p[2]) for p in predicates], ["pred", "lo", "hi"]
    )
    matches = (
        df.crossJoin(F.broadcast(preds))
        .groupBy("pred")
        .agg(
            F.sum(
                F.col(value).between(F.col("lo"), F.col("hi")).cast("long")
            )
            .cast("long")
            .alias("rows_matching")
        )
    )
    outs = []
    for name, zone in layouts.items():
        stats = zonemap_stats(df, zone, value)
        audit = (
            stats.crossJoin(F.broadcast(preds))
            .groupBy("pred")
            .agg(
                F.count(F.lit(1)).cast("long").alias("zones_total"),
                F.sum(
                    (
                        (F.col("vmin") <= F.col("hi"))
                        & (F.col("vmax") >= F.col("lo"))
                    ).cast("long")
                )
                .cast("long")
                .alias("zones_scanned"),
                F.sum("n_rows").cast("long").alias("rows_total"),
                F.sum(
                    F.when(
                        (F.col("vmin") <= F.col("hi"))
                        & (F.col("vmax") >= F.col("lo")),
                        F.col("n_rows"),
                    ).otherwise(F.lit(0))
                )
                .cast("long")
                .alias("rows_scanned"),
            )
            .select(F.lit(name).alias("layout"), "*")
        )
        outs.append(audit)
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.join(matches, "pred").select(
        "layout",
        "pred",
        "zones_total",
        "zones_scanned",
        "rows_total",
        "rows_scanned",
        "rows_matching",
    )
