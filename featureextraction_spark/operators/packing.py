"""Sequence packing: concat-and-chunk documents into fixed-length
training sequences, computed relationally.

Pre-training pipelines tokenize documents, concatenate them in a
deterministic order, and slice the token stream into fixed ``seq_len``
context windows (GPT-2/3-style packing; T5's "pack" preprocessing). The
reference has no analog — its pipeline emits one fixed-width vector per
image — but this is the step that turns a curated corpus into training
shards, so the engine treats it as a first-class operator.

The relational formulation: a deterministic total order over documents
(content-addressed 60-bit md5 rank, as ``hash_split`` — stable across
runs, engines, and partition counts), an EXCLUSIVE global cumulative sum
of token counts giving each document its byte... token offset in the
virtual concatenated stream, then each document's span
``[cum_start, cum_start + n_tokens)`` intersected with the ``seq_len``
grid yields its (sequence id, offset) assignments.

Scale design: the global cumsum reuses the range-partition +
per-partition-offset machinery of ``blockpair.with_global_rank`` — a
window PARTITIONED on the range-partition id plus a tiny broadcast
offset table, never a single-partition Window. The per-sequence explode
emits one row per (document, crossed sequence): n_docs + n_seqs rows
total, not n_tokens. Everything downstream of the one range shuffle is
map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from featureextraction_spark.functions.textstats import token_count
from featureextraction_spark.operators.cache import persist_tracked
from featureextraction_spark.operators.sampling import _seed_hash


def with_global_cumsum(
    df: DataFrame,
    order_cols: list,
    value_col: str,
    out_col: str = "__cum",
    n_rows: int | None = None,
    rows_per_partition: int = 65536,
) -> DataFrame:
    """EXCLUSIVE global running sum of ``value_col`` in ``order_cols``
    order (each row gets the sum of all STRICTLY PRIOR rows), computed
    with no single-partition Window.

    Same two-phase shape as ``blockpair.with_global_rank``:
    ``repartitionByRange`` on the order keys puts contiguous key ranges in
    separate partitions; an exclusive within-partition running sum
    (window PARTITIONED BY the range-partition id) plus per-partition
    value totals — a tiny n_parts-row aggregate re-attached via broadcast
    join — lift local sums to global ones. Equivalent to
    ``sum(value) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING) - value``
    but every stage is parallel; survives a 100× scale-up.

    Values must be non-negative longs (token counts); order keys must be
    unique across rows (ties at a partition boundary would make the
    running sum nondeterministic, exactly as the global window's).

    The repartitioned frame is persisted (registered with
    ``operators.cache``; caller releases after the consuming action) so
    the totals pass and the output observe the same physical partitioning.
    """
    spark = df.sparkSession
    try:
        n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except Exception:
        n_parts = spark.sparkContext.defaultParallelism
    n_parts = max(n_parts, 1)
    if n_rows is not None:
        n_parts = max(1, min(n_parts, -(-int(n_rows) // rows_per_partition)))
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    dfp = (
        df.repartitionByRange(n_parts, *cols)
        .withColumn("__pid", F.spark_partition_id())
        .transform(persist_tracked)
    )
    totals = sorted(
        dfp.groupBy("__pid")
        .agg(F.sum(F.col(value_col)).alias("__tot"))
        .collect(),
        key=lambda r: r["__pid"],
    )
    rows, acc = [], 0
    for r in totals:
        rows.append((r["__pid"], acc))
        acc += int(r["__tot"] or 0)
    offsets = spark.createDataFrame(rows or [(0, 0)], schema="__pid int, __off long")
    w = (
        Window.partitionBy("__pid")
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        dfp.join(F.broadcast(offsets), "__pid", "left")
        .withColumn(
            out_col,
            (
                F.sum(F.col(value_col)).over(w)
                - F.col(value_col)
                + F.coalesce(F.col("__off"), F.lit(0))
            ).cast("long"),
        )
        .drop("__pid", "__off")
    )


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    text: str = "text",
    seed: int = 42,
    n_rows: int | None = None,
) -> DataFrame:
    """Per-document packing summary: where each document lands in the
    virtual concatenated token stream sliced into ``seq_len`` windows.

    Order is the content-addressed md5(id:seed) rank (ties broken by id),
    so the packing is reproducible across runs/engines and insensitive to
    input partitioning. Documents with zero tokens occupy no span: they
    get ``n_seqs = 0`` and NULL first/last sequence ids.

    Returns one row per document:
    (id, n_tokens, cum_start, first_seq, last_seq, n_seqs)
    where first_seq = floor(cum_start / seq_len) and
    last_seq = floor((cum_start + n_tokens − 1) / seq_len).
    """
    L = int(seq_len)
    if L <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    toks = docs.select(
        F.col(id_col),
        token_count(text).alias("n_tokens"),
        _seed_hash(id_col, seed).alias("__h"),
    )
    cum = with_global_cumsum(
        toks, ["__h", id_col], "n_tokens", "cum_start", n_rows=n_rows
    )
    nonzero = F.col("n_tokens") > 0
    return cum.select(
        id_col,
        "n_tokens",
        "cum_start",
        F.when(nonzero, F.floor(F.col("cum_start") / L)).cast("long").alias("first_seq"),
        F.when(
            nonzero,
            F.floor((F.col("cum_start") + F.col("n_tokens") - 1) / L),
        )
        .cast("long")
        .alias("last_seq"),
        F.coalesce(
            F.when(
                nonzero,
                F.floor((F.col("cum_start") + F.col("n_tokens") - 1) / L)
                - F.floor(F.col("cum_start") / L)
                + 1,
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("n_seqs"),
    )


def pack_segments(
    docs: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    text: str = "text",
    seed: int = 42,
    n_rows: int | None = None,
) -> DataFrame:
    """Exploded packing assignment: one row per (document, training
    sequence it crosses) — the actual shard-construction table a packing
    writer consumes.

    For each document spanning ``[cum_start, cum_start + n_tokens)`` and
    each sequence ``s`` in ``[first_seq, last_seq]``:

    - ``seg_start``  — first token of the document included in s
      (offset WITHIN the document);
    - ``seg_len``    — number of document tokens in s;
    - ``seq_offset`` — position within sequence s where the segment
      begins.

    Invariants (tested): per-document ``Σ seg_len = n_tokens``; per-
    sequence ``Σ seg_len = seq_len`` for every full (non-final) sequence,
    with segments tiling ``[0, seq_len)`` without gaps or overlap.

    Row count is n_docs + n_seqs (each extra row is a sequence boundary
    crossed), so the explode is safe at corpus scale; the only shuffle is
    the cumsum's range partition.
    """
    L = int(seq_len)
    packed = pack_sequences(
        docs, L, id_col=id_col, text=text, seed=seed, n_rows=n_rows
    ).filter(F.col("n_seqs") > 0)
    seg = packed.select(
        id_col,
        "n_tokens",
        "cum_start",
        F.explode(F.sequence(F.col("first_seq"), F.col("last_seq"))).alias("seq_id"),
    )
    seq_start = F.col("seq_id") * L
    seg_start = F.greatest(seq_start - F.col("cum_start"), F.lit(0))
    seg_end = F.least(
        seq_start + L - F.col("cum_start"), F.col("n_tokens").cast("long")
    )
    return seg.select(
        F.col("seq_id").cast("long"),
        id_col,
        seg_start.cast("long").alias("seg_start"),
        (seg_end - seg_start).cast("long").alias("seg_len"),
        F.greatest(F.col("cum_start") - seq_start, F.lit(0))
        .cast("long")
        .alias("seq_offset"),
    )
