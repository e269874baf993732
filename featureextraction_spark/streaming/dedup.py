"""Streaming exact-dedup: first arrival of each fingerprint survives.

The batch engine's ``exact_dedup`` (``operators/dedup.py``) groups the
whole corpus by normalized-text fingerprint; on a LIVE stream (turns or
documents arriving continuously — retry storms, at-least-once ingestion,
crawler re-fetches) the same contract becomes "emit the first arrival,
drop replays". Built on the built-in
``dropDuplicatesWithinWatermark`` stateful operator rather than a custom
``applyInPandasWithState`` kernel: Spark keeps one state row per distinct
fingerprint seen inside the watermark horizon and reclaims it as event
time advances, so state is bounded by distinct-keys-per-horizon, not by
stream history — the scale contract a global streaming dedup cannot offer
(an unwindowed ``dropDuplicates`` on a stream grows state forever).

Same fingerprint function as the batch operator (md5 of
whitespace-normalized lowercase text), so a batch backfill and the live
stream agree on what "duplicate" means.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from featureextraction_spark.functions.textstats import fingerprint


def streaming_dedup(
    stream: DataFrame,
    text: str = "text",
    ts: str = "ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    """First-arrival pass-through of rows whose normalized-text
    fingerprint has not been seen within the watermark horizon.

    A duplicate arriving later than ``watermark`` after the original's
    event time MAY be re-emitted (its state was reclaimed) — the
    documented at-least-once trade-off that keeps state bounded; size the
    horizon to the replay window of the ingestion layer.
    """
    d = (
        stream.withColumn(ts, F.col(ts).cast("timestamp"))
        .withColumn("fp", fingerprint(text))
        .withWatermark(ts, watermark)
    )
    return d.dropDuplicatesWithinWatermark(["fp"])
