"""Streaming deduplication — the ingest-time half of the dedup story.

Batch dedup (ops/dedup) resolves an existing corpus; a training-data
INGEST pipeline also needs duplicates dropped as documents arrive, with
bounded state. Two shapes:

- stream_exact_dedup: drop exact-content repeats via
  ``dropDuplicatesWithinWatermark`` on the content hash — state is bounded
  by the watermark horizon (an unbounded ``dropDuplicates`` would
  accumulate one state row per distinct doc forever, which at 10^12 docs
  is not a plan).
- stream_first_seen: keep-first per natural key (e.g. url/doc_id), same
  watermark bound — the streaming analogue of keeper = min id.

Both return streaming DataFrames: compose with writeStream (or
foreachBatch into the incremental index, streaming/index_stream.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def stream_exact_dedup(
    stream: DataFrame,
    *,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Drop rows whose content md5 was already seen within the watermark
    horizon. Emits the first arrival of each distinct content; state per
    distinct hash is dropped once the watermark passes it."""
    return (
        stream.withColumn("__ts", F.col(ts_col).cast("timestamp"))
        .withWatermark("__ts", watermark)
        .withColumn("__content_md5", F.md5(F.col(text_col)))
        .dropDuplicatesWithinWatermark(["__content_md5"])
        .drop("__content_md5", "__ts")
    )


def stream_first_seen(
    stream: DataFrame,
    key_cols: list[str],
    *,
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Keep the first-arriving row per key within the watermark horizon
    (re-crawls, retries, at-least-once sources)."""
    return (
        stream.withColumn("__ts", F.col(ts_col).cast("timestamp"))
        .withWatermark("__ts", watermark)
        .dropDuplicatesWithinWatermark(list(key_cols))
        .drop("__ts")
    )
