"""Incremental inverted-index maintenance with Structured Streaming.

New documents arrive on a stream; each micro-batch is tokenized with the
same analysis chain as the batch build and appended as a new index *segment*
(Lucene's segment model recast: immutable per-batch posting shards merged by
the compaction job in index/segments.py). foreachBatch keeps the write
idempotent via the (batch_id) checkpoint, giving exactly-once segment
appends — the streaming analogue of the reference's commit semantics
(QUICK_START.md:126-133).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from solrtexttagger_spark.index.build import doc_term_rows


def incremental_index_stream(
    stream_df: DataFrame,
    out_dir: str,
    *,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    checkpoint_dir: str | None = None,
    trigger_once: bool = True,
):
    """Start a streaming query appending per-batch posting segments.

    Each micro-batch writes parquet doc-term rows under
    ``{out_dir}/segment={batch_id}``; merge to a queryable postings table
    with index.segments.merge_segments.
    """
    checkpoint_dir = checkpoint_dir or os.path.join(out_dir, "_checkpoint")

    def write_batch(batch_df: DataFrame, batch_id: int):
        rows = doc_term_rows(batch_df, text_col=text_col, doc_id_col=doc_id_col)
        rows.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"segment={batch_id}")
        )

    writer = (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
