"""Streaming document chunking — the ingestion sink of a RAG /
pretraining pipeline (round 7; batch operator: ops/chunking.py).

New documents arrive on a stream; each micro-batch is chunked with the
SAME map-only operator as the batch path, so batch backfill and
streaming ingest produce identical chunk rows — (doc_id, chunk_idx) is
a pure function of the document, never of arrival order or batch
boundaries. Output lands under ``{out_dir}/batch={batch_id}`` with an
idempotent per-batch overwrite: a replayed micro-batch (failure before
the checkpoint commit) rewrites the same directory with the same rows,
the exactly-once contract incremental_index_stream uses for segments.

An optional deterministic train/val/test assignment
(ops/sampling.hash_split) rides the same projection: the split is a
pure function of (doc_id, salt), so every chunk of a document lands in
ONE split, identical across stream vs backfill and across replays —
the leakage-safe property randomSplit cannot give on a stream at all.

At scale: each micro-batch is a map-only pass (split/sequence/
posexplode/slice — no shuffle, no Python); output partitioning inherits
the stream source's. Reading the sink is a plain recursive parquet load
of ``batch=*`` (read_chunks below).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from solrtexttagger_spark.ops.chunking import (
    chunk_documents,
    chunk_documents_analyzed,
)
from solrtexttagger_spark.ops.sampling import hash_split


def chunk_document_stream(
    stream_df: DataFrame,
    out_dir: str,
    *,
    chunk_tokens: int = 128,
    overlap: int = 16,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    analyzed: bool = False,
    splits: dict | None = None,
    split_salt: str = "",
    checkpoint_dir: str | None = None,
    trigger_once: bool = True,
):
    """Start a streaming query chunking each micro-batch into
    overlapping token windows (``analyzed=True`` uses the analyzer-grade
    char-span variant) and appending parquet under
    ``{out_dir}/batch={batch_id}``. ``splits`` (e.g. {"train": 0.9,
    "val": 0.05, "test": 0.05}) adds the deterministic hash_split
    column keyed on the document id."""
    checkpoint_dir = checkpoint_dir or os.path.join(out_dir, "_checkpoint")
    chunker = chunk_documents_analyzed if analyzed else chunk_documents

    def write_batch(batch_df: DataFrame, batch_id: int):
        chunks = chunker(
            batch_df,
            chunk_tokens=chunk_tokens,
            overlap=overlap,
            text_col=text_col,
            id_col=doc_id_col,
        )
        if splits:
            chunks = hash_split(
                chunks, splits, key_cols=["doc_id"], salt=split_salt
            )
        chunks.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch={batch_id}")
        )

    writer = (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_chunks(spark: SparkSession, out_dir: str) -> DataFrame:
    """Load every appended batch of a chunk sink as one DataFrame."""
    return (
        spark.read.option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.parquet")
        .parquet(out_dir)
    )
