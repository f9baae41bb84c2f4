"""Streaming chunking sink (round 7): stream-vs-batch identity,
exactly-once replay, and leakage-safe split assignment."""

import os

import pytest

from solrtexttagger_spark.ops.chunking import chunk_documents
from solrtexttagger_spark.ops.sampling import hash_split
from solrtexttagger_spark.streaming.chunking import (
    chunk_document_stream,
    read_chunks,
)

DOCS = [
    (0, "the fast key order sort table scan merge row data"),
    (1, "spark group query row data slow small filter the the"),
    (2, "join a filter window row join stream data group sort merge fast"),
    (3, "fast column table row filter key fast agg query order join small"),
    (4, ""),
]


@pytest.fixture()
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _rows(df):
    return sorted(
        (r["doc_id"], r["chunk_idx"], r["chunk_start"], r["n_tokens"],
         r["chunk_text"])
        for r in df.select(
            "doc_id", "chunk_idx", "chunk_start", "n_tokens", "chunk_text"
        ).collect()
    )


def test_stream_matches_batch_chunking(spark, docs_df, tmp_path):
    src = str(tmp_path / "src")
    docs_df.write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    out = str(tmp_path / "chunks")
    q = chunk_document_stream(stream, out, chunk_tokens=6, overlap=2)
    q.awaitTermination(120)

    got = read_chunks(spark, out)
    want = chunk_documents(docs_df, chunk_tokens=6, overlap=2)
    assert _rows(got) == _rows(want)


def test_replay_is_idempotent(spark, docs_df, tmp_path):
    """availableNow + the checkpoint: restarting the SAME sink over the
    same source reprocesses nothing, and a forced rewrite of one batch
    directory produces identical rows (the overwrite-per-batch-id
    exactly-once contract)."""
    src = str(tmp_path / "src")
    docs_df.write.parquet(src)
    out = str(tmp_path / "chunks")

    def run():
        stream = (
            spark.readStream.schema("doc_id long, text string").parquet(src)
        )
        q = chunk_document_stream(stream, out, chunk_tokens=6, overlap=2)
        q.awaitTermination(120)

    run()
    first = _rows(read_chunks(spark, out))
    run()  # restart with the same checkpoint: no new batches
    assert _rows(read_chunks(spark, out)) == first


def test_split_assignment_is_deterministic_and_doc_level(
    spark, docs_df, tmp_path
):
    src = str(tmp_path / "src")
    docs_df.write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    out = str(tmp_path / "chunks")
    splits = {"train": 0.6, "val": 0.2, "test": 0.2}
    q = chunk_document_stream(
        stream, out, chunk_tokens=6, overlap=2, splits=splits, split_salt="s7"
    )
    q.awaitTermination(120)

    got = read_chunks(spark, out)
    # every chunk of a doc is in exactly one split
    per_doc = {
        r["doc_id"]: r["n"]
        for r in got.groupBy("doc_id")
        .agg({"split": "approx_count_distinct"})
        .withColumnRenamed("approx_count_distinct(split)", "n")
        .collect()
    }
    assert all(n == 1 for n in per_doc.values())
    # ... and equals the batch-path hash_split on the same salt
    want = {
        (r["doc_id"], r["split"])
        for r in hash_split(
            docs_df.select("doc_id"), splits, key_cols=["doc_id"], salt="s7"
        ).collect()
    }
    gotpairs = {
        (r["doc_id"], r["split"])
        for r in got.select("doc_id", "split").distinct().collect()
    }
    assert gotpairs == want


def test_analyzed_variant_has_char_spans(spark, tmp_path):
    docs = [(0, "Alpha,  beta;gamma delta!"), (1, "one two")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    src = str(tmp_path / "src")
    df.write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    out = str(tmp_path / "chunks")
    q = chunk_document_stream(
        stream, out, chunk_tokens=2, overlap=0, analyzed=True
    )
    q.awaitTermination(120)
    got = read_chunks(spark, out)
    from solrtexttagger_spark.ops.chunking import chunk_documents_analyzed

    want = chunk_documents_analyzed(df, chunk_tokens=2, overlap=0)
    key = lambda df_: sorted(map(tuple, df_.collect()))  # noqa: E731
    assert key(got.select(*want.columns)) == key(want)
