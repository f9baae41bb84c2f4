"""Document chunking — the splitting step of a RAG / pretraining data
pipeline: fixed-size overlapping token windows with stable, rerun-safe
chunk identities. (No reference counterpart — SolrTextTagger operates on
whole documents — but a 100 TB training-data engine needs it as a
first-class operator next to packing/dedup; see ops/packing.py for the
downstream batch-assembly step.)

Chunking contract (deterministic, SQL-mirrorable):

  tokens   = whitespace split of ``text_col`` (the engine's use_split
             contract; analyzer-grade chunking would tokenize first)
  stride   = chunk_tokens - overlap            (> 0 enforced)
  starts   = 0, stride, 2*stride, ...  while start < max(n - overlap, 1)
  chunk i  = tokens[start : start + chunk_tokens]

Every token is covered; consecutive chunks share exactly ``overlap``
tokens (except a shorter final chunk); an empty/short document yields
exactly one chunk. chunk_idx = start / stride, so (doc_id, chunk_idx)
is a stable identity under any partitioning or rerun — downstream dedup
or labeling can join on it.

Physical shape: one projection — split, a JVM ``sequence`` of window
starts, ``posexplode``, and per-chunk ``slice``/``concat_ws``. No
shuffle, no Python; Catalyst prunes the scan to (id, text). At 100 TB
this is a map-only pass whose output partitioning inherits the input's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def chunk_documents(
    docs_df: DataFrame,
    *,
    chunk_tokens: int = 128,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document into overlapping token windows. Returns
    (doc_id, chunk_idx long, chunk_start long, n_tokens long,
    chunk_text) — chunk_start is the 0-based token offset, n_tokens the
    actual window size (= chunk_tokens except the final partial
    window)."""
    if chunk_tokens <= 0:
        raise ValueError("chunk_tokens must be > 0")
    if overlap < 0 or overlap >= chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    # NULL text behaves like the empty document (one empty chunk) —
    # size(NULL) would otherwise poison n_tokens through least()
    w = F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
    n = F.size(w)
    # starts < max(n - overlap, 1); sequence() is stop-INCLUSIVE, so the
    # stop is that bound minus one (integer starts)
    stop = F.greatest(n - overlap, F.lit(1)) - 1
    starts = F.sequence(F.lit(0), stop, F.lit(stride))
    ex = docs_df.select(
        F.col(id_col).alias("doc_id"),
        w.alias("_w"),
        n.alias("_n"),
        F.posexplode(starts).alias("chunk_idx", "chunk_start"),
    )
    return ex.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("chunk_start").cast("long").alias("chunk_start"),
        F.least(F.lit(chunk_tokens), F.col("_n") - F.col("chunk_start"))
        .cast("long")
        .alias("n_tokens"),
        F.concat_ws(
            " ", F.slice("_w", F.col("chunk_start") + 1, chunk_tokens)
        ).alias("chunk_text"),
    )


def chunk_documents_analyzed(
    docs_df: DataFrame,
    *,
    chunk_tokens: int = 128,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Analyzer-grade chunking: the index tokenizer (analysis/core.
    tokenize — the same chain the inverted index uses) instead of a
    whitespace split, emitting CHARACTER spans so each chunk slices
    exactly out of the raw document even when whitespace runs,
    punctuation, or markup misalign a split() view. Same window rule as
    chunk_documents (stride = chunk_tokens - overlap, starts <
    max(n - overlap, 1)).

    Returns (doc_id, chunk_idx, chunk_start, n_tokens, chunk_char_start,
    chunk_char_end, chunk_text) where chunk_text =
    text[chunk_char_start:chunk_char_end] — the raw substring from the
    first window token's start to the last's end (a document with no
    analyzer tokens yields one empty chunk).

    Physical shape: Arrow-batched mapInPandas over (id, text) only
    (column-pruned scan); map-only like the JVM path — the Python
    analyzer is the honest cost of offset fidelity, exactly as in the
    tagger operator."""
    if chunk_tokens <= 0:
        raise ValueError("chunk_tokens must be > 0")
    if overlap < 0 or overlap >= chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap

    import pandas as pd

    from solrtexttagger_spark.analysis.core import tokenize

    schema = (
        "doc_id long, chunk_idx long, chunk_start long, n_tokens long, "
        "chunk_char_start long, chunk_char_end long, chunk_text string"
    )

    def fn(batches):
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "chunk_idx", "chunk_start", "n_tokens",
                "chunk_char_start", "chunk_char_end", "chunk_text",
            )}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                text = text or ""
                toks = [t for t in tokenize(text) if t is not None]
                n = len(toks)
                for ci, s in enumerate(range(0, max(n - overlap, 1), stride)):
                    win = toks[s:s + chunk_tokens]
                    cs = win[0][1] if win else 0
                    ce = win[-1][2] if win else 0
                    out["doc_id"].append(int(doc_id))
                    out["chunk_idx"].append(ci)
                    out["chunk_start"].append(s)
                    out["n_tokens"].append(len(win))
                    out["chunk_char_start"].append(cs)
                    out["chunk_char_end"].append(ce)
                    out["chunk_text"].append(text[cs:ce])
            # explicit dtypes: empty Arrow batches default to float64
            yield pd.DataFrame({
                "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                "chunk_idx": pd.Series(out["chunk_idx"], dtype="int64"),
                "chunk_start": pd.Series(out["chunk_start"], dtype="int64"),
                "n_tokens": pd.Series(out["n_tokens"], dtype="int64"),
                "chunk_char_start": pd.Series(
                    out["chunk_char_start"], dtype="int64"
                ),
                "chunk_char_end": pd.Series(out["chunk_char_end"], dtype="int64"),
                "chunk_text": pd.Series(out["chunk_text"], dtype="object"),
            })

    narrowed = docs_df.select(
        F.col(id_col).cast("long").alias("doc_id"), F.col(text_col).alias("text")
    )
    return narrowed.mapInPandas(fn, schema)
