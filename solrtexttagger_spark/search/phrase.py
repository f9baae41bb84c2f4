"""Exact phrase matching over positional postings — the consumer that
justifies storing positions in the index (north star: postings carry
(docID, tf, positions); the reference's tag field omits them,
schema.xml:52-53, because Lucene handles phrases elsewhere).

All JVM-side, ONE pass over the postings for ANY number of phrases:
the (phrase_id, term_idx, term) rows broadcast into the postings scan
(same shape as BM25 query terms), positions are shifted by the term's
offset in its phrase so adjacency becomes set intersection, and one
groupBy(phrase_id, doc_id) folds the intersection with higher-order
array functions:

  occ_positions(t0..tk, doc) = positions(t0) ∩ (positions(t1) - 1)
                                             ∩ ... ∩ (positions(tk) - k)

A document matches iff every term_idx is present AND the fold is
non-empty; n_occurrences = its size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from solrtexttagger_spark.analysis.core import tokenize
from solrtexttagger_spark.index.build import InvertedIndex


def phrase_terms(phrase: str, lowercase: bool = True) -> list[str]:
    return [
        (w.lower() if lowercase else w)
        for w, _s, _e in [t for t in tokenize(phrase) if t is not None]
    ]


def multi_phrase_match(
    index: InvertedIndex, phrases: list[str], *, lowercase: bool = True
) -> DataFrame:
    """Match MANY phrases in one postings pass.
    Returns (phrase_id, doc_id, n_occurrences), phrase_id = position in
    ``phrases``, n_occurrences >= 1. One shuffle total (the
    per-(phrase, doc) fold), regardless of phrase count — the batch shape
    the boolean-query phrase clauses need."""
    spark = index.postings.sparkSession
    rows: list[tuple[int, int, str]] = []
    plens: dict[int, int] = {}
    for pid, ph in enumerate(phrases):
        terms = phrase_terms(ph, lowercase)
        if not terms:
            raise ValueError(f"empty phrase at index {pid}")
        plens[pid] = len(terms)
        rows.extend((pid, i, t) for i, t in enumerate(terms))
    qdf = spark.createDataFrame(rows, "phrase_id int, term_idx int, term string")

    # one postings scan: phrase terms broadcast in; a doc lives in exactly
    # one segment, so each (phrase_id, term_idx, doc_id) arrives once
    ex = (
        index.postings.join(F.broadcast(qdf), "term")
        .select("phrase_id", "term_idx", F.explode("postings").alias("p"))
        .select(
            "phrase_id",
            "term_idx",
            F.col("p.doc_id").alias("doc_id"),
            F.transform("p.positions", lambda x: x - F.col("term_idx")).alias(
                "shifted"
            ),
        )
    )
    return _fold_phrases(ex, plens)


def _fold_phrases(ex: DataFrame, plens: dict[int, int]) -> DataFrame:
    """The per-(phrase, doc) contiguity fold shared by the uncompressed
    and compressed phrase paths. ``ex``: (phrase_id, term_idx, doc_id,
    shifted array<long>) with ONE row per (phrase, term, doc)."""
    g = ex.groupBy("phrase_id", "doc_id").agg(
        F.count("*").alias("nt"),
        F.array_sort(F.collect_list(F.struct("term_idx", "shifted"))).alias("arrs"),
    )
    plen_map = F.create_map(*[F.lit(x) for kv in plens.items() for x in kv])
    occ = F.aggregate(
        F.slice(F.col("arrs"), F.lit(2), F.size("arrs") - 1),
        F.element_at(F.col("arrs"), 1)["shifted"],
        lambda acc, s: F.array_intersect(acc, s["shifted"]),
    )
    return (
        g.where(F.col("nt") == plen_map[F.col("phrase_id")])
        .select("phrase_id", "doc_id", F.size(occ).alias("n_occurrences"))
        .where(F.col("n_occurrences") > 0)
    )


def multi_phrase_match_compressed(
    cindex, phrases: list[str], *, lowercase: bool = True
) -> DataFrame:
    """multi_phrase_match over a COMPRESSED index built with
    compress_index(with_positions=True) — the compressed-only deployment
    (at scale only the blocks table is persisted; the uncompressed
    postings are a build intermediate).

    Same plan shape: the (phrase_id, term_idx, term) rows broadcast into
    the blocks scan (only the phrase terms' blocks are read), one
    Arrow-batched decode pass turns each block into (phrase_id, term_idx,
    doc_id, shifted) rows, then the same one-shuffle JVM fold as the
    uncompressed path. Returns (phrase_id, doc_id, n_occurrences)."""
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from solrtexttagger_spark.index.compression import (
        decode_positions_block,
        decode_postings_block,
    )

    if "pos_block" not in cindex.blocks.columns:
        raise ValueError(
            "compressed phrase match needs pos_block rows — build with "
            "compress_index(with_positions=True)"
        )
    spark = cindex.blocks.sparkSession
    rows: list[tuple[int, int, str]] = []
    plens: dict[int, int] = {}
    for pid, ph in enumerate(phrases):
        terms = phrase_terms(ph, lowercase)
        if not terms:
            raise ValueError(f"empty phrase at index {pid}")
        plens[pid] = len(terms)
        rows.extend((pid, i, t) for i, t in enumerate(terms))
    qdf = spark.createDataFrame(rows, "phrase_id int, term_idx int, term string")
    joined = cindex.blocks.join(F.broadcast(qdf), "term").select(
        "phrase_id", "term_idx", "block", "pos_block"
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_p, out_t, out_d, out_s = [], [], [], []
            for pid, tix, blk, pblk in zip(
                pdf["phrase_id"], pdf["term_idx"], pdf["block"], pdf["pos_block"]
            ):
                doc_ids, _tf, _dl = decode_postings_block(bytes(blk))
                counts, flat = decode_positions_block(bytes(pblk))
                shifted = flat - int(tix)
                for d, parr in zip(
                    doc_ids, np.split(shifted, np.cumsum(counts))[:-1]
                ):
                    out_p.append(int(pid))
                    out_t.append(int(tix))
                    out_d.append(int(d))
                    out_s.append(parr.tolist())
            yield pd.DataFrame(
                {
                    "phrase_id": pd.Series(out_p, dtype="int32"),
                    "term_idx": pd.Series(out_t, dtype="int32"),
                    "doc_id": pd.Series(out_d, dtype="int64"),
                    "shifted": pd.Series(out_s, dtype=object),
                }
            )

    ex = joined.mapInPandas(
        decode,
        schema="phrase_id int, term_idx int, doc_id long, shifted array<long>",
    )
    return _fold_phrases(ex, plens)


def phrase_match(index: InvertedIndex, phrase: str) -> DataFrame:
    """Documents containing the exact token phrase.
    Returns (doc_id, n_occurrences), n_occurrences >= 1."""
    if not phrase_terms(phrase):
        raise ValueError("empty phrase")
    return multi_phrase_match(index, [phrase]).select("doc_id", "n_occurrences")
