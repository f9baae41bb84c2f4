"""Exact phrase matching over positional postings — the consumer that
justifies storing positions in the index (north star: postings carry
(docID, tf, positions); the reference's tag field omits them,
schema.xml:52-53, because Lucene handles phrases elsewhere).

All JVM-side: per phrase term, explode that term's postings (query terms
broadcast into the postings scan, same shape as BM25), then fold adjacency
with array_intersect over shifted position arrays:

  occ_positions(t0..tk, doc) = positions(t0) ∩ (positions(t1) - 1)
                                             ∩ ... ∩ (positions(tk) - k)

A document matches iff the fold is non-empty; n_occurrences = its size.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F

from solrtexttagger_spark.analysis.core import tokenize
from solrtexttagger_spark.index.build import InvertedIndex


def phrase_terms(phrase: str, lowercase: bool = True) -> list[str]:
    return [
        (w.lower() if lowercase else w)
        for w, _s, _e in [t for t in tokenize(phrase) if t is not None]
    ]


def phrase_match(index: InvertedIndex, phrase: str) -> DataFrame:
    """Documents containing the exact token phrase.
    Returns (doc_id, n_occurrences), n_occurrences >= 1."""
    terms = phrase_terms(phrase)
    if not terms:
        raise ValueError("empty phrase")
    spark = index.postings.sparkSession

    qdf = spark.createDataFrame(
        [(t, i) for i, t in enumerate(terms)], "term string, term_idx int"
    ).distinct()

    # one pass over postings: query terms broadcast in, positions shifted by
    # the term's offset in the phrase so adjacency becomes set intersection
    ex = (
        index.postings.join(F.broadcast(qdf), "term")
        .select("term_idx", F.explode("postings").alias("p"))
        .select(
            "term_idx",
            F.col("p.doc_id").alias("doc_id"),
            F.transform(
                "p.positions", lambda x: x - F.col("term_idx")
            ).alias("shifted"),
        )
    )
    per_term = [
        ex.where(F.col("term_idx") == i).select(
            "doc_id", F.col("shifted").alias(f"pos_{i}")
        )
        for i in range(len(terms))
    ]
    joined = reduce(lambda a, b: a.join(b, "doc_id"), per_term)
    occ = reduce(
        lambda acc, i: F.array_intersect(acc, F.col(f"pos_{i}")),
        range(1, len(terms)),
        F.col("pos_0"),
    )
    return (
        joined.select("doc_id", F.size(occ).alias("n_occurrences"))
        .where(F.col("n_occurrences") > 0)
    )
