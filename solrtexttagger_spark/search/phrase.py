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


def phrase_match(index: InvertedIndex, phrase: str) -> DataFrame:
    """Documents containing the exact token phrase.
    Returns (doc_id, n_occurrences), n_occurrences >= 1."""
    if not phrase_terms(phrase):
        raise ValueError("empty phrase")
    return multi_phrase_match(index, [phrase]).select("doc_id", "n_occurrences")
