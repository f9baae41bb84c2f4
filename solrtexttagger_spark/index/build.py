"""Inverted-index construction — the Spark-native replacement for the
reference's delegated Lucene indexing chain (SURVEY.md §2.4 D2).

Shape of the plan (one shuffle):

  Scan (Parquet/Iceberg, column-pruned to id + text)
    -> MapInPandas tokenize + PER-DOC TERM AGGREGATION   <- map-side combine
         emits (doc_id, term, tf, positions, dl) rows     in Python, so the
    -> groupBy(term) [optionally salted two-phase]        shuffle carries
    -> postings(term, df, cf, postings[])                 per-doc-term rows,
                                                          never raw tokens

Doc ids: content-addressed 60-bit ids derived from sha2 over the natural-key
columns — deterministic, stable under any partitioning/parallelism (unlike
monotonically_increasing_id), no global sort, no driver bottleneck.

Postings carry (doc_id, tf, dl, positions): tf/positions because BM25 and
phrase search need them (the reference's tag field omits them,
schema.xml:52-53 — we keep the tagger path cheap instead by never reading
the positions column thanks to Parquet column pruning).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from solrtexttagger_spark.analysis.core import tokenize

_TOKEN_ROW_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("term", T.StringType()),
        T.StructField("tf", T.IntegerType()),
        T.StructField("positions", T.ArrayType(T.IntegerType())),
        T.StructField("dl", T.IntegerType()),
    ]
)

POSTING_ELEM = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("tf", T.IntegerType()),
        T.StructField("dl", T.IntegerType()),
        T.StructField("positions", T.ArrayType(T.IntegerType())),
    ]
)


@dataclass
class InvertedIndex:
    """postings: (term, df, cf, postings array<struct<doc_id,tf,dl,positions>>)
    doc_count / avgdl: corpus stats needed by BM25."""

    postings: DataFrame
    doc_count: int
    avgdl: float

    def stats(self) -> dict:
        return {"doc_count": self.doc_count, "avgdl": self.avgdl}


def with_doc_ids(df: DataFrame, key_cols: list[str], out_col: str = "doc_id") -> DataFrame:
    """Deterministic 60-bit doc ids from sha2 of the natural key.

    At 10^12 docs the birthday-collision expectation for 60 bits is
    non-trivial, so production uses the full 256-bit digest as the stable
    identity and this 60-bit int only as the sort/join key; collisions at
    test scale (<=1e8) are ~0.
    """
    key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in key_cols])
    return df.withColumn(
        out_col, F.conv(F.substring(F.sha2(key, 256), 1, 15), 16, 10).cast("long")
    )


def _tokenize_rows(text_col: str, doc_id_col: str, lowercase: bool):
    """mapInPandas fn: tokenize + per-document term aggregation."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "term": [], "tf": [], "positions": [], "dl": []}
            for doc_id, text in zip(pdf[doc_id_col], pdf[text_col]):
                if text is None:
                    continue
                words = [w for w in tokenize(text) if w is not None]
                terms: dict[str, list[int]] = {}
                for pos, (w, _s, _e) in enumerate(words):
                    t = w.lower() if lowercase else w
                    terms.setdefault(t, []).append(pos)
                dl = len(words)
                for t, poss in terms.items():
                    out["doc_id"].append(doc_id)
                    out["term"].append(t)
                    out["tf"].append(len(poss))
                    out["positions"].append(poss)
                    out["dl"].append(dl)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "term": pd.Series(out["term"], dtype="object"),
                    "tf": pd.Series(out["tf"], dtype="int32"),
                    "positions": pd.Series(out["positions"], dtype="object"),
                    "dl": pd.Series(out["dl"], dtype="int32"),
                }
            )

    return run


def doc_term_rows(
    df: DataFrame,
    *,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    lowercase: bool = True,
    use_split: bool = False,
) -> DataFrame:
    """(doc_id, term, tf, positions, dl) rows, one per distinct doc-term.

    use_split=True is the pure-JVM fast path for pre-cleaned text (single
    spaces, no punctuation — e.g. the driver's documents table): whole-stage
    codegen end to end, no Python at all.
    """
    if use_split:
        toks = df.select(
            F.col(doc_id_col).alias("doc_id"),
            F.split(F.col(text_col), " ").alias("toks"),
        ).select("doc_id", "toks", F.size("toks").cast("int").alias("dl"))
        return (
            toks.select("doc_id", "dl", F.posexplode("toks").alias("pos", "term"))
            .where(F.col("term") != "")
            .groupBy("doc_id", "term", "dl")
            .agg(
                F.count("*").cast("int").alias("tf"),
                F.sort_array(F.collect_list(F.col("pos").cast("int"))).alias(
                    "positions"
                ),
            )
            .select("doc_id", "term", "tf", "positions", "dl")
        )
    narrowed = df.select(F.col(doc_id_col).alias(doc_id_col), F.col(text_col))
    return narrowed.mapInPandas(
        _tokenize_rows(text_col, doc_id_col, lowercase), schema=_TOKEN_ROW_SCHEMA
    )


def build_index(
    df: DataFrame,
    *,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    lowercase: bool = True,
    use_split: bool = False,
    salt_buckets: int | None = None,
) -> InvertedIndex:
    """Build the inverted index.

    salt_buckets: two-phase salted aggregation for skewed (stopword-heavy)
    terms — phase 1 groups by (term, hash(doc_id) % salt) bounding any
    single task's list; phase 2 merges the partial lists per term. With AQE
    skew handling this is optional below ~1e9 docs; explicit salting is the
    10^12-scale path (SURVEY.md §4).
    """
    rows = doc_term_rows(
        df,
        text_col=text_col,
        doc_id_col=doc_id_col,
        lowercase=lowercase,
        use_split=use_split,
    ).persist()  # one tokenize pass feeds both the stats agg and the postings shuffle

    elem = F.struct("doc_id", "tf", "dl", "positions")
    if salt_buckets and salt_buckets > 1:
        partial = (
            rows.withColumn("__salt", F.pmod(F.xxhash64("doc_id"), F.lit(salt_buckets)))
            .groupBy("term", "__salt")
            .agg(
                F.sort_array(F.collect_list(elem)).alias("p_postings"),
                F.count("*").alias("p_df"),
                F.sum("tf").alias("p_cf"),
            )
        )
        postings = partial.groupBy("term").agg(
            F.array_sort(F.flatten(F.collect_list("p_postings"))).alias("postings"),
            F.sum("p_df").alias("df"),
            F.sum("p_cf").alias("cf"),
        )
    else:
        postings = rows.groupBy("term").agg(
            F.sort_array(F.collect_list(elem)).alias("postings"),
            F.count("*").alias("df"),
            F.sum("tf").alias("cf"),
        )

    # Corpus stats in one small agg over the persisted rows. N = docs with at
    # least one token (Lucene's per-field docCount semantics, which BM25 idf
    # uses); avgdl = total tokens / N.
    agg = rows.agg(
        F.sum("tf").alias("total_terms"),
        F.countDistinct("doc_id").alias("n"),
    ).collect()[0]
    n = agg["n"] or 0
    avgdl = (agg["total_terms"] or 0) / n if n else 0.0
    return InvertedIndex(postings=postings, doc_count=n, avgdl=float(avgdl))
