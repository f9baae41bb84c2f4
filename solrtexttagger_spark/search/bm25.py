"""BM25 top-k keyword search — Spark-native replacement for the reference's
delegated Solr ``/select`` SearchHandler (SURVEY.md §2.4 D1; solrconfig.xml:52).

Physical shape, deliberately all JVM-side (whole-stage codegen, no Python in
the scoring path):

  postings (BIG)  JOIN  broadcast(query terms, tiny)   <- broadcast hash join,
    -> explode(postings)                                  no shuffle of postings
    -> per-(query,term,doc) contribution (built-in exprs)
    -> groupBy(query_id, doc_id).sum                    <- the one shuffle,
    -> row_number() window per query_id, <= k              partial agg map-side

Scoring: Lucene-classic BM25 (k1=1.2, b=0.75),
  idf  = ln(1 + (N - df + 0.5)/(df + 0.5))
  w    = idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)) * qtf
Deterministic tie-break (score desc, doc_id asc) for rank-identical output.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from solrtexttagger_spark.analysis.core import tokenize
from solrtexttagger_spark.index.build import InvertedIndex

K1 = 1.2
B = 0.75


def analyze_query_terms(query: str, lowercase: bool = True) -> dict[str, int]:
    """Query analysis chain (same tokenizer as the index chain) -> term bag."""
    words = [w for w in tokenize(query) if w is not None]
    return Counter((w.lower() if lowercase else w) for w, _s, _e in words)


def queries_to_df(spark: SparkSession, queries: list[tuple[int, str]]) -> DataFrame:
    rows = []
    for qid, q in queries:
        for term, qtf in sorted(analyze_query_terms(q).items()):
            rows.append((int(qid), term, int(qtf)))
    return spark.createDataFrame(rows, "query_id long, term string, qtf int")


def bm25_topk(
    index: InvertedIndex,
    queries,
    *,
    k: int = 10,
    k1: float = K1,
    b: float = B,
    spark: SparkSession | None = None,
) -> DataFrame:
    """Top-k BM25 per query. ``queries`` is a list[(query_id, text)] or a
    DataFrame(query_id, term, qtf). Returns
    (query_id, rank, doc_id, score double)."""
    postings = index.postings
    if isinstance(queries, DataFrame):
        qdf = queries
    else:
        qdf = queries_to_df(spark or postings.sparkSession, queries)

    n = float(index.doc_count)
    avgdl = float(index.avgdl) if index.avgdl else 1.0

    # One pass over postings: broadcast-join the query terms, then recover
    # the GLOBAL df per term with a window over that term's segment rows
    # (tiny group count = |query terms|). Using index.term_stats here
    # instead would re-derive the whole index when it isn't persisted —
    # a second full scan+shuffle for a handful of numbers.
    # join DISTINCT terms first: the window must see each (term, seg) row
    # exactly once, or terms shared by several queries inflate df
    qterms = qdf.select("term").distinct()
    qpost = postings.join(F.broadcast(qterms), "term").withColumn(
        "df", F.sum("df_seg").over(Window.partitionBy("term"))
    )
    joined = qpost.join(F.broadcast(qdf), "term")
    ex = joined.select(
        "query_id",
        "qtf",
        F.log(F.lit(1.0) + (F.lit(n) - F.col("df") + 0.5) / (F.col("df") + 0.5)).alias(
            "idf"
        ),
        F.explode("postings").alias("p"),
    )
    tf = F.col("p.tf").cast("double")
    dl = F.col("p.dl").cast("double")
    contrib = (
        F.col("idf")
        * (tf * (k1 + 1.0))
        / (tf + k1 * (1.0 - b + b * dl / avgdl))
        * F.col("qtf").cast("double")
    )
    scores = (
        ex.select("query_id", F.col("p.doc_id").alias("doc_id"), contrib.alias("c"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("c").alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )
