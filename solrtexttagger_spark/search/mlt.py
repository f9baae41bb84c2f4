"""More-Like-This — given source documents, find the most similar other
documents. The reference's stack exposes this as Solr's MoreLikeThis
handler (another delegated-to-Lucene black box, SURVEY.md §2.4); owned
natively here as a two-stage composition of existing operators:

  1. representative terms: each probe doc's top-``n_terms`` TF-IDF
     keywords (ops/textqa.tfidf_keywords — tf * ln(N/df), tie-broken by
     term, the rounded score both engines agree on);
  2. retrieval: those terms form a per-probe query (qtf=1 per term,
     Lucene MLT's default boost-by-interestingness is intentionally
     simplified to unweighted terms for cross-engine determinism) scored
     with BM25 over the inverted index, excluding the probe itself.

Probe term sets are tiny (|probes| x n_terms) and collected to the
driver — the retrieval stage then runs the standard broadcast-join BM25
plan, so corpus-side cost is identical to bm25_topk."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from solrtexttagger_spark.index.build import InvertedIndex
from solrtexttagger_spark.ops.textqa import tfidf_keywords
from solrtexttagger_spark.search.bm25 import B, K1, bm25_topk


def more_like_this(
    index: InvertedIndex,
    docs_df: DataFrame,
    probe_doc_ids: list[int],
    *,
    n_terms: int = 5,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = K1,
    b: float = B,
    spark: SparkSession | None = None,
) -> DataFrame:
    """-> (query_id=probe doc_id, rank, doc_id, score) — the k most
    BM25-similar OTHER documents per probe, via the probe's top TF-IDF
    terms. Deterministic end to end."""
    spark = spark or docs_df.sparkSession
    probes = [int(p) for p in probe_doc_ids]
    if not probes:
        return spark.createDataFrame(
            [], "query_id long, rank long, doc_id long, score double"
        )
    keywords = (
        tfidf_keywords(docs_df, text_col=text_col, id_col=id_col, top_k=n_terms)
        .where(F.col(id_col).isin(probes))
        .select(id_col, "term")
        .collect()
    )
    qdf_rows = [(int(r[id_col]), r["term"], 1) for r in keywords]
    if not qdf_rows:
        return spark.createDataFrame(
            [], "query_id long, rank long, doc_id long, score double"
        )
    qdf = spark.createDataFrame(qdf_rows, "query_id long, term string, qtf int")
    # rank one deeper, then drop self-matches and re-rank: the probe doc
    # almost always tops its own term query
    topk = bm25_topk(index, qdf, k=k + 1, k1=k1, b=b, spark=spark, strategy="exploded")
    from pyspark.sql import Window

    others = topk.where(F.col("doc_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        others.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )
