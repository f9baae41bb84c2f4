"""Solr function queries on the ranking path — ``bf=`` (additive boost
function, dismax) and ``boost=`` (multiplicative, edismax).

Reference surface: Solr ranks with `score = bm25 + bf_value` under
dismax's ``bf=log(popularity)`` and `score = bm25 * boost_value` under
edismax's ``boost=...`` — the standard way a corpus signal
(popularity, recency, quality) joins textual relevance without
re-indexing. Function values come from document fields at query time.

Spark-first shape: the function is ONE Catalyst SQL expression over the
corpus columns (``F.expr`` — stays in whole-stage codegen, never a
Python UDF), computed only after the corpus projects down to
(doc_id, referenced columns); it joins the exploded scoring relation on
doc_id and folds into the score BEFORE the rank window, so pagination,
fq and tie-breaks behave exactly like the unboosted scorer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from solrtexttagger_spark.index.build import InvertedIndex
from solrtexttagger_spark.search.bm25 import B, K1, exploded_scores, queries_to_df


def boosted_topk(
    index: InvertedIndex,
    docs_df: DataFrame,
    queries,
    *,
    bf: str | None = None,
    boost: str | None = None,
    k: int = 10,
    k1: float = K1,
    b: float = B,
    start: int = 0,
    allowed_docs: DataFrame | None = None,
    id_col: str = "doc_id",
    spark: SparkSession | None = None,
) -> DataFrame:
    """Top-k under Solr function-query boosting:

        final = (bm25 + bf_expr) * boost_expr

    ``bf`` is the additive function (Solr dismax ``bf=``; omitted = +0),
    ``boost`` the multiplicative one (edismax ``boost=``; omitted = x1) —
    both SQL expression strings over ``docs_df`` columns (e.g.
    ``"log(1 + views)"``, ``"recip(ms(NOW,date),...)"`` spelled in Spark
    SQL). A NULL function value coalesces to the identity (0 / 1) —
    Solr's missing-field behavior for numeric function sources.

    Returns (query_id, rank, doc_id, score, bm25) — ``score`` is the
    boosted value the rank window ordered by ((score desc, doc_id asc)
    deterministic tie-break, start/k pagination like bm25_topk);
    ``bm25`` carries the unboosted relevance for debugging/explain, as
    Solr's debugQuery shows both components. ``allowed_docs`` is fq."""
    if bf is None and boost is None:
        raise ValueError("boosted_topk needs bf= and/or boost= (else use "
                         "bm25_topk)")
    spark = spark or docs_df.sparkSession
    scores = exploded_scores(
        index, queries_to_df(spark, queries), k1=k1, b=b,
        allowed_docs=allowed_docs,
    )
    cols = [F.col(id_col).alias("doc_id")]
    if bf is not None:
        cols.append(F.expr(bf).cast("double").alias("__bf"))
    if boost is not None:
        cols.append(F.expr(boost).cast("double").alias("__boost"))
    funcs = docs_df.select(*cols)
    joined = scores.withColumnRenamed("score", "bm25").join(funcs, "doc_id")
    add = F.coalesce(F.col("__bf"), F.lit(0.0)) if bf is not None else F.lit(0.0)
    mul = (
        F.coalesce(F.col("__boost"), F.lit(1.0))
        if boost is not None
        else F.lit(1.0)
    )
    boosted = joined.withColumn("score", (F.col("bm25") + add) * mul)
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        boosted.withColumn("rank", F.row_number().over(w).cast("long"))
        .where((F.col("rank") > start) & (F.col("rank") <= start + k))
        .select("query_id", "rank", "doc_id", "score", "bm25")
    )
