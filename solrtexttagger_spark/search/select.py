"""/select result assembly — Solr returns STORED FIELDS with each hit
(`fl=` projection), not bare ids (reference delegated stack, SURVEY.md
§2.4 D1/D4; the tagger side's equivalent is matched_docs'
`fl` projection at tagging/operator.py).

Shape: the ranked top-k relation is tiny (k x |queries| rows) — it
broadcasts into a join against the corpus, and Catalyst prunes the docs
scan to exactly the requested `fl` columns (pinned by
test_plans.test_scan_pruning_column_projection for the tagger path; the
same projection applies here)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from solrtexttagger_spark.index.build import InvertedIndex
from solrtexttagger_spark.search.bm25 import B, K1, bm25_topk


def select_topk(
    index: InvertedIndex,
    docs_df: DataFrame,
    queries,
    *,
    fl: list[str],
    k: int = 10,
    k1: float = K1,
    b: float = B,
    start: int = 0,
    allowed_docs: DataFrame | None = None,
    id_col: str = "doc_id",
    spark: SparkSession | None = None,
) -> DataFrame:
    """Top-k BM25 with stored-field retrieval: returns
    (query_id, rank, doc_id, score, *fl). `fl` columns come from
    ``docs_df``; the ranked set broadcasts into the corpus join. Supports
    the same fq (`allowed_docs`) and pagination (`start`) as bm25_topk."""
    ranked = bm25_topk(
        index, queries, k=k, k1=k1, b=b, spark=spark,
        start=start, allowed_docs=allowed_docs,
    )
    fields = docs_df.select(F.col(id_col).alias("doc_id"), *fl)
    return (
        fields.join(F.broadcast(ranked), "doc_id")
        .select("query_id", "rank", "doc_id", "score", *fl)
    )
