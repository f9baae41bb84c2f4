from solrtexttagger_spark.search.bm25 import bm25_topk, analyze_query_terms

__all__ = ["bm25_topk", "analyze_query_terms"]
