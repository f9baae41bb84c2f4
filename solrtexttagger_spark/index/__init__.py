from solrtexttagger_spark.index.build import build_index, with_doc_ids

__all__ = ["build_index", "with_doc_ids"]
