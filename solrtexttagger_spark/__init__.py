"""solrtexttagger_spark — a from-scratch, PySpark-native full-text
inverted-index + BM25 search + dictionary-tagging engine with the query and
data-processing capabilities of OpenSextant/SolrTextTagger.

This is NOT a port of the reference (a Lucene/Solr plugin): storage is
Parquet/Iceberg-style tables, the term dictionary is a broadcast sorted array
(the FST/`seekCeil` analogue), postings are DataFrame rows with optional
delta+varint block compression, and all hot paths are either pure
DataFrame/Catalyst plans or Arrow-batched pandas UDFs.

Public API (mirrors the reference surface, SURVEY.md §2):
  - build_index(df, ...)      inverted index build       (reference: Lucene indexing chain)
  - bm25_topk(...) / search   BM25 top-k keyword search  (reference: /select SearchHandler)
  - build_tag_dictionary(...) dictionary build           (reference: ConcatenateFilter/Shingle index chains)
  - tag(...)                  text tagging               (reference: TaggerRequestHandler /tag)
"""

from solrtexttagger_spark.session import get_spark
from solrtexttagger_spark.index.build import build_index, with_doc_ids
from solrtexttagger_spark.index.compressed import compress_index
from solrtexttagger_spark.search.bm25 import bm25_topk
from solrtexttagger_spark.search.phrase import phrase_match
from solrtexttagger_spark.search.wand import wand_topk
from solrtexttagger_spark.tagging.dictionary import build_tag_dictionary
from solrtexttagger_spark.tagging.join_operator import build_dict_terms, tag_join
from solrtexttagger_spark.tagging.operator import matched_docs, tag, translate_ids

__all__ = [
    "get_spark",
    "build_index",
    "with_doc_ids",
    "compress_index",
    "bm25_topk",
    "wand_topk",
    "phrase_match",
    "build_tag_dictionary",
    "tag",
    "translate_ids",
    "matched_docs",
    "build_dict_terms",
    "tag_join",
]
