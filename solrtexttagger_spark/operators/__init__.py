"""Operator facade — the engine's relational/custom operators in one
namespace (canonical homes: tagging/, search/, ops/, streaming/)."""

from solrtexttagger_spark.ops.dedup import (
    connected_components,
    dup_clusters,
    exact_dedup,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    span_dup_stats,
)
from solrtexttagger_spark.ops.multimodal import (
    extract_features,
    extract_media_meta,
    repartition_for_payload,
    resize_images,
    sample_frames,
)
from solrtexttagger_spark.ops.sampling import (
    hash_sample,
    hash_top_k,
    stratified_hash_sample,
)
from solrtexttagger_spark.ops.similarity import (
    cosine_dup_pairs,
    cosine_topk,
    ivf_cosine_topk,
    ivf_fit_centroids,
    lsh_cosine_topk,
)
from solrtexttagger_spark.search.bm25 import bm25_topk
from solrtexttagger_spark.search.boolean import boolean_bm25_topk, parse_boolean_query
from solrtexttagger_spark.search.facets import facet_counts
from solrtexttagger_spark.search.highlight import snippets
from solrtexttagger_spark.search.mlt import more_like_this
from solrtexttagger_spark.search.phrase import phrase_match
from solrtexttagger_spark.search.wand import LocalSearcher, wand_topk
from solrtexttagger_spark.ops.textqa import (
    ngram_contamination,
    pii_stats,
    repetition_stats,
)
from solrtexttagger_spark.streaming.dedup import stream_exact_dedup, stream_first_seen
from solrtexttagger_spark.streaming.sessionize import sessionize_batch, sessionize_stream
from solrtexttagger_spark.streaming.stateful import running_user_stats
from solrtexttagger_spark.tagging.join_operator import tag_join
from solrtexttagger_spark.tagging.operator import matched_docs, tag, tag_response, translate_ids

__all__ = [
    "connected_components", "dup_clusters",
    "exact_dedup", "lsh_candidate_pairs", "minhash_signatures",
    "ngram_jaccard_pairs", "simhash", "span_dup_stats", "extract_media_meta",
    "extract_features", "repartition_for_payload", "resize_images",
    "sample_frames",
    "hash_sample", "hash_top_k", "stratified_hash_sample",
    "cosine_dup_pairs", "cosine_topk", "ivf_cosine_topk",
    "ivf_fit_centroids", "lsh_cosine_topk",
    "bm25_topk", "boolean_bm25_topk", "parse_boolean_query", "snippets",
    "facet_counts", "more_like_this",
    "phrase_match", "LocalSearcher", "wand_topk",
    "ngram_contamination", "pii_stats", "repetition_stats",
    "sessionize_batch", "sessionize_stream", "running_user_stats",
    "stream_exact_dedup", "stream_first_seen",
    "tag_join", "matched_docs", "tag", "tag_response", "translate_ids",
]
