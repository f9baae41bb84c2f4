"""Scalar/text function facade (canonical homes: analysis/, ops/textqa)."""

from solrtexttagger_spark.analysis.core import (
    ENGLISH_STOP_WORDS,
    concatenate,
    fold_ascii,
    index_analyze_shingles,
    index_analyze_whole,
    query_analyze,
    shingles,
    strip_possessive,
    tokenize,
)
from solrtexttagger_spark.ops.textqa import (
    fingerprint,
    language_id,
    quality_score,
    rolling_hash,
    tfidf_keywords,
    token_stats,
)

__all__ = [
    "ENGLISH_STOP_WORDS", "concatenate", "fold_ascii",
    "index_analyze_shingles", "index_analyze_whole", "query_analyze",
    "shingles", "strip_possessive", "tokenize",
    "fingerprint", "language_id", "quality_score", "rolling_hash",
    "tfidf_keywords", "token_stats",
]
