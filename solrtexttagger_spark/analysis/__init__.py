from solrtexttagger_spark.analysis.core import (
    ENGLISH_STOP_WORDS,
    Token,
    concatenate,
    index_analyze_shingles,
    index_analyze_whole,
    query_analyze,
    shingles,
    tokenize,
)

__all__ = [
    "ENGLISH_STOP_WORDS",
    "Token",
    "concatenate",
    "index_analyze_shingles",
    "index_analyze_whole",
    "query_analyze",
    "shingles",
    "tokenize",
]
