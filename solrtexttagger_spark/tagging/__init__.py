from solrtexttagger_spark.tagging.core import TermDict, tag_text
from solrtexttagger_spark.tagging.dictionary import build_tag_dictionary
from solrtexttagger_spark.tagging.operator import tag

__all__ = ["TermDict", "tag_text", "build_tag_dictionary", "tag"]
