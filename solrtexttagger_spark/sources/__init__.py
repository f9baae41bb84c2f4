from solrtexttagger_spark.sources.codecorpus import synth_code_corpus

__all__ = ["synth_code_corpus"]
