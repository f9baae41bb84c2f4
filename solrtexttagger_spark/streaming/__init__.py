from solrtexttagger_spark.streaming.sessionize import sessionize_batch, sessionize_stream
from solrtexttagger_spark.streaming.index_stream import incremental_index_stream

__all__ = ["sessionize_batch", "sessionize_stream", "incremental_index_stream"]
