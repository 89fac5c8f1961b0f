from splade_easy_spark.streaming.appender import stream_append, turn_rate
from splade_easy_spark.streaming.sessions import sessionize_stream

__all__ = ["stream_append", "turn_rate", "sessionize_stream"]
