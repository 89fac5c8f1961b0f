from splade_easy_spark.streaming.appender import stream_append, turn_rate

__all__ = ["stream_append", "turn_rate"]
