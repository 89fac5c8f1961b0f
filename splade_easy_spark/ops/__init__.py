from splade_easy_spark.ops import curate, dedup, similarity, textstats, multimodal

__all__ = ["curate", "dedup", "similarity", "textstats", "multimodal"]
