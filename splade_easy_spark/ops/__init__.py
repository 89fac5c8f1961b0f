from splade_easy_spark.ops import dedup, similarity, textstats, multimodal

__all__ = ["dedup", "similarity", "textstats", "multimodal"]
