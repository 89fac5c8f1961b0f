from splade_easy_spark.ops import (
    curate,
    decontaminate,
    dedup,
    multimodal,
    similarity,
    textstats,
)

__all__ = ["curate", "decontaminate", "dedup", "multimodal", "similarity", "textstats"]
