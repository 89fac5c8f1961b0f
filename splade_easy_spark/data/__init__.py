from splade_easy_spark.data.embeddings import synthetic_embeddings
from splade_easy_spark.data.transcripts import (
    TRANSCRIPT_SCHEMA,
    generate_transcripts,
    generate_query_set,
)

__all__ = [
    "TRANSCRIPT_SCHEMA",
    "generate_transcripts",
    "generate_query_set",
    "synthetic_embeddings",
]
