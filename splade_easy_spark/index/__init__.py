from splade_easy_spark.index.builder import build_index
from splade_easy_spark.index.catalog import IndexCatalog
from splade_easy_spark.index.manifest import Manifest
from splade_easy_spark.index.vector_builder import append_vector_documents, build_vector_index

__all__ = [
    "build_index",
    "build_vector_index",
    "append_vector_documents",
    "Manifest",
    "IndexCatalog",
]
