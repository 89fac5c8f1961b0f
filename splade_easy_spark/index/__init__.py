from splade_easy_spark.index.builder import build_index
from splade_easy_spark.index.manifest import Manifest
from splade_easy_spark.index.catalog import IndexCatalog

__all__ = ["build_index", "Manifest", "IndexCatalog"]
