from splade_easy_spark.query.searcher import Searcher, analyze_query

__all__ = ["Searcher", "analyze_query"]
