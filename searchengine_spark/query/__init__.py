from searchengine_spark.query.engine import SearchEngine

__all__ = ["SearchEngine"]
