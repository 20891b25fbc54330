from searchengine_spark.operators.wand import score_salt_group

__all__ = ["score_salt_group"]
