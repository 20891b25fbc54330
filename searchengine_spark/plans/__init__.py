from searchengine_spark.plans.planner import PlannedQuery, plan_query

__all__ = ["PlannedQuery", "plan_query"]
