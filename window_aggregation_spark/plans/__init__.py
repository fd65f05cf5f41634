from window_aggregation_spark.plans.sql_gen import plan_to_sql, plans_to_sql
from window_aggregation_spark.plans.lineage import describe_plan

__all__ = ["describe_plan", "plan_to_sql", "plans_to_sql"]
