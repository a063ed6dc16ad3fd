from lwetl_spark.plans.db_copy import DbCopyPlan, db_copy, topo_order
from lwetl_spark.plans.statistics import ExecutionStatistics

__all__ = ["DbCopyPlan", "db_copy", "topo_order", "ExecutionStatistics"]
