from parallel_dataflow_spark.plans.registry import QUERIES, ORACLE_SQL, flagship_entry  # noqa: F401
