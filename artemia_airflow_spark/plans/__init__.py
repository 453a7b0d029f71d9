from artemia_airflow_spark.plans.registry import ORACLE, QUERIES, declared

__all__ = ["QUERIES", "ORACLE", "declared"]
