"""artemia_airflow_spark — a PySpark-native analytics + orchestration engine.

Re-expresses the capabilities of the reference repo
(Artemia-project/artemia-airflow, an Airflow workflow orchestrator —
see SURVEY.md) on Apache Spark:

- Surface A (orchestration): ``artemia_airflow_spark.pipeline`` — DAG of
  stage functions with retries, trigger rules, sensors, connections and
  DataFrame-based XCom handoff (reference: dags/update_tr_from_ex_dag.py,
  dags/hello_function_dag.py).
- Surface B (data processing): ``operators/``, ``functions/``,
  ``sources/``, ``streaming/`` — the full relational + LLM-data-pipeline
  operator inventory of SURVEY.md §2-B, implemented DataFrame-first so
  Catalyst/Tungsten pick the physical strategy.

Every operator is designed for 100 TB scale (broadcast hints for dims,
partial aggregation, no driver-side collects in the hot path) even
though CI runs at sf<=0.1 on local[32].
"""

from artemia_airflow_spark.session import build_session

__all__ = ["build_session"]
__version__ = "0.1.0"
