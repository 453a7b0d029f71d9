from artemia_airflow_spark.functions.core import (
    dec_avg,
    dec_sum,
    epoch_seconds,
    ts_second,
)
from artemia_airflow_spark.functions.vectors import cosine_similarity, dot, l2_norm

__all__ = [
    "dec_sum", "dec_avg", "ts_second", "epoch_seconds",
    "cosine_similarity", "dot", "l2_norm",
]
