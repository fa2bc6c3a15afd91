from sclera_spark.functions.scalar import SCALAR_FUNCTIONS, scalar_function
from sclera_spark.functions.aggregates import AGGREGATE_FUNCTIONS, aggregate_function

__all__ = [
    "SCALAR_FUNCTIONS",
    "scalar_function",
    "AGGREGATE_FUNCTIONS",
    "aggregate_function",
]
