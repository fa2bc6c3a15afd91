from sclera_spark.operators.distinct_on import distinct_on
from sclera_spark.operators.asof import asof_join
from sclera_spark.operators.rangejoin import range_join, point_in_interval_join
from sclera_spark.operators.rollup import time_rollup
from sclera_spark.operators.arg import arg_opt
from sclera_spark.operators.pivot import pivot, unpivot
from sclera_spark.operators.intervals import split_into
from sclera_spark.operators.align import align, align_zip
from sclera_spark.operators.typeinfer import infer_types
from sclera_spark.operators.transform import transform_partitions
from sclera_spark.operators.window_seq import (
    ordered_window,
    running,
    movavg,
    movstddev,
    movsum,
    expmovavg,
)

__all__ = [
    "asof_join",
    "range_join",
    "point_in_interval_join",
    "time_rollup",
    "distinct_on",
    "arg_opt",
    "pivot",
    "unpivot",
    "split_into",
    "align",
    "align_zip",
    "infer_types",
    "transform_partitions",
    "ordered_window",
    "running",
    "movavg",
    "movstddev",
    "movsum",
    "expmovavg",
]
