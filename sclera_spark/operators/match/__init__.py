from sclera_spark.operators.match.regex_nfa import compile_pattern, find_matches
from sclera_spark.operators.match.labeler import (
    RowLabeler,
    ConstRowLabeler,
    ColumnRowLabeler,
    PredRowLabeler,
)
from sclera_spark.operators.match.matcher import (
    MATCH_ID,
    MATCH_LABEL,
    match_rows,
    match_aggregate,
    label_agg,
)

__all__ = [
    "compile_pattern",
    "find_matches",
    "RowLabeler",
    "ConstRowLabeler",
    "ColumnRowLabeler",
    "PredRowLabeler",
    "MATCH_ID",
    "MATCH_LABEL",
    "match_rows",
    "match_aggregate",
    "label_agg",
]
