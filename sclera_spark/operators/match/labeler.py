"""Row labelers: assign match labels to rows, JVM-side.

Parity with the reference's labelers (modules/core/src/main/scala/analytics/
sequence/labeler/rowlabeler/: ConstRowLabeler.scala, ColumnRowLabeler.scala,
PredRowLabeler.scala). A labeler produces an ``array<string>`` Column of the
labels that apply to each row — computed with built-in functions so labeling
stays inside whole-stage codegen; only the NFA walk itself drops to pandas.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class RowLabeler:
    def label_col(self, df: DataFrame) -> Column:
        raise NotImplementedError

    def single_label_col(self, df: DataFrame) -> Column | None:
        """A plain string Column when this labeler assigns at most one
        label per row (fast path: avoids array<string> Arrow transfer in
        the matcher), else None."""
        return None


@dataclass
class ConstRowLabeler(RowLabeler):
    """Every row gets the same label (reference ConstRowLabeler.scala:39)."""

    label: str

    def label_col(self, df: DataFrame) -> Column:
        return F.array(F.lit(self.label.upper()))

    def single_label_col(self, df: DataFrame) -> Column:
        return F.lit(self.label.upper())


@dataclass
class ColumnRowLabeler(RowLabeler):
    """Label = value of a column, optionally remapped CASE-style
    (reference ColumnRowLabeler.scala: `LABEL col [WHEN val THEN label]...`).
    Rows whose value maps to no label get an empty label set (never match)."""

    column: str
    when_then: dict[object, str] = field(default_factory=dict)
    default: str | None = None

    def label_col(self, df: DataFrame) -> Column:
        return F.filter(F.array(self.single_label_col(df)), lambda x: x.isNotNull())

    def single_label_col(self, df: DataFrame) -> Column:
        c = F.col(self.column)
        if not self.when_then:
            return F.upper(c.cast("string"))
        expr = None
        for val, lab in self.when_then.items():
            cond = c == F.lit(val)
            expr = F.when(cond, F.lit(lab.upper())) if expr is None else expr.when(
                cond, F.lit(lab.upper())
            )
        return expr.otherwise(
            F.lit(self.default.upper()) if self.default is not None else F.lit(None)
        )


@dataclass
class PredRowLabeler(RowLabeler):
    """Row gets every label whose predicate holds (reference
    PredRowLabeler.scala: `LABEL l1 WHEN pred1, l2 WHEN pred2 ...`)."""

    preds: Sequence[tuple[Column, str]]

    def label_col(self, df: DataFrame) -> Column:
        items = [F.when(pred, F.lit(lab.upper())).otherwise(F.lit(None)) for pred, lab in self.preds]
        return F.filter(F.array(*items), lambda x: x.isNotNull())
