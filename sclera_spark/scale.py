"""Scale guards for operators with sequential (single-sequence) modes.

Several sequence operators (MATCH, EXPMOVAVG, Transform) replicate the
reference's single-threaded whole-input semantics when called without
partition keys by coalescing to one task. That is correct but serializes
the entire input through one executor core — fine for bounded data,
a scale-killer on a 100 TB cluster run. These paths warn loudly so the
fallback is never silent in a pipeline."""

from __future__ import annotations

import warnings


class UnpartitionedFallbackWarning(UserWarning):
    """An operator fell back to a single-task sequential plan."""


def warn_unpartitioned(op: str, hint: str = "pass partition_by") -> None:
    warnings.warn(
        f"{op} without partition keys runs the whole input through a single "
        f"task (sequential semantics, zero parallelism) — {hint} to "
        f"distribute",
        UnpartitionedFallbackWarning,
        stacklevel=3,
    )
