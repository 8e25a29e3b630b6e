"""Declarative data-quality checks (SURVEY.md §2.11).

The reference's ``table_validate`` (spark_check_emr.py:20-47) reads a
table, runs a scalar SQL check, and compares the result with a Python
comparison operator, raising on failure. We keep that declarative shape
but make the check list a first-class value and evaluate all checks in
one Spark job where possible (a union of scalar aggregates is one pass
per table instead of N actions).
"""

from __future__ import annotations

import operator
from dataclasses import dataclass
from functools import reduce
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One assertion: described, not executed, until run_checks."""

    name: str
    df: DataFrame
    agg: object  # a Column producing one scalar
    expected: object
    comparison: Callable[[object, object], bool] = operator.eq


def not_empty(name: str, df: DataFrame) -> Check:
    return Check(name, df, F.count(F.lit(1)), 0, operator.gt)


def no_nulls(name: str, df: DataFrame, column: str) -> Check:
    return Check(name, df, F.count(F.when(F.col(column).isNull(), 1)), 0, operator.eq)


def run_checks(checks: list[Check]) -> list[tuple[str, object, bool]]:
    """Evaluate each check; returns (name, actual, passed). Raises
    ValueError listing every failure (mirrors spark_check_emr.py:41-47
    but reports all failures at once)."""
    results = []
    for c in checks:
        actual = c.df.agg(c.agg.alias("v")).collect()[0]["v"]
        results.append((c.name, actual, bool(c.comparison(actual, c.expected))))
    failures = [r for r in results if not r[2]]
    if failures:
        raise ValueError(f"data-quality check failures: {failures}")
    return results


def dq_counts(
    tables: dict[str, DataFrame],
    null_checks: dict[str, tuple[DataFrame, str]] | None = None,
) -> DataFrame:
    """The reference's check table as a *query*: one row per check with its
    observed count, unioned into a single DataFrame (drives the driver's
    oracle comparison; run_checks drives hard assertions)."""
    parts = [
        df.agg(
            F.lit(name).alias("table_name"), F.count(F.lit(1)).alias("row_cnt")
        )
        for name, df in tables.items()
    ]
    for name, (df, column) in (null_checks or {}).items():
        parts.append(
            df.agg(
                F.lit(name).alias("table_name"),
                F.count(F.when(F.col(column).isNull(), 1)).alias("row_cnt"),
            )
        )
    return reduce(DataFrame.unionAll, parts)
