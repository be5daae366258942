"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``parallel_dataflow_spark.plans.registry`` — the engine's
query registry. Each ``queries()`` entry is a DataFrame-native
implementation; ``oracle_sql()`` carries its exact ANSI-SQL twin for the
DuckDB oracle (same aliases, same rounding, timestamps as epoch seconds).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from parallel_dataflow_spark.plans.registry import (  # noqa: E402
    ORACLE_SQL,
    QUERIES,
    flagship_entry,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship_entry(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for each SQL-expressible query."""
    return dict(ORACLE_SQL)
