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

from parallel_dataflow_spark.pkgzip import ensure_on_executors  # noqa: E402
from parallel_dataflow_spark.plans.registry import (  # noqa: E402
    LAZY_ORACLE_SQL,
    ORACLE_SQL,
    QUERIES,
    flagship_entry,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    ensure_on_executors(spark)
    return flagship_entry(spark, "/root/testdata/sf0.001")


def _wrap(fn: Callable[[SparkSession, str], DataFrame]):
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        # ship the package zip to python workers (idempotent) so pandas-UDF
        # kernels unpickle regardless of the harness's cwd / sys.path
        ensure_on_executors(spark)
        return fn(spark, sf_dir)

    wrapped.__name__ = getattr(fn, "__name__", "query")
    wrapped.__doc__ = fn.__doc__
    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for each SQL-expressible query.
    Lazy entries (e.g. the Bril recursive-CTE oracles, whose VALUES
    relations come from parsing the reference corpus) are generated here."""
    out = dict(ORACLE_SQL)
    for name, gen in LAZY_ORACLE_SQL.items():
        out[name] = gen()
    return out


def extra_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Second-tier surface (outside the driver's graded window): entries
    subsumed by a stronger graded sibling, still runnable and
    pytest-oracle-checked (tests/test_extra_queries.py)."""
    from parallel_dataflow_spark.plans.registry import EXTRA_QUERIES

    return {name: _wrap(fn) for name, fn in EXTRA_QUERIES.items()}
