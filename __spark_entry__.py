"""Driver contract for the spark-graft builder (PySpark target).

Delegates to ``firewatch_spark.queries`` — the registry of named
operator queries (SURVEY.md §2 inventory + LLM-pipeline pack) with
their DuckDB oracle twins.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from firewatch_spark import queries as _q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q.entry(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-expressible query."""
    return _q.oracle_sql()
