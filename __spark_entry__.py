"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over :mod:`cyclebane_spark.queries` — the named-query registry
where every SURVEY.md §2 operator (and north-star extension) registers a
Spark implementation plus a DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cyclebane_spark import queries as _q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q5-shape star join) on /root/testdata/sf0.001."""
    return _q.queries()['q5_local_supplier_volume'](spark, '/root/testdata/sf0.001')


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
