"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in the ``pro_etl_spark`` package; every operator
from SURVEY.md §2 registers itself with
``pro_etl_spark.registry.register`` (query callable + oracle SQL).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import pro_etl_spark

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the migration
    reconciliation log (SURVEY §7.4) — mapping dedup → validation →
    broadcast join against the customer corpus → status/reason log."""
    from pro_etl_spark.ops.migration import migration_reconciliation

    return migration_reconciliation(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return pro_etl_spark.get_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each value-checkable query;
    keys absent here (vs queries()) are rows-only by design
    (nondeterministic output or filesystem round-trips)."""
    return pro_etl_spark.get_oracles()
