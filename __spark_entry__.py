"""Driver contract for the spark-graft builder (PySpark target).

Thin view over the engine's query registry
(ecowatt_etl_spark/queries/registry.py): every implemented operator
from SURVEY §2 registers a (spark, sf_dir) -> DataFrame callable and,
when ANSI-expressible, a DuckDB oracle SQL twin.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

FLAGSHIP = "q01_pricing_summary"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from ecowatt_etl_spark.queries.registry import all_queries

    return all_queries()[FLAGSHIP].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from ecowatt_etl_spark.queries.registry import all_queries

    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; keys without an entry get the
    driver's weaker rows-only check (approximate/sketch-based or
    non-SQL-expressible operators only)."""
    from ecowatt_etl_spark.queries.registry import oracle_map

    return oracle_map()
