"""Named-query registry.

Every operator the engine claims (SURVEY §2 inventory + the
beyond-reference pipeline operators) registers here as a callable
``(spark, sf_dir) -> DataFrame`` plus, when the semantics are
ANSI-SQL-expressible, a DuckDB oracle string over the same parquet
tables. ``__spark_entry__.py`` is a thin view over this registry.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL twin; None → rows-only check
    doc: str


_REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a named query (and optional DuckDB oracle)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, (fn.__doc__ or "").strip())
        return fn

    return deco


def _load_all() -> None:
    """Import every query module so registrations run."""
    import ecowatt_etl_spark.queries.analytics_queries  # noqa: F401
    import ecowatt_etl_spark.queries.dedup_queries  # noqa: F401
    import ecowatt_etl_spark.queries.ecowatt_queries  # noqa: F401
    import ecowatt_etl_spark.queries.event_queries  # noqa: F401
    import ecowatt_etl_spark.queries.multimodal_queries  # noqa: F401
    import ecowatt_etl_spark.queries.relational  # noqa: F401
    import ecowatt_etl_spark.queries.similarity_queries  # noqa: F401
    import ecowatt_etl_spark.queries.text_queries  # noqa: F401


def all_queries() -> dict[str, QuerySpec]:
    _load_all()
    return dict(_REGISTRY)


def oracle_map() -> dict[str, str]:
    return {n: s.oracle for n, s in all_queries().items() if s.oracle is not None}
