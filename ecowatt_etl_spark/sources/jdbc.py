"""JDBC sink/source surface (SURVEY §2 S7/S8/S10).

Spark-side equivalent of the reference's SQL-database I/O
(reference utils/datsetup.py:98-130):

- ``upload_dataframe_sqldatabase`` (datsetup.py:98-113): pandas
  ``to_sql(if_exists='replace')`` plus hand-issued PK DDL →
  :func:`write_jdbc` with ``mode="replace"`` plus
  :func:`primary_key_ddl` (Spark's JDBC writer cannot issue
  constraint DDL in-band, so the DDL is returned for out-of-band
  execution — the same statements the reference runs).
- ``append_dataframe_sqldatabase`` (datsetup.py:115-117) →
  :func:`write_jdbc` with ``mode="append"``.
- ``get_sql_table`` (datsetup.py:127-130): query → list of record
  dicts → :func:`to_records`.

``write_jdbc`` is exercised LIVE against embedded Apache Derby (on
Spark's classpath for the Hive metastore): replace/append round-trips,
replace-overwrite semantics, and PK-constraint enforcement after the
out-of-band DDL all run through a real database in tests/test_sinks.py
— plus a no-driver boundary test for databases whose jar is absent
(the reference's SQL Server). At scale, JDBC writes are bottlenecked
by the database, not Spark — ``num_partitions`` caps the number of
concurrent connections (default 8) so a 1000-executor job cannot open
1000 sessions against one database.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_MODE_MAP = {
    # pandas to_sql if_exists semantics → Spark writer modes
    "replace": "overwrite",
    "append": "append",
    "fail": "errorifexists",
}


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "replace",
    properties: dict[str, str] | None = None,
    num_partitions: int = 8,
) -> None:
    """Write ``df`` to a JDBC table with pandas-``to_sql``-style modes.

    ``mode`` is the reference's ``if_exists`` vocabulary ("replace" /
    "append" / "fail"); it maps onto Spark writer modes. The frame is
    repartitioned to ``num_partitions`` so concurrent DB connections
    stay bounded regardless of cluster size — ``repartition`` (not
    ``coalesce``) because coalesce removes the shuffle barrier and
    would collapse the UPSTREAM computation to the same task count,
    serializing whatever produced the frame.
    """
    if mode not in _MODE_MAP:
        raise ValueError(f"mode must be one of {sorted(_MODE_MAP)}, got {mode!r}")
    writer = df.repartition(num_partitions).write.mode(_MODE_MAP[mode])
    writer.jdbc(url=url, table=table, properties=properties or {})


def primary_key_ddl(table: str) -> list[str]:
    """The PK DDL the reference issues after a replace-load
    (datsetup.py:100-113): facts key on ``{table}_id``, dimensions on
    the ``dim``→``id`` renamed column. Spark's JDBC writer cannot run
    constraint DDL, so these are returned for the caller to execute on
    the database connection of their choice."""
    # suffix-anchored: a substring replace would mangle names like
    # 'sediment_dim' ('dim' inside the stem is not the suffix)
    if table.lower().endswith("_dim"):
        pk = table[: -len("_dim")] + "_id"
    else:  # fact tables (and anything else) key on {table}_id
        pk = f"{table}_id"
    return [
        f"ALTER TABLE {table} ALTER COLUMN {pk} bigint NOT NULL",
        f"ALTER TABLE {table} ADD CONSTRAINT PK_{table} PRIMARY KEY ({pk})",
    ]


def to_records(df: DataFrame) -> list[dict]:
    """Result set as a list of record dicts — the reference's
    ``get_sql_table`` return shape (datsetup.py:127-130,
    ``to_dict(orient='records')``). Driver-side by construction: use
    only on small (aggregated / limited) results, never a raw fact
    table."""
    return [row.asDict(recursive=True) for row in df.collect()]
