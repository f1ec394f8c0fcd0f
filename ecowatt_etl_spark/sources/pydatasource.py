"""Custom Python Data Source (Spark 4 DataSource API): a generated
date dimension.

The Python Data Source API is the engine's extension point for reading
systems Spark has no built-in connector for (internal REST APIs,
proprietary formats, procedural generators): implement
``DataSource``/``DataSourceReader``, register once per session, and
the source becomes a first-class ``spark.read.format(...)`` citizen —
schema'd, partition-parallel, usable in joins like any table.

This instance generates the classic DATE DIMENSION (calendar table)
procedurally: one InputPartition per month, so a 50-year calendar
fans out across 600 tasks with zero driver-side row materialization —
the pattern scales to any generator whose key space partitions
cleanly. Rows are computed with ``datetime`` arithmetic (pure,
deterministic); weekday uses ISO numbering (Mon=1..Sun=7) to match
the SQL oracle's ``isodow``.
"""

from __future__ import annotations

from datetime import date, timedelta

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class _MonthPartition(InputPartition):
    def __init__(self, year: int, month: int):
        self.year = year
        self.month = month


class DateDimReader(DataSourceReader):
    def __init__(self, options: dict):
        self.start = date.fromisoformat(options.get("start", "2024-01-01"))
        self.end = date.fromisoformat(options.get("end", "2024-12-31"))

    def partitions(self):
        parts = []
        y, m = self.start.year, self.start.month
        while (y, m) <= (self.end.year, self.end.month):
            parts.append(_MonthPartition(y, m))
            y, m = (y + 1, 1) if m == 12 else (y, m + 1)
        return parts

    def read(self, partition: _MonthPartition):
        d = date(partition.year, partition.month, 1)
        while d.month == partition.month and self.start <= d <= self.end:
            isodow = d.isoweekday()
            yield (d, d.year, d.month, d.day, isodow, isodow >= 6)
            d = d + timedelta(days=1)


class DateDimSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "date_dim"

    def schema(self) -> str:
        return (
            "date DATE, year INT, month INT, day INT, "
            "isodow INT, is_weekend BOOLEAN"
        )

    def reader(self, schema):
        return DateDimReader(self.options)


def register_date_dim(spark) -> None:
    """Idempotent per-session registration of the date_dim source."""
    key = "_ecowatt_date_dim_registered"
    if not getattr(spark, key, False):
        spark.dataSource.register(DateDimSource)
        setattr(spark, key, True)
