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


# ---------------------------------------------------------------------------
# Streaming half of the DataSource API: a deterministic tick stream
# ---------------------------------------------------------------------------
# SimpleDataSourceStreamReader is the bounded-state variant: the engine
# asks for (start → latest) slices by offset; offsets here are plain
# tick indices, so replay is exact and the stream is fully
# deterministic — the property that lets a custom source carry a
# value-checked oracle like any batch table.


class TickStreamReader:
    """SimpleDataSourceStreamReader for a generated tick stream.

    Emits ``ticks_total`` rows (tick_id, bucket, amount_cents) across
    micro-batches of ``batch_size``. Content is pure arithmetic on the
    tick index: bucket = tick mod n_buckets, amount_cents =
    (tick·2654435761) mod 10000 — a Knuth multiplicative hash, exact
    in int64."""

    def __init__(self, options: dict):
        self.total = int(options.get("ticks_total", "1000"))
        self.batch = int(options.get("batch_size", "128"))
        self.n_buckets = int(options.get("n_buckets", "8"))

    def initialOffset(self):
        return {"tick": 0}

    def read(self, start: dict):
        lo = start["tick"]
        hi = min(lo + self.batch, self.total)
        rows = [
            (t, t % self.n_buckets, (t * 2654435761) % 10000)
            for t in range(lo, hi)
        ]
        return iter(rows), {"tick": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            (t, t % self.n_buckets, (t * 2654435761) % 10000)
            for t in range(start["tick"], end["tick"])
        )

    def commit(self, end: dict) -> None:
        pass


class TickStreamSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "tick_stream"

    def schema(self) -> str:
        return "tick_id BIGINT, bucket INT, amount_cents BIGINT"

    def simpleStreamReader(self, schema):
        return TickStreamReader(self.options)


def register_tick_stream(spark) -> None:
    """Idempotent per-session registration of the tick_stream source."""
    key = "_ecowatt_tick_stream_registered"
    if not getattr(spark, key, False):
        spark.dataSource.register(TickStreamSource)
        setattr(spark, key, True)
