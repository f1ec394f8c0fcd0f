"""Contract tests for the time-series toolkit's composite ordering key.

q164/q165/q166/q174 select open/close/latest rows via the composite
key epoch_micros·10^7 + event_id; the encoding is only injective while
event_id < 10^7 (the docstring's stated precondition). These tests keep
that claim honest against testdata regeneration.
"""

from __future__ import annotations

from tests.conftest import SF_ORACLE, SF_SMOKE


def test_event_id_fits_composite_ordering_key(spark):
    from pyspark.sql import functions as F

    from ecowatt_etl_spark.sources.tables import load_table

    for sf_dir in (SF_SMOKE, SF_ORACLE):
        ev = load_table(spark, sf_dir, "events")
        row = ev.agg(
            F.max("event_id").alias("mx"), F.min("event_id").alias("mn")
        ).collect()[0]
        assert 0 <= row["mn"] and row["mx"] < 10_000_000, sf_dir


def test_composite_key_orders_like_ts_then_event_id(spark):
    """The scalar key must rank identically to the (ts, event_id)
    lexicographic order it stands in for."""
    from pyspark.sql import functions as F

    from ecowatt_etl_spark.sources.tables import load_table

    ev = load_table(spark, SF_SMOKE, "events").limit(500)
    key = (
        F.unix_micros("ts").cast("decimal(38,0)") * F.lit(10_000_000)
        + F.col("event_id")
    ).alias("k")
    rows = ev.select("ts", "event_id", key).collect()
    by_key = sorted(rows, key=lambda r: r["k"])
    by_tuple = sorted(rows, key=lambda r: (r["ts"], r["event_id"]))
    assert [(r["ts"], r["event_id"]) for r in by_key] == [
        (r["ts"], r["event_id"]) for r in by_tuple
    ]
