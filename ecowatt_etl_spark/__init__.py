"""ecowatt_etl_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of
the EcoWatt-ETL reference (an Azure-blob → pandas → Azure-SQL ETL +
Streamlit analytics project), re-expressed as a lazy, declarative,
Catalyst-optimized Spark engine, plus the large-scale training-data
pipeline operators (dedup, similarity search, text analysis, event-time
windows) the reference never had.

Layout:
    session      — SparkSession factory tuned for local[N] and cluster use
    sources/     — CSV (reference-shaped) and Parquet (testdata) scans, sinks
    functions/   — scalar expression library (cleaning, exact decimal aggs)
    operators/   — relational + beyond-reference operators
    plans/       — the end-to-end EcoWatt star-schema pipeline
    queries/     — named query catalog (drives __spark_entry__.py)
    streaming/   — Structured Streaming variants of the event queries
"""

from ecowatt_etl_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
