from ecowatt_etl_spark.functions import cleaning, exact

__all__ = ["cleaning", "exact"]
