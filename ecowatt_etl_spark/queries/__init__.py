from ecowatt_etl_spark.queries.registry import QuerySpec, all_queries, oracle_map, query

__all__ = ["QuerySpec", "all_queries", "oracle_map", "query"]
