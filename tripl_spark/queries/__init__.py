from tripl_spark.queries.registry import all_oracles, all_queries, query  # noqa: F401
