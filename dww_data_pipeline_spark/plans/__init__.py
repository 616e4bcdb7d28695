from dww_data_pipeline_spark.plans.registry import REGISTRY, Query, all_oracles, all_queries

__all__ = ["REGISTRY", "Query", "all_oracles", "all_queries"]
