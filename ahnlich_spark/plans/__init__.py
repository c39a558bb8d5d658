from ahnlich_spark.plans.engine import Engine, StoreUpsert, DelResult, StoreInfo

__all__ = ["Engine", "StoreUpsert", "DelResult", "StoreInfo"]
