from updater_spark.plans.cdc import CdcEngine, UpdateStats

__all__ = ["CdcEngine", "UpdateStats"]
