from updater_spark.sources.store import TableStore

__all__ = ["TableStore"]
