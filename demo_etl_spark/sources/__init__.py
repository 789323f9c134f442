from demo_etl_spark.sources.eventgen import EventGenDataSource

__all__ = ["EventGenDataSource"]
