from demo_etl_spark.sources.eventgen import EventGenDataSource

__all__ = ["EventGenDataSource"]
from demo_etl_spark.sources.auditsink import AuditSinkDataSource  # noqa: E402

__all__.append("AuditSinkDataSource")
