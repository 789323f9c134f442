from demo_etl_spark.lineage.tracker import LineageEvent, LineageTracker

__all__ = ["LineageEvent", "LineageTracker"]
